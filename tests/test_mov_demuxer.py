"""MOV demuxer hardening (round-3 VERDICT item 7): real iPhone-produced box
trees use 64-bit sizes (largesize mdat, co64 chunk offsets), multiple traks
(audio + video + metadata), and unknown boxes interleaved between the ones we
parse. Synthesize those layouts around the MJPEG muxer's sample table and
assert the reader still finds and decodes the video track."""

import io
import struct

import numpy as np
import pytest

from rd_vio_tpu.datasets import video
from rd_vio_tpu.datasets.video import MovReader, _box, _full, write_mjpeg_mov


def _jpegs(n=4, w=48, h=32, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        a = rng.integers(0, 255, (h, w), dtype=np.uint8)
        bio = io.BytesIO()
        Image.fromarray(a).save(bio, format="JPEG", quality=90)
        out.append(bio.getvalue())
    return out, w, h


def _video_trak(jpegs, w, h, offsets, use_co64: bool, timescale=600,
                delta=20):
    """Build a 'vide' trak whose chunk-offset box is stco or co64."""
    n = len(jpegs)
    duration = n * delta
    compressor = b"Motion JPEG".ljust(32, b"\x00")[:32]
    sample_entry = _box(
        b"jpeg",
        b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x480000, 0x480000) + b"\x00" * 4
        + struct.pack(">H", 1) + compressor + struct.pack(">Hh", 24, -1),
    )
    stsd = _full(b"stsd", struct.pack(">I", 1) + sample_entry)
    stts = _full(b"stts", struct.pack(">III", 1, n, delta))
    stsc = _full(b"stsc", struct.pack(">IIII", 1, 1, 1, 1))
    stsz = _full(b"stsz", struct.pack(">II", 0, n)
                 + struct.pack(f">{n}I", *[len(j) for j in jpegs]))
    if use_co64:
        cobox = _full(b"co64", struct.pack(">I", n)
                      + struct.pack(f">{n}Q", *offsets))
    else:
        cobox = _full(b"stco", struct.pack(">I", n)
                      + struct.pack(f">{n}I", *offsets))
    # an unknown box between the parsed ones must be skipped
    junk = _box(b"free", b"\xde\xad\xbe\xef" * 4)
    stbl = _box(b"stbl", stsd + stts + junk + stsc + stsz + cobox)
    vmhd = _full(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0), flags=1)
    dref = _full(b"dref", struct.pack(">I", 1) + _full(b"url ", b"", flags=1))
    minf = _box(b"minf", vmhd + _box(b"dinf", dref) + stbl)
    hdlr = _full(b"hdlr", b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"V\x00")
    mdhd = _full(b"mdhd", struct.pack(">IIIIHH", 0, 0, timescale, duration,
                                      0x55C4, 0))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    matrix = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                         0x40000000)
    tkhd = _full(
        b"tkhd",
        struct.pack(">IIIII", 0, 0, 1, 0, duration) + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0) + matrix
        + struct.pack(">II", w << 16, h << 16), flags=7,
    )
    return _box(b"trak", tkhd + mdia)


def _sound_trak(timescale=44100):
    """A minimal non-video trak (handler 'soun') the reader must skip."""
    stbl = _box(b"stbl", _full(b"stsd", struct.pack(">I", 0)))
    smhd = _full(b"smhd", struct.pack(">HH", 0, 0))
    dref = _full(b"dref", struct.pack(">I", 1) + _full(b"url ", b"", flags=1))
    minf = _box(b"minf", smhd + _box(b"dinf", dref) + stbl)
    hdlr = _full(b"hdlr", b"\x00" * 4 + b"soun" + b"\x00" * 12 + b"S\x00")
    mdhd = _full(b"mdhd", struct.pack(">IIIIHH", 0, 0, timescale, 0,
                                      0x55C4, 0))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", struct.pack(">IIIII", 0, 0, 2, 0, 0) + b"\x00" * 8
                 + struct.pack(">HHHH", 0, 0, 0, 0) + b"\x00" * 36 + b"\x00" * 8,
                 flags=7)
    return _box(b"trak", tkhd + mdia)


def _write(path, jpegs, w, h, *, co64: bool, largesize_mdat: bool,
           leading_sound_trak: bool):
    """Assemble an adversarial MOV: optional 64-bit boxes + extra traks."""
    ftyp = _box(b"ftyp", b"qt  " + struct.pack(">I", 0x200) + b"qt  ")
    mdat_payload = b"".join(jpegs)
    if largesize_mdat:
        # size field = 1, real 64-bit size follows the type
        header = struct.pack(">I", 1) + b"mdat" + struct.pack(
            ">Q", 16 + len(mdat_payload))
        mdat = header + mdat_payload
        first_sample = len(ftyp) + 16
    else:
        mdat = _box(b"mdat", mdat_payload)
        first_sample = len(ftyp) + 8
    offsets, off = [], first_sample
    for j in jpegs:
        offsets.append(off)
        off += len(j)

    traks = b""
    if leading_sound_trak:
        traks += _sound_trak()
    traks += _video_trak(jpegs, w, h, offsets, use_co64=co64)
    n = len(jpegs)
    timescale, delta = 600, 20
    mvhd = _full(
        b"mvhd",
        struct.pack(">IIII", 0, 0, timescale, n * delta)
        + struct.pack(">IH", 0x10000, 0x100) + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 3),
    )
    moov = _box(b"moov", mvhd + traks)
    with open(path, "wb") as f:
        f.write(ftyp + mdat + moov)


@pytest.mark.parametrize("co64", [False, True])
@pytest.mark.parametrize("largesize", [False, True])
@pytest.mark.parametrize("sound_first", [False, True])
def test_adversarial_layouts(tmp_path, co64, largesize, sound_first):
    jpegs, w, h = _jpegs(n=5)
    p = tmp_path / "adv.mov"
    _write(str(p), jpegs, w, h, co64=co64, largesize_mdat=largesize,
           leading_sound_trak=sound_first)
    r = MovReader(str(p))
    assert len(r) == 5
    assert (r.width, r.height) == (w, h)
    assert r.codec == b"jpeg"
    # timestamps decode from stts at the mdhd timescale
    np.testing.assert_allclose(np.diff(r.timestamps), 20 / 600, atol=1e-9)
    # every sample decodes to the right shape
    for i in range(5):
        assert r.sample(i) == jpegs[i]
        fr = r.decode(i)
        assert fr.shape == (h, w)


def test_roundtrip_against_own_muxer(tmp_path):
    rng = np.random.default_rng(1)
    frames = [rng.integers(0, 255, (32, 48), dtype=np.uint8)
              for _ in range(3)]
    p = tmp_path / "own.mov"
    write_mjpeg_mov(str(p), frames, fps=30.0)
    r = MovReader(str(p))
    assert len(r) == 3
    for i in range(3):
        d = r.decode(i)
        assert d.shape == (32, 48)
        # JPEG quality 90 keeps content recognizable
        assert np.abs(d - frames[i]).mean() < 25.0


def test_unsupported_codec_raises_with_hint(tmp_path):
    """Non-MJPEG fourcc (ADVIO ships H.264 'avc1') must raise the documented
    extraction hint, not crash the demuxer."""
    jpegs, w, h = _jpegs(n=2)
    p = tmp_path / "avc.mov"
    _write(str(p), jpegs, w, h, co64=False, largesize_mdat=False,
           leading_sound_trak=False)
    data = bytearray(p.read_bytes())
    idx = data.find(b"jpeg", data.find(b"stsd"))
    data[idx:idx + 4] = b"avc1"
    p.write_bytes(bytes(data))
    r = MovReader(str(p))
    assert r.codec == b"avc1"
    assert len(r) == 2  # sample table still parses
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        r.decode(0)


def test_truncated_trailer_stops_cleanly(tmp_path):
    jpegs, w, h = _jpegs(n=3)
    p = tmp_path / "trunc.mov"
    _write(str(p), jpegs, w, h, co64=True, largesize_mdat=True,
           leading_sound_trak=True)
    data = p.read_bytes() + b"\x00\x00\x00\xffjunk"  # malformed trailing box
    p.write_bytes(data)
    r = MovReader(str(p))
    assert len(r) == 3
    assert r.decode(2).shape == (h, w)
