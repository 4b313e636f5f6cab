"""Device-resident frontend loop (ops/frontend_loop.ft_loop_step): slot
semantics (born/cont), tracking accuracy across a known shift, life
accounting, host_drop feedback, and Poisson spacing of detections."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.ndimage import gaussian_filter, shift as ndshift

from rd_vio_tpu.ops import frontend_loop as fl
from rd_vio_tpu.ops.image import pyramid

H, W = 120, 160
CAP = 64
SHIFT = (2.3, -1.6)  # (dx, dy) pixels


def _textured(rng, shift=(0.0, 0.0)):
    base = rng.standard_normal((H // 4 + 8, W // 4 + 8))
    img = np.kron(base, np.ones((4, 4)))
    img = gaussian_filter(img, 2.0)
    img = ndshift(img, (shift[1], shift[0]), order=3, mode="nearest")
    img = img[:H, :W]
    return ((img - img.min()) / (np.ptp(img) + 1e-9) * 255.0).astype(np.float32)


@pytest.fixture(scope="module")
def imgs():
    rng = np.random.default_rng(648)
    img1 = _textured(rng)
    rng2 = np.random.default_rng(648)
    img2 = _textured(rng2, shift=SHIFT)
    pyr1 = pyramid.build_pyramid(jnp.asarray(img1), 3)
    pyr2 = pyramid.build_pyramid(jnp.asarray(img2), 3)
    return pyr1, pyr2


def _step(state, pyr_a, pyr_b, detect, drop=None, R=None):
    K = jnp.asarray(np.diag([120.0, 120.0, 1.0]).astype(np.float32))
    K = K.at[0, 2].set(W / 2.0).at[1, 2].set(H / 2.0)
    return fl.ft_loop_step(
        state, pyr_a, pyr_b,
        jnp.eye(3, dtype=jnp.float32) if R is None else R,
        jax.random.PRNGKey(3),
        jnp.zeros(CAP, bool) if drop is None else drop,
        K, np.float32(0.02),
        detect=detect, max_points=40, min_dist=10.0, num_hypotheses=64,
    )


def test_detect_populates_free_slots(imgs):
    pyr1, _ = imgs
    st0 = fl.init_state(CAP)
    st1, out = _step(st0, pyr1, pyr1, detect=True)
    out = jax.device_get(out)
    assert out["born"].sum() > 10
    assert (out["valid"] == out["born"]).all()  # nothing to continue yet
    assert not out["cont"].any()
    assert (out["life"][out["valid"]] == 1).all()
    # spacing: no two detections within min_dist
    pix = out["pix"][out["valid"]]
    d = np.linalg.norm(pix[:, None] - pix[None], axis=-1)
    np.fill_diagonal(d, 1e9)
    assert d.min() >= 10.0 - 1e-3


def test_track_known_shift_and_life(imgs):
    pyr1, pyr2 = imgs
    st0 = fl.init_state(CAP)
    st1, out1 = _step(st0, pyr1, pyr1, detect=True)
    st2, out2 = _step(st1, pyr1, pyr2, detect=False)
    out1, out2 = jax.device_get((out1, out2))
    cont = out2["cont"]
    assert cont.sum() > 0.6 * out1["valid"].sum()
    flow = out2["pix"][cont] - out1["pix"][cont]
    err = np.linalg.norm(flow - np.asarray(SHIFT), axis=-1)
    assert np.median(err) < 0.3, f"median flow err {np.median(err):.3f} px"
    assert (out2["life"][cont] == 2).all()
    assert not out2["born"].any()  # detect=False

    # slots are stable: cont slots keep their index => the host can link
    # slot s in frame k-1 to slot s in frame k
    assert (out1["valid"][cont]).all()


def test_host_drop_retires_slots(imgs):
    pyr1, pyr2 = imgs
    st0 = fl.init_state(CAP)
    st1, out1 = _step(st0, pyr1, pyr1, detect=True)
    out1 = jax.device_get(out1)
    sl = int(np.flatnonzero(out1["valid"])[0])
    drop = np.zeros(CAP, bool)
    drop[sl] = True
    st2, out2 = _step(st1, pyr1, pyr2, detect=False,
                      drop=jnp.asarray(drop))
    out2 = jax.device_get(out2)
    assert not out2["valid"][sl]
    assert not out2["cont"][sl]


def test_detect_refills_after_tracking(imgs):
    """A detect step after tracking: survivors keep slots (cont), free slots
    are refilled (born), and presets are respected (no new corner within
    min_dist of a survivor)."""
    pyr1, pyr2 = imgs
    st0 = fl.init_state(CAP)
    st1, _ = _step(st0, pyr1, pyr1, detect=True)
    st2, out2 = _step(st1, pyr1, pyr2, detect=True)
    out2 = jax.device_get(out2)
    assert out2["cont"].sum() > 0
    assert (out2["cont"] & out2["born"]).sum() == 0
    surv = out2["pix"][out2["cont"]]
    born = out2["pix"][out2["born"]]
    if len(born) and len(surv):
        d = np.linalg.norm(born[:, None] - surv[None], axis=-1)
        assert d.min() >= 10.0 - 1e-3
