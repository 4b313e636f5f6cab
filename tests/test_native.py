"""Native runtime tests: build the C++ library, synthesize a tiny EuRoC-layout
dataset (CSV + PNGs via PIL), read it back, and exercise the sensor queue."""

import os

import numpy as np
import pytest

from rd_vio_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain/libpng unavailable"
)


@pytest.fixture(scope="module")
def euroc_dir(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("mav0")
    (root / "imu0").mkdir()
    (root / "cam0" / "data").mkdir(parents=True)

    rng = np.random.default_rng(0)
    with open(root / "imu0" / "data.csv", "w") as f:
        f.write("#timestamp,w_x,w_y,w_z,a_x,a_y,a_z\n")
        for i in range(100):
            t_ns = 1_000_000_000 + i * 5_000_000
            vals = rng.standard_normal(6)
            f.write(f"{t_ns}," + ",".join(f"{v:.6f}" for v in vals) + "\n")

    imgs = []
    with open(root / "cam0" / "data.csv", "w") as f:
        f.write("#timestamp [ns],filename\n")
        for i in range(5):
            t_ns = 1_000_000_000 + i * 50_000_000
            name = f"{t_ns}.png"
            img = (rng.uniform(0, 255, size=(48, 64))).astype(np.uint8)
            imgs.append(img)
            Image.fromarray(img, mode="L").save(root / "cam0" / "data" / name)
            f.write(f"{t_ns},{name}\n")
    return str(root), imgs


def test_native_euroc_reader(euroc_dir):
    path, imgs = euroc_dir
    ds = native.NativeEurocDataset(path)
    assert len(ds.imu_t) == 100
    assert len(ds.frame_t) == 5
    assert (ds.width, ds.height) == (64, 48)
    np.testing.assert_allclose(ds.imu_t[0], 1.0)
    np.testing.assert_allclose(np.diff(ds.imu_t), 0.005, atol=1e-9)
    img0 = ds.load_image(0)
    np.testing.assert_allclose(img0, imgs[0].astype(np.float32), atol=0)
    img3 = ds.load_image(3)
    np.testing.assert_allclose(img3, imgs[3].astype(np.float32), atol=0)
    ds.close()


def test_native_sensor_queue_interleave():
    q = native.NativeSensorQueue()
    # gyro at 0, 10, 20 ms; accel at 5, 15 ms -> interpolated midpoints
    q.push_gyro(0.000, [0.0, 0.0, 0.0])
    q.push_gyro(0.010, [1.0, 2.0, 3.0])
    q.push_gyro(0.020, [2.0, 4.0, 6.0])
    q.push_accel(0.005, [9.0, 0.0, 0.0])
    q.push_accel(0.015, [9.5, 0.0, 0.0])
    assert q.fused_count() == 2
    rows = q.pop_interval(0.012)
    assert len(rows) == 1
    np.testing.assert_allclose(rows[0, 0], 0.005)
    np.testing.assert_allclose(rows[0, 1:4], [0.5, 1.0, 1.5])  # midpoint gyro
    np.testing.assert_allclose(rows[0, 4], 9.0)
    rows = q.pop_interval(1.0)
    assert len(rows) == 1
    np.testing.assert_allclose(rows[0, 1:4], [1.5, 3.0, 4.5])
    q.destroy()


def test_native_motion_fast_path():
    q = native.NativeSensorQueue(capacity=16)
    for i in range(20):
        q.push_motion(i * 0.01, [1.0, 2.0, 3.0], [4.0, 5.0, 6.0])
    assert q.fused_count() == 16  # bounded ring
    rows = q.pop_interval(10.0, cap=32)
    assert len(rows) == 16
    q.destroy()


def test_native_preintegrator_matches_jax():
    """native/preintegrator.cpp must match ops/preintegration.integrate (and
    the Python fallback must match the native path)."""
    import jax
    import jax.numpy as jnp

    from rd_vio_tpu.ops import preintegration as pre
    from rd_vio_tpu.ops import preintegration_np as pre_np

    rng = np.random.default_rng(3)
    F, N = 4, 24
    dts = np.zeros((F, N))
    ws = np.zeros((F, N, 3))
    accs = np.zeros((F, N, 3))
    for f in range(F):
        n = rng.integers(5, N)
        dts[f, :n] = rng.uniform(0.004, 0.006, n)
        ws[f, :n] = rng.normal(0, 0.3, (n, 3))
        accs[f, :n] = rng.normal(0, 2.0, (n, 3)) + [0, 0, 9.8]
    bg = rng.normal(0, 0.01, (F, 3))
    ba = rng.normal(0, 0.05, (F, 3))
    covs = [np.eye(3) * c for c in (2.9e-8, 4e-6, 3.8e-10, 9e-6)]

    out = pre_np.integrate_full_batch(dts, ws, accs, bg, ba, *covs)

    covs_j = [jnp.asarray(c) for c in covs]
    for f in range(F):
        d = pre.integrate(
            jnp.asarray(dts[f]), jnp.asarray(ws[f]), jnp.asarray(accs[f]),
            jnp.asarray(bg[f]), jnp.asarray(ba[f]), *covs_j,
        )
        sic = pre.sqrt_inv_cov(d.cov + 1e-14 * jnp.eye(15))
        for k, ref in [
            ("t", d.t), ("q", d.q), ("p", d.p), ("v", d.v), ("cov", d.cov),
            ("dq_dbg", d.dq_dbg), ("dp_dbg", d.dp_dbg), ("dp_dba", d.dp_dba),
            ("dv_dbg", d.dv_dbg), ("dv_dba", d.dv_dba), ("sqrt_inv_cov", sic),
        ]:
            ref = np.asarray(ref)
            err = np.max(np.abs(out[k][f] - ref))
            rel = err / (np.max(np.abs(ref)) + 1e-12)
            assert rel < 1e-8, (f, k, err, rel)

    # Python fallback (no native lib) must agree with the native path
    import rd_vio_tpu.native as nat

    orig = nat.available
    nat.available = lambda: False
    try:
        out2 = pre_np.integrate_full_batch(dts, ws, accs, bg, ba, *covs)
    finally:
        nat.available = orig
    for k in out:
        scale = np.max(np.abs(out[k])) + 1e-12
        assert np.max(np.abs(out[k] - out2[k])) / scale < 1e-12, k
