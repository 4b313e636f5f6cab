"""Render pixel images from a SyntheticSequence: Gaussian blobs at projected
landmark positions over a geometry-consistent textured background, with
distractor features and photometric drift (round-4 realism hardening,
VERDICT r3 item 8).

Bridges the perfect-match seam and the real-image path: the same synthetic
world is observable either as exact keypoints (SyntheticBackend) or as actual
images for the CLAHE/GFTT/KLT kernels (JaxImageBackend) — SURVEY.md §4.3.

Realism elements (all geometry-consistent, so the scene remains a valid
static world for VIO — difficulty comes from texture/distractors/lighting,
not from violating the rigid-world assumption):

- background: a band-limited ENVIRONMENT-MAP texture sampled along each
  pixel's world ray direction (zero-parallax far background — moves
  consistently under rotation, like sky/far structure), instead of a
  screen-fixed sinusoid;
- distractors: extra finite-depth world points rendered as blobs but absent
  from the ground-truth keypoint tables — GFTT sees corners that are not
  planted landmarks (they are still static world geometry);
- photometric drift: slow per-frame gain/offset modulation (the CLAHE
  preprocess must absorb it, as on real sequences);
- optional per-pixel Gaussian sensor noise.
"""

from __future__ import annotations

import numpy as np

from rd_vio_tpu.datasets.synthetic import SyntheticSequence, _quat_to_R


class SequenceRenderer:
    def __init__(self, seq: SyntheticSequence, image_size=(320, 240),
                 blob_sigma=1.3, seed=7, textured: bool = True,
                 n_distractors: int = 300, brightness_drift: bool = True,
                 pixel_noise: float = 1.0):
        # blob_sigma 1.3: sharp enough that the Harris response peaks AT the
        # blob center (larger sigmas put the gradient energy on a ring around
        # it, biasing integer-NMS corners ~1.3 px off the true projection)
        self.seq = seq
        self.W, self.H = image_size
        self.sigma = blob_sigma
        self.textured = textured
        self.brightness_drift = brightness_drift
        self.pixel_noise = float(pixel_noise)
        rng = np.random.default_rng(seed)
        self._rng = rng
        n = len(seq.landmarks)
        self.amps = rng.uniform(80.0, 200.0, n)
        # distractor world points: same spatial envelope as the landmark set
        # but NOT in the ground-truth keypoint tables
        if n_distractors > 0 and n > 0:
            lo = seq.landmarks.min(axis=0)
            hi = seq.landmarks.max(axis=0)
            self.distractors = rng.uniform(lo, hi, (n_distractors, 3))
            self.d_amps = rng.uniform(60.0, 160.0, n_distractors)
        else:
            self.distractors = np.zeros((0, 3))
            self.d_amps = np.zeros(0)
        # environment-map basis: band-limited directional sinusoids
        n_waves = 24
        w = rng.normal(size=(n_waves, 3))
        self.env_dirs = w / np.linalg.norm(w, axis=-1, keepdims=True)
        self.env_freqs = rng.uniform(4.0, 18.0, n_waves)
        self.env_phases = rng.uniform(0, 2 * np.pi, n_waves)
        self.env_amps = rng.uniform(2.0, 7.0, n_waves)
        # scale intrinsics from the sequence's nominal camera to this size
        K = seq.K_mat
        sx = self.W / 752.0
        sy = self.H / 480.0
        self.K = np.array(
            [
                [K[0, 0] * sx, 0, K[0, 2] * sx],
                [0, K[1, 1] * sy, K[1, 2] * sy],
                [0, 0, 1.0],
            ]
        )
        ys, xs = np.mgrid[0: self.H, 0: self.W].astype(np.float32)
        self._xs, self._ys = xs, ys
        # cached unit rays in the CAMERA frame (rotated per frame)
        rx = (xs - self.K[0, 2]) / self.K[0, 0]
        ry = (ys - self.K[1, 2]) / self.K[1, 1]
        rays = np.stack([rx, ry, np.ones_like(rx)], axis=-1)
        self._rays = (rays / np.linalg.norm(rays, axis=-1, keepdims=True)
                      ).reshape(-1, 3).astype(np.float32)

    def _splat(self, img, u, v, vis, amps):
        s2 = 2 * self.sigma**2
        r = int(np.ceil(3 * self.sigma))
        xs, ys = self._xs, self._ys
        for i in np.flatnonzero(vis):
            cx, cy = u[i], v[i]
            x0, x1 = int(max(0, cx - r)), int(min(self.W, cx + r + 1))
            y0, y1 = int(max(0, cy - r)), int(min(self.H, cy + r + 1))
            if x1 <= x0 or y1 <= y0:
                continue
            gx = xs[y0:y1, x0:x1] - cx
            gy = ys[y0:y1, x0:x1] - cy
            img[y0:y1, x0:x1] += amps[i] * np.exp(-(gx * gx + gy * gy) / s2)

    def _project(self, pts, R, p):
        x_cam = (pts - p) @ R
        vis = x_cam[:, 2] > 0.3
        z = np.maximum(x_cam[:, 2], 1e-9)
        u = self.K[0, 0] * x_cam[:, 0] / z + self.K[0, 2]
        v = self.K[1, 1] * x_cam[:, 1] / z + self.K[1, 2]
        vis &= (u > -5) & (u < self.W + 5) & (v > -5) & (v < self.H + 5)
        return u, v, vis

    def render(self, frame_idx: int) -> np.ndarray:
        seq = self.seq
        R = _quat_to_R(seq.q_wb[frame_idx])
        p = seq.p_wb[frame_idx]

        if self.textured:
            # world-ray environment texture (zero parallax; rotation-
            # consistent) — (HW, 3) @ (3, n_waves) then banked sinusoids
            d_world = self._rays @ R.T.astype(np.float32)
            phase = (d_world @ (self.env_dirs.T * self.env_freqs
                                ).astype(np.float32)) + self.env_phases
            img = 60.0 + np.sin(phase, dtype=np.float32) @ self.env_amps
            img = img.reshape(self.H, self.W).astype(np.float64)
        else:
            xs, ys = self._xs, self._ys
            img = 40.0 + 20.0 * np.sin(xs / 53.0) * np.cos(ys / 37.0)
            img = img.astype(np.float64)

        u, v, vis = self._project(seq.landmarks, R, p)
        self._splat(img, u, v, vis, self.amps)
        if len(self.distractors):
            ud, vd, visd = self._project(self.distractors, R, p)
            self._splat(img, ud, vd, visd, self.d_amps)

        if self.brightness_drift:
            t = seq.t_frame[frame_idx]
            gain = 1.0 + 0.12 * np.sin(2 * np.pi * t / 5.0)
            offset = 8.0 * np.sin(2 * np.pi * t / 3.7)
            img = img * gain + offset
        if self.pixel_noise > 0:
            img = img + self._rng.normal(0.0, self.pixel_noise, img.shape)
        return np.clip(img, 0, 255)
