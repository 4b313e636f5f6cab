"""Render pixel images from a SyntheticSequence: Gaussian blobs at projected
landmark positions over a smooth background.

Bridges the perfect-match seam and the real-image path: the same synthetic
world is observable either as exact keypoints (SyntheticBackend) or as actual
images for the CLAHE/GFTT/KLT kernels (JaxImageBackend) — SURVEY.md §4.3.
"""

from __future__ import annotations

import numpy as np

from rd_vio_tpu.datasets.synthetic import SyntheticSequence, _quat_to_R


class SequenceRenderer:
    def __init__(self, seq: SyntheticSequence, image_size=(320, 240),
                 blob_sigma=1.3, seed=7):
        # blob_sigma 1.3: sharp enough that the Harris response peaks AT the
        # blob center (larger sigmas put the gradient energy on a ring around
        # it, biasing integer-NMS corners ~1.3 px off the true projection)
        self.seq = seq
        self.W, self.H = image_size
        self.sigma = blob_sigma
        rng = np.random.default_rng(seed)
        n = len(seq.landmarks)
        self.amps = rng.uniform(80.0, 200.0, n)
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

    def render(self, frame_idx: int) -> np.ndarray:
        seq = self.seq
        R = _quat_to_R(seq.q_wb[frame_idx])
        p = seq.p_wb[frame_idx]
        x_cam = (seq.landmarks - p) @ R
        vis = x_cam[:, 2] > 0.3
        u = self.K[0, 0] * x_cam[:, 0] / np.maximum(x_cam[:, 2], 1e-9) + self.K[0, 2]
        v = self.K[1, 1] * x_cam[:, 1] / np.maximum(x_cam[:, 2], 1e-9) + self.K[1, 2]
        vis &= (u > -5) & (u < self.W + 5) & (v > -5) & (v < self.H + 5)

        ys, xs = np.mgrid[0 : self.H, 0 : self.W].astype(np.float32)
        img = 40.0 + 20.0 * np.sin(xs / 53.0) * np.cos(ys / 37.0)  # background
        s2 = 2 * self.sigma**2
        r = int(np.ceil(3 * self.sigma))
        for i in np.flatnonzero(vis):
            cx, cy = u[i], v[i]
            x0, x1 = int(max(0, cx - r)), int(min(self.W, cx + r + 1))
            y0, y1 = int(max(0, cy - r)), int(min(self.H, cy + r + 1))
            if x1 <= x0 or y1 <= y0:
                continue
            gx = xs[y0:y1, x0:x1] - cx
            gy = ys[y0:y1, x0:x1] - cy
            img[y0:y1, x0:x1] += self.amps[i] * np.exp(-(gx * gx + gy * gy) / s2)
        return np.clip(img, 0, 255)
