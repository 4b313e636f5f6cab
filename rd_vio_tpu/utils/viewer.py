"""Trajectory/map visualization — headless replacement for the reference's
Pangolin viewer (reference examples/pviz.hpp: trajectory, keyframes, point
cloud, image topics).

Renders to PNG/HTML files instead of an interactive window (no display in TPU
environments). Uses matplotlib when available, else writes a standalone HTML
canvas plot.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np


def save_trajectory_plot(
    path: str,
    est_p: np.ndarray,
    gt_p: Optional[np.ndarray] = None,
    landmarks: Optional[np.ndarray] = None,
    title: str = "rd_vio_tpu trajectory",
):
    """Top-down (x, y) trajectory + landmark plot to a PNG (or .html fallback)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 8))
        if landmarks is not None and len(landmarks):
            ax.scatter(landmarks[:, 0], landmarks[:, 1], s=2, c="#999999",
                       alpha=0.5, label="landmarks")
        if gt_p is not None and len(gt_p):
            ax.plot(gt_p[:, 0], gt_p[:, 1], "-", c="#2a7ab0", lw=1.5,
                    label="ground truth")
        ax.plot(est_p[:, 0], est_p[:, 1], "-", c="#d0543c", lw=1.5,
                label="estimate")
        ax.set_aspect("equal")
        ax.set_xlabel("x [m]")
        ax.set_ylabel("y [m]")
        ax.set_title(title)
        ax.legend(loc="best", fontsize=8)
        fig.tight_layout()
        fig.savefig(path, dpi=120)
        plt.close(fig)
        return path
    except Exception:
        html_path = os.path.splitext(path)[0] + ".html"
        data = {
            "est": est_p.tolist(),
            "gt": gt_p.tolist() if gt_p is not None else None,
            "landmarks": landmarks.tolist() if landmarks is not None else None,
        }
        with open(html_path, "w") as f:
            f.write(
                "<html><body><canvas id=c width=800 height=800></canvas>"
                "<script>const D=" + json.dumps(data) + ";"
                """
const ctx=document.getElementById('c').getContext('2d');
const all=D.est.concat(D.gt||[]).concat(D.landmarks||[]);
let xs=all.map(p=>p[0]),ys=all.map(p=>p[1]);
const x0=Math.min(...xs),x1=Math.max(...xs),y0=Math.min(...ys),y1=Math.max(...ys);
const s=780/Math.max(x1-x0,y1-y0,1e-6);
const X=p=>10+(p[0]-x0)*s, Y=p=>790-(p[1]-y0)*s;
function line(pts,color){ctx.strokeStyle=color;ctx.beginPath();
pts.forEach((p,i)=>i?ctx.lineTo(X(p),Y(p)):ctx.moveTo(X(p),Y(p)));ctx.stroke();}
if(D.landmarks){ctx.fillStyle='#999';D.landmarks.forEach(p=>ctx.fillRect(X(p),Y(p),2,2));}
if(D.gt)line(D.gt,'#2a7ab0');
line(D.est,'#d0543c');
</script></body></html>"""
            )
        return html_path
