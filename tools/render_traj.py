"""Offline trajectory renderer — the host-side replacement for the
reference's PyBullet GUI (SURVEY.md §2.2 N8).

Input: the .npz written by `env_viewer.py --dump traj.npz` (world-space
capsule segments per step).  Output: PNG frames (and, with --gif and
pillow available, an animated gif).

    python env_viewer.py --env FeedingJaco-v0 --dump traj.npz
    python tools/render_traj.py traj.npz --out frames/ --every 10
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def render_frame(ax, seg_a, seg_b, radius, title=""):
    ax.clear()
    for a, b, r in zip(seg_a, seg_b, radius):
        if r <= 0:
            continue
        lw = max(0.6, r * 40)
        color = "tab:blue" if np.allclose(a, b) else "tab:gray"
        ax.plot([a[0], b[0]], [a[1], b[1]], [a[2], b[2]],
                lw=lw, solid_capstyle="round", color=color, alpha=0.8)
    ax.set_xlim(-1.2, 1.2)
    ax.set_ylim(-1.2, 1.2)
    ax.set_zlim(0, 1.8)
    ax.set_box_aspect((1, 1, 0.75))
    ax.set_title(title)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("traj")
    p.add_argument("--out", default="frames")
    p.add_argument("--every", type=int, default=10,
                   help="render every Nth control step")
    p.add_argument("--gif", action="store_true")
    args = p.parse_args()

    z = np.load(args.traj, allow_pickle=True)
    seg_a, seg_b, radius = z["seg_a"], z["seg_b"], z["radius"]
    env_id = str(z["env"]) if "env" in z.files else ""
    os.makedirs(args.out, exist_ok=True)

    fig = plt.figure(figsize=(6, 5))
    ax = fig.add_subplot(111, projection="3d")
    paths = []
    for t in range(0, len(seg_a), args.every):
        render_frame(ax, seg_a[t], seg_b[t], radius,
                     title=f"{env_id} t={t} r={float(z['reward'][t]):.2f}")
        path = os.path.join(args.out, f"frame_{t:04d}.png")
        fig.savefig(path, dpi=90)
        paths.append(path)
    print(f"{len(paths)} frames -> {args.out}/")

    if args.gif:
        try:
            from PIL import Image
            imgs = [Image.open(p) for p in paths]
            gif = os.path.join(args.out, "traj.gif")
            imgs[0].save(gif, save_all=True, append_images=imgs[1:],
                         duration=120, loop=0)
            print(f"gif -> {gif}")
        except ImportError:
            print("pillow not available; skipped gif")


if __name__ == "__main__":
    main()
