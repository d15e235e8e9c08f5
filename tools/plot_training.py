"""Plot training curves from a train.py metrics.jsonl.

    python tools/plot_training.py runs/scratch_itch2/metrics.jsonl --out curve.png

One small-multiple per metric (never dual axes); single series per panel.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

LINE = "#3d6fb3"        # one mid-lightness hue; single series, no legend needed
INK = "#333333"
GRID = "#e4e4e4"


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("metrics")
    p.add_argument("--out", default="training_curve.png")
    p.add_argument("--keys", default="mean_return,success_rate")
    args = p.parse_args()

    rows = [json.loads(l) for l in open(args.metrics)]
    keys = [k for k in args.keys.split(",") if k in rows[0]]
    steps = [r["step"] for r in rows]

    fig, axes = plt.subplots(1, len(keys), figsize=(5.2 * len(keys), 3.4))
    if len(keys) == 1:
        axes = [axes]
    for ax, k in zip(axes, keys):
        ys = [r[k] for r in rows]
        ax.plot(steps, ys, lw=2, color=LINE, solid_capstyle="round")
        ax.set_title(k.replace("_", " "), color=INK, fontsize=11)
        ax.set_xlabel("update", color=INK, fontsize=9)
        ax.grid(True, color=GRID, lw=0.6)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        ax.tick_params(colors=INK, labelsize=8)
        # direct label on the final value
        ax.annotate(f"{ys[-1]:.2f}", (steps[-1], ys[-1]),
                    textcoords="offset points", xytext=(4, 4),
                    fontsize=9, color=INK)
    env = os.path.basename(os.path.dirname(os.path.abspath(args.metrics)))
    fig.suptitle(f"PPO on {env} — {len(rows)} updates x "
                 f"{int(rows[-1].get('env_steps_per_s', 0)):,} env-steps/s",
                 color=INK, fontsize=11)
    fig.tight_layout()
    fig.savefig(args.out, dpi=110)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
