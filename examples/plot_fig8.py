"""Plot a figure-8 tracking run — the reference's visual-verification scripts
(test/WAFR_fig8.py, test/ICRA_Abstract_Fig8.py: 3-D matplotlib plots of logged
eePos vs goal, with the run's timing/error stats archived alongside).

Input is the .npz log written by the closed-loop benchmark:

    python benchmarks/fig8.py --device-loop --save-log /tmp/fig8.npz
    python examples/plot_fig8.py /tmp/fig8.npz -o fig8.png

Produces a two-panel figure: the 3-D end-effector path vs the commanded
figure-8, and the tracking error over time with the run's average / max
annotated (the numbers test/WAFR_fig8.py:5-7 archives in comments).
"""

import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log", help=".npz from benchmarks/fig8.py --save-log")
    ap.add_argument("-o", "--out", default="fig8.png")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    d = np.load(args.log)
    t, ee, goal, err = d["t"], d["ee_xyz"], d["goal_xyz"], d["ee_err"]

    fig = plt.figure(figsize=(11, 5))
    ax3 = fig.add_subplot(1, 2, 1, projection="3d")
    ax3.plot(*goal.T, "--", color="0.45", lw=1.2, label="goal")
    ax3.plot(*ee.T, color="tab:blue", lw=1.4, label="end effector")
    ax3.set_xlabel("x (m)"), ax3.set_ylabel("y (m)"), ax3.set_zlabel("z (m)")
    ax3.set_title("figure-8 EE path")
    ax3.legend(loc="upper left")

    ax = fig.add_subplot(1, 2, 2)
    ax.plot(t, err, color="tab:blue", lw=1.0)
    avg, mx = float(err.mean()), float(err.max())
    ax.axhline(avg, color="0.45", ls="--", lw=1.0)
    ax.axhline(0.0878, color="tab:red", ls=":", lw=1.0)
    ax.annotate(f"avg {avg:.4f} m", (t[0], avg), textcoords="offset points",
                xytext=(4, 4), fontsize=9)
    ax.annotate("reference GPU avg 0.0878 m (WAFR_fig8.py:5)", (t[0], 0.0878),
                textcoords="offset points", xytext=(4, 4), fontsize=8,
                color="tab:red")
    ax.set_xlabel("t (s)"), ax.set_ylabel("EE tracking error (m)")
    ax.set_title(
        f"avg {avg:.4f} m / max {mx:.4f} m / "
        f"{float(d['per_control_step_ms']):.2f} ms per control step"
    )
    ax.set_ylim(bottom=0.0)

    fig.tight_layout()
    fig.savefig(args.out, dpi=130)
    print(f"wrote {args.out} (avg {avg:.4f} m, max {mx:.4f} m, "
          f"ok rate {float(d['ok'].mean()):.3f})")


if __name__ == "__main__":
    sys.exit(main())
