"""Compare aggregated curves from saved .npz files
(``python -m replay.compare_plots`` parity)."""
from __future__ import annotations

import argparse
import os

import numpy as np

from srl_tpu.utils.logging import printGreen


def main(argv=None):
    parser = argparse.ArgumentParser(description="Compare aggregated curves")
    parser.add_argument("-i", "--input-dir", type=str, required=True,
                        help="Directory containing method .npz files")
    parser.add_argument("--methods", type=str, nargs="+", default=None)
    parser.add_argument("--title", type=str, default="")
    parser.add_argument("-o", "--output", type=str, default=None)
    args = parser.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import glob

    files = sorted(glob.glob(os.path.join(args.input_dir, "*.npz")))
    if args.methods:
        files = [f for f in files
                 if os.path.splitext(os.path.basename(f))[0] in args.methods]
    assert files, "no .npz curve files found"

    fig, ax = plt.subplots(figsize=(8, 5))
    for f in files:
        d = np.load(f)
        name = os.path.splitext(os.path.basename(f))[0]
        ax.plot(d["timesteps"], d["mean"], label=name)
        ax.fill_between(d["timesteps"], d["mean"] - d["stderr"],
                        d["mean"] + d["stderr"], alpha=0.25)
    ax.set_xlabel("timesteps")
    ax.set_ylabel("mean episode reward")
    ax.set_title(args.title)
    ax.legend()
    out = args.output or os.path.join(args.input_dir, "comparison.png")
    fig.savefig(out, dpi=100)
    plt.close(fig)
    printGreen(f"Saved {out}")


if __name__ == "__main__":
    main()
