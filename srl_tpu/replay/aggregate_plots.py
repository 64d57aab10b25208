"""Aggregate learning curves across seeds (``python -m replay.aggregate_plots``).

For each SRL-method folder under ``logs/{env}/``, loads every run's monitor
CSVs, interpolates episode rewards onto a common timestep grid, and saves the
mean ± standard-error curve to an .npz + matplotlib figure
(replay/aggregate_plots.py in the reference).
"""
from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from srl_tpu.experiments.visualize import episodes_with_timesteps, smooth_moving_average
from srl_tpu.utils.logging import printGreen, printYellow
from srl_tpu.utils.monitor import load_results


def curve_for_run(run_dir: str, window: int = 40):
    timesteps, rewards = episodes_with_timesteps(load_results(run_dir))
    if len(rewards) == 0:
        return None
    if len(rewards) >= window:
        rewards = smooth_moving_average(rewards, window)
        timesteps = timesteps[window - 1 :]
    return timesteps, rewards


def aggregate_method(method_dir: str, algo: str = None, window: int = 40,
                     grid_points: int = 200):
    """mean ± stderr over runs of one env/srl-method (any algo subdir)."""
    pattern = os.path.join(method_dir, algo or "*", "*")
    run_dirs = [d for d in glob.glob(pattern) if os.path.isdir(d)]
    curves = [c for c in (curve_for_run(d, window) for d in run_dirs) if c]
    if not curves:
        return None
    t_max = min(c[0][-1] for c in curves)
    grid = np.linspace(0, t_max, grid_points)
    interp = np.stack([np.interp(grid, t, r) for t, r in curves])
    mean = interp.mean(axis=0)
    stderr = interp.std(axis=0) / np.sqrt(len(curves))
    return {"timesteps": grid, "mean": mean, "stderr": stderr,
            "n_runs": len(curves)}


def main(argv=None):
    parser = argparse.ArgumentParser(description="Aggregate curves over seeds")
    parser.add_argument("--log-dir", type=str, required=True,
                        help="logs/{env}/ directory")
    parser.add_argument("--algo", type=str, default=None)
    parser.add_argument("--episode-window", type=int, default=40)
    parser.add_argument("--output", type=str, default=None)
    args = parser.parse_args(argv)

    out_dir = args.output or args.log_dir
    os.makedirs(out_dir, exist_ok=True)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5))
    found = False
    for method_dir in sorted(glob.glob(os.path.join(args.log_dir, "*"))):
        if not os.path.isdir(method_dir):
            continue
        method = os.path.basename(method_dir)
        agg = aggregate_method(method_dir, args.algo, args.episode_window)
        if agg is None:
            printYellow(f"No complete runs for {method}")
            continue
        found = True
        np.savez(os.path.join(out_dir, f"{method}.npz"), **agg)
        ax.plot(agg["timesteps"], agg["mean"], label=f"{method} (n={agg['n_runs']})")
        ax.fill_between(agg["timesteps"], agg["mean"] - agg["stderr"],
                        agg["mean"] + agg["stderr"], alpha=0.25)
    if found:
        ax.set_xlabel("timesteps")
        ax.set_ylabel("mean episode reward")
        ax.legend()
        out = os.path.join(out_dir, "aggregated_curves.png")
        fig.savefig(out, dpi=100)
        printGreen(f"Saved {out}")
    plt.close(fig)


if __name__ == "__main__":
    main()
