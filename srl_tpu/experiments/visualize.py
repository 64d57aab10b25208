"""Learning-curve visualization.

Replaces the reference's visdom live plotting (rl_baselines/visualize.py):
the same monitor-CSV loaders, smoothing/median-filter/downsampling helpers
(visualize.py:12-56,135-143) and the timesteps/episodes plots
(timestepsPlot/episodePlot, :146-215) — rendered to PNG files in the log dir
instead of a visdom server (which needs a live web service the training box
may not have).
"""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from srl_tpu.utils.monitor import load_results


def smooth_moving_average(x: np.ndarray, window: int) -> np.ndarray:
    """Moving average smoothing (visualize.py:30-38 smoothRewardCurve)."""
    if len(x) < window or window <= 1:
        return x
    kernel = np.ones(window) / window
    return np.convolve(x, kernel, mode="valid")


def median_filter(x: np.ndarray, size: int = 5) -> np.ndarray:
    """Median filter (visualize.py fix_point-style outlier smoothing)."""
    if len(x) < size:
        return x
    out = x.copy()
    half = size // 2
    for i in range(half, len(x) - half):
        out[i] = np.median(x[i - half : i + half + 1])
    return out


def downsample(x: np.ndarray, y: np.ndarray, n: int = 500):
    if len(x) <= n:
        return x, y
    idx = np.linspace(0, len(x) - 1, n).astype(int)
    return x[idx], y[idx]


def episodes_with_timesteps(results) -> tuple:
    """(timesteps, rewards) arrays merged over all monitor files, ordered by
    wall time (load_results-equivalent of visualize.py:59-107)."""
    rs, ts, ls = [], [], []
    for res in results:
        rs.append(res["r"])
        ts.append(res["t"])
        ls.append(res["l"])
    if not rs:
        return np.array([]), np.array([])
    r = np.concatenate(rs)
    t = np.concatenate(ts)
    l = np.concatenate(ls)
    order = np.argsort(t)
    r, l = r[order], l[order]
    timesteps = np.cumsum(l)
    return timesteps, r


def plot_log_dir(log_dir: str, title: str = "", episode_window: int = 40,
                 out_name: str = "learning_curve.png") -> Optional[str]:
    """Render the timesteps plot (raw + smoothed) and episode plot."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    results = load_results(log_dir)
    timesteps, rewards = episodes_with_timesteps(results)
    if len(rewards) == 0:
        return None

    fig, axes = plt.subplots(1, 2, figsize=(12, 4.5))
    axes[0].plot(timesteps, rewards, alpha=0.3, label="episode reward")
    if len(rewards) >= episode_window:
        sm = smooth_moving_average(rewards, episode_window)
        axes[0].plot(timesteps[episode_window - 1 :], sm,
                     label=f"smoothed (w={episode_window})")
    axes[0].set_xlabel("timesteps")
    axes[0].set_ylabel("episode reward")
    axes[0].legend()
    axes[0].set_title(title or os.path.basename(log_dir))

    episodes = np.arange(len(rewards))
    axes[1].plot(episodes, rewards, alpha=0.3)
    if len(rewards) >= episode_window:
        axes[1].plot(episodes[episode_window - 1 :],
                     smooth_moving_average(rewards, episode_window))
    axes[1].set_xlabel("episodes")
    axes[1].set_ylabel("episode reward")

    out = os.path.join(log_dir, out_name)
    fig.tight_layout()
    fig.savefig(out, dpi=100)
    plt.close(fig)
    return out
