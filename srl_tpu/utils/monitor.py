"""Episode-monitor CSV logging (stable-baselines ``bench.Monitor`` format).

The reference wraps every env in ``bench.Monitor`` (environments/utils.py:54)
producing ``<rank>.monitor.csv`` files with a JSON header line and
``r,l,t`` rows; its visualization/aggregation stack consumes exactly that
format (rl_baselines/visualize.py, replay/*). We keep the format bit-for-bit
so those tools interoperate, but write from the vectorized training loop
(episode stats come out of the jitted rollout as masked arrays).
"""
from __future__ import annotations

import csv
import glob
import json
import os
import time
from typing import Dict, List, Optional

import numpy as np


class MonitorWriter:
    EXT = "monitor.csv"

    def __init__(self, path: str, env_id: str = "", rank: int = 0,
                 append: bool = False):
        os.makedirs(path, exist_ok=True)
        self.t_start = time.time()
        self.file_path = os.path.join(path, f"{rank}.{self.EXT}")
        resuming = append and os.path.exists(self.file_path)
        self._f = open(self.file_path, "a" if resuming else "w", newline="")
        self._writer = csv.DictWriter(self._f, fieldnames=("r", "l", "t"))
        if not resuming:
            self._f.write(
                "#%s\n" % json.dumps({"t_start": self.t_start, "env_id": env_id})
            )
            self._writer.writeheader()
        self._f.flush()

    def write_episode(self, reward: float, length: int, t: Optional[float] = None):
        if t is None:
            t = time.time() - self.t_start
        self._writer.writerow(
            {"r": round(float(reward), 6), "l": int(length), "t": round(t, 6)}
        )
        self._f.flush()

    def flush(self):
        self._f.flush()

    def close(self):
        self._f.close()


def load_csv(file_path: str) -> Dict[str, np.ndarray]:
    """Load one monitor CSV -> dict of r/l/t arrays, plus the header."""
    with open(file_path) as f:
        first = f.readline()
        header = json.loads(first[1:]) if first.startswith("#") else {}
        reader = csv.DictReader(f)
        rows = list(reader)
    out = {
        "r": np.array([float(row["r"]) for row in rows], np.float64),
        "l": np.array([int(row["l"]) for row in rows], np.int64),
        "t": np.array([float(row["t"]) for row in rows], np.float64),
    }
    out["header"] = header
    return out


def load_results(log_dir: str) -> List[Dict[str, np.ndarray]]:
    """All monitor files under a log dir (sorted by rank)."""
    files = sorted(glob.glob(os.path.join(log_dir, f"*.{MonitorWriter.EXT}")))
    return [load_csv(f) for f in files]


def compute_mean_reward(log_dir: str, last_n_episodes: int) -> tuple:
    """(ok, mean reward over the last N episodes) across all monitor files
    (rl_baselines/utils.py:28-44 computeMeanReward)."""
    results = load_results(log_dir)
    if not results:
        return False, 0.0
    rewards = np.concatenate([r["r"] for r in results]) if results else np.array([])
    if len(rewards) == 0:
        return False, 0.0
    return True, float(np.mean(rewards[-last_n_episodes:]))
