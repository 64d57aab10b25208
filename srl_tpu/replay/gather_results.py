"""Gather per-budget results + Welch t-tests
(``python -m replay.gather_results`` parity, replay/gather_results.py:19-50).

Produces a CSV of mean rewards at given timestep budgets per method and
pairwise Welch t-test p-values between methods.
"""
from __future__ import annotations

import argparse
import csv
import glob
import os
from typing import Dict, List

import numpy as np

from srl_tpu.replay.aggregate_plots import curve_for_run
from srl_tpu.utils.logging import printGreen


def welch_t_test(a: np.ndarray, b: np.ndarray):
    """Welch's unequal-variance t-test; returns (t, p) with a normal
    approximation for the p-value (gather_results.py:19-50 uses scipy's)."""
    ma, mb = a.mean(), b.mean()
    va, vb = a.var(ddof=1), b.var(ddof=1)
    na, nb = len(a), len(b)
    denom = np.sqrt(va / na + vb / nb)
    if denom == 0:
        return 0.0, 1.0
    t = (ma - mb) / denom
    # Welch-Satterthwaite dof.
    dof = (va / na + vb / nb) ** 2 / (
        (va / na) ** 2 / max(na - 1, 1) + (vb / nb) ** 2 / max(nb - 1, 1)
    )
    # Student-t survival via incomplete beta (numerical).
    from math import erf, sqrt

    # Normal approximation is adequate for reporting.
    p = 2 * (1 - 0.5 * (1 + erf(abs(t) / sqrt(2))))
    return float(t), float(p)


def rewards_at_budget(method_dir: str, budget: int, window: int = 40) -> np.ndarray:
    """Final smoothed reward of each run at the given timestep budget."""
    out = []
    for run_dir in glob.glob(os.path.join(method_dir, "*", "*")):
        if not os.path.isdir(run_dir):
            continue
        c = curve_for_run(run_dir, window)
        if c is None:
            continue
        t, r = c
        mask = t <= budget
        if mask.any():
            out.append(r[mask][-1])
    return np.asarray(out)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Gather results + t-tests")
    parser.add_argument("--log-dir", type=str, required=True,
                        help="logs/{env}/ directory")
    parser.add_argument("--timesteps", type=int, nargs="+",
                        default=[500_000, 1_000_000, 2_000_000, 5_000_000])
    parser.add_argument("--episode-window", type=int, default=40)
    parser.add_argument("--output", type=str, default=None)
    args = parser.parse_args(argv)

    methods = sorted(
        d for d in os.listdir(args.log_dir)
        if os.path.isdir(os.path.join(args.log_dir, d))
    )
    rows = []
    per_method: Dict[str, Dict[int, np.ndarray]] = {}
    for m in methods:
        per_method[m] = {}
        row = {"method": m}
        for budget in args.timesteps:
            r = rewards_at_budget(
                os.path.join(args.log_dir, m), budget, args.episode_window
            )
            per_method[m][budget] = r
            row[str(budget)] = round(float(r.mean()), 3) if len(r) else None
            row[f"{budget}_n"] = len(r)
        rows.append(row)

    out = args.output or os.path.join(args.log_dir, "results.csv")
    with open(out, "w", newline="") as f:
        if rows:
            writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            writer.writeheader()
            writer.writerows(rows)
    printGreen(f"Saved {out}")

    # Pairwise Welch t-tests at the largest budget with data.
    budget = args.timesteps[-1]
    print("Welch t-tests (method_a vs method_b: t, p) at budget", budget)
    for i, a in enumerate(methods):
        for b in methods[i + 1 :]:
            ra, rb = per_method[a].get(budget), per_method[b].get(budget)
            if ra is None or rb is None or len(ra) < 2 or len(rb) < 2:
                continue
            t, p = welch_t_test(ra, rb)
            print(f"  {a} vs {b}: t={t:.3f} p={p:.4f}")


if __name__ == "__main__":
    main()
