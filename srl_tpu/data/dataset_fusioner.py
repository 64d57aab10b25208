"""Merge two recorded datasets into one.

CLI parity with ``python -m environments.dataset_fusioner --merge``
(environments/dataset_fusioner.py:23-117): concatenates frames, renumbers
episodes and rewrites image path keys; removes the source folders afterwards
(the reference moves them into the merged tree).
"""
from __future__ import annotations

import argparse
import os
import shutil

import numpy as np

from srl_tpu.srl.episode_saver import load_dataset, save_frames
from srl_tpu.utils.logging import printGreen


def fuse_datasets(src1: str, src2: str, dst: str, remove_sources: bool = True) -> str:
    d1 = load_dataset(src1)
    d2 = load_dataset(src2)
    os.makedirs(dst, exist_ok=False)

    name = os.path.basename(dst.rstrip("/"))
    # Renumber episodes of the second dataset (dataset_fusioner.py:58-90).
    n_ep1 = int(np.asarray(d1["episode_starts"]).sum())

    def renumber(paths, offset):
        out = []
        for p in paths:
            parts = str(p).split("/")
            # "<name>/record_XXX/frameYYYYYY"
            ep = int(parts[-2].split("_")[1]) + offset
            out.append(f"{name}/record_{ep:03d}/{parts[-1]}")
        return np.asarray(out)

    merged = {
        "observations": np.concatenate([d1["observations"], d2["observations"]]),
        "actions": np.concatenate([d1["actions"], d2["actions"]]),
        "rewards": np.concatenate([d1["rewards"], d2["rewards"]]),
        "episode_starts": np.concatenate(
            [d1["episode_starts"], d2["episode_starts"]]
        ),
        "ground_truth_states": np.concatenate(
            [d1["ground_truth_states"], d2["ground_truth_states"]]
        ),
        "target_positions": np.concatenate(
            [d1["target_positions"], d2["target_positions"]]
        ),
        "images_path": np.concatenate(
            [renumber(d1["images_path"], 0), renumber(d2["images_path"], n_ep1)]
        ),
    }

    np.savez(
        os.path.join(dst, "preprocessed_data.npz"),
        rewards=merged["rewards"],
        actions=merged["actions"],
        episode_starts=merged["episode_starts"],
    )
    np.savez(
        os.path.join(dst, "ground_truth.npz"),
        target_positions=merged["target_positions"],
        ground_truth_states=merged["ground_truth_states"],
        images_path=merged["images_path"],
    )
    save_frames(dst, merged["observations"])
    for extra in ("dataset_config.json", "env_globals.json"):
        src_file = os.path.join(src1, extra)
        if os.path.exists(src_file):
            shutil.copy(src_file, os.path.join(dst, extra))

    if remove_sources:
        shutil.rmtree(src1)
        shutil.rmtree(src2)
    printGreen(f"Merged into {dst}: {len(merged['rewards'])} frames")
    return dst


def main(argv=None):
    parser = argparse.ArgumentParser(description="Dataset Fusion")
    parser.add_argument(
        "--merge", nargs=3, metavar=("SRC1", "SRC2", "DST"), required=True
    )
    parser.add_argument("--keep-sources", action="store_true")
    args = parser.parse_args(argv)
    fuse_datasets(*args.merge, remove_sources=not args.keep_sources)


if __name__ == "__main__":
    main()
