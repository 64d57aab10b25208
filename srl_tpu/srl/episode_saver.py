"""Episode recording for SRL training datasets.

Host-side recorder with the reference ``EpisodeSaver`` API
(state_representation/episode_saver.py:13-162): ``reset``/``step``/``save``
accumulate transitions and write the same npz layout —
``preprocessed_data.npz`` (rewards/actions/episode_starts) and
``ground_truth.npz`` (target_positions/ground_truth_states/images_path) plus
``dataset_config.json``/``env_globals.json`` snapshots. Frames are stored as
one ``frames.npz`` uint8 stack instead of per-step JPEGs (no filesystem
round-trip on the training path; ``images_path`` keys are kept for layout
parity).
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np


class EpisodeSaver:
    def __init__(
        self,
        name: str,
        max_dist: float = 0.0,
        state_dim: int = -1,
        globals_: Optional[dict] = None,
        learn_every: int = 3,
        learn_states: bool = False,
        path: str = "data/",
        relative_pos: bool = False,
    ):
        self.name = name
        self.data_folder = os.path.join(path, name)
        os.makedirs(self.data_folder, exist_ok=True)

        self.actions: List = []
        self.rewards: List[float] = []
        self.images: List[np.ndarray] = []
        self.images_path: List[str] = []
        self.episode_starts: List[bool] = []
        self.ground_truth_states: List[np.ndarray] = []
        self.target_positions: List[np.ndarray] = []
        self.episode_step = 0
        self.episode_idx = -1
        self.episode_success = False

        if globals_ is not None:
            # env_globals.json snapshot (episode_saver.py:56-63).
            serializable = {
                k: v
                for k, v in globals_.items()
                if isinstance(v, (int, float, str, bool, list))
            }
            with open(os.path.join(self.data_folder, "env_globals.json"), "w") as f:
                json.dump(serializable, f, indent=2)
        with open(os.path.join(self.data_folder, "dataset_config.json"), "w") as f:
            json.dump(
                {
                    "max_dist": max_dist,
                    "state_dim": state_dim,
                    "relative_pos": relative_pos,
                },
                f,
                indent=2,
            )

    def reset(self, observation, target_pos, ground_truth):
        self.episode_idx += 1
        self.episode_step = 0
        self.episode_success = False
        self.episode_starts.append(True)
        self.images.append(np.asarray(observation, np.uint8))
        self.images_path.append(
            f"{self.name}/record_{self.episode_idx:03d}/frame{self.episode_step:06d}"
        )
        self.ground_truth_states.append(np.asarray(ground_truth, np.float32))
        self.target_positions.append(np.asarray(target_pos, np.float32))
        # Placeholder action/reward for the reset frame; materialized as
        # zeros of the action dtype at save time.
        self.actions.append(None)
        self.rewards.append(0.0)

    def step(self, observation, action, reward, done, ground_truth_state):
        self._last_action = action
        self.episode_step += 1
        self.episode_starts.append(False)
        self.rewards.append(float(reward))
        self.actions.append(action)
        if float(reward) > 0:
            self.episode_success = True
        self.images.append(np.asarray(observation, np.uint8))
        self.images_path.append(
            f"{self.name}/record_{self.episode_idx:03d}/frame{self.episode_step:06d}"
        )
        self.ground_truth_states.append(np.asarray(ground_truth_state, np.float32))

    @property
    def n_episodes(self) -> int:
        return self.episode_idx + 1

    def save(self):
        """Write the dataset npz files (episode_saver.py:114-162 layout)."""
        assert len(self.actions) == len(self.rewards) == len(self.images)
        proto = next((a for a in self.actions if a is not None), 0)
        zero = np.zeros_like(np.asarray(proto))
        actions = np.asarray(
            [zero if a is None else np.asarray(a) for a in self.actions]
        )
        data = {
            "rewards": np.asarray(self.rewards, np.float32),
            "actions": actions,
            "episode_starts": np.asarray(self.episode_starts, bool),
        }
        ground_truth = {
            "target_positions": np.asarray(self.target_positions, np.float32),
            "ground_truth_states": np.asarray(self.ground_truth_states, np.float32),
            "images_path": np.asarray(self.images_path),
        }
        np.savez(os.path.join(self.data_folder, "preprocessed_data.npz"), **data)
        np.savez(os.path.join(self.data_folder, "ground_truth.npz"), **ground_truth)
        frames = np.stack(self.images) if self.images else np.zeros((0, 1), np.uint8)
        self._save_frames(frames)
        return self.data_folder

    def _save_frames(self, frames: np.ndarray):
        save_frames(self.data_folder, frames)


def save_frames(data_folder: str, frames: np.ndarray):
    """Frames go through the native async framestore when available
    (srl_tpu/native/framestore.cpp) — raw chunked file + mmap reads — with
    np.savez_compressed as the pure-Python fallback."""
    try:
        from srl_tpu.native import FrameStoreWriter, available

        if available() and frames.ndim >= 2 and frames.dtype == np.uint8:
            with FrameStoreWriter(
                os.path.join(data_folder, "frames.srlf"),
                frames.shape[1:], frames.dtype,
            ) as w:
                w.push(frames)
            return
    except Exception:
        pass
    np.savez_compressed(os.path.join(data_folder, "frames.npz"), frames=frames)


def load_frames(data_folder: str) -> np.ndarray:
    srlf = os.path.join(data_folder, "frames.srlf")
    if os.path.exists(srlf):
        from srl_tpu.native import FrameStoreReader

        with FrameStoreReader(srlf) as r:
            return np.array(r.frames)
    return np.load(os.path.join(data_folder, "frames.npz"))["frames"]


def load_dataset(data_folder: str) -> Dict[str, np.ndarray]:
    """Load a recorded dataset into the trainer's dict format."""
    pre = np.load(os.path.join(data_folder, "preprocessed_data.npz"))
    gt = np.load(os.path.join(data_folder, "ground_truth.npz"))
    frames = load_frames(data_folder)
    return {
        "observations": frames,
        "actions": pre["actions"],
        "rewards": pre["rewards"],
        "episode_starts": pre["episode_starts"],
        "ground_truth_states": gt["ground_truth_states"],
        "target_positions": gt["target_positions"],
        "images_path": gt["images_path"],
    }


class LogRLStates:
    """Log (state, normalized state, action, reward) during RL training —
    SRL-model debugging aid with the reference's file layout
    (state_representation/episode_saver.py:165-234): ``full_log.npz``,
    ``states_rewards.npz``, ``normalized_states_rewards.npz`` under
    ``{log_folder}/log_srl/``.

    Works with batched (vmapped) rollouts: every call may pass ``[N, d]``
    arrays; rows are stacked along the leading time axis. ``step`` saves to
    disk whenever the episode ends (``done`` truthy, or all envs done for a
    batch), matching the per-episode flush of the reference.
    """

    def __init__(self, log_folder: str):
        self.log_folder = os.path.join(log_folder, "log_srl")
        os.makedirs(self.log_folder, exist_ok=True)
        self.actions: List = []
        self.rewards: List = []
        self.states: List = []
        self.normalized_states: List = []

    def reset(self, normalized_state, state):
        self.normalized_states.append(np.asarray(normalized_state))
        self.states.append(np.squeeze(np.asarray(state)))

    def step(self, normalized_state, state, action, reward, done):
        self.rewards.append(np.asarray(reward))
        self.actions.append(np.asarray(action))
        done = np.asarray(done)
        if done.all():
            self.save()
        else:
            self.normalized_states.append(np.asarray(normalized_state))
            self.states.append(np.squeeze(np.asarray(state)))

    def save(self):
        assert len(self.actions) == len(self.rewards)
        assert len(self.actions) == len(self.normalized_states)
        assert len(self.actions) == len(self.states)
        data = {
            "rewards": np.array(self.rewards),
            "actions": np.array(self.actions),
            "states": np.array(self.states),
            "normalized_states": np.array(self.normalized_states),
        }
        np.savez(os.path.join(self.log_folder, "full_log.npz"), **data)
        np.savez(
            os.path.join(self.log_folder, "states_rewards.npz"),
            states=data["states"], rewards=data["rewards"],
        )
        np.savez(
            os.path.join(self.log_folder, "normalized_states_rewards.npz"),
            states=data["normalized_states"], rewards=data["rewards"],
        )
