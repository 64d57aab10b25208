"""Base RL agent API.

Mirrors the reference's ``BaseRLObject`` surface (rl_baselines/base_classes.py:10-102):
``train/save/load/getAction/getActionProba/customArguments/getOptParam/
parserHyperParam/makeEnv`` — re-shaped for functional on-device training
(agents own a jitted ``train_iteration`` instead of wrapping TF sessions).
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


class BaseRLAgent:
    """Common interface all algorithms implement."""

    name = "base"
    LOG_INTERVAL = 10
    SAVE_INTERVAL = 1

    def __init__(self):
        self.state = None  # algorithm-specific train-state pytree
        self._act_key = None  # deterministic inference key stream

    def _next_act_key(self):
        """Deterministic fallback key for getAction when the caller passes
        none: a per-agent split stream seeded from a fixed constant, so
        replay/enjoy runs are reproducible (the framework's determinism-first
        stance) instead of wall-clock-seeded."""
        if getattr(self, "_act_key", None) is None:
            self._act_key = jax.random.PRNGKey(0)
        self._act_key, key = jax.random.split(self._act_key)
        return key

    # ---- CLI integration (base_classes.py:30-81) -----------------------
    def customArguments(self, parser):
        parser.add_argument(
            "--num-envs",
            help="Number of batched environments (replaces --num-cpu)",
            type=int,
            default=None,
        )
        return parser

    @classmethod
    def getOptParam(cls) -> Optional[Dict[str, tuple]]:
        return None

    @classmethod
    def parserHyperParam(cls, hyperparam):
        """Parse 'k:v' strings against getOptParam declarations
        (base_classes.py:62-81)."""
        opt_param = cls.getOptParam()
        parsed = {}
        if hyperparam:
            assert opt_param is not None, (
                "Error: cannot parse hyperparameters for {}".format(cls.name)
            )
            for kv in hyperparam:
                assert ":" in kv, "Error: hyperparam must be of format 'name:value'"
                k, v = kv.split(":", 1)
                assert k in opt_param, f"Error: unknown hyperparam {k}"
                parsed[k] = opt_param[k][0](v)
        return parsed

    # ---- persistence (base_classes.py:121-170) --------------------------
    def save(self, save_path: str, _locals=None):
        raise NotImplementedError

    @classmethod
    def load(cls, load_path: str, args=None):
        raise NotImplementedError

    # ---- acting ---------------------------------------------------------
    def getAction(self, observation, dones=None, deterministic: bool = True):
        raise NotImplementedError

    def getActionProba(self, observation, dones=None):
        raise NotImplementedError

    # ---- training --------------------------------------------------------
    def train(self, args, callback=None, env_kwargs=None, train_kwargs=None):
        raise NotImplementedError

    def _jit_train_iteration(self):
        """Jitted ``train_iteration``, cached across learn() calls.

        Re-wrapping a bound method with jax.jit on every learn() re-traces
        and re-lowers the whole rollout+update graph (seconds to tens of
        seconds for pixel configurations) even though the backend executable
        cache would hit. The trace closes over ``self._tx`` (whose schedule
        may embed the run horizon), so the cache is keyed on its identity —
        rebuilding the optimizer invalidates it, anything else reuses it."""
        cache = getattr(self, "_jit_cache", None)
        if cache is None:
            cache = self._jit_cache = {}
        # The cache entry holds the optimizer OBJECT alongside the jitted
        # fn and validates it by identity — keying on id() alone is unsound
        # (CPython reuses freed addresses, so a rebuilt optimizer could
        # alias a stale trace with the wrong schedule baked in).
        tx = getattr(self, "_tx", None)
        entry = cache.get("iter")
        if entry is None or entry[0] is not tx:
            entry = (tx, jax.jit(self.train_iteration, donate_argnums=0))
            cache["iter"] = entry
        return entry[1]

    # ---- shared pickle helpers -------------------------------------------
    @staticmethod
    def _to_numpy(tree):
        return jax.tree.map(lambda x: np.asarray(x), tree)

    @staticmethod
    def _save_pickle(path: str, payload: dict):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(payload, f)

    @staticmethod
    def _load_pickle(path: str) -> dict:
        with open(path, "rb") as f:
            return pickle.load(f)

    # ---- crash-resume checkpointing --------------------------------------
    # Beyond-reference capability (SURVEY §5: the reference can only
    # fine-tune from a saved policy, not resume a crashed run): the FULL
    # training-state pytree — params, optimizer state, env batch state,
    # PRNG key, update counter — is written atomically so training can
    # continue exactly where it stopped.
    def save_checkpoint(self, path: str, meta: Optional[dict] = None):
        """Atomically write the complete training state + progress meta."""
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(
                {"state": self._to_numpy(self.state), "meta": meta or {}}, f
            )
        os.replace(tmp, path)

    @staticmethod
    def load_checkpoint(path: str):
        """Returns (training_state_pytree, meta). Assign the state to
        ``agent.state`` / pass it as ``learn(initial_state=...)``."""
        with open(path, "rb") as f:
            d = pickle.load(f)
        return d["state"], d["meta"]
