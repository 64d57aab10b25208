"""Mixed env-family batches: heterogeneous env kernels feeding ONE learner.

The pod-scale capability bar (BASELINE.json configs[4]) calls for 8192+
mixed Kuka/Omnirobot envs sharded over hosts feeding a single sharded PPO
learner. The reference's vec-env factory only ever builds one env family
per run (rl_baselines/utils.py:194-229, createEnvs); this module is the
mechanism it lacks:

  * ``MixedEnv`` — a static config facade over K env families that share an
    observation space (raw_pixels at a common shape, or equal-dim SRL
    states). It exposes the union action space and the usual env attributes
    so every agent treats it like a single env.
  * ``MixedVecEnv`` — the vectorized form: the global batch is split into
    contiguous per-family slices (family f owns ``counts[f]`` consecutive
    env slots), each stepped by its own ``VecEnv`` (vmap + auto-reset +
    family-specific Pallas renderers), and the transitions are concatenated
    along the env axis into one learner batch. Under a dp mesh, keeping the
    slices contiguous and ``align``-ed to the device count means each
    device holds envs of ONE family — no intra-device divergence, and the
    XLA collectives over the learner batch are family-agnostic.

``VecEnv(mixed_env, n)`` dispatches here automatically, so PPO2 & co. train
on mixed batches with zero per-agent changes.

Action-space union: discrete families of different sizes share
``Discrete(max_n)``. How a smaller family executes an out-of-range shared
action is an explicit choice: pass ``action_tables`` (a static per-family
lookup, e.g. sending the Kuka z-axis actions to a task-specific analogue) or
``oob_action`` ("modulo" maps shared ``i`` to ``i % n_family``, "clip" to
``min(i, n-1)``). There is NO silent default — any static fold skews the
smaller family's action distribution under an exploring policy (modulo
doubles the fold targets' selection probability), so differing action counts
without an explicit choice raise. Box families must match exactly.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from srl_tpu.core.env import Transition, VecEnv
from srl_tpu.core.spaces import Box, Discrete


def default_align(
    num_envs: int, n_families: int, n_devices: Optional[int] = None
) -> int:
    """Family-slice alignment so each dp shard holds envs of ONE family.

    Under a dp mesh the global batch is split into ``n_devices`` contiguous
    shards of ``num_envs // n_devices`` envs; aligning the per-family counts
    to that shard size keeps every device single-family (no intra-device
    divergence between env kernels). Returns 1 (no alignment) when the batch
    isn't evenly shardable or is too small for one shard per family."""
    if n_devices is None:
        n_devices = jax.device_count()
    if n_devices <= 1 or num_envs % n_devices != 0:
        return 1
    shard = num_envs // n_devices
    if shard * n_families > num_envs:
        return 1
    return shard


class MixedEnv:
    """Static facade over K env families with a shared observation space."""

    is_mixed_family = True

    def __init__(
        self,
        families: Sequence,
        fractions: Optional[Sequence[float]] = None,
        action_tables: Optional[Sequence[Optional[Sequence[int]]]] = None,
        oob_action: str = "raise",
    ):
        assert len(families) >= 1
        self.families = list(families)
        k = len(self.families)
        if fractions is None:
            fractions = [1.0 / k] * k
        assert len(fractions) == k and abs(sum(fractions) - 1.0) < 1e-6
        self.fractions = [float(f) for f in fractions]

        # Observation spaces must match exactly — one learner batch.
        obs0 = self.families[0].observation_space
        for fam in self.families[1:]:
            sp = fam.observation_space
            assert sp.shape == obs0.shape and sp.dtype == obs0.dtype, (
                f"mixed families need a shared obs space; got {sp.shape} vs "
                f"{obs0.shape} — use raw_pixels at a common shape or "
                f"equal-dim SRL states"
            )

        # Union action space + per-family static action tables.
        spaces = [fam.action_space for fam in self.families]
        if all(isinstance(s, Discrete) for s in spaces):
            n_shared = max(s.n for s in spaces)
            self._action_space = Discrete(n_shared)
            self._tables: List[Optional[np.ndarray]] = []
            for i, s in enumerate(spaces):
                tab = None
                if action_tables is not None and action_tables[i] is not None:
                    tab = np.asarray(action_tables[i], np.int32)
                    assert tab.shape == (n_shared,) and tab.max() < s.n
                elif s.n < n_shared:
                    if oob_action == "modulo":
                        tab = (np.arange(n_shared) % s.n).astype(np.int32)
                    elif oob_action == "clip":
                        tab = np.minimum(
                            np.arange(n_shared), s.n - 1
                        ).astype(np.int32)
                    else:
                        raise ValueError(
                            f"mixed families have differing discrete action "
                            f"counts ({[sp.n for sp in spaces]}); any static "
                            f"fold of the shared Discrete({n_shared}) onto "
                            f"{type(self.families[i]).__name__}'s {s.n} "
                            f"actions skews its action distribution under "
                            f"an exploring policy — pass action_tables with "
                            f"task-specific semantics, or choose "
                            f"oob_action='modulo'|'clip' explicitly"
                        )
                self._tables.append(tab)
        else:
            assert all(
                isinstance(s, Box) and s.shape == spaces[0].shape
                for s in spaces
            ), "mixed continuous families need identical Box action spaces"
            self._action_space = spaces[0]
            self._tables = [None] * k

    # ---- env-facade surface (what agents read) -----------------------
    @property
    def observation_space(self):
        return self.families[0].observation_space

    @property
    def action_space(self):
        return self._action_space

    @property
    def srl_model(self) -> str:
        return self.families[0].srl_model

    @property
    def max_steps(self) -> int:
        return max(f.max_steps for f in self.families)

    @property
    def is_discrete(self) -> bool:
        return isinstance(self._action_space, Discrete)

    def split_counts(self, num_envs: int, align: int = 1) -> List[int]:
        """Per-family env counts: fractions of ``num_envs`` rounded down to
        multiples of ``align`` (the dp shard size, so each device's slice is
        single-family), remainder folded into the first family."""
        counts = [
            max(align, (int(num_envs * f) // align) * align)
            for f in self.fractions
        ]
        counts[0] += num_envs - sum(counts)
        assert counts[0] >= 1, "num_envs too small for this family split"
        return counts


class MixedVecEnv(VecEnv):
    """Contiguous per-family VecEnv slices concatenated into one batch.

    The vectorized state is a tuple of per-family ``VecEnvState`` pytrees;
    jit/scan/shard_map treat it like any other pytree.
    """

    def __init__(self, env: MixedEnv, num_envs: int,
                 align: Optional[int] = None):
        assert isinstance(env, MixedEnv), (
            "MixedVecEnv requires a MixedEnv facade (a wrapper forwarding "
            "is_mixed_family=True via __getattr__ would skip its own "
            "observe/encode path — wrap the families, not the MixedEnv)"
        )
        super().__init__(env, num_envs)
        if align is None:
            # Auto-align the family slices to the device-shard size so each
            # dp device holds envs of ONE family (the module's design note);
            # callers with a mesh whose dp differs from jax.device_count()
            # (e.g. dp x tp layouts) pass align = num_envs // dp explicitly.
            align = default_align(num_envs, len(env.families))
        self.align = align
        self.counts = env.split_counts(num_envs, align)
        self.vecs = [
            VecEnv(fam, c) for fam, c in zip(env.families, self.counts)
        ]
        self._offsets = np.concatenate([[0], np.cumsum(self.counts)])

    def reset(self, key: jax.Array):
        keys = jax.random.split(key, len(self.vecs))
        states, obs = [], []
        for vec, k in zip(self.vecs, keys):
            vstate, o = vec.reset(k)
            states.append(vstate)
            obs.append(o)
        return tuple(states), jnp.concatenate(obs, axis=0)

    def step(self, vstate, actions: jax.Array):
        new_states, trs = [], []
        for i, vec in enumerate(self.vecs):
            a = actions[self._offsets[i] : self._offsets[i + 1]]
            table = self.env._tables[i]
            if table is not None:
                a = jnp.asarray(table)[a]
            st, tr = vec.step(vstate[i], a)
            new_states.append(st)
            trs.append(tr)
        merged = jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0), *trs
        )
        return tuple(new_states), merged
