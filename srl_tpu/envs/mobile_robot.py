"""MobileRobot environment family as batched pure-JAX kernels.

TPU-native re-design of the reference's PyBullet-hosted mobile-robot envs
(environments/mobile_robot/*.py). The reference's dynamics are already pure
numpy — position integration plus a bounding-box margin check with rollback
(mobile_robot_env.py:235-267) — PyBullet is only used for rendering; here the
dynamics are jit/vmap-compiled and thousands of instances step in lockstep.

Variant map (reference file -> parameterization):
  * MobileRobotGymEnv            (mobile_robot_env.py)          -> dim=2
  * MobileRobot1DGymEnv          (mobile_robot_1D_env.py)       -> dim=1
  * MobileRobot2TargetGymEnv     (mobile_robot_2target_env.py)  -> n_targets=2
  * MobileRobotLineTargetGymEnv  (mobile_robot_line_target_env.py) -> line_target=True

Semantics preserved (same constants, same formulas, float32):
  * DELTA_POS=0.1 per step, 4/2 discrete actions or clipped continuous
    (mobile_robot_env.py:235-250);
  * collision margin 0.1 + robot_half_extent, full rollback on bump
    (:257-263, x-axis uses ROBOT_LENGTH=0.65, y-axis ROBOT_WIDTH=0.2);
  * reward +1 within 0.4 of target (0.1 band for line target), -1 on bump,
    shaped variant -distance (:345-363);
  * episode ends when step_count > max_steps (250; 1500 for 2-target)
    (:336-343, mobile_robot_2target_env.py:3);
  * reset samples robot uniformly in the central third and, with
    random_target, targets with 0.1*max_x margin (:167-178).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from srl_tpu.core.env import TpuEnv
from srl_tpu.core.spaces import Box, Discrete, Space

# Constants mirrored from mobile_robot_env.py:12-28.
MAX_STEPS = 250
MAX_STEPS_2TARGET = 1500  # mobile_robot_2target_env.py:3
REWARD_DIST_THRESHOLD = 0.4
REWARD_DIST_THRESHOLD_LINE = 0.1  # mobile_robot_line_target_env.py:3
ROBOT_OFFSET = 0.2  # mobile_robot_line_target_env.py:4
N_DISCRETE_ACTIONS = 4
DELTA_POS = 0.1
NOISE_STD = 0.0
ROBOT_WIDTH = 0.2
ROBOT_LENGTH = 0.325 * 2
COLLISION_MARGIN = 0.1
MIN_X, MAX_X = 0.0, 4.0
MIN_Y, MAX_Y = 0.0, 4.0
RENDER_WIDTH = 224
RENDER_HEIGHT = 224


@struct.dataclass
class MobileRobotState:
    key: jax.Array
    robot_pos: jax.Array  # [2] float32 (y fixed at 0 for the 1D variant)
    targets: jax.Array  # [n_targets, 2] float32
    current_target: jax.Array  # int32
    step_count: jax.Array  # int32
    terminated: jax.Array  # bool
    has_bumped: jax.Array  # bool


class MobileRobotEnv(TpuEnv):
    """Racecar base on a 4x4 m plane reaching a cylinder target."""

    name = "MobileRobotGymEnv-v0"

    def __init__(
        self,
        dim: int = 2,
        n_targets: int = 1,
        line_target: bool = False,
        is_discrete: bool = True,
        random_target: bool = False,
        shape_reward: bool = False,
        noise_std: float = NOISE_STD,
        srl_model: str = "ground_truth",
        max_steps: int = None,
        fpv: bool = False,
        state_dim: int = -1,
        render_shape: Tuple[int, int] = (RENDER_HEIGHT, RENDER_WIDTH),
    ):
        assert dim in (1, 2)
        if dim == 1 or n_targets > 1:
            assert is_discrete, "Only discrete actions supported for this variant"
        self.dim = dim
        self.n_targets = n_targets
        self.line_target = line_target
        self.is_discrete = is_discrete
        self.random_target = random_target
        self.shape_reward = shape_reward
        self.noise_std = float(noise_std)
        self.srl_model = srl_model
        self.relative_pos = True  # RELATIVE_POS, mobile_robot_env.py:21
        self.fpv = fpv
        self.state_dim = state_dim
        # (H, W) of rendered observations. 224x224 matches the reference
        # (mobile_robot_env.py:24-25); smaller shapes trade fidelity for
        # throughput (tests, low-res+upsample render paths).
        self.render_shape = tuple(render_shape)
        if max_steps is None:
            max_steps = MAX_STEPS_2TARGET if n_targets > 1 else MAX_STEPS
        self.max_steps = max_steps
        # Per-axis rollback margins (mobile_robot_env.py:257-258).
        self._margins = np.array(
            [
                COLLISION_MARGIN + ROBOT_LENGTH / 2,
                COLLISION_MARGIN + ROBOT_WIDTH / 2,
            ],
            dtype=np.float32,
        )
        self._reward_threshold = (
            REWARD_DIST_THRESHOLD_LINE if line_target else REWARD_DIST_THRESHOLD
        )

    # ------------------------------------------------------------------
    @property
    def action_space(self) -> Space:
        if self.is_discrete:
            return Discrete(2 if self.dim == 1 else N_DISCRETE_ACTIONS)
        return Box(-1.0, 1.0, (2,))

    @property
    def observation_space(self) -> Space:
        if self.srl_model == "raw_pixels":
            channels = 6 if self.fpv else 3
            return Box(0, 255, self.render_shape + (channels,), np.uint8)
        return Box(-np.inf, np.inf, (self.ground_truth_dim_(),))

    def ground_truth_dim_(self) -> int:
        # line-target keeps dim 2 (inherits getGroundTruthDim,
        # mobile_robot_env.py:151-153); 1D variant is 1.
        return self.dim

    # ------------------------------------------------------------------
    def reset(self, key: jax.Array) -> MobileRobotState:
        key, k_robot, k_targets = jax.random.split(key, 3)
        # Robot starts uniformly in the central third (mobile_robot_env.py:168-170).
        start = MAX_X / 2 + jax.random.uniform(
            k_robot, (2,), minval=-MAX_X / 3, maxval=MAX_X / 3, dtype=jnp.float32
        )
        robot_pos = jnp.where(jnp.arange(2) < self.dim, start, 0.0)

        # Targets: fixed default positions or uniform with margin
        # (mobile_robot_env.py:173-178; second target at 0.1*max_x,
        # mobile_robot_2target_env.py:53-69).
        defaults = np.array(
            [[0.9 * MAX_X, MAX_Y * 3 / 4], [0.1 * MAX_X, MAX_Y * 3 / 4]],
            dtype=np.float32,
        )[: self.n_targets]
        if self.line_target:
            # wall-band target spans y; stored y is max_x per the reference
            # (mobile_robot_line_target_env.py:56-64) but unused for reward.
            defaults = np.array([[0.9 * MAX_X, MAX_X]], dtype=np.float32)
        if self.random_target:
            margin = 0.1 * MAX_X
            rnd = jax.random.uniform(
                k_targets,
                (self.n_targets, 2),
                minval=MIN_X + margin,
                maxval=MAX_X - margin,
                dtype=jnp.float32,
            )
            if self.dim == 1:
                targets = jnp.stack([rnd[:, 0], jnp.zeros(self.n_targets)], axis=-1)
            elif self.line_target:
                targets = jnp.stack(
                    [rnd[:, 0], jnp.full((self.n_targets,), MAX_X)], axis=-1
                )
            else:
                targets = rnd
        else:
            targets = jnp.asarray(defaults)
            if self.dim == 1:
                targets = targets.at[:, 1].set(0.0)

        return MobileRobotState(
            key=key,
            robot_pos=robot_pos.astype(jnp.float32),
            targets=targets.astype(jnp.float32),
            current_target=jnp.int32(0),
            step_count=jnp.int32(0),
            terminated=jnp.bool_(False),
            has_bumped=jnp.bool_(False),
        )

    # ------------------------------------------------------------------
    def step(
        self, state: MobileRobotState, action: jax.Array
    ) -> Tuple[MobileRobotState, jax.Array, jax.Array]:
        key, k_noise = jax.random.split(state.key)
        noise = jax.random.normal(k_noise, (), dtype=jnp.float32) * self.noise_std
        dv = DELTA_POS + noise

        if self.is_discrete:
            if self.dim == 1:
                # mobile_robot_1D_env.py:112-115
                dxs = jnp.stack([-dv, dv, jnp.zeros_like(dv), jnp.zeros_like(dv)])
                delta = jnp.stack([dxs[action], jnp.zeros_like(dv)])
            else:
                # mobile_robot_env.py:239-244
                dxs = jnp.stack([-dv, dv, jnp.zeros_like(dv), jnp.zeros_like(dv)])
                dys = jnp.stack([jnp.zeros_like(dv), jnp.zeros_like(dv), -dv, dv])
                delta = jnp.stack([dxs[action], dys[action]])
        else:
            # mobile_robot_env.py:246-250
            act = jnp.clip(jnp.asarray(action, jnp.float32), -1.0, 1.0)
            delta = act * dv

        prev = state.robot_pos
        new = prev + delta

        # Per-axis wall margins with full rollback on any bump
        # (mobile_robot_env.py:256-263). The reference breaks after the first
        # bumping axis but always rolls back the full position, so OR over
        # axes is equivalent.
        margins = jnp.asarray(self._margins)
        limits = jnp.array([MAX_X, MAX_Y], dtype=jnp.float32)
        axis_active = jnp.arange(2) < self.dim
        bumped_axes = ((new < margins) | (new > limits - margins)) & axis_active
        has_bumped = jnp.any(bumped_axes)
        robot_pos = jnp.where(has_bumped, prev, new)

        step_count = state.step_count + 1

        # Reward (mobile_robot_env.py:345-363 and variant overrides).
        target = self._current_target_pos(state)
        if self.line_target:
            # |getTargetPos()[0] - x| with the ROBOT_OFFSET-shifted target
            # (mobile_robot_line_target_env.py:35-40,108-117).
            distance = jnp.abs((target[0] - ROBOT_OFFSET) - robot_pos[0])
        elif self.dim == 1:
            distance = jnp.abs(target[0] - robot_pos[0])
        else:
            distance = jnp.linalg.norm(target - robot_pos)
        reached = distance <= self._reward_threshold
        reward = jnp.where(reached, 1.0, 0.0)
        # Target progression (mobile_robot_2target_env.py:170-173).
        current_target = state.current_target
        if self.n_targets > 1:
            current_target = jnp.where(
                reached & (current_target < self.n_targets - 1),
                current_target + 1,
                current_target,
            )
        reward = jnp.where(has_bumped, -1.0, reward)
        if self.shape_reward:
            reward = -distance

        done = state.terminated | (step_count > self.max_steps)

        new_state = state.replace(
            key=key,
            robot_pos=robot_pos,
            current_target=current_target,
            step_count=step_count,
            has_bumped=has_bumped,
        )
        return new_state, reward.astype(jnp.float32), done

    # ------------------------------------------------------------------
    def _current_target_pos(self, state: MobileRobotState) -> jax.Array:
        """Full [x, y] of the active target."""
        if self.n_targets == 1:
            return state.targets[0]
        return state.targets[state.current_target]

    def target_pos(self, state: MobileRobotState) -> jax.Array:
        """Reward-relevant target coordinates, matching getTargetPos shapes:
        [x, y] (2D, mobile_robot_env.py:147-149), [x] (1D, :45-47), or
        [x - ROBOT_OFFSET] (line target, mobile_robot_line_target_env.py:35-40).
        """
        full = self._current_target_pos(state)
        if self.line_target:
            return full[:1] - ROBOT_OFFSET
        return full[: self.dim]

    def ground_truth(self, state: MobileRobotState) -> jax.Array:
        return state.robot_pos[: self.ground_truth_dim_()]

    def observe(self, state: MobileRobotState) -> jax.Array:
        if self.srl_model == "ground_truth":
            return self.srl_state(state)
        # raw_pixels and learned-encoder modes all observe rendered pixels;
        # learned encoders are applied in-batch downstream.
        return self.render_pixels(state)

    def render_pixels(self, state: MobileRobotState) -> jax.Array:
        from srl_tpu.ops.renderer import render_mobile_robot

        return render_mobile_robot(self, state)


class MobileRobot1DEnv(MobileRobotEnv):
    name = "MobileRobot1DGymEnv-v0"

    def __init__(self, **kwargs):
        kwargs.setdefault("dim", 1)
        super().__init__(**kwargs)


class MobileRobot2TargetEnv(MobileRobotEnv):
    name = "MobileRobot2TargetGymEnv-v0"

    def __init__(self, **kwargs):
        kwargs.setdefault("n_targets", 2)
        super().__init__(**kwargs)


class MobileRobotLineTargetEnv(MobileRobotEnv):
    name = "MobileRobotLineTargetGymEnv-v0"

    def __init__(self, **kwargs):
        kwargs.setdefault("line_target", True)
        super().__init__(**kwargs)
