"""Omnidirectional robot (Omnirobot) reach-target env as a pure-JAX kernel.

TPU-native re-design of the reference's Omnirobot stack: the ZMQ
client/server pair (environments/omnirobot_gym/omnirobot_env.py +
real_robots/omnirobot_simulator_server.py + omnirobot_manager_base.py)
collapses into one batched step function — the "server-side" boundary-checked
moves and reward (omnirobot_manager_base.py:22-81,147-158) and the
"client-side" episode accounting (omnirobot_env.py:290-301) live in the same
jitted kernel; the marker-composite rendering becomes an analytic top-down
rasterizer with the simulator's noise models
(omnirobot_simulator_server.py:16-22).

Semantics preserved:
  * boundaries [-0.85, 0.85]^2, init/target uniform in [-0.7, 0.7]^2
    (constants.py:91-101);
  * discrete Moves FORWARD/BACKWARD/LEFT/RIGHT with STEP_DISTANCE=0.1,
    bump = move would cross a boundary, robot stays (manager:22-67);
  * continuous 2D action in the RingBox [-0.1,0]U[0,0.1] per axis, both-axis
    boundary check (manager:69-81);
  * reward +1 within 0.2 of target else -1 on bump else 0 (manager:147-158);
  * episode ends when step_count > 250 (omnirobot_env.py:294).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from srl_tpu.core.env import TpuEnv
from srl_tpu.core.spaces import Box, Discrete, Space

MAX_STEPS = 250
N_DISCRETE_ACTIONS = 4  # omnirobot_env.py:35
STEP_DISTANCE = 0.1
MIN_X, MAX_X = -0.85, 0.85
MIN_Y, MAX_Y = -0.85, 0.85
INIT_MIN, INIT_MAX = -0.7, 0.7
TARGET_MIN, TARGET_MAX = -0.7, 0.7
DIST_TO_TARGET_THRESHOLD = 0.2
REWARD_TARGET_REACH = 1.0
REWARD_BUMP_WALL = -1.0
REWARD_NOTHING = 0.0
ACTION_POSITIVE_HIGH = 0.1
RENDER_WIDTH = 224
RENDER_HEIGHT = 224
# Simulator noise (omnirobot_simulator_server.py:16-22).
NOISE_VAR_ROBOT_POS = 0.01
NOISE_VAR_ROBOT_YAW = np.radians(2.5)


class RingBox(Box):
    """Continuous space where each coordinate magnitude is bounded away from
    zero: values in [-high, -low] U [low, high]
    (real_robots/omnirobot_utils/utils.py:64-135)."""

    def __init__(self, positive_low, positive_high, negative_low, negative_high,
                 shape, dtype=np.float32):
        super().__init__(negative_low, positive_high, tuple(shape), dtype)
        self.positive_low = positive_low
        self.positive_high = positive_high
        self.negative_low = negative_low
        self.negative_high = negative_high

    def sample(self, key):
        lp = self.positive_high - self.positive_low
        ln = self.negative_high - self.negative_low
        raw = jax.random.uniform(key, self.shape, minval=-ln, maxval=lp)
        return raw + jnp.where(raw >= 0, self.positive_low, self.negative_high)


@struct.dataclass
class OmniRobotState:
    key: jax.Array
    robot_pos: jax.Array  # [2]
    robot_yaw: jax.Array
    target_pos: jax.Array  # [2]
    step_count: jax.Array
    terminated: jax.Array
    n_contacts: jax.Array


class OmniRobotEnv(TpuEnv):
    name = "OmnirobotEnv-v0"

    def __init__(self, is_discrete: bool = True, random_target: bool = True,
                 shape_reward: bool = False, srl_model: str = "raw_pixels",
                 max_steps: int = MAX_STEPS, simple_continual_target: bool = False,
                 state_dim: int = -1, action_repeat: int = 1, noise: bool = True):
        assert action_repeat == 1, (
            "Omnirobot doesn't support action_repeat (omnirobot_env.py:81)"
        )
        self.is_discrete = is_discrete
        self.random_target = random_target
        self.shape_reward = shape_reward
        self.srl_model = srl_model
        self.relative_pos = True  # omnirobot_env.py:31
        self.max_steps = max_steps
        self.state_dim = state_dim
        self.noise = noise

    @property
    def action_space(self) -> Space:
        if self.is_discrete:
            return Discrete(N_DISCRETE_ACTIONS)
        return RingBox(0.0, ACTION_POSITIVE_HIGH, -ACTION_POSITIVE_HIGH, 0.0, (2,))

    @property
    def observation_space(self) -> Space:
        if self.srl_model == "raw_pixels":
            return Box(0, 255, (RENDER_HEIGHT, RENDER_WIDTH, 3), np.uint8)
        return Box(-np.inf, np.inf, (2,))

    @staticmethod
    def ground_truth_dim() -> int:
        return 2  # omnirobot_env.py:248

    def reset(self, key: jax.Array) -> OmniRobotState:
        key, k_robot, k_target = jax.random.split(key, 3)
        robot_pos = jax.random.uniform(
            k_robot, (2,), minval=INIT_MIN, maxval=INIT_MAX, dtype=jnp.float32
        )
        if self.random_target:
            target = jax.random.uniform(
                k_target, (2,), minval=TARGET_MIN, maxval=TARGET_MAX,
                dtype=jnp.float32,
            )
        else:
            target = jnp.zeros(2, jnp.float32)
        return OmniRobotState(
            key=key, robot_pos=robot_pos, robot_yaw=jnp.float32(0.0),
            target_pos=target, step_count=jnp.int32(0),
            terminated=jnp.bool_(False), n_contacts=jnp.int32(0),
        )

    def step(self, state: OmniRobotState, action) -> Tuple[OmniRobotState, jax.Array, jax.Array]:
        key, _ = jax.random.split(state.key)
        pos = state.robot_pos

        if self.is_discrete:
            # Moves: 0 FORWARD(+x), 1 BACKWARD(-x), 2 LEFT(+y), 3 RIGHT(-y)
            # (constants.py Move enum; manager:22-67 boundary checks).
            deltas = jnp.array(
                [[STEP_DISTANCE, 0.0], [-STEP_DISTANCE, 0.0],
                 [0.0, STEP_DISTANCE], [0.0, -STEP_DISTANCE]],
                jnp.float32,
            )
            delta = deltas[action]
        else:
            delta = jnp.asarray(action, jnp.float32)

        new = pos + delta
        # Strict-inequality boundary checks (manager: pos + step < MAX etc.).
        inside = (
            (new[0] > MIN_X) & (new[0] < MAX_X)
            & (new[1] > MIN_Y) & (new[1] < MAX_Y)
        )
        has_bumped = ~inside
        robot_pos = jnp.where(has_bumped, pos, new)

        distance = jnp.linalg.norm(robot_pos - state.target_pos)
        reached = distance < DIST_TO_TARGET_THRESHOLD
        reward = jnp.where(
            reached, REWARD_TARGET_REACH,
            jnp.where(has_bumped, REWARD_BUMP_WALL, REWARD_NOTHING),
        )
        if self.shape_reward:
            reward = -distance

        n_contacts = jnp.where(reached, state.n_contacts + 1, 0)
        step_count = state.step_count + 1
        done = state.terminated | (step_count > self.max_steps)

        new_state = state.replace(
            key=key, robot_pos=robot_pos, step_count=step_count,
            n_contacts=n_contacts,
        )
        return new_state, reward.astype(jnp.float32), done

    def ground_truth(self, state: OmniRobotState) -> jax.Array:
        return state.robot_pos

    def target_pos(self, state: OmniRobotState) -> jax.Array:
        return state.target_pos

    def observe(self, state: OmniRobotState) -> jax.Array:
        if self.srl_model == "ground_truth":
            return self.srl_state(state)
        return self.render_pixels(state)

    def actionPolicyTowardTarget(self, state: OmniRobotState):
        """Expert policy (omnirobot_env.py:157-173)."""
        d = state.target_pos - state.robot_pos
        if self.is_discrete:
            return jnp.where(
                jnp.abs(d[0]) > jnp.abs(d[1]),
                jnp.where(d[0] > 0, 0, 1),
                jnp.where(d[1] > 0, 2, 3),
            ).astype(jnp.int32)
        return jnp.clip(d, -STEP_DISTANCE, STEP_DISTANCE)

    def render_pixels(self, state: OmniRobotState) -> jax.Array:
        """Synthetic top-down arena view replacing the marker-composite
        simulator rendering (omnirobot_simulator_server.py:94-190): wooden
        floor, dark border at the walls, black round robot marker with a
        white heading wedge, red square target marker; optional position
        noise like the simulator's."""
        h, w = RENDER_HEIGHT, RENDER_WIDTH
        span = 1.0  # arena rendered over [-1, 1] like the cropped camera
        ys = jnp.linspace(span, -span, h)[:, None]
        xs = jnp.linspace(-span, span, w)[None, :]
        # Grid world coords: x to the right, y up -> matches ground frame.
        gx = jnp.broadcast_to(xs, (h, w))
        gy = jnp.broadcast_to(ys, (h, w))

        floor = jnp.stack(
            [jnp.full((h, w), 0.82), jnp.full((h, w), 0.71),
             jnp.full((h, w), 0.55)], axis=-1,
        )
        checker = ((jnp.floor(gx / 0.425) + jnp.floor(gy / 0.425)) % 2)
        floor = floor * (0.92 + 0.08 * checker[..., None])

        border = (jnp.abs(gx) > MAX_X) | (jnp.abs(gy) > MAX_Y)
        img = jnp.where(border[..., None], jnp.array([0.25, 0.22, 0.2]), floor)

        key = state.key  # only used for render noise; not consumed
        pos = state.robot_pos
        if self.noise:
            k1, k2 = jax.random.split(jax.random.fold_in(key, state.step_count))
            pos = pos + jax.random.normal(k1, (2,)) * NOISE_VAR_ROBOT_POS
            yaw = state.robot_yaw + jax.random.normal(k2, ()) * NOISE_VAR_ROBOT_YAW
        else:
            yaw = state.robot_yaw

        # Target: red square marker.
        t = state.target_pos
        tmask = (jnp.abs(gx - t[0]) < 0.09) & (jnp.abs(gy - t[1]) < 0.09)
        img = jnp.where(tmask[..., None], jnp.array([0.85, 0.1, 0.1]), img)

        # Robot: black disk + white heading wedge.
        d2 = jnp.square(gx - pos[0]) + jnp.square(gy - pos[1])
        rmask = d2 < 0.11**2
        img = jnp.where(rmask[..., None], jnp.array([0.08, 0.08, 0.08]), img)
        hx = pos[0] + 0.06 * jnp.cos(yaw)
        hy = pos[1] + 0.06 * jnp.sin(yaw)
        hmask = (jnp.square(gx - hx) + jnp.square(gy - hy)) < 0.035**2
        img = jnp.where(hmask[..., None], jnp.array([0.95, 0.95, 0.95]), img)

        return jnp.clip(img * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
