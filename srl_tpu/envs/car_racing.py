"""CarRacing as a pure-JAX kernel: procedural track + car dynamics + renderer.

TPU-native replacement for the reference's Box2D-backed CarRacing wrapper
(environments/car_racing/car_env.py, which is only registered when X/GL are
available, environments/registry.py:56-63 — here it always works, headless).

Reference semantics preserved at the wrapper level (car_env.py:122-160):
  * discrete(4): steer [-1,1,0,0], gas [0,0,1,0], brake [0,0,0,1];
    continuous [steer, gas, brake] with steer negated;
  * reward: +1000/N per newly visited track tile minus 0.1 per step (the gym
    CarRacing scheme the wrapper inherits), -100 and done when leaving the
    playfield; done when all tiles are visited or after MAX_STEPS=10000;
  * ground truth dim 5: x, y, angle, inertia (constant), angular velocity
    (car_env.py:91-99);
  * getTargetPos = lookahead track point (car_env.py:84-89).

The Box2D rigid-body car (hull + 4 wheels + friction joints) is replaced by a
dynamic bicycle model with lateral-grip velocity mixing; the random
checkpoint-loop track generation mirrors gym's (12 checkpoints at random
angle/radius, smoothed into a fixed-size closed loop of tiles).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from srl_tpu.core.env import TpuEnv
from srl_tpu.core.spaces import Box, Discrete, Space

MAX_STEPS = 10000  # car_env.py:16
RENDER_WIDTH = 224
RENDER_HEIGHT = 224
FPS = 50.0
DT = 1.0 / FPS
SCALE = 6.0
TRACK_RAD = 900.0 / SCALE
PLAYFIELD = 2000.0 / SCALE
N_CHECKPOINTS = 12
N_TILES = 252  # 12 checkpoints x 21 interpolated tiles each
TRACK_WIDTH = 40.0 / SCALE
TILE_REWARD_TOTAL = 1000.0
LOOKAHEAD = 20  # car_env lookahead default (tiles ahead for getTargetPos)

# Car model.
MAX_STEER = 0.42  # rad, gym CarRacing wheel limit
STEER_RATE = 3.0
ENGINE_ACCEL = 40.0
BRAKE_DECEL = 80.0
DRAG = 0.35
GRIP = 6.0  # lateral velocity alignment rate
WHEELBASE = 2.8
HULL_INERTIA = 1.0546  # constant reported in ground truth slot 3


@struct.dataclass
class CarRacingState:
    key: jax.Array
    pos: jax.Array  # [2]
    vel: jax.Array  # [2] world-frame velocity
    yaw: jax.Array
    yaw_rate: jax.Array
    wheel_angle: jax.Array
    track: jax.Array  # [N_TILES, 2]
    visited: jax.Array  # [N_TILES] bool
    total_reward: jax.Array  # accumulated tile+time reward
    step_count: jax.Array
    terminated: jax.Array


def _generate_track(key: jax.Array) -> jax.Array:
    """Random closed loop [N_TILES, 2]: noisy checkpoints on a circle,
    linearly interpolated then smoothed (gym CarRacing's generator spirit
    with a static shape)."""
    k_angle, k_rad = jax.random.split(key)
    base = jnp.arange(N_CHECKPOINTS) * (2 * jnp.pi / N_CHECKPOINTS)
    noise = jax.random.uniform(
        k_angle, (N_CHECKPOINTS,), minval=0.0, maxval=2 * jnp.pi / N_CHECKPOINTS
    )
    alpha = base + noise
    rad = jax.random.uniform(
        k_rad, (N_CHECKPOINTS,), minval=TRACK_RAD / 3, maxval=TRACK_RAD
    )
    # First checkpoint pinned like gym (alpha=0, rad=1.5*TRACK_RAD/2).
    alpha = alpha.at[0].set(0.0)
    rad = rad.at[0].set(0.75 * TRACK_RAD)
    cps = jnp.stack([rad * jnp.cos(alpha), rad * jnp.sin(alpha)], axis=-1)

    # Dense closed loop via linear interp between consecutive checkpoints.
    per = N_TILES // N_CHECKPOINTS
    t = jnp.linspace(0.0, 1.0, per, endpoint=False)
    nxt = jnp.roll(cps, -1, axis=0)
    seg = cps[:, None, :] * (1 - t)[None, :, None] + nxt[:, None, :] * t[None, :, None]
    pts = seg.reshape(N_TILES, 2)
    # Circular smoothing passes round the corners.
    for _ in range(8):
        pts = (jnp.roll(pts, 1, axis=0) + pts + jnp.roll(pts, -1, axis=0)) / 3.0
    return pts.astype(jnp.float32)


class CarRacingEnv(TpuEnv):
    name = "CarRacingGymEnv-v0"

    def __init__(self, is_discrete: bool = True, shape_reward: bool = False,
                 srl_model: str = "raw_pixels", max_steps: int = MAX_STEPS,
                 lookahead: int = LOOKAHEAD, state_dim: int = -1, **_):
        self.is_discrete = is_discrete
        self.shape_reward = shape_reward
        self.srl_model = srl_model
        self.relative_pos = False  # car env uses absolute ground truth
        self.max_steps = max_steps
        self.lookahead = lookahead
        self.state_dim = state_dim

    @property
    def action_space(self) -> Space:
        if self.is_discrete:
            return Discrete(4)
        return Box(np.array([-1, 0, 0], np.float32), np.array([1, 1, 1], np.float32))

    @property
    def observation_space(self) -> Space:
        if self.srl_model == "raw_pixels":
            return Box(0, 255, (RENDER_HEIGHT, RENDER_WIDTH, 3), np.uint8)
        return Box(-np.inf, np.inf, (5,))

    @staticmethod
    def ground_truth_dim() -> int:
        return 5  # car_env.py:91-93

    def reset(self, key: jax.Array) -> CarRacingState:
        key, k_track = jax.random.split(key)
        track = _generate_track(k_track)
        start = track[0]
        heading = track[1] - track[0]
        yaw = jnp.arctan2(heading[1], heading[0])
        return CarRacingState(
            key=key, pos=start, vel=jnp.zeros(2), yaw=yaw,
            yaw_rate=jnp.float32(0.0), wheel_angle=jnp.float32(0.0),
            track=track, visited=jnp.zeros(N_TILES, bool),
            total_reward=jnp.float32(0.0), step_count=jnp.int32(0),
            terminated=jnp.bool_(False),
        )

    def step(self, state: CarRacingState, action) -> Tuple[CarRacingState, jax.Array, jax.Array]:
        key, _ = jax.random.split(state.key)
        if self.is_discrete:
            steer = jnp.array([-1.0, 1.0, 0.0, 0.0])[action]
            gas = jnp.array([0.0, 0.0, 1.0, 0.0])[action]
            brake = jnp.array([0.0, 0.0, 0.0, 1.0])[action]
        else:
            act = jnp.asarray(action, jnp.float32)
            steer = -act[0]  # car_env.py:130 negates steer
            gas = jnp.clip(act[1], 0.0, 1.0)
            brake = jnp.clip(act[2], 0.0, 1.0)

        # Steering servo toward the commanded angle.
        target_angle = steer * MAX_STEER
        wheel_angle = state.wheel_angle + jnp.clip(
            target_angle - state.wheel_angle, -STEER_RATE * DT, STEER_RATE * DT
        )

        heading = jnp.stack([jnp.cos(state.yaw), jnp.sin(state.yaw)])
        speed = jnp.dot(state.vel, heading)

        # Longitudinal forces.
        accel = gas * ENGINE_ACCEL - brake * BRAKE_DECEL * jnp.sign(speed) \
            - DRAG * speed
        speed = speed + accel * DT
        # Kinematic bicycle yaw rate with dynamic grip mixing.
        yaw_rate = speed / WHEELBASE * jnp.tan(wheel_angle)
        yaw = state.yaw + yaw_rate * DT
        new_heading = jnp.stack([jnp.cos(yaw), jnp.sin(yaw)])
        # Lateral grip: velocity relaxes toward the heading direction.
        ideal_vel = new_heading * speed
        vel = state.vel + (ideal_vel - state.vel) * jnp.minimum(GRIP * DT, 1.0)
        pos = state.pos + vel * DT

        # Tile visitation (the gym friction-detector reward).
        d2 = jnp.sum(jnp.square(state.track - pos[None, :]), axis=-1)
        on_tile = d2 < TRACK_WIDTH**2
        newly = on_tile & ~state.visited
        visited = state.visited | on_tile
        tile_reward = jnp.sum(newly) * (TILE_REWARD_TOTAL / N_TILES)

        step_count = state.step_count + 1
        step_reward = tile_reward - 0.1  # -0.1 per step (car_env.py:142)

        out_of_field = (jnp.abs(pos[0]) > PLAYFIELD) | (jnp.abs(pos[1]) > PLAYFIELD)
        all_visited = jnp.all(visited)
        done = out_of_field | all_visited | (step_count >= self.max_steps) \
            | state.terminated
        step_reward = jnp.where(out_of_field, -100.0, step_reward)

        if self.shape_reward:
            # distance to the nearest unvisited tile as shaping
            unvisited_d2 = jnp.where(visited, jnp.inf, d2)
            step_reward = -jnp.sqrt(jnp.min(unvisited_d2) + 1e-8) / TRACK_RAD

        new_state = state.replace(
            key=key, pos=pos, vel=vel, yaw=yaw, yaw_rate=yaw_rate,
            wheel_angle=wheel_angle, visited=visited,
            total_reward=state.total_reward + step_reward,
            step_count=step_count,
        )
        return new_state, step_reward.astype(jnp.float32), done

    def ground_truth(self, state: CarRacingState) -> jax.Array:
        # x, y, angle, inertia (constant), angular velocity (car_env.py:94-99).
        return jnp.concatenate([
            state.pos,
            jnp.stack([state.yaw, jnp.float32(HULL_INERTIA), state.yaw_rate]),
        ])

    def target_pos(self, state: CarRacingState) -> jax.Array:
        """Lookahead track point padded to dim 5 (car_env.py:84-89)."""
        d2 = jnp.sum(jnp.square(state.track - state.pos[None, :]), axis=-1)
        nearest = jnp.argmin(d2)
        pt = state.track[(nearest + self.lookahead) % N_TILES]
        return jnp.concatenate([pt, jnp.zeros(3)])

    def observe(self, state: CarRacingState) -> jax.Array:
        if self.srl_model == "ground_truth":
            return self.ground_truth(state)
        return self.render_pixels(state)

    def render_pixels(self, state: CarRacingState) -> jax.Array:
        """Car-centered top-down view: grass, track band, car box — matching
        the gym view's information content.

        Perf, two layers (see docs/PARITY.md roofline section):
        - FLOP bound: the naive field is min over all N_TILES of a per-pixel
          distance — H*W*N_TILES (~12.6M) multiply-adds per frame. Instead
          the field is evaluated on a 56x56 grid and bilinearly upsampled —
          the quadratic field is smooth at the ~1-world-unit grid pitch
          while the track band is ~7 units wide, so the threshold edge
          moves well under a band width. The coarse grid makes an exact min
          over ALL tiles affordable; an earlier top_k(128) nearest-tile
          cull was measured SLOWER on TPU v5e (226k vs 325k f/s isolated —
          the per-frame sort costs more than the 2x field FLOPs it saves)
          and only approximated this exact field.
        - Pixel bound: the frame has exactly four quantized colors (two
          grass checker shades, track grey, car red), so pixels composite
          as ONE packed-u32 lane — one select per layer instead of three —
          and unpack via a free bitcast (same packed scheme as
          ops/renderer.py, bit-identical to the per-channel float path:
          colors pre-quantized with the same clip(c*255+0.5) truncation).
          The car mask depends only on the static view grid and is a baked
          constant."""
        h, w = RENDER_HEIGHT, RENDER_WIDTH
        view = 60.0  # world units across the view
        ys = jnp.linspace(view / 2, -view / 2, h)
        xs = jnp.linspace(-view / 2, view / 2, w)
        gx, gy = jnp.meshgrid(xs, ys)
        # Rotate view with the car (gym follows car heading).
        c, s = jnp.cos(state.yaw - jnp.pi / 2), jnp.sin(state.yaw - jnp.pi / 2)
        wx = state.pos[0] + c * gx - s * gy
        wy = state.pos[1] + s * gx + c * gy

        # One packing implementation for all renderers (bit-parity contract
        # lives in ops/renderer.py: clip(c*255+0.5) truncation, R|G<<8|B<<16).
        from srl_tpu.ops.renderer import _pack_color

        def pack(r, g, b):
            return jnp.uint32(_pack_color((r, g, b)))

        grass_hi = pack(0.4, 0.8, 0.4)            # checker == 1
        grass_lo = pack(0.4 * 0.92, 0.8 * 0.92, 0.4 * 0.92)
        checker = ((jnp.floor(wx / 10.0) + jnp.floor(wy / 10.0)) % 2) > 0.5
        img = jnp.where(checker, grass_hi, grass_lo)

        # Track band via the coarse distance field over every tile.
        LOW = 56
        near = state.track  # [N_TILES, 2]
        ys_lo = jnp.linspace(view / 2, -view / 2, LOW)
        xs_lo = jnp.linspace(-view / 2, view / 2, LOW)
        gx_lo, gy_lo = jnp.meshgrid(xs_lo, ys_lo)
        wx_lo = state.pos[0] + c * gx_lo - s * gy_lo
        wy_lo = state.pos[1] + s * gx_lo + c * gy_lo
        d2_lo = jnp.min(
            jnp.square(wx_lo[..., None] - near[None, None, :, 0])
            + jnp.square(wy_lo[..., None] - near[None, None, :, 1]),
            axis=-1,
        )
        min_d2 = jax.image.resize(d2_lo, (h, w), "linear")
        on_track = min_d2 < TRACK_WIDTH**2
        img = jnp.where(on_track, pack(0.4, 0.4, 0.4), img)

        # Car: red box at the view center (rotated frame -> axis aligned;
        # static in the view grid, so the mask is a compile-time constant).
        cmask = (jnp.abs(gx) < 1.0) & (jnp.abs(gy) < 2.0)
        img = jnp.where(cmask, pack(0.8, 0.0, 0.0), img)

        return jax.lax.bitcast_convert_type(img, jnp.uint8)[..., :3]
