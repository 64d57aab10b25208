"""Kuka iiwa button-pushing environment family as batched pure-JAX kernels.

TPU-native re-design of the reference PyBullet envs
(environments/kuka_gym/*.py): the arm is the analytic FK/DLS-IK/servo chain
from srl_tpu.ops.kinematics (replacing p.calculateInverseKinematics +
setJointMotorControl2 + stepSimulation), and button/table contacts are
geometric predicates over the gripper-tip position (replacing
p.getContactPoints — the reference only ever tests contact existence,
kuka_button_gym_env.py:433-437).

Variant map:
  * KukaButtonGymEnv        (kuka_button_gym_env.py)        -> n_buttons=1
  * Kuka2ButtonGymEnv       (kuka_2button_gym_env.py)       -> n_buttons=2
  * KukaRandButtonGymEnv    (kuka_rand_button_gym_env.py)   -> distractors
  * KukaMovingButtonGymEnv  (kuka_moving_button_gym_env.py) -> moving button

Semantics preserved (same constants/formulas):
  * discrete actions ±DELTA_V(0.03)+N(0,0.01) on x/y, down-only z with
    force_down; continuous DELTA_V_CONTINUOUS(0.0035)+N(0,1e-4)
    (kuka_button_gym_env.py:27-33,302-335);
  * workspace clipping of the integrated effector target (kuka.py:46-53,
    133-139), small constraints unless random_target;
  * reward +1 per button-contact step, 5 contacts terminate; -1 and
    outside-counter when distance > max_distance or table contact; table
    contact terminates; shaped variants (:428-463);
  * reset = deterministic 500-step settle (precomputed constant) + 5 random
    init actions (:242-269);
  * episode cap 1000 steps (1500 moving/2-button) (:17,
    kuka_2button_gym_env.py:3).
"""
from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from srl_tpu.core.env import TpuEnv
from srl_tpu.core.spaces import Box, Discrete, Space
from srl_tpu.ops import kinematics as kin

# Constants mirrored from kuka_button_gym_env.py:16-35.
MAX_STEPS = 1000
MAX_STEPS_LONG = 1500
N_CONTACTS_BEFORE_TERMINATION = 5
N_STEPS_OUTSIDE_SAFETY_SPHERE = 5000
RENDER_WIDTH = 224
RENDER_HEIGHT = 224
Z_TABLE = -0.2
N_DISCRETE_ACTIONS = 6
DELTA_V = 0.03
DELTA_V_CONTINUOUS = 0.0035
DELTA_THETA = 0.1
NOISE_STD = 0.01
NOISE_STD_CONTINUOUS = 0.0001
NOISE_STD_JOINTS = 0.002
N_RANDOM_ACTIONS_AT_INIT = 5
BUTTON_DISTANCE_HEIGHT = 0.28  # virtual distance target above the cap link
# Physical button geometry, from urdf/simple_button.urdf joint origins plus
# the meshes/*.dae vertex bounds: base plate r=0.10 h=0.005; base cylinder
# r=0.10 h=0.025 stacked at +0.005; cap r=0.09 h=0.030 on a prismatic glider
# (travel 0.01) that the motor holds raised (step2 applies
# targetPosition=0.1 every step, kuka_button_gym_env.py:346-347). The whole
# button is only 4.5 cm tall — the arm has to descend ~0.37 m from its rest
# pose and land the finger tips on the cap without touching the table.
BUTTON_BASE_RADIUS = 0.10
BUTTON_BASE_TOP = Z_TABLE + 0.030
BUTTON_CAP_RADIUS = 0.09
BUTTON_CAP_TOP = Z_TABLE + 0.045
BUTTON_CAP_PRESSED = BUTTON_CAP_TOP - 0.01  # fully pressed glider
CONTACT_EPS = 0.01
# Moving-button variant (kuka_moving_button_gym_env.py:3-7).
BUTTON_SPEED = 0.001
BUTTON_YMIN = -0.3
BUTTON_YMAX = 0.3
# Rand-button variant (kuka_rand_button_gym_env.py).
N_DISTRACTORS = 10
BALL_FORCE_SPEED = 0.004  # ball roll per step after the kick
# Physical footprints of the distractor bodies: the reference loads them as
# dynamic PyBullet bodies the arm/ball can shove around
# (kuka_rand_button_gym_env.py:60-69 duck/lego/cube, :117-127 kicked
# sphere). Radii approximate the reference meshes' footprints.
DISTRACTOR_RADIUS = 0.05
# Tallest distractor (the duck mesh is ~8 cm): the finger tip's lowest
# reachable point (workspace-clipped, ~Z_TABLE+0.068) must be able to
# engage the bodies, as the PyBullet fingers do.
DISTRACTOR_TOP = Z_TABLE + 0.08
BALL_RADIUS = 0.03
TIP_RADIUS = 0.02  # finger-tip contact radius for object pushback

# Static gripper joint values (kuka.py:65-66, joints 7-13) for the
# 14-dim "joints" observation mode.
GRIPPER_JOINTS = np.array(
    [0.000048, -0.299912, 0.0, -0.000043, 0.29996, 0.0, -0.0002], np.float32
)


@struct.dataclass
class KukaState:
    key: jax.Array
    q: jax.Array  # [7] arm joint angles
    tip: jax.Array  # [3] finger-tip position (cached FK, post contact block)
    gripper: jax.Array  # [3] gripper-link position (getArmPos anchor)
    flange: jax.Array  # [3] flange position (cached FK — control_step input)
    ee_target: jax.Array  # [3] integrated clipped effector target
    effector_angle: jax.Array  # accumulated da (kuka.py:140)
    buttons: jax.Array  # [n_buttons, 3] button TOP positions
    button_speed: jax.Array  # moving-button y velocity
    n_contacts: jax.Array  # [n_buttons] int32
    goal_id: jax.Array  # int32 (2-button progression)
    n_steps_outside: jax.Array  # int32
    step_count: jax.Array  # int32
    terminated: jax.Array  # bool
    distractors: jax.Array  # [n_distractors, 3] pushable bodies (pos)
    ball: jax.Array  # [6] pos+vel — kicked sphere, collides with tip/objects


@lru_cache(maxsize=1)
def _settled_q() -> np.ndarray:
    return kin.settled_rest_q()


class KukaButtonEnv(TpuEnv):
    """Kuka iiwa arm pushing a button on a table."""

    name = "KukaButtonGymEnv-v0"

    def __init__(
        self,
        n_buttons: int = 1,
        moving_button: bool = False,
        rand_objects: bool = False,
        is_discrete: bool = True,
        action_joints: bool = False,
        multi_view: bool = False,
        shape_reward: bool = False,
        random_target: bool = False,
        force_down: bool = True,
        max_distance: float = 0.8,
        action_repeat: int = 1,
        srl_model: str = "raw_pixels",
        state_dim: int = -1,
        max_steps: int = None,
        noise_std: float = NOISE_STD,
        null_space: bool = False,
        render_scale: int = 1,
        coarse_obs: bool = False,
    ):
        # Coarse-trace factor for the ray-traced pixel paths: rays are
        # traced at (H/render_scale, W/render_scale) and nearest-upsampled
        # to the 224x224 observation. The default is 1 — the exact
        # full-resolution trace, matching the reference's native 224x224
        # PyBullet camera (kuka_button_gym_env.py:396-398). render_scale=2
        # quarters the per-frame ray math (~3.5x frames/s; ≥90% of pixels
        # within 8 of the exact trace) and is the benched fast
        # configuration — opt in explicitly (bench.py, --render-scale 2);
        # SRL models/checkpoints see shifted pixel statistics across
        # scales, so the fidelity choice must be the caller's.
        assert RENDER_HEIGHT % render_scale == 0, "scale must divide 224"
        self.render_scale = int(render_scale)
        # coarse_obs hands the TRACED resolution (H/s, W/s) to the policy as
        # the observation and skips the upsample entirely; a CNN policy
        # folds the nearest-upsample into conv1 exactly (block-summed
        # kernel, models/policies.py) so the math matches the 224x224
        # coarse-trace observation bit-for-nothing-lost while the
        # [N, 224, 224, 3] buffers never exist. Requires render_scale > 1.
        assert not coarse_obs or render_scale > 1, (
            "coarse_obs needs render_scale > 1"
        )
        self.coarse_obs = bool(coarse_obs)
        self.obs_coarse_scale = self.render_scale if self.coarse_obs else 1
        self.null_space = null_space
        self.n_buttons = n_buttons
        self.moving_button = moving_button
        self.rand_objects = rand_objects
        self.is_discrete = is_discrete
        self.action_joints = action_joints
        self.multi_view = multi_view
        self.shape_reward = shape_reward
        self.random_target = random_target
        self.force_down = force_down
        self.max_distance = float(max_distance)
        self.action_repeat = int(action_repeat)
        self.srl_model = srl_model
        self.relative_pos = True  # RELATIVE_POS, kuka_button_gym_env.py:30
        self.state_dim = state_dim
        self.noise_std = float(noise_std)
        if max_steps is None:
            max_steps = MAX_STEPS_LONG if (n_buttons > 1 or moving_button) else MAX_STEPS
        self.max_steps = max_steps
        # Workspace constraints (kuka.py:46-53).
        small = not random_target and n_buttons == 1
        if small:
            self._ws_lo = np.array([0.50, -0.17, 0.0], np.float32)
            self._ws_hi = np.array([0.65, 0.22, 0.5], np.float32)
        else:
            self._ws_lo = np.array([0.35, -0.30, 0.0], np.float32)
            self._ws_hi = np.array([0.65, 0.30, 0.5], np.float32)
        self._n_distract = N_DISTRACTORS if rand_objects else 0

    # ------------------------------------------------------------------
    @property
    def action_space(self) -> Space:
        if self.is_discrete:
            return Discrete(N_DISCRETE_ACTIONS)
        if self.action_joints:
            return Box(-1.0, 1.0, (7,))
        return Box(-1.0, 1.0, (3,))

    @property
    def observation_space(self) -> Space:
        if self.srl_model == "raw_pixels":
            channels = 6 if self.multi_view else 3
            s = self.obs_coarse_scale
            return Box(0, 255,
                       (RENDER_HEIGHT // s, RENDER_WIDTH // s, channels),
                       np.uint8)
        dims = {
            "ground_truth": 3,
            "joints": 14,
            "joints_position": 17,
        }
        return Box(-np.inf, np.inf, (dims.get(self.srl_model, 3),))

    @staticmethod
    def ground_truth_dim() -> int:
        return 3  # kuka_button_gym_env.py:201-203

    @staticmethod
    def joints_dim() -> int:
        return 14  # kuka_button_gym_env.py:194-199

    # ------------------------------------------------------------------
    def _sample_buttons(self, key: jax.Array) -> jax.Array:
        """Button TOP positions [n_buttons, 3]."""
        if self.n_buttons == 1:
            # kuka_button_gym_env.py:227-234
            base = jnp.array([0.5, 0.0], jnp.float32)
            if self.random_target:
                u = jax.random.uniform(key, (2,), minval=-1.0, maxval=1.0)
                base = base + jnp.array([0.15, 0.3]) * u
            top = jnp.concatenate(
                [base, jnp.array([Z_TABLE + BUTTON_DISTANCE_HEIGHT], jnp.float32)]
            )
            return top[None, :]
        # kuka_2button_gym_env.py:53-73: first at y=+0.125, second at -0.125.
        k1, k2 = jax.random.split(key)
        b1 = jnp.array([0.5, 0.125], jnp.float32)
        b2 = jnp.array([0.5, -0.125], jnp.float32)
        if self.random_target:
            u1 = jax.random.uniform(k1, (2,))
            b1 = b1 + jnp.array([0.15, 0.175]) * jnp.array([u1[0] * 2 - 1, u1[1]])
            u2 = jax.random.uniform(k2, (2,))
            b2 = b2 + jnp.array([0.15, 0.175]) * jnp.array([u2[0] * 2 - 1, -u2[1]])
        z = Z_TABLE + BUTTON_DISTANCE_HEIGHT
        return jnp.stack(
            [
                jnp.concatenate([b1, jnp.array([z], jnp.float32)]),
                jnp.concatenate([b2, jnp.array([z], jnp.float32)]),
            ]
        )

    def reset(self, key: jax.Array) -> KukaState:
        key, k_btn, k_init, k_obj, k_ball = jax.random.split(key, 5)
        buttons = self._sample_buttons(k_btn)

        # Distractor objects on the table (kuka_rand_button_gym_env.py:60-69);
        # physical pushable bodies (see the contact block in step);
        # rejected placements (inside the button box) are dropped below the
        # table and stay inert.
        if self._n_distract > 0:
            u = jax.random.uniform(k_obj, (self._n_distract, 2), minval=-1.0, maxval=1.0)
            xy = jnp.array([0.5, 0.0]) + jnp.array([0.15, 0.3]) * u
            inside = (jnp.abs(xy[:, 0] - buttons[0, 0]) <= 0.1) & (
                jnp.abs(xy[:, 1] - buttons[0, 1]) <= 0.1
            )
            z = jnp.where(inside, -5.0, Z_TABLE + 0.03)
            distractors = jnp.concatenate([xy, z[:, None]], axis=1)
        else:
            distractors = jnp.zeros((0, 3), jnp.float32)
        ball = jnp.array([0.25, -0.2, Z_TABLE + 0.03, 0.0, 0.0, 0.0], jnp.float32)

        # Settled arm (precomputed constant) + 5 random init actions
        # (kuka_button_gym_env.py:249-269).
        q = jnp.asarray(_settled_q())
        ee_target = jnp.asarray(kin.REST_EE_TARGET)
        init_keys = jax.random.split(k_init, N_RANDOM_ACTIONS_AT_INIT)
        for i in range(N_RANDOM_ACTIONS_AT_INIT):
            ka, kb = jax.random.split(init_keys[i])
            if self.is_discrete:
                sign = jnp.where(jax.random.uniform(ka) > 0.5, 1.0, -1.0)
                axis = jax.random.randint(kb, (), 0, 3)
                delta = jnp.zeros(3).at[axis].set(sign * DELTA_V)
            else:
                direction = jax.random.normal(ka, (3,))
                direction = direction / jnp.linalg.norm(direction)
                delta = DELTA_V_CONTINUOUS * direction
            ee_target = jnp.clip(
                ee_target + delta, jnp.asarray(self._ws_lo), jnp.asarray(self._ws_hi)
            )
            q = kin.control_step(q, ee_target, null_space=self.null_space)

        flange, gripper, tip = kin.fk_points(q)
        return KukaState(
            key=key,
            q=q.astype(jnp.float32),
            tip=tip.astype(jnp.float32),
            gripper=gripper.astype(jnp.float32),
            flange=flange.astype(jnp.float32),
            ee_target=ee_target.astype(jnp.float32),
            effector_angle=jnp.float32(0.0),
            buttons=buttons.astype(jnp.float32),
            button_speed=jnp.float32(BUTTON_SPEED),
            n_contacts=jnp.zeros((self.n_buttons,), jnp.int32),
            goal_id=jnp.int32(0),
            n_steps_outside=jnp.int32(0),
            step_count=jnp.int32(0),
            terminated=jnp.bool_(False),
            distractors=distractors.astype(jnp.float32),
            ball=ball,
        )

    # ------------------------------------------------------------------
    def _action_to_delta(self, key, action):
        """(delta_xyz | q_target) per the reference mapping
        (kuka_button_gym_env.py:302-335)."""
        if self.is_discrete:
            dv = DELTA_V + jax.random.normal(key, ()) * self.noise_std
            zero = jnp.zeros_like(dv)
            dxs = jnp.stack([-dv, dv, zero, zero, zero, zero])
            dys = jnp.stack([zero, zero, -dv, dv, zero, zero])
            if self.force_down:
                dzs = jnp.stack([zero, zero, zero, zero, -dv, -dv])
            else:
                dzs = jnp.stack([zero, zero, zero, zero, -dv, dv])
            return jnp.stack([dxs[action], dys[action], dzs[action]])
        dv = DELTA_V_CONTINUOUS + jax.random.normal(key, ()) * NOISE_STD_CONTINUOUS
        act = jnp.asarray(action, jnp.float32)
        dx = act[0] * dv
        dy = act[1] * dv
        dz = jnp.where(self.force_down, -jnp.abs(act[2] * dv), act[2] * dv)
        return jnp.stack([dx, dy, dz])

    def step(self, state: KukaState, action) -> Tuple[KukaState, jax.Array, jax.Array]:
        key, k_noise = jax.random.split(state.key)

        buttons = state.buttons
        button_speed = state.button_speed
        if self.moving_button:
            # kuka_moving_button_gym_env.py:110-118 — flip at the rails,
            # then translate.
            y = buttons[0, 1]
            button_speed = jnp.where(
                (y > BUTTON_YMAX) | (y < BUTTON_YMIN), -button_speed, button_speed
            )
            buttons = buttons.at[0, 1].add(button_speed)

        # Arm control with penetration blocking: the PyBullet arm physically
        # rests on whatever it touches (table / button base / button cap) —
        # emulate the contact solver by rolling a sub-step back when the
        # finger tip would sink below the supporting surface (the same
        # position-rollback model the reference MobileRobot uses for walls,
        # mobile_robot_env.py:235-267).
        def blocked(q_old, tip_old, grip_old, fl_old, q_new):
            fl_new, grip_new, tip_new = kin.fk_points(q_new)
            xy = jnp.linalg.norm(buttons[:, :2] - tip_new[None, :2], axis=1)
            floor = jnp.where(
                jnp.any(xy <= BUTTON_CAP_RADIUS),
                BUTTON_CAP_PRESSED,
                jnp.where(jnp.any(xy <= BUTTON_BASE_RADIUS), BUTTON_BASE_TOP, Z_TABLE),
            )
            penet = tip_new[2] < floor
            return (
                jnp.where(penet, q_old, q_new),
                jnp.where(penet, tip_old, tip_new),
                jnp.where(penet, grip_old, grip_new),
                jnp.where(penet, fl_old, fl_new),
            )

        q, tip, gripper, flange = state.q, state.tip, state.gripper, state.flange
        if self.action_joints:
            d_theta = DELTA_THETA + jax.random.normal(k_noise, ()) * NOISE_STD_JOINTS
            q_target = jnp.asarray(action, jnp.float32) * d_theta + state.q
            ee_target = state.ee_target
            for _ in range(self.action_repeat):
                q, tip, gripper, flange = blocked(
                    q, tip, gripper, flange, kin.servo_step(q, q_target)
                )
        else:
            delta = self._action_to_delta(k_noise, action)
            ee_target = jnp.clip(
                state.ee_target + delta,
                jnp.asarray(self._ws_lo),
                jnp.asarray(self._ws_hi),
            )
            for _ in range(self.action_repeat):
                # p_cur = the flange cached from the previous (blocked) FK —
                # the same fk(q)[3] control_step would recompute, halving
                # the FK work per step.
                q, tip, gripper, flange = blocked(
                    q, tip, gripper, flange,
                    kin.control_step(q, ee_target, null_space=self.null_space,
                                     p_cur=flange),
                )

        step_count = state.step_count + self.action_repeat

        # Physical distractor interactions. In the reference these are
        # dynamic PyBullet bodies: a sphere kicked by a random force at step
        # 10 (kuka_rand_button_gym_env.py:117-127) and 10 table objects the
        # arm (and ball) can collide with (:60-69). Here: the same
        # position-projection contact model the arm itself uses — an
        # overlapping body is shoved out of penetration along the contact
        # normal, and the ball transfers its momentum on impact.
        ball = state.ball
        distractors = state.distractors
        if self.rand_objects:
            # Kick when the step counter CROSSES 10 (the reference applies
            # the force at its step 10, kuka_rand_button_gym_env.py:117-127)
            # — an equality test would never fire for action_repeat values
            # that don't divide 10.
            kick = (state.step_count < 10) & (step_count >= 10)
            k_kick, key = jax.random.split(key)
            direction = jnp.abs(jax.random.normal(k_kick, (2,)))
            direction = direction / (jnp.linalg.norm(direction) + 1e-8)
            vel = jnp.where(kick, direction * BALL_FORCE_SPEED, ball[3:5])
            # Tip-vs-ball: a low finger tip overlapping the sphere kicks it
            # along the tip->ball direction (the arm can play with the ball
            # exactly as in the PyBullet scene).
            rel_tb = ball[:2] - tip[:2]
            d_tb = jnp.linalg.norm(rel_tb)
            tip_low_ball = tip[2] <= Z_TABLE + 2 * BALL_RADIUS + CONTACT_EPS
            tip_hits_ball = (d_tb <= BALL_RADIUS + TIP_RADIUS) & tip_low_ball
            vel = jnp.where(
                tip_hits_ball,
                rel_tb / jnp.maximum(d_tb, 1e-6) * BALL_FORCE_SPEED,
                vel,
            )
            pos = ball[:3].at[:2].add(vel)
            ball = jnp.concatenate([pos, vel, ball[5:6]])

            # Pushback of table objects by the tip and the rolling ball.
            # Rejected placements (dropped below the table at reset) and
            # already-settled objects only move when something shoves them.
            on_table = distractors[:, 2] > Z_TABLE

            def push_from(xy, center_xy, radius, active):
                rel = xy - center_xy[None]
                d = jnp.linalg.norm(rel, axis=1)
                overlap = (d < radius + DISTRACTOR_RADIUS) & on_table & active
                dirn = rel / jnp.maximum(d, 1e-6)[:, None]
                target = center_xy[None] + dirn * (radius + DISTRACTOR_RADIUS)
                return jnp.where(overlap[:, None], target, xy), overlap

            tip_low = tip[2] <= DISTRACTOR_TOP + CONTACT_EPS
            d_xy, _ = push_from(
                distractors[:, :2], tip[:2], TIP_RADIUS, tip_low
            )
            d_xy, ball_hit = push_from(
                d_xy, ball[:2], BALL_RADIUS, jnp.bool_(True)
            )
            distractors = distractors.at[:, :2].set(d_xy)
            # Momentum transfer: the ball stops when it knocks an object.
            vel = jnp.where(jnp.any(ball_hit), 0.0, vel)
            ball = jnp.concatenate([ball[:3], vel, ball[5:6]])

        # ---- contacts & reward (kuka_button_gym_env.py:428-463 /
        #      kuka_2button_gym_env.py:151-198) ----
        # Reference contact = p.getContactPoints against the button CAP link
        # only (BUTTON_LINK_IDX, kuka_button_gym_env.py:433): finger tip on
        # (or into, from the side) the 9 cm-radius cap. The distance penalty
        # is measured from the gripper link to the virtual target 0.28 above
        # the cap link (:273-274,429-430).
        goal_id = state.goal_id
        goal_button = buttons[goal_id]
        distance = jnp.linalg.norm(goal_button - gripper)

        xy_dist_all = jnp.linalg.norm(buttons[:, :2] - tip[None, :2], axis=1)
        contact_all = (xy_dist_all <= BUTTON_CAP_RADIUS) & (
            tip[2] <= BUTTON_CAP_TOP + CONTACT_EPS
        )
        goal_contact = contact_all[goal_id]
        # Table contact: the blocked tip can only get this low over bare
        # table (the button base/cap floors sit higher).
        table_contact = tip[2] <= Z_TABLE + CONTACT_EPS

        n_contacts = state.n_contacts.at[goal_id].add(goal_contact.astype(jnp.int32))

        if self.n_buttons == 1:
            reward = goal_contact.astype(jnp.float32)
            pressed_out = n_contacts[0] >= N_CONTACTS_BEFORE_TERMINATION
            outside_limit = N_STEPS_OUTSIDE_SAFETY_SPHERE
        else:
            # Sparse reward only for the LAST button (kuka_2button:159-161).
            reward = jnp.where(
                goal_id == self.n_buttons - 1, goal_contact.astype(jnp.float32), 0.0
            )
            # Goal progression once the current button accumulated 5 contacts.
            advance = (n_contacts[goal_id] >= N_CONTACTS_BEFORE_TERMINATION) & (
                goal_id < self.n_buttons - 1
            )
            goal_id = jnp.where(advance, goal_id + 1, goal_id)
            pressed_out = n_contacts[-1] >= N_CONTACTS_BEFORE_TERMINATION
            outside_limit = N_STEPS_OUTSIDE_SAFETY_SPHERE - 1  # kuka_2button:180

        outside = (distance > self.max_distance) | table_contact
        reward = jnp.where(outside, -1.0, reward)
        n_steps_outside = jnp.where(outside, state.n_steps_outside + 1, 0)

        terminated = (
            state.terminated
            | table_contact
            | pressed_out
            | (n_steps_outside >= outside_limit)
        )

        if self.shape_reward:
            if self.is_discrete and self.n_buttons == 1:
                reward = -distance  # kuka_button:449-451
            elif self.n_buttons == 1:
                # continuous shaped (kuka_button:452-462)
                reward = jnp.where(
                    terminated & (reward > 0),
                    50.0,
                    jnp.where(terminated & (reward < 0), -250.0, -distance),
                )
            else:
                # 2-button shaped (kuka_2button:183-198)
                reward = jnp.where(
                    terminated & (reward > 0),
                    50.0,
                    jnp.where(
                        (n_contacts[goal_id] < N_CONTACTS_BEFORE_TERMINATION)
                        & goal_contact,
                        25.0,
                        jnp.where(
                            table_contact,
                            -250.0,
                            jnp.where(distance > self.max_distance, -20.0, -distance),
                        ),
                    ),
                )

        done = terminated | (step_count > self.max_steps)

        new_state = state.replace(
            key=key,
            q=q,
            tip=tip,
            gripper=gripper,
            flange=flange,
            ee_target=ee_target,
            buttons=buttons,
            button_speed=button_speed,
            n_contacts=n_contacts,
            goal_id=goal_id,
            n_steps_outside=n_steps_outside,
            step_count=step_count,
            terminated=terminated,
            distractors=distractors,
            ball=ball,
        )
        return new_state, reward.astype(jnp.float32), done

    # ------------------------------------------------------------------
    def ground_truth(self, state: KukaState) -> jax.Array:
        """Gripper-link position (getArmPos, kuka_button_gym_env.py:205-212)."""
        return state.gripper

    def target_pos(self, state: KukaState) -> jax.Array:
        return state.buttons[state.goal_id]

    def joints(self, state: KukaState) -> jax.Array:
        return jnp.concatenate([state.q, jnp.asarray(GRIPPER_JOINTS)])

    def observe(self, state: KukaState) -> jax.Array:
        # getSRLState dispatch (kuka_button_gym_env.py:175-189).
        if self.srl_model == "ground_truth":
            return self.srl_state(state)
        if self.srl_model == "joints":
            return self.joints(state)
        if self.srl_model == "joints_position":
            return jnp.concatenate([self.srl_state(state), self.joints(state)])
        return self.render_pixels(state)

    def render_pixels(self, state: KukaState) -> jax.Array:
        from srl_tpu.ops.renderer3d import render_kuka

        return render_kuka(self, state)

    def observe_batched(self, states) -> jax.Array:
        """Batched observation hook used by VecEnv. For pixel modes on TPU
        this routes to the Pallas tile ray-tracer (ops/pallas_render3d.py),
        which keeps the ~20-primitive intersect-shade-composite loop in VMEM
        instead of materializing per-primitive [H, W] buffers; other modes
        (and the CPU test platform) fall back to vmap over observe."""
        pixel_mode = self.srl_model not in (
            "ground_truth", "joints", "joints_position"
        )
        if pixel_mode and (
            jax.default_backend() == "tpu"
            or getattr(self, "force_pallas_render", False)
        ):
            from srl_tpu.ops.pallas_render3d import render_kuka_pallas

            return render_kuka_pallas(self, states)
        return jax.vmap(self.observe)(states)


class KukaRandButtonEnv(KukaButtonEnv):
    name = "KukaRandButtonGymEnv-v0"

    def __init__(self, **kwargs):
        kwargs.setdefault("rand_objects", True)
        super().__init__(**kwargs)


class Kuka2ButtonEnv(KukaButtonEnv):
    name = "Kuka2ButtonGymEnv-v0"

    def __init__(self, **kwargs):
        kwargs.setdefault("n_buttons", 2)
        kwargs.setdefault("max_distance", 2.0)
        kwargs.setdefault("force_down", False)
        # Reference enables null-space IK for this variant
        # (kuka_2button_gym_env.py:79).
        kwargs.setdefault("null_space", True)
        super().__init__(**kwargs)


class KukaMovingButtonEnv(KukaButtonEnv):
    name = "KukaMovingButtonGymEnv-v0"

    def __init__(self, **kwargs):
        kwargs.setdefault("moving_button", True)
        super().__init__(**kwargs)
