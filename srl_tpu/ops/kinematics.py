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
# Gripper link frame (kuka_gripper_index=8, kuka.py:32) used by the
# reference's getArmPos/getGroundTruth (kuka_button_gym_env.py:205-212):
# sits just below the flange, ~0.25 above the finger tips.  Calibrated so
# that when the finger tips press the button cap the gripper-to-target
# distance is ~0 (button_pos is the cap link + 0.28,
# kuka_button_gym_env.py:273-274).
GRIPPER_OFFSET = 0.03
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

    The iiwa's joints are all elementary rotations (axes z, y, z, -y, z, y,
    z) and every link offset is pure +z, so the chain is evaluated as Givens
    column updates on the nine scalar entries of R: R@Rz mixes columns 0/1,
    R@Ry mixes columns 0/2, and each position update only needs column 2
    (p += d * R[:, 2]). That removes every 3x3 ``dot_general`` from the hot
    env step — under vmap each tiny batched matmul was its own kernel thunk
    (~42 per step with the contact-rollback second FK), whose dispatch
    overhead dominated the Kuka step; the scalar form fuses into the single
    elementwise kernel with everything else. Numerically equivalent to the
    generic Rodrigues+matmul chain within float32 rounding (the golden Kuka
    fingerprints pass at atol 2e-5), not bit-identical: the Rodrigues form
    computes diagonal terms as 1+(1-c)(-1) and accumulates via dot products,
    so individual entries can differ by a few ulps."""
    base = jnp.asarray(BASE_POS)
    px, py, pz = base[0], base[1], base[2]
    one = jnp.ones_like(q[0])
    zero = jnp.zeros_like(q[0])
    # R columns as scalars: c0 = (r00, r10, r20), c1, c2. Start = identity.
    c0 = (one, zero, zero)
    c1 = (zero, one, zero)
    c2 = (zero, zero, one)
    offs = [float(IIWA_OFFSETS[i, 2]) for i in range(7)]
    # axis kind per joint: +1 -> Rz(q), +2 -> Ry(q), -2 -> Ry(-q).
    kinds = []
    for i in range(7):
        ax = IIWA_AXES[i]
        kinds.append(1 if ax[2] != 0 else (2 if ax[1] > 0 else -2))

    joint_pos = []
    joint_axis = []
    for i in range(7):
        d = offs[i]
        px = px + d * c2[0]
        py = py + d * c2[1]
        pz = pz + d * c2[2]
        joint_pos.append(jnp.stack([px, py, pz]))
        s, c = jnp.sin(q[i]), jnp.cos(q[i])
        if kinds[i] == 1:  # about local z: axis_w = c2, mix c0/c1
            joint_axis.append(jnp.stack([c2[0], c2[1], c2[2]]))
            n0 = tuple(c * a + s * b for a, b in zip(c0, c1))
            n1 = tuple(-s * a + c * b for a, b in zip(c0, c1))
            c0, c1 = n0, n1
        else:  # about local +-y: axis_w = +-c1, mix c0/c2
            sgn = 1.0 if kinds[i] == 2 else -1.0
            joint_axis.append(jnp.stack([sgn * c1[0], sgn * c1[1], sgn * c1[2]]))
            se = sgn * s
            n0 = tuple(c * a - se * b for a, b in zip(c0, c2))
            n2 = tuple(se * a + c * b for a, b in zip(c0, c2))
            c0, c2 = n0, n2

    p_flange = jnp.stack([px, py, pz])
    p_tip = p_flange + TIP_OFFSET * jnp.stack([c2[0], c2[1], c2[2]])
    R = jnp.stack(
        [jnp.stack([c0[0], c1[0], c2[0]]),
         jnp.stack([c0[1], c1[1], c2[1]]),
         jnp.stack([c0[2], c1[2], c2[2]])]
    )
    return jnp.stack(joint_pos), jnp.stack(joint_axis), R, p_flange, p_tip


def tip_position(q: jax.Array) -> jax.Array:
    return fk(q)[4]


def gripper_position(q: jax.Array) -> jax.Array:
    """Position of the gripper link (getArmPos, kuka_button_gym_env.py:205-212)."""
    _, _, R, p_flange, _ = fk(q)
    return p_flange + GRIPPER_OFFSET * R[:, 2]


def fk_points(q: jax.Array):
    """(p_flange, p_gripper, p_tip) from one FK pass."""
    _, _, R, p_flange, p_tip = fk(q)
    p_grip = p_flange + GRIPPER_OFFSET * R[:, 2]
    return p_flange, p_grip, p_tip


# ---------------------------------------------------------------------------
# Closed-form IK for the fixed down-pointing orientation.
#
# The button envs always request orientation Ry(-pi) (kuka.py:144) and never
# rotate the effector (da == 0), so the 7-DOF redundancy collapses: q3=q5=0
# puts the arm in the vertical plane through the base yaw, the elbow solves a
# planar 2R problem (upper arm 0.42, forearm 0.40), the wrist pitch closes
# the orientation constraint q2 - q4 + q6 = pi, and q7 = -q1 cancels the base
# yaw. One trig evaluation replaces the iterated fk+Jacobian+solve chain of
# dls_ik — ~10x fewer flops on the Kuka hot path.
# ---------------------------------------------------------------------------
_SHOULDER = BASE_POS + np.array([0.0, 0.0, 0.36], np.float32)  # joints 1-3
_UPPER_ARM = 0.42  # shoulder -> elbow (offsets 3+4)
_FOREARM = 0.40  # elbow -> wrist (offsets 5+6)
_FLANGE_D = 0.081  # wrist -> flange along the (down-pointing) final link


def ik_down(target_pos: jax.Array) -> jax.Array:
    """Joint angles reaching ``target_pos`` with the flange pointing straight
    down (R = Ry(-pi)), on the branch matching the reference rest pose
    (elbow bent forward, kuka.py:65-66). Out-of-reach targets are clamped to
    the workspace sphere."""
    w = target_pos + jnp.array([0.0, 0.0, _FLANGE_D], jnp.float32) - jnp.asarray(_SHOULDER)
    r = jnp.sqrt(w[0] * w[0] + w[1] * w[1] + 1e-12)
    z = w[2]
    q1 = jnp.arctan2(w[1], w[0])
    l2 = r * r + z * z
    a, b = _UPPER_ARM, _FOREARM
    c4 = jnp.clip((l2 - a * a - b * b) / (2.0 * a * b), -1.0, 1.0)
    elbow = jnp.arccos(c4)
    l = jnp.sqrt(l2)
    alpha = jnp.arccos(jnp.clip((l2 + a * a - b * b) / (2.0 * a * l), -1.0, 1.0))
    phi = jnp.arctan2(r, z)  # angle of shoulder->wrist from vertical
    q2 = phi - alpha
    q4 = -elbow
    q6 = jnp.pi - q2 + q4
    zero = jnp.zeros_like(q1)
    return jnp.stack([q1, q2, zero, q4, zero, q6, -q1]).astype(jnp.float32)


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
    ~4x end-to-end on ``control_step`` at batch 4096, numerically equivalent
    to ``jax.scipy.linalg.solve(assume_a="pos")`` up to float32 round-off
    (~4e-5 relative: reciprocal-multiply vs divide, different reduction
    order).

    Unbatched only (rely on vmap for batching, as the IK callsites do).
    """
    assert A.ndim == 2 and b.ndim == 1, "spd_solve is unbatched; use vmap"
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


# Null-space IK parameters from the reference arm (kuka.py:33-41): joint
# limits and rest poses used when use_null_space is on (enabled by
# Kuka2Button, kuka_2button_gym_env.py:79). The reference values come from
# PyBullet's kuka example and use that model's joint-4 sign convention —
# they contradict the reference's OWN rest pose (joint_positions[3] =
# -1.289 vs ll[3] = +0.19, kuka.py:34,65), which PyBullet tolerates because
# its null-space solve treats them softly. Our joint-4 axis matches the SDF
# rest pose, so we map limits/rest by flipping joint 4 (and bias joint 6
# toward the down-orientation working posture).
NULL_LL = np.array([-0.967, -2.0, -2.96, -2.29, -2.96, -2.09, -3.05], np.float32)
NULL_UL = np.array([0.967, 2.0, 2.96, -0.19, 2.96, 2.09, 3.05], np.float32)
NULL_RP = np.array(
    [0.0, 0.0, 0.0, -0.5 * np.pi, 0.0, np.pi * 0.5 * 0.66, 0.0], np.float32
)


def dls_ik(
    q: jax.Array,
    target_pos: jax.Array,
    n_iters: int = 3,
    damping: float = 0.1,
    null_space: bool = False,
    null_gain: float = 0.1,
) -> jax.Array:
    """Damped-least-squares IK toward (target_pos, down orientation), warm
    started from q — the reference calls PyBullet IK once per control step
    from the current configuration (kuka.py:153-156).

    With ``null_space=True``, a secondary objective pulls the redundant DOF
    toward the reference rest poses through the Jacobian null-space projector
    and the result is clipped to the reference joint limits, matching
    PyBullet's null-space IK mode (kuka.py:34-43,145-152)."""
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
        if null_space:
            # dq_null = (I - J+ J) k (rest - q): move toward the rest pose
            # without disturbing the task-space error.
            JpJ = J.T @ jax.vmap(lambda col: spd_solve(JJt, col), in_axes=1, out_axes=1)(J)
            dq_rest = null_gain * (jnp.asarray(NULL_RP) - q)
            dq = dq + dq_rest - JpJ @ dq_rest
        q = q + dq
        if null_space:
            q = jnp.clip(q, jnp.asarray(NULL_LL), jnp.asarray(NULL_UL))
    return q


def servo_step(q: jax.Array, q_target: jax.Array) -> jax.Array:
    """One physics step of PyBullet-style position control: proportional
    approach capped at maxVelocity * dt per joint."""
    err = q_target - q
    dq = jnp.clip(POSITION_GAIN * err, -DQ_MAX, DQ_MAX)
    return q + dq


def ik_down_limited(target_pos: jax.Array) -> jax.Array:
    """Null-space-mode IK: the closed-form down solution clamped to the
    reference joint limits. PyBullet's null-space IK observable behavior in
    the 2-button env is exactly this — the flange reaches the target with
    down orientation while joints stay inside ll/ul (kuka.py:145-152); the
    closed-form branch (elbow negative in our convention) is the one inside
    the mapped limits."""
    return jnp.clip(ik_down(target_pos), jnp.asarray(NULL_LL), jnp.asarray(NULL_UL))


# Task-space tracking step: PyBullet re-solves IK from the current
# configuration every physics step (kuka.py:153-156), so the arm follows a
# quasi-straight task-space path toward the target instead of interpolating
# in joint space (which bows the tip ~10 cm sideways on a long descent).
# 2 mm/step matches the effective tip speed the per-joint velocity cap
# allows (maxVelocity=0.35 rad/s at 240 Hz over ~0.7 m levers); larger steps
# make the servo caps bind, which re-introduces the joint-interpolation bow.
TASK_STEP = 0.002


def control_step(q: jax.Array, ee_target: jax.Array, null_space: bool = False,
                 p_cur: jax.Array = None) -> jax.Array:
    """IK + servo: one full applyAction+stepSimulation of the reference.

    The commanded configuration is the closed-form down-orientation IK of an
    intermediate target TASK_STEP ahead of the *current* flange position, so
    the tip tracks the straight task-space path like PyBullet's
    incrementally re-solved IK; the velocity-capped servo preserves the
    reference arm's position-control lag.

    ``p_cur`` may pass the caller's cached flange position fk(q)[3] (the env
    step already has it from the contact-rollback FK) to skip recomputing
    the chain — bit-identical, it is the same function of the same q."""
    if p_cur is None:
        p_cur = fk(q)[3]
    delta = ee_target - p_cur
    dist = jnp.linalg.norm(delta) + 1e-9
    t_int = p_cur + delta * (jnp.minimum(dist, TASK_STEP) / dist)
    q_ik = ik_down_limited(t_int) if null_space else ik_down(t_int)
    return servo_step(q, q_ik)


def settled_rest_q(n_steps: int = 500) -> np.ndarray:
    """The deterministic arm configuration after the reference's 500
    settle steps toward the rest end-effector target
    (kuka_button_gym_env.py:242-247). Identical for every episode, so it is
    computed once on the host CPU and baked in as a constant."""
    # local_devices, not devices: in a multi-process runtime jax.devices()
    # is the GLOBAL list, and picking [0] from another process would pin
    # the constant to a non-addressable device (jit then refuses to close
    # over it).
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        target = jnp.asarray(REST_EE_TARGET)

        def body(_, q):
            return control_step(q, target)

        q = jax.jit(
            lambda q0: jax.lax.fori_loop(0, n_steps, body, q0)
        )(jnp.asarray(REST_Q))
    return np.asarray(q)
