"""Batched analytic ray-traced renderer for 3D scenes (Kuka table-top).

Replaces PyBullet's TinyRenderer for the Kuka cameras
(kuka_button_gym_env.py:370-420): per-pixel closed-form ray intersections
against a small set of primitives (planes, boxes, vertical cylinders,
capsules for the arm links) with flat Lambertian shading. All math is
elementwise over the [H, W] pixel grid — vmap adds the env batch axis and XLA
fuses the whole scene into one kernel. Camera rays are precomputed host-side
(static per config).
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from srl_tpu.ops.camera import pixel_rays

BIG = 1e9

# Scene colors.
FLOOR_COLOR = np.array([0.85, 0.85, 0.85], np.float32)
TABLE_COLOR = np.array([0.55, 0.38, 0.22], np.float32)
BUTTON_GREEN = np.array([0.0, 0.85, 0.0], np.float32)
BUTTON_CAP_YELLOW = np.array([0.9, 0.9, 0.0], np.float32)  # simple_button.urdf
BUTTON_CAP_TEAL = np.array([0.2, 0.6, 0.38], np.float32)  # simple_button_2.urdf
ARM_ORANGE = np.array([0.95, 0.55, 0.05], np.float32)
ARM_SILVER = np.array([0.75, 0.75, 0.78], np.float32)
BALL_COLOR = np.array([0.9, 0.9, 0.9], np.float32)
DISTRACTOR_COLOR = np.array([0.85, 0.75, 0.1], np.float32)
SKY_COLOR = np.array([0.7, 0.78, 0.9], np.float32)
LIGHT_DIR = np.array([0.4, 0.25, 0.88], np.float32)
LIGHT_DIR /= np.linalg.norm(LIGHT_DIR)

# Kuka scene geometry (kuka_button_gym_env.py reset): floor plane at z=-1,
# table top at Z_TABLE=-0.2 with the tabletop box below it.
FLOOR_Z = -1.0
TABLE_CENTER = np.array([0.5, 0.0, -0.51], np.float32)
TABLE_HALF = np.array([0.75, 0.5, 0.31], np.float32)
ARM_LINK_RADIUS = 0.055


def _hit_plane(eye, dirs, z):
    dz = dirs[..., 2]
    t = (z - eye[2]) / jnp.where(jnp.abs(dz) < 1e-8, 1e-8, dz)
    t = jnp.where(t > 1e-4, t, BIG)
    normal = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    return t, jnp.broadcast_to(normal, dirs.shape)


def _hit_aabb(eye, dirs, center, half):
    """Slab-method AABB intersection; returns (t, normal)."""
    inv = 1.0 / jnp.where(jnp.abs(dirs) < 1e-8, 1e-8, dirs)
    lo = (center - half - eye) * inv
    hi = (center + half - eye) * inv
    tmin = jnp.minimum(lo, hi)
    tmax = jnp.maximum(lo, hi)
    t_near = jnp.max(tmin, axis=-1)
    t_far = jnp.min(tmax, axis=-1)
    hit = (t_near <= t_far) & (t_far > 1e-4)
    t = jnp.where(hit & (t_near > 1e-4), t_near, BIG)
    # Normal: the axis achieving t_near, signed by ray direction.
    is_axis = (tmin == t_near[..., None]).astype(jnp.float32)
    normal = -jnp.sign(dirs) * is_axis
    norm = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / jnp.where(norm < 1e-8, 1.0, norm)
    return t, normal


def _hit_vcylinder(eye, dirs, center_xy, radius, z_lo, z_hi):
    """Vertical capped cylinder."""
    ox = eye[0] - center_xy[0]
    oy = eye[1] - center_xy[1]
    dx = dirs[..., 0]
    dy = dirs[..., 1]
    a = dx * dx + dy * dy
    b = 2.0 * (ox * dx + oy * dy)
    c = ox * ox + oy * oy - radius * radius
    disc = b * b - 4 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    a_safe = jnp.where(jnp.abs(a) < 1e-8, 1e-8, a)
    t_side = (-b - sq) / (2 * a_safe)
    z_at = eye[2] + t_side * dirs[..., 2]
    side_ok = (disc > 0) & (t_side > 1e-4) & (z_at >= z_lo) & (z_at <= z_hi)
    t_side = jnp.where(side_ok, t_side, BIG)
    side_n = jnp.stack(
        [
            (ox + t_side * dx) / radius,
            (oy + t_side * dy) / radius,
            jnp.zeros_like(t_side),
        ],
        axis=-1,
    )

    # Top cap disk.
    t_cap, cap_n = _hit_plane(eye, dirs, z_hi)
    px = eye[0] + t_cap * dirs[..., 0] - center_xy[0]
    py = eye[1] + t_cap * dirs[..., 1] - center_xy[1]
    cap_ok = (px * px + py * py) <= radius * radius
    t_cap = jnp.where(cap_ok, t_cap, BIG)

    use_cap = t_cap < t_side
    t = jnp.minimum(t_side, t_cap)
    normal = jnp.where(use_cap[..., None], cap_n, side_n)
    return t, normal


def _hit_sphere(eye, dirs, center, radius):
    oc = eye - center
    b = 2.0 * jnp.einsum("...i,i->...", dirs, oc)
    c = jnp.dot(oc, oc) - radius * radius
    disc = b * b - 4 * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = (-b - sq) / 2.0
    ok = (disc > 0) & (t > 1e-4)
    t = jnp.where(ok, t, BIG)
    p = eye + t[..., None] * dirs
    normal = (p - center) / radius
    return t, normal


def _hit_capsule(eye, dirs, a, b, radius):
    """Capsule from a to b: infinite-cylinder quadratic clamped to the
    segment, plus sphere caps."""
    ba = b - a
    ba_len2 = jnp.dot(ba, ba) + 1e-12
    oa = eye - a
    d_dot_ba = jnp.einsum("...i,i->...", dirs, ba)
    oa_dot_ba = jnp.dot(oa, ba)
    # Components orthogonal to the axis.
    aa = 1.0 - d_dot_ba * d_dot_ba / ba_len2
    bb = 2.0 * (jnp.einsum("...i,i->...", dirs, oa) - d_dot_ba * oa_dot_ba / ba_len2)
    cc = jnp.dot(oa, oa) - oa_dot_ba * oa_dot_ba / ba_len2 - radius * radius
    disc = bb * bb - 4 * aa * cc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    aa_safe = jnp.where(jnp.abs(aa) < 1e-8, 1e-8, aa)
    t_cyl = (-bb - sq) / (2 * aa_safe)
    s = (oa_dot_ba + t_cyl * d_dot_ba) / ba_len2  # axis parameter at hit
    cyl_ok = (disc > 0) & (t_cyl > 1e-4) & (s >= 0.0) & (s <= 1.0)
    t_cyl = jnp.where(cyl_ok, t_cyl, BIG)
    p = eye + t_cyl[..., None] * dirs
    axis_pt = a + s[..., None] * ba
    n_cyl = (p - axis_pt) / radius

    t_s1, n_s1 = _hit_sphere(eye, dirs, a, radius)
    t_s2, n_s2 = _hit_sphere(eye, dirs, b, radius)
    t = jnp.minimum(t_cyl, jnp.minimum(t_s1, t_s2))
    normal = jnp.where(
        (t == t_cyl)[..., None], n_cyl, jnp.where((t == t_s1)[..., None], n_s1, n_s2)
    )
    return t, normal


def _shade(t, normal, color, eye, dirs):
    lam = jnp.clip(jnp.einsum("...i,i->...", normal, jnp.asarray(LIGHT_DIR)), 0.0, 1.0)
    shade = 0.45 + 0.55 * lam
    return shade[..., None] * jnp.asarray(color)[None, None]


def _fold(prims, eye, dirs, background):
    """Min-depth composite of (t, normal, color) primitive tuples."""
    t_best = jnp.full(dirs.shape[:-1], BIG, jnp.float32)
    img = jnp.broadcast_to(jnp.asarray(background)[None, None], dirs.shape)
    for t, normal, color in prims:
        shaded = _shade(t, normal, color, eye, dirs)
        closer = t < t_best
        img = jnp.where(closer[..., None], shaded, img)
        t_best = jnp.minimum(t, t_best)
    return img


# Single source of truth for the Kuka cameras; the Pallas tile-cull basis
# (pallas_render3d._camera_planes) derives from these same tuples so the two
# renderers can never silently diverge.
# "main": kuka_button_gym_env.py:94-102,386-395; "second": multi_view :401-409.
KUKA_CAMERAS = {
    "main": ((0.316, -0.2, -0.1), 1.1, 145.0, -36.0, 0.0, 60.0),
    "second": ((0.316, 0.316, -0.105), 1.05, 32.0, -13.0, 0.0, 60.0),
}


@lru_cache(maxsize=8)
def _kuka_camera(which: str, height: int, width: int):
    target, dist, yaw, pitch, roll, fov = KUKA_CAMERAS[
        "main" if which == "main" else "second"
    ]
    return pixel_rays(target, dist, yaw, pitch, roll, fov, width, height)


def upsample_nearest(img: jax.Array, s: int) -> jax.Array:
    """[..., H, W, C] -> [..., H*s, W*s, C] nearest-neighbour upsample via
    broadcast+reshape (no gathers — a plain copy on TPU)."""
    if s == 1:
        return img
    *lead, h, w, c = img.shape
    out = jnp.broadcast_to(
        img[..., :, None, :, None, :], (*lead, h, s, w, s, c)
    )
    return out.reshape(*lead, h * s, w * s, c)


def _render_kuka_view(env, state, which: str) -> jax.Array:
    from srl_tpu.envs.kuka import RENDER_HEIGHT, RENDER_WIDTH, Z_TABLE
    from srl_tpu.ops import kinematics as kin

    # Coarse-trace factor (same trick as the CarRacing coarse field): rays
    # are traced at H/s x W/s and nearest-upsampled to the observation
    # resolution. s=1 is the exact full-resolution path.
    scale = int(getattr(env, "render_scale", 1))
    eye_np, dirs_np = _kuka_camera(
        which, RENDER_HEIGHT // scale, RENDER_WIDTH // scale
    )
    eye = jnp.asarray(eye_np)
    dirs = jnp.asarray(dirs_np)

    prims = []
    prims.append(_hit_plane(eye, dirs, FLOOR_Z) + (FLOOR_COLOR,))
    prims.append(
        _hit_aabb(eye, dirs, jnp.asarray(TABLE_CENTER), jnp.asarray(TABLE_HALF))
        + (TABLE_COLOR,)
    )

    # Buttons: real simple_button.urdf geometry — green base cylinder
    # (r=0.10, 3 cm incl. base plate) topped by the pressable cap (r=0.09,
    # raised to 4.5 cm). Cap colors: yellow (simple_button.urdf) / greenish
    # (simple_button_2.urdf).
    from srl_tpu.envs.kuka import (
        BUTTON_BASE_RADIUS,
        BUTTON_BASE_TOP,
        BUTTON_CAP_RADIUS,
        BUTTON_CAP_TOP,
    )

    cap_colors = [BUTTON_CAP_YELLOW, BUTTON_CAP_TEAL]
    for i in range(env.n_buttons):
        xy = state.buttons[i, :2]
        prims.append(
            _hit_vcylinder(eye, dirs, xy, BUTTON_BASE_RADIUS, Z_TABLE, BUTTON_BASE_TOP)
            + (BUTTON_GREEN,)
        )
        prims.append(
            _hit_vcylinder(eye, dirs, xy, BUTTON_CAP_RADIUS, BUTTON_BASE_TOP,
                           BUTTON_CAP_TOP)
            + (cap_colors[min(i, 1)],)
        )

    # Arm: capsules along the kinematic chain + gripper segment.
    joint_pos, _, R, p_flange, p_tip = kin.fk(state.q)
    base = jnp.asarray(kin.BASE_POS)
    pts = jnp.concatenate([base[None], joint_pos, p_flange[None], p_tip[None]], axis=0)
    n_seg = pts.shape[0] - 1
    for i in range(n_seg):
        color = ARM_ORANGE if i % 2 == 0 else ARM_SILVER
        radius = ARM_LINK_RADIUS if i < n_seg - 1 else 0.035
        prims.append(_hit_capsule(eye, dirs, pts[i], pts[i + 1], radius) + (color,))

    # Distractors + ball (rand-button variant).
    if env.rand_objects:
        for i in range(state.distractors.shape[0]):
            prims.append(
                _hit_sphere(eye, dirs, state.distractors[i], 0.05)  # = kuka.DISTRACTOR_RADIUS (render matches the contact model)
                + (DISTRACTOR_COLOR,)
            )
        prims.append(_hit_sphere(eye, dirs, state.ball[:3], 0.03) + (BALL_COLOR,))

    img = _fold(prims, eye, dirs, SKY_COLOR)
    img = jnp.clip(img * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
    if getattr(env, "obs_coarse_scale", 1) > 1:
        # Coarse-obs mode: the traced resolution IS the observation; the
        # policy folds the 2x upsample into conv1 (models/policies.py).
        return img
    return upsample_nearest(img, scale)


def render_kuka(env, state) -> jax.Array:
    """uint8 [H, W, 3] (or [H, W, 6] with multi_view) Kuka scene render."""
    img = _render_kuka_view(env, state, "main")
    if env.multi_view:
        img2 = _render_kuka_view(env, state, "aux")
        return jnp.concatenate([img, img2], axis=-1)
    return img
