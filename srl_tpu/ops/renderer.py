"""Batched on-device rasterizer for raw_pixels observations.

Replaces PyBullet's TinyRenderer camera (``p.getCameraImage``,
mobile_robot_env.py:307-309) with an analytic per-pixel shader: the static
scene background (ground plane + walls) is precomputed on the host once per
env configuration, and only the dynamic sprites (robot box, target cylinders)
are composited per env per step — a handful of fused elementwise ops over a
[H, W] grid, vmapped over thousands of envs. No triangles, no z-buffer: the
reference scenes are top-down views of known primitives.

Scene constants come from the reference URDFs: walls are 4 x 0.1 x 0.1 boxes
(urdf/wall.urdf) colored red/black/green/blue (mobile_robot_env.py:186-202),
the target is a yellow button cylinder scaled 2x (urdf/cylinder.urdf), the
line target a 4 x 0.5 yellow band (urdf/wall_target.urdf,
mobile_robot_line_target_env.py:62-65), and the robot is the racecar URDF
(approximated by its 0.65 x 0.2 chassis footprint, mobile_robot_env.py:27-28).
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

# Colors (linear 0..1, shaded flat — the top-down sun of TinyRenderer).
GROUND_LIGHT = np.array([0.93, 0.93, 0.93], np.float32)
GROUND_DARK = np.array([0.78, 0.78, 0.78], np.float32)
WALL_COLORS = {
    "left": np.array([0.8, 0.0, 0.0], np.float32),  # red
    "bottom": np.array([0.05, 0.05, 0.05], np.float32),  # black (default)
    "right": np.array([0.0, 0.8, 0.0], np.float32),  # green
    "top": np.array([0.0, 0.0, 0.8], np.float32),  # blue
}
TARGET_YELLOW = np.array([0.95, 0.95, 0.05], np.float32)
TARGET_RED = np.array([0.8, 0.05, 0.05], np.float32)
ROBOT_BODY = np.array([0.15, 0.15, 0.35], np.float32)
ROBOT_WHEEL = np.array([0.05, 0.05, 0.05], np.float32)

TARGET_RADIUS = 0.25  # button.dae base scaled 2x (urdf/cylinder.urdf)
WALL_HALF_W = 0.05  # wall.urdf box 4 x 0.1
LINE_TARGET_HALF_W = 0.25  # wall_target.urdf box 4 x 0.5
ROBOT_HALF_L = 0.325  # ROBOT_LENGTH / 2 (x)
ROBOT_HALF_W = 0.10  # ROBOT_WIDTH / 2 (y)


@lru_cache(maxsize=16)
def _mobile_robot_coords(dim: int, height: int, width: int):
    """Separable pixel->ground coordinates (xs_row [W], ys_col [H], f32).

    The top-down camera (pitch -90, directly above the target,
    mobile_robot_env.py:76-84,297-306) maps pixels to the ground plane
    affinely and *separably*: column u determines world x, row v world y.
    Algebra (from ops/camera.pixel_rays + the z=0 intersection — the ray
    normalization cancels exactly):
        x(u) = tx + dist * tan(fov/2) * aspect * ndc_x(u)
        y(v) = ty + dist * tan(fov/2) * ndc_y(v)
    Computing this directly in f64 (instead of the general normalize+divide
    ray path, which adds f32 rounding noise of ~1 ulp that breaks exact
    separability) makes the two 1-D vectors the canonical coordinate
    definition; the full [H,W,2] grid is their outer product. This is what
    lets box/wheel masks be outer products of 1-D masks and the disk mask a
    broadcast add — the per-pixel cost that dominates the sprite pass.
    """
    target = (2.0, 2.0, 0.0) if dim == 2 else (2.0, 0.0, 0.0)
    tan_half = np.tan(np.radians(60.0) / 2.0)
    aspect = width / height
    ndc_x = (np.arange(width) + 0.5) / width * 2.0 - 1.0
    ndc_y = 1.0 - (np.arange(height) + 0.5) / height * 2.0
    # yaw 90: image x axis = world x (right = (1,0,0)), image y = world y.
    xs_row = (target[0] + 4.4 * tan_half * aspect * ndc_x).astype(np.float32)
    ys_col = (target[1] + 4.4 * tan_half * ndc_y).astype(np.float32)
    return xs_row, ys_col


@lru_cache(maxsize=16)
def _mobile_robot_static(dim: int, height: int, width: int):
    """(grid [H,W,2], background [H,W,3]) numpy constants for a config.

    The grid is the outer product of the separable coordinate vectors
    (`_mobile_robot_coords`), so every consumer — the XLA sprite pass, the
    Pallas tile kernel (ops/pallas_render.py), and tests — sees identical
    per-pixel world coordinates."""
    xs_row, ys_col = _mobile_robot_coords(dim, height, width)
    xs = np.broadcast_to(xs_row[None, :], (height, width))
    ys = np.broadcast_to(ys_col[:, None], (height, width))
    grid = np.stack([xs, ys], axis=-1).astype(np.float32)

    # Checkerboard ground (plane.urdf's checker texture).
    checker = ((np.floor(xs / 0.5) + np.floor(ys / 0.5)) % 2).astype(np.float32)
    bg = (
        checker[..., None] * GROUND_DARK[None, None]
        + (1 - checker[..., None]) * GROUND_LIGHT[None, None]
    )

    def paint_box(img, cx, cy, hx, hy, color):
        mask = (np.abs(xs - cx) <= hx) & (np.abs(ys - cy) <= hy)
        return np.where(mask[..., None], color[None, None], img)

    # Walls (mobile_robot_env.py:189-204; 1D has only the left wall,
    # mobile_robot_1D_env.py:84-88).
    bg = paint_box(bg, 2.0, 0.0, 2.0, WALL_HALF_W, WALL_COLORS["left"])
    if dim == 2:
        bg = paint_box(bg, 4.0, 2.0, WALL_HALF_W, 2.0, WALL_COLORS["bottom"])
        bg = paint_box(bg, 2.0, 4.0, 2.0, WALL_HALF_W, WALL_COLORS["right"])
        bg = paint_box(bg, 0.0, 2.0, WALL_HALF_W, 2.0, WALL_COLORS["top"])

    return grid, bg.astype(np.float32)


def _color_u8(c) -> np.ndarray:
    """Quantize a linear color exactly as the legacy float path's final
    ``clip(img*255+0.5)`` did, so uint8 compositing is bit-identical."""
    return np.clip(np.asarray(c, np.float32) * 255.0 + 0.5, 0, 255).astype(np.uint8)


def _pack_color(c) -> np.uint32:
    """RGB -> one little-endian u32 lane (R in byte 0)."""
    cu = _color_u8(c)
    return np.uint32(int(cu[0]) | (int(cu[1]) << 8) | (int(cu[2]) << 16))


@lru_cache(maxsize=16)
def _mobile_robot_static_packed(dim: int, height: int, width: int):
    """(xs_row f32 [W], ys_col f32 [H], background u32-packed [H,W]).

    The background is pre-quantized to uint8 and packed RGB-into-u32 so the
    per-step composite holds one lane per pixel instead of three."""
    xs_row, ys_col = _mobile_robot_coords(dim, height, width)
    _, bg = _mobile_robot_static(dim, height, width)
    bu = _color_u8(bg)
    packed = (bu[..., 0].astype(np.uint32)
              | (bu[..., 1].astype(np.uint32) << 8)
              | (bu[..., 2].astype(np.uint32) << 16))
    return xs_row, ys_col, packed


def render_mobile_robot(env, state) -> jax.Array:
    """uint8 [H, W, 3] image for one env state (vmap over the batch).

    Composites packed-u32 pixels: RGB lives in one u32 lane, so each sprite
    paint is ONE select per pixel instead of three, and the final unpack is
    a free bitcast (u32 -> u8[4], keep 3). Masks come from the separable
    coordinate vectors (`_mobile_robot_coords`): box sprites are outer
    products of 1-D interval masks, the target disk is a broadcast add of
    1-D squared distances — per-pixel work is ~3 mask ops + 3 selects.

    Measured on TPU v5e (224x224, batch 256, render isolated in a scan):
    packed-u32+bitcast 902k f/s vs 668k (u8-storage/f32-compute selects),
    619k (all-f32 legacy), 713k (separable masks, per-channel selects) —
    all variants bit-identical. Two negative results, for the record:
    render-at-112 + jnp.repeat upsample is *slower* (590k; the repeat
    materializes gathers), and a pure-uint8 per-channel select chain
    triggers pathological XLA compile times inside lax.scan (>500 s).
    Output bits match the legacy float path exactly: colors/background are
    pre-quantized with the same clip(c*255+0.5) rounding."""
    from srl_tpu.envs.mobile_robot import RENDER_HEIGHT, RENDER_WIDTH

    h, w = getattr(env, "render_shape", (RENDER_HEIGHT, RENDER_WIDTH))
    xs_np, ys_np, bg_np = _mobile_robot_static_packed(env.dim, h, w)
    xr = jnp.asarray(xs_np)  # [W]
    yc = jnp.asarray(ys_np)  # [H]
    img = jnp.asarray(bg_np)  # [H, W] u32

    def paint(img, mask, color):
        return jnp.where(mask, _pack_color(color), img)

    def box_mask(center, hx, hy):
        mx = jnp.abs(xr - center[0]) <= hx
        my = jnp.abs(yc - center[1]) <= hy
        return my[:, None] & mx[None, :]

    def disk_mask(center, radius):
        dx2 = jnp.square(xr - center[0])
        dy2 = jnp.square(yc - center[1])
        return (dy2[:, None] + dx2[None, :]) <= radius * radius

    # Targets.
    if env.line_target:
        # Yellow wall band spanning y at the target x
        # (mobile_robot_line_target_env.py:62-65).
        tx = state.targets[0, 0]
        img = paint(img, box_mask((tx, 2.0), LINE_TARGET_HALF_W, 2.0), TARGET_YELLOW)
    else:
        img = paint(img, disk_mask(state.targets[0], TARGET_RADIUS), TARGET_YELLOW)
        if env.n_targets > 1:
            # Second target rendered red (mobile_robot_2target_env.py:70-71).
            img = paint(img, disk_mask(state.targets[1], TARGET_RADIUS), TARGET_RED)

    # Robot: racecar chassis + four wheel pads. The four pads sit at
    # (+-0.22, +-ROBOT_HALF_W) relative to the chassis, so one folded
    # |.|-symmetric mask covers all four in a single select.
    rp = state.robot_pos
    img = paint(img, box_mask(rp, ROBOT_HALF_L, ROBOT_HALF_W), ROBOT_BODY)
    wx = jnp.abs(jnp.abs(xr - rp[0]) - 0.22) <= 0.08
    wy = jnp.abs(jnp.abs(yc - rp[1]) - ROBOT_HALF_W) <= 0.03
    img = paint(img, wy[:, None] & wx[None, :], ROBOT_WHEEL)

    # Unpack: u32 -> little-endian u8[4], drop the unused high byte.
    out = jax.lax.bitcast_convert_type(img, jnp.uint8)[..., :3]
    if env.fpv:
        # First-person second camera (mobile_robot_env.py:315-332).
        out = jnp.concatenate([out, render_mobile_robot_fpv(env, state)], axis=-1)
    return out


@lru_cache(maxsize=4)
def _fpv_rays(height: int, width: int):
    """(forward, dirs) for the first-person camera. The FPV camera follows
    the robot, so only the (static) ray directions are precomputed; the eye
    is derived from the robot position inside the kernel. Parameters from
    mobile_robot_env.py:317-327: yaw 90 (the env's _cam_yaw), pitch -17,
    roll 0, fov 90, distance 0.3 behind the target point."""
    from srl_tpu.ops.camera import camera_basis, pixel_rays

    forward, _, _ = camera_basis(90.0, -17.0, 0.0)
    _, dirs = pixel_rays((0.0, 0.0, 0.0), 0.3, 90.0, -17.0, 0.0, 90.0, width, height)
    return forward.astype(np.float32), dirs


def render_mobile_robot_fpv(env, state) -> jax.Array:
    """uint8 [H, W, 3] first-person view from the robot (fpv=True mode).

    Ray-traced with the 3D primitive kernels: checkerboard ground plane,
    wall boxes, target cylinders/band and the robot chassis, shaded flat.
    """
    from srl_tpu.envs.mobile_robot import RENDER_HEIGHT, RENDER_WIDTH
    from srl_tpu.ops import renderer3d as r3

    h, w = getattr(env, "render_shape", (RENDER_HEIGHT, RENDER_WIDTH))
    fwd_np, dirs_np = _fpv_rays(h, w)
    dirs = jnp.asarray(dirs_np)
    rp = state.robot_pos
    # cameraTargetPosition=(x-0.25, y, 0.15), distance 0.3
    # (mobile_robot_env.py:318-321); eye = target - distance * forward.
    target = jnp.stack([rp[0] - 0.25, rp[1], jnp.float32(0.15)])
    eye = target - 0.3 * jnp.asarray(fwd_np)

    prims = []  # (t, normal, color [3] or [H, W, 3])

    # Checkerboard ground plane at z=0 (color varies per hit point).
    t_g, n_g = r3._hit_plane(eye, dirs, 0.0)
    gx = eye[0] + t_g * dirs[..., 0]
    gy = eye[1] + t_g * dirs[..., 1]
    checker = ((jnp.floor(gx / 0.5) + jnp.floor(gy / 0.5)) % 2)[..., None]
    ground_col = checker * jnp.asarray(GROUND_DARK) + (1 - checker) * jnp.asarray(
        GROUND_LIGHT
    )
    prims.append((t_g, n_g, ground_col))

    # Walls: 4 x 0.1 x 0.1 boxes at the plate edges (wall.urdf,
    # mobile_robot_env.py:189-204; 1D keeps only the left wall).
    wall_h = jnp.asarray([2.0, WALL_HALF_W, WALL_HALF_W], jnp.float32)
    wall_v = jnp.asarray([WALL_HALF_W, 2.0, WALL_HALF_W], jnp.float32)
    walls = [((2.0, 0.0), wall_h, WALL_COLORS["left"])]
    if env.dim == 2:
        walls += [
            ((4.0, 2.0), wall_v, WALL_COLORS["bottom"]),
            ((2.0, 4.0), wall_h, WALL_COLORS["right"]),
            ((0.0, 2.0), wall_v, WALL_COLORS["top"]),
        ]
    for (cx, cy), half, col in walls:
        center = jnp.asarray([cx, cy, WALL_HALF_W], jnp.float32)
        prims.append(r3._hit_aabb(eye, dirs, center, half) + (jnp.asarray(col),))

    # Targets.
    if env.line_target:
        tx = state.targets[0, 0]
        center = jnp.stack([tx, jnp.float32(2.0), jnp.float32(0.25)])
        half = jnp.asarray([LINE_TARGET_HALF_W, 2.0, 0.25], jnp.float32)
        prims.append(r3._hit_aabb(eye, dirs, center, half) + (jnp.asarray(TARGET_YELLOW),))
    else:
        for i in range(env.n_targets):
            col = TARGET_YELLOW if i == 0 else TARGET_RED
            prims.append(
                r3._hit_vcylinder(
                    eye, dirs, state.targets[i], TARGET_RADIUS, 0.0, 0.1
                )
                + (jnp.asarray(col),)
            )

    # Robot chassis (the camera sits above/behind it, so its hood shows at
    # the frame bottom like the reference's racecar render).
    center = jnp.stack([rp[0], rp[1], jnp.float32(0.05)])
    half = jnp.asarray([ROBOT_HALF_L, ROBOT_HALF_W, 0.05], jnp.float32)
    prims.append(r3._hit_aabb(eye, dirs, center, half) + (jnp.asarray(ROBOT_BODY),))

    # Min-depth composite with flat Lambertian shading (renderer3d._shade,
    # inlined here because the ground color is per-pixel).
    light = jnp.asarray(r3.LIGHT_DIR)
    t_best = jnp.full(dirs.shape[:-1], r3.BIG, jnp.float32)
    img = jnp.broadcast_to(jnp.asarray(r3.SKY_COLOR)[None, None], dirs.shape)
    for t, normal, color in prims:
        lam = jnp.clip(jnp.einsum("...i,i->...", normal, light), 0.0, 1.0)
        shaded = (0.45 + 0.55 * lam)[..., None] * jnp.broadcast_to(color, dirs.shape)
        closer = t < t_best
        img = jnp.where(closer[..., None], shaded, img)
        t_best = jnp.minimum(t, t_best)

    return jnp.clip(img * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
