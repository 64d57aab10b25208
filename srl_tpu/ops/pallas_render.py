"""Pallas TPU kernel for the MobileRobot sprite compositor.

The raw_pixels hot path composites dynamic sprites (target disks, robot box,
wheels) over a precomputed static background for thousands of envs per step.
This kernel tiles the image over (env, row-block) grid programs: the
background block and the pixel->world grid block stream HBM->VMEM once per
tile, the per-env scene parameters ride in a small VMEM vector, and the
whole composite runs on the VPU in one fused pass with explicit blocking —
no intermediate [N, H, W, 3] temporaries between the paint steps.

The XLA lowering of the same math (ops/renderer.py) is the reference
implementation; `render_mobile_robot_pallas` is bit-compatible with it (same
masks, same colors) and validated against it in tests. Env batching comes
from the kernel grid, not vmap.

Measured on TPU v5e (batch 64, 224x224): the XLA-fused path runs ~35k
frames/s vs ~2k frames/s for this kernel — the per-pixel work is too thin
for a (env x row-block) program grid, so per-program overhead dominates and
XLA's single fused elementwise kernel wins. The default render path
therefore stays on XLA; this kernel is kept as the validated tile-level
scaffold for heavier per-pixel scenes (the ray-traced Kuka renderer is the
candidate), where per-pixel primitive loops amortize the grid overhead.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from srl_tpu.ops import renderer as xr

BH = 8  # row-block height per grid program


def _scene_params(env, states) -> jax.Array:
    """[N, 8] scene vector: robot xy, target0 xy, target1 xy, flags."""
    n = states.robot_pos.shape[0]
    t0 = states.targets[:, 0]
    t1 = states.targets[:, 1] if env.n_targets > 1 else jnp.zeros_like(t0)
    flags = jnp.full((n, 1), float(env.n_targets > 1))
    line = jnp.full((n, 1), float(env.line_target))
    return jnp.concatenate(
        [states.robot_pos, t0, t1, flags, line], axis=1
    ).astype(jnp.float32)


def _kernel(scene_ref, grid_ref, bg_ref, out_ref):
    scene = scene_ref[pl.program_id(1)]  # [8] row of the full scene table
    x = grid_ref[0, :, :, 0]  # [BH, W]
    y = grid_ref[0, :, :, 1]
    img = bg_ref[0]  # [BH, W, 3]

    rx, ry = scene[0], scene[1]
    t0x, t0y = scene[2], scene[3]
    t1x, t1y = scene[4], scene[5]
    two_targets = scene[6] > 0.5
    line_target = scene[7] > 0.5

    def paint(img, mask, color):
        # Colors inlined as scalar immediates (Pallas kernels cannot capture
        # array constants).
        r, g, b = (float(color[0]), float(color[1]), float(color[2]))
        return jnp.stack(
            [
                jnp.where(mask, r, img[:, :, 0]),
                jnp.where(mask, g, img[:, :, 1]),
                jnp.where(mask, b, img[:, :, 2]),
            ],
            axis=-1,
        )

    # Targets.
    tr2 = xr.TARGET_RADIUS * xr.TARGET_RADIUS
    d0 = jnp.square(x - t0x) + jnp.square(y - t0y)
    line_mask = (jnp.abs(x - t0x) <= xr.LINE_TARGET_HALF_W) & (
        jnp.abs(y - 2.0) <= 2.0
    )
    disk0 = d0 <= tr2
    # Boolean algebra instead of select-on-i1 (Mosaic can't legalize it).
    yellow_mask = (line_mask & line_target) | (disk0 & ~line_target)
    img = paint(img, yellow_mask, xr.TARGET_YELLOW)
    d1 = jnp.square(x - t1x) + jnp.square(y - t1y)
    img = paint(img, (d1 <= tr2) & two_targets & ~line_target, xr.TARGET_RED)

    # Robot body + wheels.
    body = (jnp.abs(x - rx) <= xr.ROBOT_HALF_L) & (
        jnp.abs(y - ry) <= xr.ROBOT_HALF_W
    )
    img = paint(img, body, xr.ROBOT_BODY)
    for sx in (-0.22, 0.22):
        for sy in (-1.0, 1.0):
            wheel = (jnp.abs(x - (rx + sx)) <= 0.08) & (
                jnp.abs(y - (ry + sy * xr.ROBOT_HALF_W)) <= 0.03
            )
            img = paint(img, wheel, xr.ROBOT_WHEEL)

    out_ref[0] = img


@functools.partial(jax.jit, static_argnums=0)
def _render_batch(env_key, scene, grid, bg):
    """scene [N,8], grid [H,W,2], bg [H,W,3] -> [N,H,W,3] float."""
    n = scene.shape[0]
    h, w, _ = bg.shape
    n_blocks = h // BH

    out = pl.pallas_call(
        _kernel,
        # Env axis innermost: the grid/background blocks' indices only
        # depend on the outer row-block axis, so Pallas keeps them resident
        # in VMEM across all envs instead of re-streaming them.
        grid=(n_blocks, n),
        in_specs=[
            # Whole scene table resident in VMEM; rows picked by program id.
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BH, w, 2), lambda j, i: (0, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BH, w, 3), lambda j, i: (0, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BH, w, 3), lambda j, i: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, 3), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(scene, grid[None], bg[None])
    return out


def render_mobile_robot_pallas(env, states) -> jax.Array:
    """Batched [N, H, W, 3] uint8 render via the Pallas tile kernel.

    `states` must be a batched (vmapped-layout) MobileRobotState.
    """
    from srl_tpu.envs.mobile_robot import RENDER_HEIGHT, RENDER_WIDTH

    h, w = getattr(env, "render_shape", (RENDER_HEIGHT, RENDER_WIDTH))
    grid_np, bg_np = xr._mobile_robot_static(env.dim, h, w)
    scene = _scene_params(env, states)
    out = _render_batch(
        env.dim, scene, jnp.asarray(grid_np), jnp.asarray(bg_np)
    )
    return jnp.clip(out * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
