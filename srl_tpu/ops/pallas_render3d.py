"""Pallas TPU kernel for the ray-traced Kuka renderer.

The XLA lowering of the Kuka scene (ops/renderer3d.py) materializes a
[H, W] depth + [H, W, 3] normal buffer per primitive (~20 primitives:
floor, table, button cylinders, nine arm capsules, distractor spheres),
so the raw_pixels path is HBM-bandwidth-bound. This kernel tiles the image
over an (row-block, env) program grid: the static camera-ray planes stream
HBM->VMEM once per row block and stay resident across the env axis, the
per-env scene parameters (arm capsule endpoints from FK, button/distractor
positions) ride in a small VMEM table, and the entire
intersect-shade-composite loop runs per tile with no HBM intermediates.

Unlike the thin MobileRobot compositor (ops/pallas_render.py, where XLA's
single fused elementwise kernel wins), the per-pixel work here is ~20
quadratic intersections — heavy enough to amortize the program grid.

Scene geometry and shading constants are shared with ops/renderer3d.py so
the two paths render the same scene; parity is asserted in tests.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from srl_tpu.ops import renderer3d as r3

BIG = r3.BIG


def _pick_bh(layout_rows: int) -> int:
    """Row-block size for the packed image layout: whole-image for small
    traces, else the largest multiple-of-8 divisor <= 64 (Mosaic requires
    the sublane block dim to be a multiple of 8 or the full array dim)."""
    if layout_rows <= 64:
        # One whole-image block: the ~21-primitive scalar setup then
        # amortizes over the full image instead of per row-block (measured
        # 124k -> see below at 112x112 trace), and the packed image still
        # fits VMEM comfortably (56x224 f32 x ~10 planes = 500 KB).
        return layout_rows
    # Prefer LARGE blocks (>= ~7k px): the per-program scalar setup is the
    # dominant per-block cost. Mosaic needs the sublane block dim to be a
    # multiple of 8 (or the full array dim).
    for bh in (64, 56, 48, 40, 32, 24, 16, 8):
        if layout_rows % bh == 0:
            return bh
    return layout_rows


def _composite(state, t, nx, ny, nz, color):
    """Deferred min-depth composite into (t_best, nx, ny, nz, r, g, b).

    Shading is applied ONCE at the end of the kernel to the winning
    primitive's (normal, albedo) instead of per primitive — 8 vector ops
    per primitive here vs ~16 for shade-then-composite, on ~20 primitives."""
    t_best, bnx, bny, bnz, r, g, b = state
    closer = t < t_best
    cr, cg, cb = (float(c) for c in color)
    return (
        jnp.minimum(t, t_best),
        jnp.where(closer, nx, bnx),
        jnp.where(closer, ny, bny),
        jnp.where(closer, nz, bnz),
        jnp.where(closer, cr, r),
        jnp.where(closer, cg, g),
        jnp.where(closer, cb, b),
    )


def _hit_floor(eye, dx, dy, dz, z):
    t = (z - eye[2]) / jnp.where(jnp.abs(dz) < 1e-8, 1e-8, dz)
    return jnp.where(t > 1e-4, t, BIG)


def _hit_aabb(eye, dx, dy, dz, center, half):
    t_near = jnp.full_like(dx, -BIG)
    t_far = jnp.full_like(dx, BIG)
    # Track which axis realizes t_near for the normal.
    nx = jnp.zeros_like(dx)
    ny = jnp.zeros_like(dx)
    nz = jnp.zeros_like(dx)
    for axis, d in enumerate((dx, dy, dz)):
        inv = 1.0 / jnp.where(jnp.abs(d) < 1e-8, 1e-8, d)
        lo = (center[axis] - half[axis] - eye[axis]) * inv
        hi = (center[axis] + half[axis] - eye[axis]) * inv
        a_min = jnp.minimum(lo, hi)
        a_max = jnp.maximum(lo, hi)
        take = a_min > t_near
        sgn = -jnp.sign(d)
        nx = jnp.where(take, sgn if axis == 0 else 0.0, nx)
        ny = jnp.where(take, sgn if axis == 1 else 0.0, ny)
        nz = jnp.where(take, sgn if axis == 2 else 0.0, nz)
        t_near = jnp.maximum(t_near, a_min)
        t_far = jnp.minimum(t_far, a_max)
    hit = (t_near <= t_far) & (t_far > 1e-4) & (t_near > 1e-4)
    t = jnp.where(hit, t_near, BIG)
    return t, nx, ny, nz


def _hit_vcylinder(eye, dx, dy, dz, cx, cy, radius, z_lo, z_hi):
    ox = eye[0] - cx
    oy = eye[1] - cy
    a = dx * dx + dy * dy
    bq = 2.0 * (ox * dx + oy * dy)
    c = ox * ox + oy * oy - radius * radius
    disc = bq * bq - 4 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    a_safe = jnp.where(jnp.abs(a) < 1e-8, 1e-8, a)
    t_side = (-bq - sq) / (2 * a_safe)
    z_at = eye[2] + t_side * dz
    side_ok = (disc > 0) & (t_side > 1e-4) & (z_at >= z_lo) & (z_at <= z_hi)
    t_side = jnp.where(side_ok, t_side, BIG)
    snx = (ox + t_side * dx) / radius
    sny = (oy + t_side * dy) / radius

    t_cap = _hit_floor(eye, dx, dy, dz, z_hi)
    px = eye[0] + t_cap * dx - cx
    py = eye[1] + t_cap * dy - cy
    cap_ok = (px * px + py * py) <= radius * radius
    t_cap = jnp.where(cap_ok, t_cap, BIG)

    use_cap = t_cap < t_side
    t = jnp.minimum(t_side, t_cap)
    nx = jnp.where(use_cap, 0.0, snx)
    ny = jnp.where(use_cap, 0.0, sny)
    nz = jnp.where(use_cap, 1.0, jnp.zeros_like(t))
    return t, nx, ny, nz


def _hit_sphere(eye, dx, dy, dz, sx, sy, sz, radius):
    inv_r = 1.0 / radius
    ocx, ocy, ocz = eye[0] - sx, eye[1] - sy, eye[2] - sz
    bq = 2.0 * (dx * ocx + dy * ocy + dz * ocz)
    c = ocx * ocx + ocy * ocy + ocz * ocz - radius * radius
    disc = bq * bq - 4 * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = (-bq - sq) * 0.5
    ok = (disc > 0) & (t > 1e-4)
    t = jnp.where(ok, t, BIG)
    nx = (eye[0] + t * dx - sx) * inv_r
    ny = (eye[1] + t * dy - sy) * inv_r
    nz = (eye[2] + t * dz - sz) * inv_r
    return t, nx, ny, nz


def _hit_cylinder_body(eye, dx, dy, dz, ax, ay, az, bx, by, bz, radius):
    """The cylindrical body of a capsule (axis parameter s clamped to the
    segment); cap spheres are composited separately so adjacent arm links
    share one joint sphere instead of testing two."""
    inv_r = 1.0 / radius
    bax, bay, baz = bx - ax, by - ay, bz - az
    inv_ba_len2 = 1.0 / (bax * bax + bay * bay + baz * baz + 1e-12)
    oax, oay, oaz = eye[0] - ax, eye[1] - ay, eye[2] - az
    d_dot_ba = dx * bax + dy * bay + dz * baz
    oa_dot_ba = oax * bax + oay * bay + oaz * baz
    aa = 1.0 - d_dot_ba * d_dot_ba * inv_ba_len2
    bbq = 2.0 * (
        (dx * oax + dy * oay + dz * oaz) - d_dot_ba * oa_dot_ba * inv_ba_len2
    )
    cc = (
        oax * oax + oay * oay + oaz * oaz
        - oa_dot_ba * oa_dot_ba * inv_ba_len2
        - radius * radius
    )
    disc = bbq * bbq - 4 * aa * cc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    aa_safe = jnp.where(jnp.abs(aa) < 1e-8, 1e-8, aa)
    t_cyl = (-bbq - sq) / (2 * aa_safe)
    s = (oa_dot_ba + t_cyl * d_dot_ba) * inv_ba_len2
    cyl_ok = (disc > 0) & (t_cyl > 1e-4) & (s >= 0.0) & (s <= 1.0)
    t_cyl = jnp.where(cyl_ok, t_cyl, BIG)
    nx = (eye[0] + t_cyl * dx - (ax + s * bax)) * inv_r
    ny = (eye[1] + t_cyl * dy - (ay + s * bay)) * inv_r
    nz = (eye[2] + t_cyl * dz - (az + s * baz)) * inv_r
    return t_cyl, nx, ny, nz


def _make_kernel(eye, n_buttons: int, n_pts: int, n_distract: int,
                 z_table: float, base_radius: float, base_top: float,
                 cap_radius: float, cap_top: float, cam_basis,
                 trace_h: int, pack: int):
    """Build the scene kernel for a static env config. Scene row layout:
    [pts (n_pts*3) | buttons (n_buttons*2) | distractors (n_distract*3) |
    ball (3 if n_distract)].

    The traced image is [trace_h, trace_w] but the kernel operates on a
    PACKED layout [trace_h*trace_w/128, 128]: the flattened pixel stream
    cut into exact 128-lane rows (112x112 = 98x128, 224x224 = 392x128), so
    no lane is ever padding — a (BH, 224) tile would pad to 256 lanes and
    waste 1/8 of the VPU, a (BH, 112) tile 1/8 more. All per-pixel math is
    elementwise, so the layout is invisible to it; only the row-culling
    bound maps layout rows back to traced rows (``pack`` = trace_w, the
    divisor from flat pixel index to traced row).

    Tile-level primitive culling: the arm capsules, joint spheres and
    distractors each occupy a small screen band, so each (row-block, env)
    program first computes a conservative row interval for the primitive's
    bounding sphere and skips the whole intersect+composite under
    ``pl.when`` when it cannot touch the tile. The bound is the exact
    interval of u/w over the bounding box u ∈ [u_c−r, u_c+r],
    w ∈ [depth−r, depth+r] (u = up-component, w = forward depth of any hit
    point), so a culled primitive provably has no ray hit in the tile —
    kept-primitive math is unchanged and output equals the unculled kernel.
    Composite state (t_best, normal, albedo) lives in VMEM scratch so
    skipped primitives cost only the scalar test."""
    fwd, up, tan_half = cam_basis
    fx, fy, fz = (float(v) for v in fwd)
    ux, uy, uz = (float(v) for v in up)
    ex, ey, ez = (float(v) for v in eye)
    th = float(tan_half)
    half_h = trace_h / 2.0

    def kernel(scene_ref, dx_ref, dy_ref, dz_ref, bg_ref, out_ref,
               t_ref, nx_ref, ny_ref, nz_ref, r_ref, g_ref, b_ref):
        scene = scene_ref[pl.program_id(1)]
        dx = dx_ref[0]
        dy = dy_ref[0]
        dz = dz_ref[0]
        # Traced-row interval covered by this block: flat pixel range
        # [px0, px1] divided by the traced width (= `pack`).
        px0 = pl.program_id(0) * dx.shape[0] * dx.shape[1]
        px1 = px0 + dx.shape[0] * dx.shape[1] - 1
        row0 = px0 // pack
        row1 = px1 // pack

        def rows_overlap(cx, cy, cz, rad):
            """Conservative scalar test: can a ray through this tile's rows
            hit the sphere (center scalar (cx,cy,cz), radius rad)?"""
            wx_, wy_, wz_ = cx - ex, cy - ey, cz - ez
            depth = wx_ * fx + wy_ * fy + wz_ * fz
            u_c = wx_ * ux + wy_ * uy + wz_ * uz
            w_lo = (depth - rad) * th
            w_hi = (depth + rad) * th
            u_lo, u_hi = u_c - rad, u_c + rad
            # exact interval of u/w over the box (w_lo > 0 required)
            v_cands = (u_lo / w_lo, u_lo / w_hi, u_hi / w_lo, u_hi / w_hi)
            v_min = jnp.minimum(jnp.minimum(v_cands[0], v_cands[1]),
                                jnp.minimum(v_cands[2], v_cands[3]))
            v_max = jnp.maximum(jnp.maximum(v_cands[0], v_cands[1]),
                                jnp.maximum(v_cands[2], v_cands[3]))
            # ndc v -> image row (row 0 = top = +v); ±1 row slack
            r_min = (1.0 - v_max) * half_h - 1.5
            r_max = (1.0 - v_min) * half_h + 0.5
            near = depth <= rad + 0.05  # behind/straddling camera: keep
            return near | ((r_min <= row1) & (r_max >= row0))

        # Static background (sky + floor + table): entirely camera-fixed,
        # so its deferred-composite state (t, normal, albedo) is
        # precomputed once per config (_background_planes) and streamed in
        # as 7 planes — the floor/AABB intersection math never runs on the
        # hot path.
        st = tuple(bg_ref[0, i] for i in range(7))

        # Buttons: base cylinder + cap (always near the view center —
        # unculled).
        cap_colors = [r3.BUTTON_CAP_YELLOW, r3.BUTTON_CAP_TEAL]
        off = n_pts * 3
        for i in range(n_buttons):
            bx = scene[off + 2 * i]
            by = scene[off + 2 * i + 1]
            t, nx, ny, nz = _hit_vcylinder(
                eye, dx, dy, dz, bx, by, base_radius, z_table, base_top
            )
            st = _composite(st, t, nx, ny, nz, r3.BUTTON_GREEN)
            t, nx, ny, nz = _hit_vcylinder(
                eye, dx, dy, dz, bx, by, cap_radius, base_top, cap_top
            )
            st = _composite(st, t, nx, ny, nz, cap_colors[min(i, 1)])

        refs = (t_ref, nx_ref, ny_ref, nz_ref, r_ref, g_ref, b_ref)
        for ref, plane in zip(refs, st):
            ref[...] = plane

        # Group-level culling: one pl.when per primitive GROUP, with the
        # composite state flowing through registers inside the group. A
        # per-primitive pl.when was measured SLOWER than no culling at all
        # (31.6k vs 46k f/s, v5e 224x224 batch 256) — each of the ~18
        # branch bodies re-loads and re-stores the four BH x W scratch
        # planes, costing more than the skipped intersections. Two branch
        # bodies amortize the scratch round-trip over the whole arm.
        n_seg = n_pts - 1
        seg_color = [
            r3.ARM_ORANGE if i % 2 == 0 else r3.ARM_SILVER
            for i in range(n_seg)
        ]

        # Arm bounding sphere: midpoint of the joint-point extents plus the
        # largest link radius (scalar min/max over the 9 chain points).
        pxs = [scene[3 * i] for i in range(n_pts)]
        pys = [scene[3 * i + 1] for i in range(n_pts)]
        pzs = [scene[3 * i + 2] for i in range(n_pts)]
        red = lambda f, vs: f(jnp.stack(vs))
        lo = (red(jnp.min, pxs), red(jnp.min, pys), red(jnp.min, pzs))
        hi = (red(jnp.max, pxs), red(jnp.max, pys), red(jnp.max, pzs))
        cx = (lo[0] + hi[0]) * 0.5
        cy = (lo[1] + hi[1]) * 0.5
        cz = (lo[2] + hi[2]) * 0.5
        half_diag = 0.5 * jnp.sqrt(
            (hi[0] - lo[0]) ** 2 + (hi[1] - lo[1]) ** 2 + (hi[2] - lo[2]) ** 2
        )
        arm_rad = half_diag + r3.ARM_LINK_RADIUS + 0.01

        @pl.when(rows_overlap(cx, cy, cz, arm_rad))
        def _arm():
            st = tuple(ref[...] for ref in refs)
            # Capsule bodies, then one shared sphere per joint (adjacent
            # capsules' cap spheres coincide: n_pts sphere tests, not
            # 2*n_seg).
            for i in range(n_seg):
                ax, ay, az = scene[3 * i], scene[3 * i + 1], scene[3 * i + 2]
                bx2, by2, bz2 = (
                    scene[3 * i + 3], scene[3 * i + 4], scene[3 * i + 5]
                )
                radius = r3.ARM_LINK_RADIUS if i < n_seg - 1 else 0.035
                t, nx, ny, nz = _hit_cylinder_body(
                    eye, dx, dy, dz, ax, ay, az, bx2, by2, bz2, radius
                )
                st = _composite(st, t, nx, ny, nz, seg_color[i])
            for i in range(n_pts):
                radius = r3.ARM_LINK_RADIUS if i < n_pts - 1 else 0.035
                t, nx, ny, nz = _hit_sphere(
                    eye, dx, dy, dz, pxs[i], pys[i], pzs[i], radius
                )
                st = _composite(st, t, nx, ny, nz,
                                seg_color[max(i - 1, 0)])
            for ref, plane in zip(refs, st):
                ref[...] = plane

        # Distractor spheres + kicked ball: all sit on the table plane, so
        # one group bound (their xy spread is small) covers them.
        if n_distract:
            doff = off + n_buttons * 2
            boff = doff + 3 * n_distract
            dxs = [scene[doff + 3 * i] for i in range(n_distract)] + [scene[boff]]
            dys = [scene[doff + 3 * i + 1] for i in range(n_distract)] + [scene[boff + 1]]
            dzs = [scene[doff + 3 * i + 2] for i in range(n_distract)] + [scene[boff + 2]]
            dlo = (red(jnp.min, dxs), red(jnp.min, dys), red(jnp.min, dzs))
            dhi = (red(jnp.max, dxs), red(jnp.max, dys), red(jnp.max, dzs))
            dcx = (dlo[0] + dhi[0]) * 0.5
            dcy = (dlo[1] + dhi[1]) * 0.5
            dcz = (dlo[2] + dhi[2]) * 0.5
            d_rad = 0.5 * jnp.sqrt(
                (dhi[0] - dlo[0]) ** 2 + (dhi[1] - dlo[1]) ** 2
                + (dhi[2] - dlo[2]) ** 2
            ) + 0.06  # >= DISTRACTOR_RADIUS (0.05) + slack, like the arm
            # group's ARM_LINK_RADIUS + 0.01 pad: the bound must cover the
            # outermost sphere's surface, not just its center.

            @pl.when(rows_overlap(dcx, dcy, dcz, d_rad))
            def _distractors():
                st = tuple(ref[...] for ref in refs)
                for i in range(n_distract):
                    # radius = kuka.DISTRACTOR_RADIUS: the rendered size
                    # must match the contact model's pushback radius.
                    t, nx, ny, nz = _hit_sphere(
                        eye, dx, dy, dz, dxs[i], dys[i], dzs[i], 0.05
                    )
                    st = _composite(st, t, nx, ny, nz,
                                    r3.DISTRACTOR_COLOR)
                t, nx, ny, nz = _hit_sphere(
                    eye, dx, dy, dz, dxs[-1], dys[-1], dzs[-1], 0.03
                )
                st = _composite(st, t, nx, ny, nz, r3.BALL_COLOR)
                for ref, plane in zip(refs, st):
                    ref[...] = plane

        # Deferred Lambertian shade of the winning primitive, once; store
        # uint8 directly (the f32 image would cost 4x the HBM writeback and
        # a second pass to convert).
        lx, ly, lz = (float(v) for v in r3.LIGHT_DIR)
        lam = jnp.clip(
            nx_ref[...] * lx + ny_ref[...] * ly + nz_ref[...] * lz, 0.0, 1.0
        )
        sh = 0.45 + 0.55 * lam
        def to_u8(x):
            # Mosaic has no direct f32->u8 cast; round-trip through int32
            # (values already clipped to [0, 255]).
            return jnp.clip(x, 0, 255).astype(jnp.int32).astype(jnp.uint8)

        out_ref[0, 0] = to_u8(sh * r_ref[...] * 255.0 + 0.5)
        out_ref[0, 1] = to_u8(sh * g_ref[...] * 255.0 + 0.5)
        out_ref[0, 2] = to_u8(sh * b_ref[...] * 255.0 + 0.5)

    return kernel


@lru_cache(maxsize=8)
def _background_planes(which: str, height: int, width: int) -> np.ndarray:
    """[7, H, W] f32 deferred-composite state (t, normal, albedo) of the
    camera-static background: sky init + floor + table, computed with the
    SAME helper ops the kernel would run (bit-compatible values).

    Called during _render_batch's trace, so force compile-time (eager)
    evaluation — these are config constants, not per-call work."""
    with jax.ensure_compile_time_eval():
        return _background_planes_impl(which, height, width)


def _background_planes_impl(which: str, height: int, width: int) -> np.ndarray:
    eye_np, dirs_np = r3._kuka_camera(which, height, width)
    eye = jnp.asarray(np.asarray(eye_np, np.float32))
    dirs = jnp.asarray(np.asarray(dirs_np, np.float32))
    dx, dy, dz = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    sky = r3.SKY_COLOR
    light = r3.LIGHT_DIR
    t_best = jnp.full(dx.shape, BIG, jnp.float32)
    # Sky "normal" = 1.01 * light dir: the deferred shade factor clips lam
    # to exactly 1.0 so the sky color passes through unshaded.
    st = (
        t_best,
        jnp.full(dx.shape, float(light[0]) * 1.01, jnp.float32),
        jnp.full(dx.shape, float(light[1]) * 1.01, jnp.float32),
        jnp.full(dx.shape, float(light[2]) * 1.01, jnp.float32),
        jnp.full(dx.shape, float(sky[0]), jnp.float32),
        jnp.full(dx.shape, float(sky[1]), jnp.float32),
        jnp.full(dx.shape, float(sky[2]), jnp.float32),
    )
    t = _hit_floor(eye, dx, dy, dz, r3.FLOOR_Z)
    one = jnp.ones_like(t)
    zero = jnp.zeros_like(t)
    st = _composite(st, t, zero, zero, one, r3.FLOOR_COLOR)
    t, nx, ny, nz = _hit_aabb(
        eye, dx, dy, dz, tuple(map(float, r3.TABLE_CENTER)),
        tuple(map(float, r3.TABLE_HALF)),
    )
    st = _composite(st, t, nx, ny, nz, r3.TABLE_COLOR)
    return np.stack([np.asarray(p, np.float32) for p in st])


@lru_cache(maxsize=8)
def _camera_planes(which: str, height: int, width: int):
    from srl_tpu.ops.camera import camera_basis

    eye, dirs = r3._kuka_camera(which, height, width)
    dirs = np.asarray(dirs, np.float32)
    # Derive the cull basis from the same camera tuple the renderer uses.
    _, _, yaw, pitch, roll, fov = r3.KUKA_CAMERAS[
        "main" if which == "main" else "second"
    ]
    fwd, _, up = camera_basis(yaw, pitch, roll)
    tan_half = float(np.tan(np.radians(fov) / 2.0))
    basis = (tuple(float(v) for v in fwd), tuple(float(v) for v in up),
             tan_half)
    return (
        tuple(float(v) for v in np.asarray(eye)),
        dirs[..., 0], dirs[..., 1], dirs[..., 2],
        basis,
    )


@partial(jax.jit, static_argnums=(0, 1, 3))
def _render_batch(config, which, scene, upsample=True):
    (n_buttons, n_pts, n_distract, z_table, base_radius, base_top,
     cap_radius, cap_top, height, width, scale) = config
    trace_h, trace_w = height // scale, width // scale
    # Packed layout: the flat pixel stream as exact 128-lane rows, zero
    # lane padding (see _make_kernel). `pack` carries trace_w for the
    # flat-index -> traced-row cull mapping.
    n_px = trace_h * trace_w
    assert n_px % 128 == 0, "traced image must flatten to 128-lane rows"
    pack = trace_w
    lh, lw = n_px // 128, 128
    bh = _pick_bh(lh)
    eye, dx_np, dy_np, dz_np, cam_basis = _camera_planes(
        which, trace_h, trace_w
    )
    kernel = _make_kernel(
        eye, n_buttons, n_pts, n_distract, z_table, base_radius, base_top,
        cap_radius, cap_top, cam_basis, trace_h, pack,
    )
    n = scene.shape[0]
    n_blocks = lh // bh
    plane_spec = pl.BlockSpec((1, bh, lw), lambda j, i: (0, j, 0),
                              memory_space=pltpu.VMEM)
    bg = _background_planes(which, trace_h, trace_w).reshape(7, lh, lw)
    out = pl.pallas_call(
        kernel,
        # Env axis innermost: the ray-plane blocks depend only on the outer
        # row-block index, so they stay VMEM-resident across envs.
        grid=(n_blocks, n),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scene table
            plane_spec, plane_spec, plane_spec,
            pl.BlockSpec((1, 7, bh, lw), lambda j, i: (0, 0, j, 0),
                         memory_space=pltpu.VMEM),  # background state
        ],
        out_specs=pl.BlockSpec((1, 3, bh, lw), lambda j, i: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 3, lh, lw), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((bh, lw), jnp.float32)] * 7,
        interpret=jax.default_backend() == "cpu",
    )(
        scene,
        jnp.asarray(dx_np).reshape(lh, lw)[None],
        jnp.asarray(dy_np).reshape(lh, lw)[None],
        jnp.asarray(dz_np).reshape(lh, lw)[None],
        jnp.asarray(bg)[None],
    )
    # Packed [N, 3, lh, lw] -> [N, trace_h, trace_w, 3] uint8 -> upsample
    # (skipped for coarse-obs envs, which hand the traced resolution
    # straight to a pooled-conv1 policy — see models/policies.py).
    out = out.reshape(n, 3, trace_h, trace_w)
    img = jnp.transpose(out, (0, 2, 3, 1))
    if not upsample:
        return img
    return r3.upsample_nearest(img, scale)


def _scene_table(env, states) -> tuple:
    """Pack per-env scene params; returns (config, scene [N, S])."""
    from srl_tpu.envs.kuka import (
        BUTTON_BASE_RADIUS, BUTTON_BASE_TOP, BUTTON_CAP_RADIUS,
        BUTTON_CAP_TOP, RENDER_HEIGHT, RENDER_WIDTH, Z_TABLE,
    )
    from srl_tpu.ops import kinematics as kin

    def pts_of(q):
        joint_pos, _, R, p_flange, p_tip = kin.fk(q)
        base = jnp.asarray(kin.BASE_POS)
        return jnp.concatenate(
            [base[None], joint_pos, p_flange[None], p_tip[None]], axis=0
        )

    pts = jax.vmap(pts_of)(states.q)  # [N, n_pts, 3]
    n = pts.shape[0]
    n_pts = pts.shape[1]
    cols = [pts.reshape(n, -1)]
    cols.append(states.buttons[:, : env.n_buttons, :2].reshape(n, -1))
    n_distract = 0
    if env.rand_objects:
        n_distract = states.distractors.shape[1]
        cols.append(states.distractors.reshape(n, -1))
        cols.append(states.ball[:, :3].reshape(n, -1))
    scene = jnp.concatenate(cols, axis=1).astype(jnp.float32)
    config = (
        env.n_buttons, n_pts, n_distract, float(Z_TABLE),
        float(BUTTON_BASE_RADIUS), float(BUTTON_BASE_TOP),
        float(BUTTON_CAP_RADIUS), float(BUTTON_CAP_TOP),
        RENDER_HEIGHT, RENDER_WIDTH, int(getattr(env, "render_scale", 1)),
    )
    return config, scene


def render_kuka_pallas(env, states) -> jax.Array:
    """Batched [N, H, W, 3] (or [..., 6] multi_view) uint8 Kuka render.

    `states` must be a batched (vmapped-layout) KukaState.
    """
    config, scene = _scene_table(env, states)
    upsample = getattr(env, "obs_coarse_scale", 1) == 1
    img = _render_batch(config, "main", scene, upsample)
    if env.multi_view:
        img2 = _render_batch(config, "aux", scene, upsample)
        return jnp.concatenate([img, img2], axis=-1)
    return img
