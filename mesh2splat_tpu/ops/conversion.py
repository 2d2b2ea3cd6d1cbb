"""Mesh -> Gaussian-splat conversion: the TPU-native replacement for the
reference's GS/rasterizer/atomic-append pipeline.

The reference converts by drawing each triangle into a res^2 viewport with
``gl_Position = orthoUv * 2 - 1`` so the *hardware rasterizer* enumerates one
fragment per covered texel, and the fragment shader atomically appends one
gaussian per fragment (reference: src/shaders/conversion/converterGS.glsl:439,
converterFS.glsl:46-103, ConversionPass.cpp:9-68).

TPU-native reformulation (no rasterizer, no atomics, static shapes):

  1. vmap per-triangle math: orthogonal UVs, tangent-frame quaternion, UV->3D
     Jacobian scale, and the triangle's texel-space bounding box.
  2. Budgeted slot allocation: each triangle claims ``bbox_area`` output slots
     via an exclusive cumsum (capped per-triangle and globally — the analogue
     of the reference's min(res^2*6*meshes, 7M) cap, ConversionPass.cpp:20-24).
  3. A scatter(+cummax) decodes each slot back to its (triangle, texel) pair —
     a segment-id trick that replaces ``atomicCounterIncrement``.
  4. vmap per-slot: point-in-triangle coverage test at the texel center in
     ortho-UV space, barycentric attribute interpolation, bilinear PBR texture
     sampling, TBN normal mapping — the whole fragment shader, as a gather.

Every op here is dense, statically shaped, and differentiable (gradients flow
through barycentrics and texture samples back to vertex data and textures).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..types import Material, Splats, TriangleMesh
from . import segments
from .sampling import (
    build_block_atlas,
    build_tap_atlas,
    sample_bilinear_atlas,
    sample_bilinear_block_atlas,
)
from .triplanar import triangle_conversion_attrs


def _sample(tex, uv):
    """Bilinear sample via a tap atlas: one gather per texture instead of
    four (see sampling.build_tap_atlas). (A 4x4-blocked atlas with one-hot
    window selection was tried to reach the small-table gather tier and
    measured ~2x SLOWER end-to-end — the window contraction does not stay
    register-resident; see sampling.build_block_atlas.)"""
    h, w, c = tex.shape
    return sample_bilinear_atlas(build_tap_atlas(tex), h, w, c, uv)


def _fused_texture_stack(material: Material):
    """Stack every present texture into one (H, W, 10) array so the whole
    fragment-shader sampling step is ONE tap-atlas gather (gather cost on TPU
    is ~12 ms per million indices and flat in row width, so 3 gathers -> 1 is
    a 3x win). Channels: base_color rgba | normal xyz | metallic-roughness bgr's
    (b, g used). Returns None when no texture is present or sizes differ."""
    texs = []
    if material.has_base_color:
        texs.append(material.base_color)
    if material.has_normal:
        texs.append(material.normal)
    if material.has_metallic_roughness:
        texs.append(material.metallic_roughness)
    if not texs:
        return None
    hw = texs[0].shape[:2]
    if any(t.shape[:2] != hw for t in texs):
        return None
    h, w = hw
    parts = [
        material.base_color
        if material.has_base_color
        else jnp.ones((h, w, 4), jnp.float32),
        material.normal
        if material.has_normal
        else jnp.zeros((h, w, 3), jnp.float32),
        material.metallic_roughness
        if material.has_metallic_roughness
        else jnp.zeros((h, w, 3), jnp.float32),
    ]
    return jnp.concatenate(parts, axis=-1)


@dataclasses.dataclass(frozen=True)
class ConversionConfig:
    """Static conversion parameters.

    resolution: the ``resolutionTarget`` texel grid (reference:
      src/imGuiUi/ImGuiUI.cpp:512, 16..4096).
    layers: average overlapping-coverage budget per texel; capacity =
      res^2 * layers mirrors the reference's res^2*6 bound
      (reference: ConversionPass.cpp:22).
    max_texels_per_tri: per-triangle slot cap (bbox area clamp) so one giant
      triangle cannot exhaust the budget.
    """

    resolution: int = 256
    layers: int = 6
    max_texels_per_tri: int = 0  # 0 => no per-triangle cap beyond capacity
    gaussian_std: float = 1.0    # UI sigma slider, 0.1..2.0 (ImGuiUi.hpp:173)
    # Exact slot budget (0 => res^2 * layers). Conversion cost on TPU is
    # linear in capacity, so sizing it to the mesh's actual requirement
    # (see required_slots / calibrate) is a direct speedup. The reference
    # instead oversizes its SSBO and relies on atomic appends to pay only
    # for live fragments (ConversionPass.cpp:20-33).
    capacity_override: int = 0
    # Budget for the intermediate (triangle, texel-row) expansion of the
    # scanline allocator (0 => same as capacity, a safe upper bound since
    # every allocated row claims >= 1 texel slot).
    row_capacity_override: int = 0

    @property
    def capacity(self) -> int:
        if self.capacity_override:
            return self.capacity_override
        return self.resolution * self.resolution * self.layers

    @property
    def row_capacity(self) -> int:
        return self.row_capacity_override or self.capacity

    @property
    def scale_multiplier(self) -> float:
        """sigma applied at export/render time:
        std_dev = gaussianStd / resolutionTarget
        (reference: src/renderer/renderPasses/GaussiansPrepass.cpp:18)."""
        return self.gaussian_std / self.resolution


def _triangle_texel_bbox(ouv, res):
    """Integer texel bbox covered by the UV triangle: texel centers
    (i + 0.5)/res inside [min_u, max_u] x [min_v, max_v].
    ouv: (T, 3, 2). Returns x0, y0, w, h (int32)."""
    lo = jnp.min(ouv, axis=1)  # (T, 2)
    hi = jnp.max(ouv, axis=1)
    # first texel index whose center >= lo:  i >= lo*res - 0.5
    x0 = jnp.ceil(lo * res - 0.5).astype(jnp.int32)
    x1 = jnp.floor(hi * res - 0.5).astype(jnp.int32)
    x0 = jnp.clip(x0, 0, res - 1)
    x1 = jnp.clip(x1, -1, res - 1)
    wh = jnp.maximum(x1 - x0 + 1, 0)
    return x0[:, 0], x0[:, 1], wh[:, 0], wh[:, 1]


def _barycentric(p, a, b, c):
    """2D barycentrics of p in triangle (a, b, c); returns (w_a, w_b, w_c)
    and the doubled signed area (for degenerate detection)."""
    v0 = b - a
    v1 = c - a
    v2 = p - a
    den = v0[..., 0] * v1[..., 1] - v1[..., 0] * v0[..., 1]
    safe = jnp.where(jnp.abs(den) < 1e-20, 1.0, den)
    wb = (v2[..., 0] * v1[..., 1] - v1[..., 0] * v2[..., 1]) / safe
    wc = (v0[..., 0] * v2[..., 1] - v2[..., 0] * v0[..., 1]) / safe
    wa = 1.0 - wb - wc
    return jnp.stack([wa, wb, wc], axis=-1), den


def _edge_cross(a, b, p):
    return (b[..., 0] - a[..., 0]) * (p[..., 1] - a[..., 1]) - (
        b[..., 1] - a[..., 1]
    ) * (p[..., 0] - a[..., 0])


def _coverage_top_left(p, a, b, c):
    """Point-in-triangle with the raster top-left fill rule so texel centers
    on shared edges are claimed by exactly one triangle — matching the GPU
    rasterizer's fragment enumeration the reference relies on
    (ConversionPass draws adjacent triangles into one viewport; hardware
    guarantees no double-hit on shared edges)."""
    den = _edge_cross(a, b, c)  # 2x signed area; >0 for CCW in (u, v)
    s = jnp.sign(den)
    # orient edges so inside => weight >= 0 regardless of winding
    w0 = _edge_cross(a, b, p) * s
    w1 = _edge_cross(b, c, p) * s
    w2 = _edge_cross(c, a, p) * s

    def top_left(e0, e1):
        d = (e1 - e0) * s[..., None]
        return jnp.logical_or(
            d[..., 1] < 0,  # "left" edge (descending in v for CCW)
            jnp.logical_and(d[..., 1] == 0, d[..., 0] < 0),  # "top" edge
        )

    t0 = top_left(a, b)
    t1 = top_left(b, c)
    t2 = top_left(c, a)

    def accept(w, tl):
        return jnp.logical_or(w > 0, jnp.logical_and(w == 0, tl))

    inside = jnp.logical_and(
        jnp.logical_and(accept(w0, t0), accept(w1, t1)), accept(w2, t2)
    )
    return jnp.logical_and(inside, jnp.abs(den) > 1e-20)


def _row_span(ouv6, tx0, tw, y, res):
    """Exact covered column range of a texel row at center ordinate ``y``:
    scanline/edge intersections in ortho-UV space, padded a hundredth of a
    texel so top-left-rule boundary texels survive f32 rounding (the exact
    _coverage_top_left test stays the final arbiter). Deterministic — the
    per-row and per-slot call sites recompute identical values.

    ouv6: (..., 6) flattened triangle ortho-UV; tx0/tw: bbox column start /
    width; y: (...,) row center in UV. Returns (c0, c1, nonempty)."""

    def edge_x(pu, pv, qu, qv):
        den = qv - pv
        span = jnp.logical_and((pv - y) * (qv - y) <= 0, jnp.abs(den) > 1e-20)
        tt_ = (y - pv) / jnp.where(span, den, 1.0)
        xx = pu + tt_ * (qu - pu)
        big = jnp.float32(3e38)
        return jnp.where(span, xx, big), jnp.where(span, xx, -big)

    lo0, hi0 = edge_x(ouv6[..., 0], ouv6[..., 1], ouv6[..., 2], ouv6[..., 3])
    lo1, hi1 = edge_x(ouv6[..., 2], ouv6[..., 3], ouv6[..., 4], ouv6[..., 5])
    lo2, hi2 = edge_x(ouv6[..., 4], ouv6[..., 5], ouv6[..., 0], ouv6[..., 1])
    xlo = jnp.minimum(jnp.minimum(lo0, lo1), lo2)
    xhi = jnp.maximum(jnp.maximum(hi0, hi1), hi2)

    c0 = jnp.ceil(xlo * res - 0.5 - 1e-2).astype(jnp.int32)
    c1 = jnp.floor(xhi * res - 0.5 + 1e-2).astype(jnp.int32)
    c0 = jnp.clip(c0, tx0, tx0 + tw - 1)
    c1 = jnp.clip(c1, tx0, tx0 + tw - 1)
    return c0, c1, xlo <= xhi


def _material_sampler(material: Material):
    """Per-splat texture sampler for a single material, honoring the
    reference's static has_* uniform flags (converterFS.glsl:15-17).
    Returns (albedo_rgba | None, normal_map_sample | None, mr | None);
    albedo already includes u_materialFactor."""
    stack = _fused_texture_stack(material)

    def sampler(uv, _extra):
        if stack is not None:
            taps = jax.lax.optimization_barrier(_sample(stack, uv))
            s_albedo = taps[..., 0:4]
            s_normal = taps[..., 4:7]
            s_mr = taps[..., 7:10]
        else:
            s_albedo = s_normal = s_mr = None
        albedo = None
        if material.has_base_color:
            a = s_albedo if s_albedo is not None else _sample(material.base_color, uv)
            albedo = a * material.base_color_factor
        n_ts = None
        if material.has_normal:
            n_ts = s_normal if s_normal is not None else _sample(material.normal, uv)
        mr = None
        if material.has_metallic_roughness:
            mr = s_mr if s_mr is not None else _sample(material.metallic_roughness, uv)
        return albedo, n_ts, mr

    return sampler, material.base_color_factor, None


@partial(jax.jit, static_argnames=("config",))
def convert(
    mesh: TriangleMesh,
    material: Material,
    bbox_min: jax.Array,
    bbox_max: jax.Array,
    config: ConversionConfig,
    ortho_uv: jax.Array | None = None,
) -> Splats:
    """Convert one primitive (triangle soup + material) to splats.

    bbox_min/max: the per-mesh bbox used for ortho-UV normalization
    (reference: ConversionPass.cpp:111-112 binds mesh.bbox).
    ortho_uv: optional (T, 3, 2) custom conversion UVs (see
    ops.uv_unwrap.unwrap_normalized_uvs)."""
    sampler, fallback_factor, extra = _material_sampler(material)
    return _convert_core(
        mesh, bbox_min, bbox_max, config, sampler, fallback_factor, extra,
        ortho_uv=ortho_uv,
    )


def _convert_core(
    mesh: TriangleMesh,
    bbox_min: jax.Array,        # (3,) or (T, 3) per-triangle
    bbox_max: jax.Array,
    config: ConversionConfig,
    sampler,                    # (uv (cap,2), extra_cols (cap,K)) -> (albedo, n_ts, mr)
    fallback_factor,            # (4,) or (cap, 4) color when albedo is None
    extra_record,               # (T, K) float columns to ride the record | None
    ortho_uv=None,              # (T, 3, 2) custom conversion UVs | None
) -> Splats:
    res = config.resolution
    cap = config.capacity
    row_cap = config.row_capacity

    # ---- stage 1: per-triangle attributes --------------------------------
    if bbox_min.ndim == 2:
        attrs = triangle_conversion_attrs(
            mesh.tri_pos, bbox_min[:, None, :], bbox_max[:, None, :],
            ouv_override=ortho_uv,
        )
    else:
        attrs = triangle_conversion_attrs(
            mesh.tri_pos, bbox_min, bbox_max, ouv_override=ortho_uv
        )
    ouv = attrs["ortho_uv"]  # (T, 3, 2)

    x0, y0, w, h = _triangle_texel_bbox(ouv, res)

    # degenerate triangles (NaN positions / zero UV area) claim no slots
    finite = jnp.all(
        jnp.isfinite(mesh.tri_pos.reshape(mesh.tri_pos.shape[0], -1)), axis=-1
    )
    n_rows = jnp.where(jnp.logical_and(finite, w > 0), h, 0)

    # ---- stage 2: scanline row expansion ----------------------------------
    # Allocating whole texel bboxes wastes ~2-3x slots on sliver triangles
    # (and conversion cost is linear in slot count), so allocate per texel
    # ROW with the exact covered column range from scanline/edge
    # intersections — the dense analogue of the coarse rasterizer stage the
    # reference gets from hardware (converterGS.glsl:439 emits the triangle;
    # the GPU enumerates covered fragments only).
    t = mesh.tri_pos.shape[0]
    row_off, row_total = segments.alloc_slots(n_rows, row_cap)
    row_local, _, row_tri = segments.expand_monotone(
        row_off, n_rows, row_cap, value=jnp.arange(t, dtype=jnp.int32)
    )
    row_live = jnp.arange(row_cap, dtype=jnp.int32) < row_total
    row_tri = jnp.maximum(row_tri, 0)

    geo = jnp.concatenate(
        [
            ouv.reshape(t, 6),
            x0[:, None].astype(jnp.float32),
            y0[:, None].astype(jnp.float32),
            w[:, None].astype(jnp.float32),
        ],
        axis=-1,
    )  # (T, 9)
    g = jax.lax.optimization_barrier(geo[row_tri])  # (row_cap, 9) gather
    tx0 = g[:, 6].astype(jnp.int32)
    tw = g[:, 8].astype(jnp.int32)
    j = g[:, 7].astype(jnp.int32) + row_local
    y = (j.astype(jnp.float32) + 0.5) / res

    c0, c1, nonempty = _row_span(g[:, 0:6], tx0, tw, y, res)
    width = jnp.where(jnp.logical_and(row_live, nonempty), c1 - c0 + 1, 0)
    width = jnp.maximum(width, 0)
    if config.max_texels_per_tri:
        width = jnp.minimum(width, config.max_texels_per_tri)

    # ---- stage 3: row -> texel slots --------------------------------------
    # Forward-fill ONE monotone packed channel (tri_id * 4096 + row_local —
    # texel rows per triangle never exceed res <= 4096) through a native
    # cummax; everything else is recomputed per slot from the record gather,
    # which is cheap VPU math. Falls back to the generic last-set scan for
    # meshes too large to pack.
    offsets, total = segments.alloc_slots(width, cap)
    if t * 4096 < 2**31:
        local, _, packed = segments.expand_monotone(
            offsets, width, cap, value=row_tri * 4096 + row_local
        )
        packed = jnp.maximum(packed, 0)
        tri_id_safe = packed >> 12
        s_row_local = packed & 4095
    else:
        _, local, _, ex = segments.expand_to_slots(
            offsets, width, cap, extra=jnp.stack([row_tri, row_local])
        )
        tri_id_safe = jnp.maximum(ex[0], 0)
        s_row_local = jnp.maximum(ex[1], 0)
    in_budget = jnp.arange(cap, dtype=jnp.int32) < total

    # ---- stage 4: the fragment shader as ONE record gather ---------------
    # TPU gathers cost ~12 ms per million rows and are flat in row width, so
    # all per-triangle data rides a single packed 52-float record.
    parts = [
        mesh.tri_pos.reshape(t, 9),
        mesh.tri_normal.reshape(t, 9),
        mesh.tri_tangent.reshape(t, 12),
        mesh.tri_uv.reshape(t, 6),
        ouv.reshape(t, 6),
        attrs["quat"],
        attrs["scale"],
        geo[:, 6:9],
    ]
    if extra_record is not None:
        parts.append(extra_record)
    record = jnp.concatenate(parts, axis=-1)  # (T, 52 + K)
    # Materialize the gather exactly once: without the barrier XLA fuses
    # it into each consumer fusion and re-executes the ~12ns/row gather
    # several times (measured 3x cost at 1.5M slots).
    rec = jax.lax.optimization_barrier(record[tri_id_safe])  # (cap, 52)

    # ---- per-slot math, all in 1-D columns --------------------------------
    # (cap, 3, k) intermediates and cross/norm on (cap, 3) arrays tile to
    # (8, 128) lanes on TPU — up to 42x padded traffic when materialized —
    # so every step below stays on flat (cap,) columns.
    col = lambda i: rec[:, i]

    # re-derive the slot's texel coordinates from the record (identical
    # arithmetic to the per-row pass above => identical f32 results)
    s_tx0 = col(49).astype(jnp.int32)
    s_tw = col(51).astype(jnp.int32)
    tj = col(50).astype(jnp.int32) + s_row_local
    y_s = (tj.astype(jnp.float32) + 0.5) / res
    sc0, _, _ = _row_span(rec[:, 36:42], s_tx0, s_tw, y_s, res)
    ti = sc0 + local
    pu = (ti.astype(jnp.float32) + 0.5) / res
    pv = y_s

    au, av = col(36), col(37)
    bu, bv = col(38), col(39)
    cu, cv = col(40), col(41)

    # barycentrics (column form of _barycentric)
    v0u, v0v = bu - au, bv - av
    v1u, v1v = cu - au, cv - av
    v2u, v2v = pu - au, pv - av
    den = v0u * v1v - v1u * v0v
    safe = jnp.where(jnp.abs(den) < 1e-20, 1.0, den)
    wb = (v2u * v1v - v1u * v2v) / safe
    wc = (v0u * v2v - v2u * v0v) / safe
    wa = 1.0 - wb - wc

    # coverage with the top-left fill rule (column form of _coverage_top_left)
    s_sign = jnp.sign(den)

    def edge_w(p0u, p0v, p1u, p1v):
        return ((p1u - p0u) * (pv - p0v) - (p1v - p0v) * (pu - p0u)) * s_sign

    def top_left(p0u, p0v, p1u, p1v):
        du = (p1u - p0u) * s_sign
        dv = (p1v - p0v) * s_sign
        return jnp.logical_or(
            dv < 0, jnp.logical_and(dv == 0, du < 0)
        )

    def accept(wq, tl):
        return jnp.logical_or(wq > 0, jnp.logical_and(wq == 0, tl))

    inside = jnp.logical_and(
        jnp.logical_and(
            accept(edge_w(au, av, bu, bv), top_left(au, av, bu, bv)),
            accept(edge_w(bu, bv, cu, cv), top_left(bu, bv, cu, cv)),
        ),
        jnp.logical_and(
            accept(edge_w(cu, cv, au, av), top_left(cu, cv, au, av)),
            jnp.abs(den) > 1e-20,
        ),
    )
    valid = jnp.logical_and(in_budget, inside)

    # barycentric interpolation, componentwise
    def lerp3(i0, i1, i2):
        return col(i0) * wa + col(i1) * wb + col(i2) * wc

    px, py, pz = lerp3(0, 3, 6), lerp3(1, 4, 7), lerp3(2, 5, 8)
    nx, ny, nz = lerp3(9, 12, 15), lerp3(10, 13, 16), lerp3(11, 14, 17)
    tx_, ty_, tz_, tw_ = (
        lerp3(18, 22, 26), lerp3(19, 23, 27), lerp3(20, 24, 28),
        lerp3(21, 25, 29),
    )
    uu, vv = lerp3(30, 32, 34), lerp3(31, 33, 35)
    uv = jnp.stack([uu, vv], axis=-1)

    # ---- texture sampling via the provided sampler -------------------------
    extra_cols = rec[:, 52:] if extra_record is not None else None
    albedo, n_ts_map, mr = sampler(uv, extra_cols)

    # albedo (converterFS.glsl:55-62) x u_materialFactor (:99)
    if albedo is not None:
        color = albedo
    else:
        color = jnp.broadcast_to(fallback_factor, (cap, 4))

    # normal map via TBN (converterFS.glsl:68-81), columnwise
    if n_ts_map is not None:
        mx, my, mz = (
            n_ts_map[..., 0] * 2.0 - 1.0,
            n_ts_map[..., 1] * 2.0 - 1.0,
            n_ts_map[..., 2] * 2.0 - 1.0,
        )
        rinv = jax.lax.rsqrt(mx * mx + my * my + mz * mz + 1e-24)
        mx, my, mz = mx * rinv, my * rinv, mz * rinv
        rinv = jax.lax.rsqrt(nx * nx + ny * ny + nz * nz + 1e-24)
        ux, uy, uz = nx * rinv, ny * rinv, nz * rinv  # unit normal
        # bitangent = normalize(cross(n_unit, tangent.xyz)) * tangent.w
        bx = uy * tz_ - uz * ty_
        by = uz * tx_ - ux * tz_
        bz = ux * ty_ - uy * tx_
        rinv = jax.lax.rsqrt(bx * bx + by * by + bz * bz + 1e-24)
        bx, by, bz = bx * rinv * tw_, by * rinv * tw_, bz * rinv * tw_
        # TBN columns (tangent, bitangent, normal)
        ox = tx_ * mx + bx * my + ux * mz
        oy = ty_ * mx + by * my + uy * mz
        oz = tz_ * mx + bz * my + uz * mz
        rinv = jax.lax.rsqrt(ox * ox + oy * oy + oz * oz + 1e-24)
        ox, oy, oz = ox * rinv, oy * rinv, oz * rinv
    else:
        ox, oy, oz = nx, ny, nz

    # metallic-roughness: map .b = metallic, .g = roughness, defaults
    # (0.1, 0.5) when absent (converterFS.glsl:87-95)
    if mr is not None:
        pbr = jnp.stack([mr[..., 2], mr[..., 1]], axis=-1)
    else:
        pbr = jnp.broadcast_to(
            jnp.asarray([0.1, 0.5], jnp.float32), (cap, 2)
        )

    pos = jnp.stack([px, py, pz], axis=-1)
    out_normal = jnp.stack([ox, oy, oz], axis=-1)
    quat = rec[:, 42:46]
    scale = rec[:, 46:49]

    return Splats(
        pos=pos,
        color=color,
        scale=scale,
        normal=out_normal,
        quat=quat,
        pbr=pbr,
        valid=valid,
    )


@partial(jax.jit, static_argnames=("config",))
def required_rows(
    mesh: TriangleMesh,
    bbox_min: jax.Array,
    bbox_max: jax.Array,
    config: ConversionConfig,
) -> jax.Array:
    """Number of (triangle, texel-row) producers the scanline allocator
    needs for this mesh. Cheap: O(T)."""
    if bbox_min.ndim == 2:
        bbox_min, bbox_max = bbox_min[:, None, :], bbox_max[:, None, :]
    attrs = triangle_conversion_attrs(mesh.tri_pos, bbox_min, bbox_max)
    x0, y0, w, h = _triangle_texel_bbox(attrs["ortho_uv"], config.resolution)
    finite = jnp.all(
        jnp.isfinite(mesh.tri_pos.reshape(mesh.tri_pos.shape[0], -1)), axis=-1
    )
    return jnp.sum(jnp.where(jnp.logical_and(finite, w > 0), h, 0))


@partial(jax.jit, static_argnames=("config",))
def required_slots(
    mesh: TriangleMesh,
    bbox_min: jax.Array,
    bbox_max: jax.Array,
    config: ConversionConfig,
) -> jax.Array:
    """Exact texel-slot requirement: the sum of scanline row widths — a
    near-exact stand-in for the number of fragment-shader invocations the
    reference's rasterizer would enumerate (converterGS.glsl:439). Uses
    config.row_capacity for the intermediate row expansion, so calibrate
    rows first. Cost: O(T + row_capacity). Shares _row_span with convert,
    so the budget it returns is exactly what convert will allocate."""
    res = config.resolution
    row_cap = config.row_capacity
    if bbox_min.ndim == 2:
        bbox_min, bbox_max = bbox_min[:, None, :], bbox_max[:, None, :]
    attrs = triangle_conversion_attrs(mesh.tri_pos, bbox_min, bbox_max)
    ouv = attrs["ortho_uv"]
    x0, y0, w, h = _triangle_texel_bbox(ouv, res)
    finite = jnp.all(
        jnp.isfinite(mesh.tri_pos.reshape(mesh.tri_pos.shape[0], -1)), axis=-1
    )
    n_rows = jnp.where(jnp.logical_and(finite, w > 0), h, 0)

    t = mesh.tri_pos.shape[0]
    row_off, row_total = segments.alloc_slots(n_rows, row_cap)
    row_local, _, row_tri = segments.expand_monotone(
        row_off, n_rows, row_cap, value=jnp.arange(t, dtype=jnp.int32)
    )
    row_live = jnp.arange(row_cap, dtype=jnp.int32) < row_total
    row_tri = jnp.maximum(row_tri, 0)

    geo = jnp.concatenate(
        [
            ouv.reshape(t, 6),
            x0[:, None].astype(jnp.float32),
            y0[:, None].astype(jnp.float32),
            w[:, None].astype(jnp.float32),
        ],
        axis=-1,
    )
    g = geo[row_tri]
    tx0 = g[:, 6].astype(jnp.int32)
    tw = g[:, 8].astype(jnp.int32)
    j = g[:, 7].astype(jnp.int32) + row_local
    y = (j.astype(jnp.float32) + 0.5) / res
    c0, c1, nonempty = _row_span(g[:, 0:6], tx0, tw, y, res)
    width = jnp.where(jnp.logical_and(row_live, nonempty), c1 - c0 + 1, 0)
    width = jnp.maximum(width, 0)
    if config.max_texels_per_tri:
        width = jnp.minimum(width, config.max_texels_per_tri)
    return jnp.sum(width)


def calibrate(
    mesh: TriangleMesh,
    bbox_min,
    bbox_max,
    config: ConversionConfig,
    round_to: int = 8192,
) -> ConversionConfig:
    """Return a config whose row and texel budgets exactly fit this mesh
    (rounded up for layout friendliness, capped at res^2*layers). Conversion
    with the calibrated config produces the identical splat set at
    proportionally lower cost — the TPU analogue of the reference paying only
    for live fragments via atomic appends (ConversionPass.cpp:20-33)."""
    hard_cap = config.resolution * config.resolution * config.layers

    def round_up(n):
        return min(-(-max(int(n), 1) // round_to) * round_to, hard_cap)

    rows = round_up(required_rows(mesh, bbox_min, bbox_max, config))
    cfg_rows = dataclasses.replace(config, row_capacity_override=rows)
    cap = round_up(required_slots(mesh, bbox_min, bbox_max, cfg_rows))
    return dataclasses.replace(
        cfg_rows, capacity_override=max(cap, 1 * round_to)
    )


@partial(
    jax.jit,
    static_argnames=("config", "has_stack", "any_normal", "any_mr"),
)
def _convert_packed_impl(
    merged, bb_lo, bb_hi, extra_record, stack, config,
    has_stack, any_normal, any_mr,
):
    from .sampling import build_tap_atlas_layered, sample_bilinear_atlas_layered

    def sampler(uv, extra_cols):
        if not has_stack:
            return extra_cols[:, 1:5], None, None
        mid = extra_cols[:, 0].astype(jnp.int32)
        m, h, w, c = stack.shape
        atlas = build_tap_atlas_layered(stack)
        taps = jax.lax.optimization_barrier(
            sample_bilinear_atlas_layered(atlas, h, w, c, uv, mid)
        )
        albedo = taps[..., 0:4]
        n_ts = taps[..., 4:7] if any_normal else None
        mr = taps[..., 7:10] if any_mr else None
        return albedo, n_ts, mr

    return _convert_core(
        merged, bb_lo, bb_hi, config, sampler,
        jnp.ones((4,), jnp.float32), extra_record,
    )


def convert_packed(
    primitives, config: ConversionConfig, shared_bbox=None,
    calibrate_budget: bool = False,
) -> Splats:
    """Convert a whole multi-primitive scene in ONE fused pass.

    The reference loops draw calls per mesh but appends into a single shared
    gaussian SSBO (ConversionPass.cpp:50-52); the TPU-native analogue merges
    every primitive into one triangle soup with a per-triangle material id
    and bbox, and texture sampling stays ONE gather via a layered tap atlas.

    Deviations (documented): per-material base_color factors are folded into
    the texture layers (bit-identical); materials lacking a normal map in a
    scene where any material has one get a flat (0.5, 0.5, 1) layer, which
    yields the *normalized* geometric normal instead of the raw interpolated
    one; textures of differing sizes are bilinearly resized to the largest
    (the reference likewise resizes at load, parsers.cpp:38-48).
    """
    import numpy as np

    meshes = [m for m, _ in primitives]
    mats = [mt for _, mt in primitives]
    counts = [int(m.tri_pos.shape[0]) for m in meshes]
    mid_host = np.repeat(
        np.arange(len(meshes), dtype=np.float32), counts
    )[:, None]

    merged = TriangleMesh(
        tri_pos=jnp.concatenate([m.tri_pos for m in meshes]),
        tri_normal=jnp.concatenate([m.tri_normal for m in meshes]),
        tri_tangent=jnp.concatenate([m.tri_tangent for m in meshes]),
        tri_uv=jnp.concatenate([m.tri_uv for m in meshes]),
    )

    if shared_bbox is not None:
        lo, hi = shared_bbox
        bb_lo = jnp.asarray(lo, jnp.float32)
        bb_hi = jnp.asarray(hi, jnp.float32)
    else:
        parts_lo, parts_hi = [], []
        for m, c in zip(meshes, counts):
            lo, hi = m.bbox()
            parts_lo.append(jnp.broadcast_to(lo, (c, 3)))
            parts_hi.append(jnp.broadcast_to(hi, (c, 3)))
        bb_lo = jnp.concatenate(parts_lo)
        bb_hi = jnp.concatenate(parts_hi)

    any_base = any(mt.has_base_color for mt in mats)
    any_normal = any(mt.has_normal for mt in mats)
    any_mr = any(mt.has_metallic_roughness for mt in mats)
    has_stack = any_base or any_normal or any_mr

    factors = jnp.stack([mt.base_color_factor for mt in mats])  # (M, 4)
    extra_record = jnp.concatenate(
        [jnp.asarray(mid_host), factors[jnp.asarray(mid_host[:, 0], jnp.int32)]],
        axis=-1,
    )  # (T, 5): material id + folded factor fallback

    if has_stack:
        hs = [mt.base_color.shape[0] for mt in mats if mt.has_base_color]
        hs += [mt.normal.shape[0] for mt in mats if mt.has_normal]
        hs += [mt.metallic_roughness.shape[0] for mt in mats if mt.has_metallic_roughness]
        ws = [mt.base_color.shape[1] for mt in mats if mt.has_base_color]
        ws += [mt.normal.shape[1] for mt in mats if mt.has_normal]
        ws += [mt.metallic_roughness.shape[1] for mt in mats if mt.has_metallic_roughness]
        h, w = max(hs), max(ws)

        def fit(tex, c, fill):
            if tex is None:
                return jnp.broadcast_to(
                    jnp.asarray(fill, jnp.float32), (h, w, c)
                )
            if tex.shape[:2] != (h, w):
                tex = jax.image.resize(tex, (h, w, c), "linear")
            return tex

        layers = []
        for mt in mats:
            base = fit(mt.base_color if mt.has_base_color else None, 4,
                       [1.0, 1.0, 1.0, 1.0])
            base = base * mt.base_color_factor  # fold the factor in
            nrm = fit(mt.normal if mt.has_normal else None, 3,
                      [0.5, 0.5, 1.0])
            mrt = fit(
                mt.metallic_roughness if mt.has_metallic_roughness else None,
                3, [0.0, 0.5, 0.1],  # .g = roughness 0.5, .b = metallic 0.1
            )
            layers.append(jnp.concatenate([base, nrm, mrt], axis=-1))
        stack = jnp.stack(layers)  # (M, h, w, 10)
    else:
        stack = jnp.zeros((1, 1, 1, 10), jnp.float32)

    if calibrate_budget:
        config = calibrate(merged, bb_lo, bb_hi, config)

    return _convert_packed_impl(
        merged, bb_lo, bb_hi, extra_record, stack, config,
        has_stack, any_normal, any_mr,
    )


def convert_scene(primitives, config: ConversionConfig, shared_bbox=None) -> Splats:
    """Convert a list of (TriangleMesh, Material) primitives and concatenate,
    like the reference's per-mesh loop (ConversionPass.cpp:50-52). Each
    primitive uses its own bbox unless ``shared_bbox`` is given."""
    parts = []
    for prim_mesh, prim_mat in primitives:
        if shared_bbox is None:
            lo, hi = prim_mesh.bbox()
        else:
            lo, hi = shared_bbox
        parts.append(convert(prim_mesh, prim_mat, lo, hi, config))
    out = parts[0]
    for p in parts[1:]:
        out = out.concat(p)
    return out
