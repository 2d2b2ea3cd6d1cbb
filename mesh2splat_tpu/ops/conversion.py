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
  4. The fragment shader itself — coverage at the texel center, barycentric
     interpolation, bilinear PBR sampling, TBN normal mapping — runs as two
     fused Pallas kernels around one fast-tier texture gather (ops.fragment).

Every op here is dense, statically shaped, and differentiable (gradients flow
through barycentrics and texture samples back to vertex data and textures).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..types import Material, Splats, TriangleMesh
from . import fragment, segments
from .triplanar import triangle_conversion_attrs


def _material_stack(material: Material):
    """Stack the material's present textures into one (1, H, W, 10) layer:
    base_color rgba | normal xyz | metallic-roughness rgb. Absent types get
    neutral fills (only consumed when another material in a packed scene has
    that type). Textures of differing sizes are bilinearly resized to the
    largest (deviation from the reference, which samples each at native
    resolution; the reference resizes only at load, parsers.cpp:38-48).
    Returns None when the material has no texture at all."""
    if not (material.has_base_color or material.has_normal
            or material.has_metallic_roughness):
        return None
    hs, ws = [], []
    for tex, has in (
        (material.base_color, material.has_base_color),
        (material.normal, material.has_normal),
        (material.metallic_roughness, material.has_metallic_roughness),
    ):
        if has:
            hs.append(tex.shape[0])
            ws.append(tex.shape[1])
    h, w = max(hs), max(ws)

    def fit(tex, has, c, fill):
        if not has:
            return jnp.broadcast_to(jnp.asarray(fill, jnp.float32), (h, w, c))
        if tex.shape[:2] != (h, w):
            tex = jax.image.resize(tex, (h, w, c), "linear")
        return tex

    base = fit(material.base_color, material.has_base_color, 4, [1.0] * 4)
    nrm = fit(material.normal, material.has_normal, 3, [0.5, 0.5, 1.0])
    mrt = fit(material.metallic_roughness, material.has_metallic_roughness,
              3, [0.0, 0.5, 0.1])
    return jnp.concatenate([base, nrm, mrt], axis=-1)[None]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PackedAtlas:
    """Prebuilt bilinear tap atlas for a material (fragment.build_pair_atlas
    output + its static geometry). The reference uploads each texture ONCE at
    scene load and every ConversionPass dispatch just binds and samples it
    (glUtils.cpp texture creation; ConversionPass.cpp:111-128 bind points);
    building the 2x2-footprint atlas per convert() call is the TPU analogue
    of re-uploading textures per conversion — pack once with pack_atlas()
    and pass to convert(..., atlas=) to amortize across conversions."""

    atlasT: jax.Array = dataclasses.field()  # (k*4*10, n_rows) f32, or
                                             # (k*4*10/2, n_rows) int32
                                             # bf16-pair lanes when packed
    # static per-mip-level geometry ((row_off, h, w, hw_pad), ...)
    geom: tuple = dataclasses.field(metadata=dict(static=True),
                                    default=((0, 1, 1, 1),))
    k: int = dataclasses.field(metadata=dict(static=True), default=1)
    packed: bool = dataclasses.field(metadata=dict(static=True),
                                     default=False)


def pack_atlas(material: Material, precision: str = "bf16",
               mips: bool = True) -> PackedAtlas | None:
    """Build a material's PackedAtlas once (None for textureless
    materials). jit-compatible; the heavy roll/concat/transpose runs on
    device a single time instead of inside every convert() call.

    precision: "bf16" (default) packs channel pairs as two bf16s per int32
    lane — halves the per-conversion tap-gather bytes at the 8-bit
    filtering precision of the reference's own GL_RGBA8 texture path
    (glUtils.cpp:252-318); "f32" keeps full precision (bit-identical to
    the inline no-atlas build). Prebuilt atlases are forward-only
    constants either way — the differentiable texture path (fit_textures)
    builds its f32 atlas inline.

    mips: include the 2x-box mip chain (the reference's glGenerateMipmap,
    glUtils.cpp:305) so dense-texture/low-res conversions area-filter
    instead of aliasing; ~1.33x atlas rows."""
    if precision not in ("bf16", "f32"):
        raise ValueError(f"precision={precision!r}: must be 'bf16' or 'f32'")
    stack = _material_stack(material)
    if stack is None:
        return None
    m, th, tw_tex, _ = stack.shape
    k = fragment.pack_factor(m * th * tw_tex)
    atlasT, geom = fragment.build_pair_atlas(
        stack, k, packed=precision == "bf16", mips=mips
    )
    return PackedAtlas(atlasT=atlasT, geom=tuple(geom), k=k,
                       packed=precision == "bf16")


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
    # Record-window width for the fragment kernel's in-kernel record DMA
    # (ops.fragment): must bound the triangle span of any CHUNK-slot chunk.
    # 0 = use the per-slot XLA gather instead (always correct; ~4 ms slower
    # at 1.5M slots). calibrate() measures the exact bound.
    rec_window: int = 0
    # Mip-mapped texture sampling (the reference's glGenerateMipmap +
    # implicit-LOD texture(), glUtils.cpp:305 / converterFS.glsl:57): a
    # per-triangle LOD from the ortho-UV -> texture-UV footprint selects
    # the nearest mip, so dense-texture/low-res conversions area-filter
    # instead of aliasing. Only affects conversions whose texel footprint
    # exceeds ~2 texture texels (LOD >= 0.5).
    use_mips: bool = True

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


@partial(jax.jit, static_argnames=("config", "return_stats"))
def convert(
    mesh: TriangleMesh,
    material: Material,
    bbox_min: jax.Array,
    bbox_max: jax.Array,
    config: ConversionConfig,
    ortho_uv: jax.Array | None = None,
    return_stats: bool = False,
    atlas: PackedAtlas | None = None,
) -> Splats:
    """Convert one primitive (triangle soup + material) to splats.

    bbox_min/max: the per-mesh bbox used for ortho-UV normalization
    (reference: ConversionPass.cpp:111-112 binds mesh.bbox).
    ortho_uv: optional (T, 3, 2) custom conversion UVs (see
    ops.uv_unwrap.unwrap_normalized_uvs).
    return_stats: when True, returns (splats, stats) where stats surfaces
    budget overflow counts (see _overflow_stats) — the analogue of the
    reference discarding fragments past u_maxGaussians (converterFS.glsl:
    46-51), made observable instead of silent.
    atlas: optional pack_atlas(material) result — skips the per-call tap
    atlas build (the reference likewise uploads textures once at load,
    not per ConversionPass dispatch). On the TPU kernel path the prebuilt
    atlas is consumed bit-identically; on the CPU (pure-XLA) path moving
    the build across the jit boundary can change fusion, which flips
    ulp-level rounding (visible only for UVs landing exactly on bilinear
    texel boundaries)."""
    return _convert_core(
        mesh, bbox_min, bbox_max, config,
        stack=None if atlas is not None else _material_stack(material),
        mids=None,
        factors=material.base_color_factor[None],
        has_base=material.has_base_color,
        has_normal=material.has_normal,
        has_mr=material.has_metallic_roughness,
        ortho_uv=ortho_uv,
        return_stats=return_stats,
        atlas=atlas,
    )


def _convert_core(
    mesh: TriangleMesh,
    bbox_min: jax.Array,        # (3,) or (T, 3) per-triangle
    bbox_max: jax.Array,
    config: ConversionConfig,
    stack,                      # (M, H, W, 10) texture stack | None
    mids,                       # (T,) int32 material id per triangle | None
    factors,                    # (M, 4) base-color factors
    has_base: bool,
    has_normal: bool,
    has_mr: bool,
    ortho_uv=None,              # (T, 3, 2) custom conversion UVs | None
    return_stats: bool = False,
    atlas: PackedAtlas | None = None,
) -> Splats:
    res = config.resolution
    cap = config.capacity
    ex = _expand_slots(mesh, bbox_min, bbox_max, config, ortho_uv)
    attrs, ouv, geo = ex["attrs"], ex["ouv"], ex["geo"]
    tri_id_safe, s_row_local = ex["tri_id_safe"], ex["s_row_local"]
    local, in_budget, t = ex["local"], ex["in_budget"], ex["t"]
    splats = _finish_convert(
        mesh, config, stack, mids, factors, has_base, has_normal, has_mr,
        attrs, ouv, geo, tri_id_safe, s_row_local, local, in_budget, t,
        ex["local_in_kernel"], atlas,
    )
    if not return_stats:
        return splats
    return splats, _overflow_stats(ex, config)


def _overflow_stats(ex, config: ConversionConfig) -> dict:
    """Budget-overflow counters (mirrors BinnedPairs.dropped_pairs):

    dropped_rows:  (triangle, texel-row) producers past row_capacity — each
        lost row silently loses ALL its texel slots, so any nonzero value
        means dropped_slots is a lower bound.
    dropped_slots: texel slots past capacity (trailing triangles lose
        coverage; reference analogue: fragments discarded past
        u_maxGaussians, converterFS.glsl:46-51).
    dropped_window: slots whose triangle fell outside the calibrated
        rec_window of their fragment-kernel chunk (0 with calibrate()'s
        exact bound; nonzero = a miscalibrated window, previously silent —
        round-3 advisor finding)."""
    stats = {
        "dropped_rows": jnp.maximum(ex["row_demand"] - config.row_capacity, 0),
        "dropped_slots": jnp.maximum(ex["slot_demand"] - config.capacity, 0),
    }
    w_rec = config.rec_window
    if w_rec and ex["local_in_kernel"]:
        tri = ex["tri_id_safe"]
        cap = tri.shape[0]
        grid = -(-cap // fragment.CHUNK)
        pad = grid * fragment.CHUNK - cap
        tri_pad = jnp.concatenate([tri, jnp.broadcast_to(tri[-1:], (pad,))])
        live_pad = jnp.concatenate(
            [ex["in_budget"], jnp.zeros((pad,), bool)]
        ).reshape(grid, fragment.CHUNK)
        tri_pad = tri_pad.reshape(grid, fragment.CHUNK)
        bases = (tri_pad[:, 0] // 128) * 128       # fragment._window_bases
        w_all = fragment._w_all(w_rec)
        rel = tri_pad - bases[:, None]
        bad = jnp.logical_and(
            live_pad, jnp.logical_or(rel < 0, rel >= w_all)
        )
        stats["dropped_window"] = jnp.sum(bad.astype(jnp.int32))
    else:
        stats["dropped_window"] = jnp.int32(0)
    return stats


def _expand_slots(mesh, bbox_min, bbox_max, config, ortho_uv=None):
    """Stages 1-3: per-triangle attributes, scanline row expansion, and
    row -> texel-slot expansion. Returns the per-slot decode shared by
    _convert_core and the calibration helpers."""
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
    local_in_kernel = fragment._is_tpu() and t * 4096 < 2**31
    if local_in_kernel:
        # the fragment kernels compute `local` in-kernel (_local_scan), so
        # only the packed-value fill runs — half the scatter+cummax cost
        packed = segments.fill_value(
            offsets, width, cap, row_tri * 4096 + row_local
        )
        packed = jnp.maximum(packed, 0)
        tri_id_safe = packed >> 12
        s_row_local = packed & 4095
        local = jnp.zeros((cap,), jnp.int32)
    elif t * 4096 < 2**31:
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
        local_in_kernel = False
    in_budget = jnp.arange(cap, dtype=jnp.int32) < total
    return dict(
        attrs=attrs, ouv=ouv, geo=geo, tri_id_safe=tri_id_safe,
        s_row_local=s_row_local, local=local, in_budget=in_budget,
        total=total, t=t, local_in_kernel=local_in_kernel,
        # pre-clip demand for _overflow_stats (slot_demand only counts rows
        # that fit row_capacity — a lower bound whenever dropped_rows > 0)
        row_demand=jnp.sum(n_rows), slot_demand=jnp.sum(width),
    )


def _finish_convert(
    mesh, config, stack, mids, factors, has_base, has_normal, has_mr,
    attrs, ouv, geo, tri_id_safe, s_row_local, local, in_budget, t,
    local_in_kernel=False, atlas: PackedAtlas | None = None,
) -> Splats:
    # ---- stage 4: the fused fragment kernel (ops.fragment) ---------------
    # All per-triangle data rides a single field-major record; the per-slot
    # records arrive either via in-kernel window DMA (rec_window > 0) or one
    # fast-tier (~1.4 ns/idx at 20k rows) XLA gather.
    res = config.resolution
    cap = config.capacity
    # metaT rides triangle ids as f32 (field-major kernel layout): exact
    # only below 2^24 (round-3 advisor finding). 16.7M triangles is ~20x
    # the reference's own working scale; raise rather than gather garbage.
    if t >= 1 << 24:
        raise ValueError(
            f"{t} triangles exceeds the fragment kernel's f32 triangle-id "
            "range (2^24); split the scene into multiple convert calls"
        )
    if mids is None:
        mids = jnp.zeros((t,), jnp.int32)
    fac_t = factors[mids]  # (T, 4)

    # per-triangle mip LOD: texture UV varies affinely over ortho-UV, so
    # the texel footprint (GL's implicit-LOD derivative, converterFS.glsl
    # texture() on a mipmapped sampler) is constant per triangle:
    # A = E @ D^-1 maps an ortho-UV step to a texture-UV step; one ortho
    # texel is 1/res, scaled to texture texels by the level-0 dimensions.
    if atlas is not None:
        n_levels = len(atlas.geom)
        th0, tw0 = atlas.geom[0][1], atlas.geom[0][2]
        if n_levels != len(fragment.mip_dims(th0, tw0, config.use_mips)):
            # a prebuilt atlas bakes its mip decision in; a conflicting
            # config would silently win/lose the mip chain
            raise ValueError(
                f"config.use_mips={config.use_mips} conflicts with the "
                f"prebuilt atlas ({n_levels} level(s)); rebuild with "
                f"pack_atlas(material, mips={config.use_mips})"
            )
    elif stack is not None:
        n_levels = len(fragment.mip_dims(
            stack.shape[1], stack.shape[2], config.use_mips))
        th0, tw0 = stack.shape[1], stack.shape[2]
    else:
        n_levels, th0, tw0 = 1, 1, 1
    if n_levels > 1:
        uvt = mesh.tri_uv
        d1 = ouv[:, 1] - ouv[:, 0]
        d2 = ouv[:, 2] - ouv[:, 0]
        e1 = uvt[:, 1] - uvt[:, 0]
        e2 = uvt[:, 2] - uvt[:, 0]
        det = d1[:, 0] * d2[:, 1] - d2[:, 0] * d1[:, 1]
        safe = jnp.where(jnp.abs(det) < 1e-20, 1.0, det)
        a00 = (e1[:, 0] * d2[:, 1] - e2[:, 0] * d1[:, 1]) / safe
        a01 = (-e1[:, 0] * d2[:, 0] + e2[:, 0] * d1[:, 0]) / safe
        a10 = (e1[:, 1] * d2[:, 1] - e2[:, 1] * d1[:, 1]) / safe
        a11 = (-e1[:, 1] * d2[:, 0] + e2[:, 1] * d1[:, 0]) / safe
        sx_t, sy_t = tw0 / res, th0 / res
        rho = jnp.sqrt(jnp.maximum(
            (a00 * sx_t) ** 2 + (a10 * sy_t) ** 2,
            (a01 * sx_t) ** 2 + (a11 * sy_t) ** 2,
        ))
        lod_t = jnp.clip(
            jnp.round(jnp.log2(jnp.maximum(rho, 1.0))), 0, n_levels - 1
        )
        lod_t = jnp.where(jnp.abs(det) < 1e-20, 0.0, lod_t)
    else:
        lod_t = jnp.zeros((t,), jnp.float32)

    record = jnp.concatenate(
        [
            ouv.reshape(t, 6),                       # au..cv       (0-5)
            geo[:, 6:9],                             # tx0 ty0 tw   (6-8)
            mesh.tri_uv.reshape(t, 6),               # ua..vc       (9-14)
            mids[:, None].astype(jnp.float32),       # mid          (15)
            lod_t[:, None],                          # lod          (16)
            mesh.tri_pos.reshape(t, 9),              # (17-25)
            mesh.tri_normal.reshape(t, 9),           # (26-34)
            mesh.tri_tangent.reshape(t, 12),         # (35-46)
            attrs["quat"],                           # (47-50)
            attrs["scale"],                          # (51-53)
            fac_t,                                   # (54-57)
            jnp.zeros((t, fragment.REC_W - 58), jnp.float32),
        ],
        axis=-1,
    )  # (T, REC_W)
    # Non-finite fields (degenerate/NaN triangles — they own no slots) must
    # not reach the kernel's one-hot matmul: 0 * NaN = NaN leaks across the
    # select. Zero them; their slots don't exist, dead slots are masked.
    record = jnp.where(jnp.isfinite(record), record, 0.0)
    # Pad the transposed table so an aligned window DMA at the last chunk
    # stays in bounds (fragment._window_bases aligns bases down by 128).
    w_rec = config.rec_window
    t_pad = -(-(t + w_rec + 128) // 128) * 128
    records = jnp.pad(jnp.transpose(record), ((0, 0), (0, t_pad - t)))
    metaT = jnp.stack(
        [tri_id_safe, s_row_local, local, in_budget.astype(jnp.int32)]
    ).astype(jnp.float32)  # (4, cap)

    taps_packed = False
    if atlas is not None:
        has_stack = True
        atlasT = atlas.atlasT
        geom_mips, k = atlas.geom, atlas.k
        taps_packed = atlas.packed
    elif stack is not None:
        has_stack = True
        m, th, tw_tex, _ = stack.shape
        k = fragment.pack_factor(m * th * tw_tex)
        atlasT, geom_mips = fragment.build_pair_atlas(
            stack, k, mips=config.use_mips
        )
    else:
        has_stack = False
    if has_stack:
        rows_idx = fragment.texel_rows(
            records, metaT, res=res, geom=geom_mips,
            k=k, n_rows=atlasT.shape[1], w_rec=w_rec,
            local_in_kernel=local_in_kernel,
        )
        tapsT = atlasT[:, rows_idx]  # (k*4*10[/2], cap)
    else:
        geom_mips, k = ((0, 1, 1, 1),), 1
        tapsT = jnp.zeros((1, cap), jnp.float32)

    outT, _ = fragment.fragment_apply(
        records, tapsT, metaT, res, tuple(geom_mips), k,
        has_base, has_normal, has_mr, w_rec, local_in_kernel, taps_packed,
    )  # (OUT_W, cap); narrow (cap, k).T views below are layout relabels

    return Splats(
        pos=outT[0:3].T,
        color=outT[3:7].T,
        scale=outT[7:10].T,
        normal=outT[10:13].T,
        quat=outT[13:17].T,
        pbr=outT[17:19].T,
        valid=outT[19] > 0.0,
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


@partial(jax.jit, static_argnames=("config",))
def required_rec_window(
    mesh: TriangleMesh,
    bbox_min: jax.Array,
    bbox_max: jax.Array,
    config: ConversionConfig,
) -> jax.Array:
    """Exact bound on the triangle span of any fragment-kernel slot chunk:
    the minimal ``rec_window`` for the in-kernel record-DMA path (ops.
    fragment). Uses the same expansion as convert, so the bound is tight."""
    if bbox_min.ndim == 2:
        bbox_min, bbox_max = bbox_min[:, None, :], bbox_max[:, None, :]
    ex = _expand_slots(mesh, bbox_min, bbox_max, config)
    tri = ex["tri_id_safe"]
    cap = tri.shape[0]
    grid = -(-cap // fragment.CHUNK)
    pad = grid * fragment.CHUNK - cap
    tri_pad = jnp.concatenate(
        [tri, jnp.broadcast_to(tri[-1:], (pad,))]
    ).reshape(grid, fragment.CHUNK)
    return jnp.max(tri_pad[:, -1] - tri_pad[:, 0]) + 1


def calibrate(
    mesh: TriangleMesh,
    bbox_min,
    bbox_max,
    config: ConversionConfig,
    round_to: int = 8192,
    n_primitives: int = 1,
) -> ConversionConfig:
    """Return a config whose row and texel budgets exactly fit this mesh
    (rounded up for layout friendliness, capped at res^2*layers*
    n_primitives — the reference's min(res^2*6*meshCount, 7M),
    ConversionPass.cpp:21-24). Conversion with the calibrated config produces
    the identical splat set at proportionally lower cost — the TPU analogue
    of the reference paying only for live fragments via atomic appends
    (ConversionPass.cpp:20-33).

    Also measures the fragment kernel's record-window bound (rec_window):
    meshes whose slot chunks span <= 1024 triangles take the in-kernel
    window-DMA path; others keep the per-slot gather."""
    hard_cap = (config.resolution * config.resolution * config.layers
                * max(n_primitives, 1))

    def round_up(n):
        return min(-(-max(int(n), 1) // round_to) * round_to, hard_cap)

    rows = round_up(required_rows(mesh, bbox_min, bbox_max, config))
    cfg_rows = dataclasses.replace(config, row_capacity_override=rows)
    cap = round_up(required_slots(mesh, bbox_min, bbox_max, cfg_rows))
    cfg = dataclasses.replace(
        cfg_rows, capacity_override=max(cap, 1 * round_to)
    )
    span = int(required_rec_window(mesh, bbox_min, bbox_max, cfg))
    w_rec = -(-span // 32) * 32
    return dataclasses.replace(
        cfg, rec_window=w_rec if w_rec <= 1024 else 0
    )


@partial(
    jax.jit,
    static_argnames=("config", "any_base", "any_normal", "any_mr",
                     "return_stats"),
)
def _convert_packed_impl(
    merged, bb_lo, bb_hi, mids, factors, stack, config,
    any_base, any_normal, any_mr, return_stats=False,
):
    return _convert_core(
        merged, bb_lo, bb_hi, config,
        stack=stack if (any_base or any_normal or any_mr) else None,
        mids=mids, factors=factors,
        has_base=any_base, has_normal=any_normal, has_mr=any_mr,
        return_stats=return_stats,
    )


def convert_packed(
    primitives, config: ConversionConfig, shared_bbox=None,
    calibrate_budget: bool = False, return_stats: bool = False,
) -> Splats:
    """Convert a whole multi-primitive scene in ONE fused pass.

    The reference loops draw calls per mesh but appends into a single shared
    gaussian SSBO (ConversionPass.cpp:50-52); the TPU-native analogue merges
    every primitive into one triangle soup with a per-triangle material id
    and bbox, and texture sampling stays ONE gather via a layered tap atlas.

    Deviations (documented): materials lacking a normal map in a scene where
    any material has one get a flat (0.5, 0.5, 1) layer, which yields the
    *normalized* geometric normal instead of the raw interpolated one;
    textures of differing sizes are bilinearly resized to the largest (the
    reference likewise resizes at load, parsers.cpp:38-48).
    """
    import numpy as np

    meshes = [m for m, _ in primitives]
    mats = [mt for _, mt in primitives]
    counts = [int(m.tri_pos.shape[0]) for m in meshes]
    mid_host = np.repeat(np.arange(len(meshes), dtype=np.int32), counts)

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
    mids = jnp.asarray(mid_host)

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
        config = calibrate(merged, bb_lo, bb_hi, config,
                           n_primitives=len(primitives))
    elif not config.capacity_override and len(primitives) > 1:
        # uncalibrated multi-primitive budget scales with primitive count,
        # clamped at the reference's global capacity:
        # min(res^2 * layers * meshCount, 7M) (ConversionPass.cpp:21-24,
        # RenderPass.hpp:9). Round 3 used res^2 * layers regardless of
        # count, which could silently drop whole primitives.
        config = dataclasses.replace(
            config,
            capacity_override=min(
                config.resolution ** 2 * config.layers * len(primitives),
                7_000_000,
            ),
        )

    return _convert_packed_impl(
        merged, bb_lo, bb_hi, mids, factors, stack, config,
        any_base, any_normal, any_mr, return_stats,
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
