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
from .sampling import build_tap_atlas, sample_bilinear_atlas
from .triplanar import triangle_conversion_attrs


def _sample(tex, uv):
    """Bilinear sample via a tap atlas: one gather per texture instead of
    four (see sampling.build_tap_atlas)."""
    h, w, c = tex.shape
    return sample_bilinear_atlas(build_tap_atlas(tex), h, w, c, uv)


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

    @property
    def capacity(self) -> int:
        return self.resolution * self.resolution * self.layers

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


@partial(jax.jit, static_argnames=("config",))
def convert(
    mesh: TriangleMesh,
    material: Material,
    bbox_min: jax.Array,
    bbox_max: jax.Array,
    config: ConversionConfig,
) -> Splats:
    """Convert one primitive (triangle soup + material) to splats.

    bbox_min/max: the per-mesh bbox used for ortho-UV normalization
    (reference: ConversionPass.cpp:111-112 binds mesh.bbox)."""
    res = config.resolution
    cap = config.capacity

    # ---- stage 1: per-triangle attributes --------------------------------
    attrs = triangle_conversion_attrs(mesh.tri_pos, bbox_min, bbox_max)
    ouv = attrs["ortho_uv"]  # (T, 3, 2)

    x0, y0, w, h = _triangle_texel_bbox(ouv, res)
    area = w * h
    if config.max_texels_per_tri:
        area = jnp.minimum(area, config.max_texels_per_tri)

    # degenerate triangles (NaN positions / zero UV area) claim no slots
    finite = jnp.all(jnp.isfinite(mesh.tri_pos.reshape(mesh.tri_pos.shape[0], -1)), axis=-1)
    area = jnp.where(finite, area, 0)

    # ---- stage 2: budgeted slot allocation -------------------------------
    offsets, total = segments.alloc_slots(area, cap)

    # ---- stage 3: slot -> (triangle, texel) ------------------------------
    tri_id_safe, local, in_budget = segments.expand_to_slots(offsets, area, cap)
    in_budget = jnp.logical_and(
        in_budget, jnp.arange(cap, dtype=jnp.int32) < total
    )

    # ---- stage 4: the fragment shader as ONE record gather ---------------
    # TPU gathers cost ~8 ms per million rows regardless of row width, so all
    # per-triangle data rides a single packed record: 49 attr floats + bbox
    # ints (exact in f32 below 2^24).
    t = mesh.tri_pos.shape[0]
    record = jnp.concatenate(
        [
            mesh.tri_pos.reshape(t, 9),
            mesh.tri_normal.reshape(t, 9),
            mesh.tri_tangent.reshape(t, 12),
            mesh.tri_uv.reshape(t, 6),
            ouv.reshape(t, 6),
            attrs["quat"],
            attrs["scale"],
            x0[:, None].astype(jnp.float32),
            y0[:, None].astype(jnp.float32),
            jnp.maximum(w, 1)[:, None].astype(jnp.float32),
        ],
        axis=-1,
    )  # (T, 52)
    rec = record[tri_id_safe]  # (cap, 52) — the one gather

    tp = rec[:, 0:9].reshape(cap, 3, 3)
    tn = rec[:, 9:18].reshape(cap, 3, 3)
    tt = rec[:, 18:30].reshape(cap, 3, 4)
    tuv = rec[:, 30:36].reshape(cap, 3, 2)
    t_ouv = rec[:, 36:42].reshape(cap, 3, 2)
    quat = rec[:, 42:46]
    scale = rec[:, 46:49]
    tx0 = rec[:, 49].astype(jnp.int32)
    ty0 = rec[:, 50].astype(jnp.int32)
    tw = rec[:, 51].astype(jnp.int32)

    ti = tx0 + local % tw
    tj = ty0 + local // tw
    uv_c = (jnp.stack([ti, tj], axis=-1).astype(jnp.float32) + 0.5) / res

    bary, _ = _barycentric(uv_c, t_ouv[:, 0], t_ouv[:, 1], t_ouv[:, 2])
    inside = _coverage_top_left(uv_c, t_ouv[:, 0], t_ouv[:, 1], t_ouv[:, 2])
    valid = jnp.logical_and(in_budget, inside)

    b = bary[..., None]
    pos = jnp.sum(tp * b, axis=1)
    nrm = jnp.sum(tn * b, axis=1)
    tan = jnp.sum(tt * b, axis=1)
    uv = jnp.sum(tuv * b, axis=1)

    # albedo (converterFS.glsl:55-62) x u_materialFactor (:99)
    if material.has_base_color:
        albedo = _sample(material.base_color, uv)
    else:
        albedo = jnp.ones((cap, 4), jnp.float32)
    color = albedo * material.base_color_factor

    # normal map via TBN (converterFS.glsl:68-81)
    if material.has_normal:
        nm = _sample(material.normal, uv)
        n_ts = nm * 2.0 - 1.0
        n_ts = n_ts / (jnp.linalg.norm(n_ts, axis=-1, keepdims=True) + 1e-12)
        n_unit = nrm / (jnp.linalg.norm(nrm, axis=-1, keepdims=True) + 1e-12)
        bitan = jnp.cross(n_unit, tan[..., :3])
        bitan = bitan / (jnp.linalg.norm(bitan, axis=-1, keepdims=True) + 1e-12)
        bitan = bitan * tan[..., 3:4]
        # TBN columns (tangent, bitangent, normal)
        out_normal = (
            tan[..., :3] * n_ts[..., 0:1]
            + bitan * n_ts[..., 1:2]
            + n_unit * n_ts[..., 2:3]
        )
        out_normal = out_normal / (
            jnp.linalg.norm(out_normal, axis=-1, keepdims=True) + 1e-12
        )
    else:
        out_normal = nrm

    # metallic-roughness: map .b = metallic, .g = roughness, defaults
    # (0.1, 0.5) when absent (converterFS.glsl:87-95)
    if material.has_metallic_roughness:
        mr = _sample(material.metallic_roughness, uv)
        pbr = jnp.stack([mr[..., 2], mr[..., 1]], axis=-1)
    else:
        pbr = jnp.broadcast_to(
            jnp.asarray([0.1, 0.5], jnp.float32), (cap, 2)
        )

    return Splats(
        pos=pos,
        color=color,
        scale=scale,
        normal=out_normal,
        quat=quat,
        pbr=pbr,
        valid=valid,
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
