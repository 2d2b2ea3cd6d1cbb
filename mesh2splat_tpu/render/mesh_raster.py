"""Triangle mesh rasterizer: depth prepass + mesh G-buffer.

Replaces the reference's DepthPrepass (depth-only FBO used for splat
occlusion culling, reference: src/renderer/renderPasses/DepthPrepass.cpp,
depthPrepassVS/PS.glsl) and MeshRenderPass (second G-buffer for split-screen
mesh-vs-splat comparison, reference: MeshRenderPass.cpp, meshRenderVS/PS.glsl).

TPU formulation: a z-buffered gather — triangles are scanned in chunks with a
running per-pixel (depth, attribute) argmin, entirely dense ops under one jit.
The mesh G-buffer doubles as a test artifact: render mesh and splats from the
same camera and diff (SURVEY.md section 7, step 7).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..types import (
    Camera, Material, RenderMode, TriangleMesh, encode_normal,
    exponential_depth,
)
from ..ops.sampling import sample_bilinear


def _tri_random_color(tri_idx):
    """Per-triangle random color — the reference's gl_PrimitiveID sin-hashes
    (meshRenderPS.glsl:66-69)."""
    t = tri_idx.astype(jnp.float32)

    def h(x):
        return jnp.mod(jnp.sin(x) * 43758.5453, 1.0)

    return jnp.stack([h(t * 311.7), h(t * 269.5 + 1.3), h(t * 183.3 + 2.7)],
                     axis=-1)


def _project_vertices(tri_pos, camera: Camera):
    """World -> clip -> NDC -> window coords (y up, GL convention)."""
    ones = jnp.ones_like(tri_pos[..., :1])
    clip = jnp.concatenate([tri_pos, ones], -1) @ (
        camera.view_to_clip @ camera.world_to_view
    ).T
    w = clip[..., 3:4]
    w_safe = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    ndc = clip[..., :3] / w_safe
    return ndc, w[..., 0]


@partial(jax.jit, static_argnames=(
    "width", "height", "chunk", "opaque_only", "render_mode",
))
def rasterize_mesh(
    mesh: TriangleMesh,
    material: Material,
    camera: Camera,
    width: int,
    height: int,
    chunk: int = 64,
    opaque_only: bool = False,
    render_mode: RenderMode = RenderMode.ALBEDO,
):
    """Returns dict with the 5-target mesh G-buffer plus:
      depth_ndc: (H, W) window-space depth in [0,1] (1 = far/background),
        row 0 = top — the depth-prepass output consumed by splat occlusion
        culling (gaussianSplattingPrepassCS.glsl:79-91)
    opaque_only replicates DepthPrepass's baseColorFactor.a == 1 filter
    (DepthPrepass.cpp:33).

    render_mode selects the albedo-target coloring exactly like the
    reference mesh pass (meshRenderPS.glsl:72-86): albedo / exponential
    depth / encoded (normal-mapped) normal / per-triangle random /
    overdraw constant — so render_split_screen compares like-for-like with
    the splat G-buffer in every mode."""
    t = mesh.tri_pos.shape[0]
    ndc, w_clip = _project_vertices(mesh.tri_pos, camera)

    # window coords: x right, y up, pixel centers at +0.5; our rows are
    # top-first so flip y when comparing
    sx = (ndc[..., 0] + 1.0) * 0.5 * width
    sy = (ndc[..., 1] + 1.0) * 0.5 * height
    sz = ndc[..., 2] * 0.5 + 0.5  # [0, 1] like gl_FragCoord.z

    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    ys = jnp.asarray(height, jnp.float32) - (
        jnp.arange(height, dtype=jnp.float32) + 0.5
    )
    px = jnp.broadcast_to(xs[None, :], (height, width))
    py = jnp.broadcast_to(ys[:, None], (height, width))

    pad = (-t) % chunk

    def pad_to(a):
        return jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))

    num_chunks = (t + pad) // chunk
    tri_valid = jnp.ones((t,), bool)

    if opaque_only:
        tri_valid = jnp.logical_and(tri_valid, material.base_color_factor[3] == 1.0)

    def chunked(a):
        return pad_to(a).reshape(num_chunks, chunk, *a.shape[1:])

    xs_c = (
        chunked(sx), chunked(sy), chunked(sz), chunked(w_clip),
        chunked(mesh.tri_normal), chunked(mesh.tri_uv),
        chunked(tri_valid.astype(jnp.float32)),
        chunked(jnp.arange(t, dtype=jnp.int32)),
    )

    init = {
        "depth": jnp.ones((height, width), jnp.float32),
        "bary": jnp.zeros((height, width, 3), jnp.float32),
        "tri": jnp.full((height, width), -1, jnp.int32),
    }

    def body(acc, cvals):
        csx, csy, csz, cw, cnrm, cuv, cval, cidx = cvals
        ax, ay = csx[:, 0], csy[:, 0]
        bx, by = csx[:, 1], csy[:, 1]
        cx, cy = csx[:, 2], csy[:, 2]

        def edge(x0, y0, x1, y1):
            return (
                (x1 - x0)[:, None, None] * (py[None] - y0[:, None, None])
                - (y1 - y0)[:, None, None] * (px[None] - x0[:, None, None])
            )

        den = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
        w0 = edge(bx, by, cx, cy)  # opposite a
        w1 = edge(cx, cy, ax, ay)  # opposite b
        w2 = edge(ax, ay, bx, by)  # opposite c
        den_safe = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)[:, None, None]
        ba = w0 / den_safe
        bb = w1 / den_safe
        bc = w2 / den_safe
        inside = (ba >= 0) & (bb >= 0) & (bc >= 0)
        # cull behind-camera triangles and degenerates
        ok = (
            inside
            & (cval[:, None, None] > 0.5)
            & (jnp.abs(den)[:, None, None] > 1e-12)
            & jnp.all(cw > 0, axis=1)[:, None, None]
        )
        z = ba * csz[:, 0, None, None] + bb * csz[:, 1, None, None] + bc * csz[:, 2, None, None]
        z = jnp.where(ok & (z >= 0.0) & (z <= 1.0), z, jnp.inf)

        # chunk-local argmin over triangles, then merge with accumulator
        local_min = jnp.min(z, axis=0)
        local_arg = jnp.argmin(z, axis=0)
        take = local_min < acc["depth"]

        def at_arg(a):  # (K, H, W) -> (H, W)
            return jnp.take_along_axis(a, local_arg[None], axis=0)[0]

        new_bary = jnp.stack([at_arg(ba), at_arg(bb), at_arg(bc)], axis=-1)
        new_tri = at_arg(jnp.broadcast_to(cidx[:, None, None], z.shape[:3]))
        return {
            "depth": jnp.where(take, local_min, acc["depth"]),
            "bary": jnp.where(take[..., None], new_bary, acc["bary"]),
            "tri": jnp.where(take, new_tri, acc["tri"]),
        }, None

    acc, _ = jax.lax.scan(body, init, xs_c)

    hit = acc["tri"] >= 0
    tri_safe = jnp.maximum(acc["tri"], 0)
    bary = acc["bary"][..., None]  # (H, W, 3, 1)

    tri_pos_p = pad_to(mesh.tri_pos)[tri_safe]      # (H, W, 3, 3)
    tri_nrm_p = pad_to(mesh.tri_normal)[tri_safe]
    tri_uv_p = pad_to(mesh.tri_uv)[tri_safe]

    pos = jnp.sum(tri_pos_p * bary, axis=2)
    nrm = jnp.sum(tri_nrm_p * bary, axis=2)
    nrm = nrm / (jnp.linalg.norm(nrm, axis=-1, keepdims=True) + 1e-12)
    uv = jnp.sum(tri_uv_p * bary, axis=2)

    if material.has_normal:
        # tangent-space normal mapping, meshRenderPS.glsl:43-52
        tri_tan_p = pad_to(mesh.tri_tangent)[tri_safe]   # (H, W, 3, 4)
        tan4 = jnp.sum(tri_tan_p * bary, axis=2)
        t_vec = tan4[..., :3]
        t_vec = t_vec / (jnp.linalg.norm(t_vec, axis=-1, keepdims=True) + 1e-12)
        b_vec = jnp.cross(nrm, t_vec)
        b_vec = b_vec / (jnp.linalg.norm(b_vec, axis=-1, keepdims=True) + 1e-12)
        b_vec = b_vec * tan4[..., 3:4]
        mapped = sample_bilinear(material.normal, uv)[..., :3] * 2.0 - 1.0
        mapped = mapped / (
            jnp.linalg.norm(mapped, axis=-1, keepdims=True) + 1e-12
        )
        nrm = (
            mapped[..., 0:1] * t_vec
            + mapped[..., 1:2] * b_vec
            + mapped[..., 2:3] * nrm
        )
        nrm = nrm / (jnp.linalg.norm(nrm, axis=-1, keepdims=True) + 1e-12)

    if material.has_base_color:
        albedo = sample_bilinear(material.base_color, uv)
    else:
        albedo = jnp.ones((height, width, 4), jnp.float32)
    albedo = albedo * material.base_color_factor
    if material.has_metallic_roughness:
        mr = sample_bilinear(material.metallic_roughness, uv)
        pbr = jnp.stack([mr[..., 2], mr[..., 1]], axis=-1)
    else:
        pbr = jnp.broadcast_to(
            jnp.asarray([0.1, 0.5], jnp.float32), (height, width, 2)
        )

    hitf = hit.astype(jnp.float32)[..., None]
    view = (
        jnp.concatenate([pos, jnp.ones_like(pos[..., :1])], -1)
        @ camera.world_to_view.T
    )
    view_depth = -view[..., 2]

    # per-mode output color into the albedo target (meshRenderPS.glsl:72-86)
    enc_n = encode_normal(nrm)
    mode = int(render_mode)
    if mode == int(RenderMode.DEPTH):
        expd = exponential_depth(view_depth, camera.near, camera.far)
        out_color = jnp.repeat(expd[..., None], 3, -1)
    elif mode == int(RenderMode.NORMAL):
        out_color = enc_n
    elif mode == int(RenderMode.GEOMETRY):
        out_color = _tri_random_color(tri_safe)
    elif mode == int(RenderMode.OVERDRAW):
        out_color = jnp.broadcast_to(
            jnp.asarray([0.01, 0.005, 0.0], jnp.float32), pos.shape
        )
    else:  # ALBEDO / PBR / FINAL
        out_color = albedo[..., :3]

    gbuffer = {
        "albedo": jnp.concatenate(
            [out_color, jnp.ones_like(albedo[..., :1])], -1
        ) * hitf,
        "position": jnp.concatenate([pos, jnp.ones_like(pos[..., :1])], -1) * hitf,
        "normal": jnp.concatenate(
            [enc_n, jnp.ones_like(pos[..., :1])], -1
        ) * hitf,
        "depth": jnp.concatenate(
            [jnp.repeat(view_depth[..., None], 3, -1), jnp.ones_like(hitf)], -1
        ) * hitf,
        "metal_rough": jnp.concatenate(
            [pbr, jnp.zeros_like(hitf), jnp.ones_like(hitf)], -1
        ) * hitf,
        "transmittance": 1.0 - hitf[..., 0],
    }
    return gbuffer, acc["depth"]
