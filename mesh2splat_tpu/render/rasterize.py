"""Reference-semantics splat rasterizer (dense jnp).

Reproduces the reference's instanced-quad splatting + hardware "under"
blending (reference: src/renderer/renderPasses/GaussianSplattingPass.cpp:37-97,
gaussianSplattingVS.glsl, gaussianSplattingPS.glsl) as a dense, differentiable
tensor program:

  * global front-to-back depth order  = stable argsort on view depth
    (replaces the GPU radix sort, RadixSortPass.cpp + glu::RadixSort)
  * quad coverage                     = parallelogram test |x|,|y| <= 1 in
    the (major, minor) axis basis (the VS's  mean + x*major + y*minor)
  * falloff                           = exp(-0.5 d^T Conic d) (the PS's
    dot(out_conic.xzy, (d*d, dx*dy)) with pre-negated/halved conic)
  * blending ONE_MINUS_DST_ALPHA, ONE = front-to-back premultiplied "under"
    compositing; each G-buffer target keeps its own alpha accumulator
    (albedo/normal/depth accumulate alpha*g; position/metallic-roughness
    accumulate g — gaussianSplattingPS.glsl:37-45)

This module is the *ground truth* implementation: exact semantics, O(N*H*W)
work, scan-chunked so memory stays bounded. The production tile-binned Pallas
kernel is validated against it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.projection import ProjectedSplats
from ..types import RenderMode


def _pixel_centers(width, height):
    """GL window coords: x right, y up from the bottom; centers at +0.5.
    Returned arrays are (H, W) with row 0 = TOP of the image."""
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    ys = jnp.asarray(height, jnp.float32) - (
        jnp.arange(height, dtype=jnp.float32) + 0.5
    )
    px = jnp.broadcast_to(xs[None, :], (height, width))
    py = jnp.broadcast_to(ys[:, None], (height, width))
    return px, py


def splat_chunk_contribution(
    mean_px, axes_px, conic, px, py
):
    """Coverage and gaussian falloff for a chunk of splats over all pixels.

    mean_px: (K, 2); axes_px: (K, 2, 2); conic: (K, 3); px/py: (H, W).
    Returns g: (K, H, W) falloff masked to the quad parallelogram.
    """
    dx = mean_px[:, 0, None, None] - px[None]  # d = mean - frag (PS:30)
    dy = mean_px[:, 1, None, None] - py[None]

    # parallelogram inside test: solve [major minor] [u v]^T = frag - mean
    mj = axes_px[:, 0]
    mn = axes_px[:, 1]
    det = mj[:, 0] * mn[:, 1] - mn[:, 0] * mj[:, 1]
    det_safe = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    # reciprocal-multiply (one divide per SPLAT, not per pixel) — the Pallas
    # kernel does the same, keeping both paths bit-identical
    rdet = (1.0 / det_safe)[:, None, None]
    fx = -dx
    fy = -dy
    u = (fx * mn[:, 1, None, None] - mn[:, 0, None, None] * fy) * rdet
    v = (mj[:, 0, None, None] * fy - fx * mj[:, 1, None, None]) * rdet
    inside = (jnp.abs(u) <= 1.0) & (jnp.abs(v) <= 1.0)

    power = -(
        0.5 * conic[:, 0, None, None] * dx * dx
        + conic[:, 1, None, None] * dx * dy
        + 0.5 * conic[:, 2, None, None] * dy * dy
    )
    g = jnp.exp(jnp.minimum(power, 0.0))
    return jnp.where(inside, g, 0.0)


@partial(jax.jit, static_argnames=("width", "height", "render_mode", "chunk"))
def rasterize_dense(
    proj: ProjectedSplats,
    width: int,
    height: int,
    render_mode: RenderMode = RenderMode.ALBEDO,
    chunk: int = 256,
):
    """Rasterize to the 5-target G-buffer. Returns a dict of (H, W, 4) arrays:
    albedo, position, normal, depth, metal_rough — premultiplied accumulations
    exactly like the reference's MRTs."""
    n = proj.capacity
    res_half = jnp.asarray([width, height], jnp.float32) * 0.5

    # global front-to-back order (invalid splats sink to the end)
    sort_key = jnp.where(proj.valid, proj.depth, jnp.inf)
    order = jnp.argsort(sort_key, stable=True)
    reorder = lambda a: a[order]

    mean_px = (reorder(proj.mean_ndc) + 1.0) * res_half  # VS:36, no half-pixel
    axes_px = reorder(proj.axes_px)
    conic = reorder(proj.conic)
    color = reorder(proj.color)
    normal = reorder(proj.normal)
    wspos = reorder(proj.wspos)
    pbr = reorder(proj.pbr)
    depth_vs = reorder(proj.depth)  # positive view depth (VS:39 out_depth=conic.w)
    valid = reorder(proj.valid)
    alpha_op = jnp.where(valid, color[:, 3], 0.0)

    px, py = _pixel_centers(width, height)

    pad = (-n) % chunk
    def pad_to(a):
        return jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))

    num_chunks = (n + pad) // chunk

    overdraw = int(render_mode) == int(RenderMode.OVERDRAW)

    def chunked(a):
        return pad_to(a).reshape(num_chunks, chunk, *a.shape[1:])

    xs = (
        chunked(mean_px),
        chunked(axes_px),
        chunked(conic),
        chunked(color),
        chunked(normal),
        chunked(wspos),
        chunked(pbr),
        chunked(depth_vs),
        chunked(alpha_op),
        chunked(valid),
    )

    zero_rgba = jnp.zeros((height, width, 4), jnp.float32)
    init = {
        "albedo": zero_rgba,
        "position": zero_rgba,
        "normal": zero_rgba,
        "depth": zero_rgba,
        "metal_rough": zero_rgba,
        # transmittances 1 - dst_alpha for the two alpha groups
        "T_a": jnp.ones((height, width), jnp.float32),   # alpha*g group
        "T_g": jnp.ones((height, width), jnp.float32),   # g group
    }

    def body(acc, chunk_vals):
        (c_mean, c_axes, c_conic, c_color, c_normal, c_wspos, c_pbr,
         c_depth, c_alpha, c_valid) = chunk_vals
        g = splat_chunk_contribution(c_mean, c_axes, c_conic, px, py)
        g = jnp.where(c_valid[:, None, None], g, 0.0)  # (K, H, W)
        ag = c_alpha[:, None, None] * g

        # within-chunk exclusive transmittance products (front-to-back)
        one_m_ag = 1.0 - ag
        one_m_g = 1.0 - g
        T_a_in = jnp.concatenate(
            [jnp.ones_like(ag[:1]), jnp.cumprod(one_m_ag, axis=0)[:-1]], axis=0
        )
        T_g_in = jnp.concatenate(
            [jnp.ones_like(g[:1]), jnp.cumprod(one_m_g, axis=0)[:-1]], axis=0
        )

        w_a = acc["T_a"][None] * T_a_in  # (K, H, W) weight for alpha*g group
        w_g = acc["T_g"][None] * T_g_in

        if overdraw:
            # additive blend, constant fragment (PS:34-35, pass:63-66)
            cover = (g > 0.0).astype(jnp.float32)
            albedo = acc["albedo"] + jnp.einsum(
                "khw,c->hwc", cover, jnp.asarray([0.01, 0.005, 0.0, 0.01])
            )
            new = dict(acc)
            new["albedo"] = albedo
            return new, None

        def under(dst, src_k, w):
            # dst (H,W,4); src_k (K,H,W,4); w (K,H,W)
            return dst + jnp.einsum("khwc,khw->hwc", src_k, w)

        # albedo: src = (rgb*a, a) * g  (premultiplied, PS:37)
        src_albedo = jnp.concatenate(
            [
                c_color[:, None, None, :3]
                * c_alpha[:, None, None, None]
                * g[..., None],
                ag[..., None],
            ],
            axis=-1,
        )
        # position: src = (wsPos, 1) * g (PS:39)
        src_pos = jnp.concatenate(
            [c_wspos[:, None, None, :] * g[..., None], g[..., None]], axis=-1
        )
        # normal: src = (enc_normal, a) * g (PS:40)
        src_nrm = jnp.concatenate(
            [c_normal[:, None, None, :] * g[..., None], ag[..., None]], axis=-1
        )
        # depth: src rgb = view_depth * g (VS:39: out_depth = conic.w, the
        # positive view depth), alpha = a * g (PS:42-43)
        src_dep = jnp.concatenate(
            [
                jnp.repeat((c_depth[:, None, None] * g)[..., None], 3, axis=-1),
                ag[..., None],
            ],
            axis=-1,
        )
        # metal-rough: src = (m, r, 0, 1) * g (PS:45)
        src_mr = jnp.concatenate(
            [
                c_pbr[:, None, None, :] * g[..., None],
                jnp.zeros_like(g[..., None]),
                g[..., None],
            ],
            axis=-1,
        )

        new = {
            "albedo": under(acc["albedo"], src_albedo, w_a),
            "position": under(acc["position"], src_pos, w_g),
            "normal": under(acc["normal"], src_nrm, w_a),
            "depth": under(acc["depth"], src_dep, w_a),
            "metal_rough": under(acc["metal_rough"], src_mr, w_g),
            "T_a": acc["T_a"] * jnp.prod(one_m_ag, axis=0),
            "T_g": acc["T_g"] * jnp.prod(one_m_g, axis=0),
        }
        return new, None

    acc, _ = jax.lax.scan(body, init, xs)
    out = {k: acc[k] for k in ("albedo", "position", "normal", "depth", "metal_rough")}
    out["transmittance"] = acc["T_a"]
    return out
