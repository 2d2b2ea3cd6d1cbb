"""Differentiable bilinear texture sampling (GL_REPEAT wrap, linear filter).

Replaces GLSL ``texture()`` lookups in the conversion fragment shader
(reference: src/shaders/conversion/converterFS.glsl:57,70,90). Gradients flow
to the texture — this is what makes conversion differentiable w.r.t. source
textures (BASELINE.json north star).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_bilinear(tex: jax.Array, uv: jax.Array) -> jax.Array:
    """tex: (H, W, C); uv: (..., 2) in [0,1] with REPEAT wrap.
    GL convention: texel (i, j) center at uv = ((j+0.5)/W, (i+0.5)/H); the
    reference's textures are uploaded without a vertical flip, so v maps
    straight to row index (reference: src/utils/glUtils.cpp:252-318)."""
    h, w = tex.shape[0], tex.shape[1]
    u = uv[..., 0] * w - 0.5
    v = uv[..., 1] * h - 0.5
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0

    u0i = jnp.mod(u0.astype(jnp.int32), w)
    u1i = jnp.mod(u0i + 1, w)
    v0i = jnp.mod(v0.astype(jnp.int32), h)
    v1i = jnp.mod(v0i + 1, h)

    t00 = tex[v0i, u0i]
    t01 = tex[v0i, u1i]
    t10 = tex[v1i, u0i]
    t11 = tex[v1i, u1i]

    fu = fu[..., None]
    fv = fv[..., None]
    return (
        t00 * (1 - fu) * (1 - fv)
        + t01 * fu * (1 - fv)
        + t10 * (1 - fu) * fv
        + t11 * fu * fv
    )


def sample_nearest(tex: jax.Array, uv: jax.Array) -> jax.Array:
    h, w = tex.shape[0], tex.shape[1]
    ui = jnp.mod(jnp.floor(uv[..., 0] * w).astype(jnp.int32), w)
    vi = jnp.mod(jnp.floor(uv[..., 1] * h).astype(jnp.int32), h)
    return tex[vi, ui]


def build_tap_atlas(tex: jax.Array) -> jax.Array:
    """Precompute the 2x2 bilinear footprint per texel: (H*W, 4C) rows
    [t00, t01, t10, t11] with REPEAT wrap (rolls).

    TPU gathers cost ~8 ms per million *rows* regardless of row width, so one
    atlas gather replaces four corner gathers. Differentiable: rolls + concat
    transpose cleanly back to the texture."""
    h, w, c = tex.shape
    t01 = jnp.roll(tex, -1, axis=1)
    t10 = jnp.roll(tex, -1, axis=0)
    t11 = jnp.roll(t10, -1, axis=1)
    return jnp.concatenate([tex, t01, t10, t11], axis=-1).reshape(h * w, 4 * c)


def sample_bilinear_atlas(atlas: jax.Array, h: int, w: int, c: int, uv: jax.Array):
    """Bilinear sample via a prebuilt tap atlas: ONE gather per call."""
    u = uv[..., 0] * w - 0.5
    v = uv[..., 1] * h - 0.5
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]
    u0i = jnp.mod(u0.astype(jnp.int32), w)
    v0i = jnp.mod(v0.astype(jnp.int32), h)
    rows = atlas[v0i * w + u0i]  # (..., 4C)
    t00 = rows[..., 0 * c : 1 * c]
    t01 = rows[..., 1 * c : 2 * c]
    t10 = rows[..., 2 * c : 3 * c]
    t11 = rows[..., 3 * c : 4 * c]
    return (
        t00 * (1 - fu) * (1 - fv)
        + t01 * fu * (1 - fv)
        + t10 * (1 - fu) * fv
        + t11 * fu * fv
    )


def build_tap_atlas_layered(tex: jax.Array) -> jax.Array:
    """Layered tap atlas for a (M, H, W, C) texture array (one material per
    layer, REPEAT wrap within each layer): (M*H*W, 4C) rows."""
    m, h, w, c = tex.shape
    t01 = jnp.roll(tex, -1, axis=2)
    t10 = jnp.roll(tex, -1, axis=1)
    t11 = jnp.roll(t10, -1, axis=2)
    return jnp.concatenate([tex, t01, t10, t11], axis=-1).reshape(
        m * h * w, 4 * c
    )


def sample_bilinear_atlas_layered(atlas, h, w, c, uv, layer):
    """Bilinear sample of layer ``layer`` (int32 per row) via a layered tap
    atlas: still ONE gather for an entire multi-material batch."""
    u = uv[..., 0] * w - 0.5
    v = uv[..., 1] * h - 0.5
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]
    u0i = jnp.mod(u0.astype(jnp.int32), w)
    v0i = jnp.mod(v0.astype(jnp.int32), h)
    rows = atlas[layer * (h * w) + v0i * w + u0i]  # (..., 4C)
    t00 = rows[..., 0 * c : 1 * c]
    t01 = rows[..., 1 * c : 2 * c]
    t10 = rows[..., 2 * c : 3 * c]
    t11 = rows[..., 3 * c : 4 * c]
    return (
        t00 * (1 - fu) * (1 - fv)
        + t01 * fu * (1 - fv)
        + t10 * (1 - fu) * fv
        + t11 * fu * fv
    )


def build_block_atlas(tex: jax.Array, block: int = 4):
    """Blocked tap atlas: one row per (block x block) texel tile, storing the
    (block+1)^2 texel window (one-texel halo right/down, REPEAT wrap) so any
    bilinear footprint starting inside the tile stays within the row.

    Gather cost on TPU is tiered by table ROW COUNT (~3.5 ns/idx below ~20k
    rows vs ~12 ns at 262k), so a 512^2 texture becomes a 16k-row table.
    Returns (atlas (H/block * W/block, (block+1)^2 * C), block)."""
    h, w, c = tex.shape
    assert h % block == 0 and w % block == 0, (h, w, block)
    hb, wb = h // block, w // block
    taps = []
    for dv in range(block + 1):
        for du in range(block + 1):
            t = jnp.roll(jnp.roll(tex, -dv, axis=0), -du, axis=1)
            # (hb, block, wb, block, c) -> corner texel of each tile window
            taps.append(
                t.reshape(hb, block, wb, block, c)[:, 0, :, 0, :]
            )  # (hb, wb, c)
    stack = jnp.stack(taps, axis=2)  # (hb, wb, (block+1)^2, c)
    return stack.reshape(hb * wb, (block + 1) ** 2 * c)


def sample_bilinear_block_atlas(atlas, h, w, c, uv, block: int = 4):
    """Bilinear sample via a blocked tap atlas: ONE small-table gather; the
    4 footprint corners are picked from the gathered window with a fused
    one-hot contraction (VPU-resident when XLA fuses the gather)."""
    hb, wb = h // block, w // block
    u = uv[..., 0] * w - 0.5
    v = uv[..., 1] * h - 0.5
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]
    u0i = jnp.mod(u0.astype(jnp.int32), w)
    v0i = jnp.mod(v0.astype(jnp.int32), h)
    bu, lu = u0i // block, u0i % block
    bv, lv = v0i // block, v0i % block

    rows = atlas[bv * wb + bu]  # (..., (block+1)^2 * c)
    win = rows.reshape(*rows.shape[:-1], block + 1, block + 1, c)

    # one-hot select of the 2x2 footprint corners from the window
    iu = jnp.arange(block + 1)
    ohu0 = (lu[..., None] == iu).astype(jnp.float32)
    ohu1 = (lu[..., None] + 1 == iu).astype(jnp.float32)
    ohv0 = (lv[..., None] == iu).astype(jnp.float32)
    ohv1 = (lv[..., None] + 1 == iu).astype(jnp.float32)

    def pick(ohv, ohu):
        return jnp.einsum("...vuc,...v,...u->...c", win, ohv, ohu)

    t00 = pick(ohv0, ohu0)
    t01 = pick(ohv0, ohu1)
    t10 = pick(ohv1, ohu0)
    t11 = pick(ohv1, ohu1)
    return (
        t00 * (1 - fu) * (1 - fv)
        + t01 * fu * (1 - fv)
        + t10 * (1 - fu) * fv
        + t11 * fu * fv
    )
