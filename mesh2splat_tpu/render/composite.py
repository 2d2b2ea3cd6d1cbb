"""Per-tile front-to-back compositing — Pallas TPU kernel with a hand-written
backward pass.

This is the TPU-native replacement for the reference's instanced-quad draw +
ROP hardware blending (reference: GaussianSplattingPass.cpp:37-97 issuing
glDrawElementsIndirect with blending ONE_MINUS_DST_ALPHA, ONE). A TPU has no
raster-output units, so the sorted "under" operator runs explicitly: each
(8, 128)-pixel tile walks its depth-ordered pair list (built by binning.py),
updating premultiplied accumulators and two transmittance planes in VMEM.

Forward deviation from the reference (documented): a tile stops processing
once its max alpha-transmittance < 1/255 — the reference's hardware blending
has no early-out, but contributions below that threshold are invisible in
8-bit output (standard 3DGS practice).

The backward pass is the differentiable-3DGS suffix trick, per tile: for
out = sum_i s_i * T_i with T_i = prod_{j<i}(1 - a_j),
  dL/ds_i = T_i * ct
  dL/da_i = -(Btot - Bpref_i) / (1 - a_i),   Btot = dot(out, ct) + ct_T * T_fin
where Bpref_i = sum_{j<=i} (s_j . ct) T_j accumulates during a second
front-to-back traversal, so no per-pixel division chains or reverse traversal
are needed. Per-pair grads are written to disjoint CHUNK-aligned ranges (one
tile each, binning.py guarantees alignment); JAX's native VJP of the binning
gather then scatter-adds them onto splats.

G-buffer channel layout (16, H, W):
  0-2 albedo rgb premult | 3 alpha-acc (a*g group) | 4-6 wsPos premult
  7 g-acc | 8-10 encoded normal premult | 11 view depth premult
  12 metallic | 13 roughness | 14 T_a | 15 T_g
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import binning as B

TILE_H = B.TILE_H
TILE_W = B.TILE_W
NUM_CH = 16
CHUNK = B.CHUNK

ALPHA_GROUP = (0, 1, 2, 3, 8, 9, 10, 11)
G_GROUP = (4, 5, 6, 7, 12, 13)
CH_TA, CH_TG = 14, 15

_MIN_T = 1.0 / 255.0


def _pixel_coords(tile_row, tile_col, height):
    """GL window-space pixel centers for this tile; row 0 of the array is the
    TOP of the image (y_gl decreasing with row)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1).astype(jnp.float32)
    px = tile_col.astype(jnp.float32) * TILE_W + cols + 0.5
    py = height - (tile_row.astype(jnp.float32) * TILE_H + rows + 0.5)
    return px, py


def _row(s, f):
    """Field column f of the (K, NUM_FIELDS) scratch chunk, broadcastable
    over pixels: (K, 1, 1). Static lane slice — Mosaic-friendly."""
    return s[:, f : f + 1][..., None]


def _splat_eval_chunk(s, px, py, live):
    """Coverage-masked gaussian falloff for ALL pairs of the chunk at once.

    s: (K, NUM_FIELDS) VMEM scratch; px/py: (TILE_H, TILE_W); live: (K, 1, 1)
    mask of rows inside this tile's range. Returns (g, dx, dy), each
    (K, TILE_H, TILE_W). Fully vectorized — Mosaic cannot scalar-load at
    dynamic lane offsets, and the VPU is far better used this way regardless.
    """
    dx = _row(s, B.F_MEAN_X) - px[None]
    dy = _row(s, B.F_MEAN_Y) - py[None]
    ca, cb, cc = _row(s, B.F_CONIC_A), _row(s, B.F_CONIC_B), _row(s, B.F_CONIC_C)
    power = -(0.5 * ca * dx * dx + cb * dx * dy + 0.5 * cc * dy * dy)
    g = jnp.exp(jnp.minimum(power, 0.0))
    mjx, mjy = _row(s, B.F_AX_MAJ_X), _row(s, B.F_AX_MAJ_Y)
    mnx, mny = _row(s, B.F_AX_MIN_X), _row(s, B.F_AX_MIN_Y)
    det = mjx * mny - mnx * mjy
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    u = (-dx * mny + mnx * dy) / det
    v = (-mjx * dy + dx * mjy) / det
    inside = (jnp.abs(u) <= 1.0) & (jnp.abs(v) <= 1.0)
    ok = inside & (_row(s, B.F_VALID) > 0.5) & live
    g = jnp.where(ok, g, 0.0)
    return g, dx, dy


def _live_mask(base, end):
    """(CHUNK, 1, 1) mask of chunk rows within [base, end)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
    return ((base + rows) < end)[..., None]


def _cumprod_excl(x):
    """Exclusive cumulative product along axis 0 (static length) via a
    doubling scan — log2(K) shifted multiplies, all static slices."""
    k = x.shape[0]
    ones = jnp.ones_like(x[:1])
    y = x
    shift = 1
    while shift < k:
        pad = jnp.ones_like(x[:shift])
        y = y * jnp.concatenate([pad, y[:-shift]], axis=0)
        shift *= 2
    return jnp.concatenate([ones, y[:-1]], axis=0)


def _cumsum_incl(x):
    """Inclusive cumulative sum along axis 0 via a doubling scan."""
    k = x.shape[0]
    y = x
    shift = 1
    while shift < k:
        pad = jnp.zeros_like(x[:shift])
        y = y + jnp.concatenate([pad, y[:-shift]], axis=0)
        shift *= 2
    return y


def _make_forward_kernel(albedo_only: bool):
    """Forward kernel factory. albedo_only skips the g-group channels
    (position/metal-rough) and normal/depth — the training hot path only
    consumes premultiplied rgba. DMA is double-buffered: chunk c+1 streams in
    while chunk c composites."""

    def _forward_kernel(
        starts_ref,          # scalar prefetch: (num_tiles + 1,) int32 (aligned)
        counts_ref,          # scalar prefetch: (num_tiles,) int32 live counts
        height_ref,          # scalar prefetch: (1,) int32 image height
        pairs_hbm,           # (P, NUM_FIELDS) f32 in HBM
        out_ref,             # (NUM_CH, TILE_H, TILE_W) VMEM
        scratch,             # (2, CHUNK, NUM_FIELDS) VMEM double buffer
        sem,                 # DMA semaphores (2,)
    ):
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        tile_id = ti * pl.num_programs(1) + tj
        start = starts_ref[tile_id]
        end = start + counts_ref[tile_id]

        px, py = _pixel_coords(ti, tj, height_ref[0].astype(jnp.float32))

        out_ref[...] = jnp.zeros((NUM_CH, TILE_H, TILE_W), jnp.float32)
        out_ref[CH_TA] = jnp.ones((TILE_H, TILE_W), jnp.float32)
        out_ref[CH_TG] = jnp.ones((TILE_H, TILE_W), jnp.float32)

        num_chunks = (end - start + CHUNK - 1) // CHUNK

        def dma(slot, c):
            return pltpu.make_async_copy(
                pairs_hbm.at[pl.ds(start + c * CHUNK, CHUNK), :],
                scratch.at[slot],
                sem.at[slot],
            )

        @pl.when(num_chunks > 0)
        def _():
            dma(0, 0).start()

        def chunk_cond(state):
            c, t_max = state
            return jnp.logical_and(c < num_chunks, t_max > _MIN_T)

        def chunk_body(state):
            c, _ = state
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < num_chunks)
            def _():
                dma(1 - slot, c + 1).start()

            dma(slot, c).wait()
            s = scratch[slot]
            base = start + c * CHUNK

            g, _, _ = _splat_eval_chunk(s, px, py, _live_mask(base, end))
            alpha = _row(s, B.F_ALPHA)
            ag = jnp.minimum(alpha * g, 0.9999)

            # exclusive within-chunk transmittances x carried-in transmittance
            ex_a = _cumprod_excl(1.0 - ag)
            # negative indices lower to dynamic_slice (unsupported); use static
            tot_a = ex_a[CHUNK - 1] * (1.0 - ag[CHUNK - 1])
            w_a = ex_a * out_ref[CH_TA][None]
            gw_a = g * w_a
            agw = alpha * gw_a

            out_ref[0] += jnp.sum(_row(s, B.F_COL_R) * agw, axis=0)
            out_ref[1] += jnp.sum(_row(s, B.F_COL_G) * agw, axis=0)
            out_ref[2] += jnp.sum(_row(s, B.F_COL_B) * agw, axis=0)
            out_ref[3] += jnp.sum(agw, axis=0)

            if not albedo_only:
                ex_g = _cumprod_excl(1.0 - g)
                tot_g = ex_g[CHUNK - 1] * (1.0 - g[CHUNK - 1])
                gw_g = g * ex_g * out_ref[CH_TG][None]
                out_ref[8] += jnp.sum(_row(s, B.F_NRM_X) * gw_a, axis=0)
                out_ref[9] += jnp.sum(_row(s, B.F_NRM_Y) * gw_a, axis=0)
                out_ref[10] += jnp.sum(_row(s, B.F_NRM_Z) * gw_a, axis=0)
                out_ref[11] += jnp.sum(_row(s, B.F_DEPTH) * gw_a, axis=0)
                out_ref[4] += jnp.sum(_row(s, B.F_WS_X) * gw_g, axis=0)
                out_ref[5] += jnp.sum(_row(s, B.F_WS_Y) * gw_g, axis=0)
                out_ref[6] += jnp.sum(_row(s, B.F_WS_Z) * gw_g, axis=0)
                out_ref[7] += jnp.sum(gw_g, axis=0)
                out_ref[12] += jnp.sum(_row(s, B.F_METAL) * gw_g, axis=0)
                out_ref[13] += jnp.sum(_row(s, B.F_ROUGH) * gw_g, axis=0)
                out_ref[CH_TG] *= tot_g

            out_ref[CH_TA] *= tot_a
            return c + 1, jnp.max(out_ref[CH_TA])

        c_final, _ = jax.lax.while_loop(
            chunk_cond, chunk_body, (jnp.int32(0), jnp.float32(1.0))
        )

        # early exit leaves the prefetched next chunk's DMA in flight
        @pl.when(c_final < num_chunks)
        def _():
            dma(jax.lax.rem(c_final, 2), c_final).wait()

    return _forward_kernel


def _backward_kernel(
    starts_ref,
    counts_ref,
    height_ref,
    pairs_hbm,           # (P, NUM_FIELDS)
    ct_ref,              # (NUM_CH, TILE_H, TILE_W) cotangent block
    res_a_ref,           # (1, TILE_H, TILE_W): Btot for the a*g group
    res_g_ref,           # (1, TILE_H, TILE_W): Btot for the g group
    dpairs_hbm,          # out: (P, NUM_FIELDS) gradient rows
    scratch,             # (CHUNK, NUM_FIELDS)
    dscratch,            # (CHUNK, NUM_FIELDS)
    state,               # (4, TILE_H, TILE_W): T_a, T_g, Bpref_a, Bpref_g
    sem_in,
    sem_out,
    *,
    albedo_only: bool = False,
):
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    tile_id = ti * pl.num_programs(1) + tj
    start = starts_ref[tile_id]
    end = start + counts_ref[tile_id]

    px, py = _pixel_coords(ti, tj, height_ref[0].astype(jnp.float32))

    state[0] = jnp.ones((TILE_H, TILE_W), jnp.float32)   # T_a
    state[1] = jnp.ones((TILE_H, TILE_W), jnp.float32)   # T_g
    state[2] = jnp.zeros((TILE_H, TILE_W), jnp.float32)  # Bpref_a
    state[3] = jnp.zeros((TILE_H, TILE_W), jnp.float32)  # Bpref_g

    num_chunks = (end - start + CHUNK - 1) // CHUNK

    def chunk_body(c, _):
        base = start + c * CHUNK
        cin = pltpu.make_async_copy(
            pairs_hbm.at[pl.ds(base, CHUNK), :], scratch, sem_in
        )
        cin.start()
        cin.wait()

        dscratch[...] = jnp.zeros((CHUNK, B.PAIR_WIDTH), jnp.float32)
        g, dx, dy = _splat_eval_chunk(scratch, px, py, _live_mask(base, end))
        alpha = _row(scratch, B.F_ALPHA)
        ag = jnp.minimum(alpha * g, 0.9999)

        ex_a = _cumprod_excl(1.0 - ag)
        tot_a = ex_a[CHUNK - 1] * (1.0 - ag[CHUNK - 1])
        w_a = ex_a * state[0][None]

        ct_rgb = (
            _row(scratch, B.F_COL_R) * ct_ref[0][None]
            + _row(scratch, B.F_COL_G) * ct_ref[1][None]
            + _row(scratch, B.F_COL_B) * ct_ref[2][None]
        )
        sdot_a = alpha * (ct_rgb + ct_ref[3][None])
        if not albedo_only:
            sdot_a = (
                sdot_a
                + _row(scratch, B.F_NRM_X) * ct_ref[8][None]
                + _row(scratch, B.F_NRM_Y) * ct_ref[9][None]
                + _row(scratch, B.F_NRM_Z) * ct_ref[10][None]
                + _row(scratch, B.F_DEPTH) * ct_ref[11][None]
            )

        bpref_a = state[2][None] + _cumsum_incl(sdot_a * g * w_a)
        da = -(res_a_ref[0][None] - bpref_a) / (1.0 - ag)
        dL_dg = sdot_a * w_a + da * alpha
        if not albedo_only:
            ex_g = _cumprod_excl(1.0 - g)
            tot_g = ex_g[CHUNK - 1] * (1.0 - g[CHUNK - 1])
            w_g = ex_g * state[1][None]
            sdot_g = (
                _row(scratch, B.F_WS_X) * ct_ref[4][None]
                + _row(scratch, B.F_WS_Y) * ct_ref[5][None]
                + _row(scratch, B.F_WS_Z) * ct_ref[6][None]
                + ct_ref[7][None]
                + _row(scratch, B.F_METAL) * ct_ref[12][None]
                + _row(scratch, B.F_ROUGH) * ct_ref[13][None]
            )
            bpref_g = state[3][None] + _cumsum_incl(sdot_g * g * w_g)
            dgg = -(res_g_ref[0][None] - bpref_g) / jnp.maximum(1.0 - g, 1e-4)
            dL_dg = dL_dg + sdot_g * w_g + dgg
        dL_dalpha = g * (ct_rgb + ct_ref[3][None]) * w_a + da * g

        gp = dL_dg * g  # dL/dpower
        ca, cb, cc = (
            _row(scratch, B.F_CONIC_A),
            _row(scratch, B.F_CONIC_B),
            _row(scratch, B.F_CONIC_C),
        )

        def rsum(x):
            return jnp.sum(jnp.sum(x, axis=2), axis=1, keepdims=True)

        gwa = g * w_a
        gwg = g * w_g if not albedo_only else gwa
        agt = alpha * gwa
        dscratch[:, B.F_MEAN_X : B.F_MEAN_X + 1] = rsum(gp * -(ca * dx + cb * dy))
        dscratch[:, B.F_MEAN_Y : B.F_MEAN_Y + 1] = rsum(gp * -(cc * dy + cb * dx))
        dscratch[:, B.F_CONIC_A : B.F_CONIC_A + 1] = rsum(gp * (-0.5 * dx * dx))
        dscratch[:, B.F_CONIC_B : B.F_CONIC_B + 1] = rsum(gp * (-dx * dy))
        dscratch[:, B.F_CONIC_C : B.F_CONIC_C + 1] = rsum(gp * (-0.5 * dy * dy))
        dscratch[:, B.F_COL_R : B.F_COL_R + 1] = rsum(agt * ct_ref[0][None])
        dscratch[:, B.F_COL_G : B.F_COL_G + 1] = rsum(agt * ct_ref[1][None])
        dscratch[:, B.F_COL_B : B.F_COL_B + 1] = rsum(agt * ct_ref[2][None])
        dscratch[:, B.F_ALPHA : B.F_ALPHA + 1] = rsum(dL_dalpha)
        if not albedo_only:
            dscratch[:, B.F_NRM_X : B.F_NRM_X + 1] = rsum(gwa * ct_ref[8][None])
            dscratch[:, B.F_NRM_Y : B.F_NRM_Y + 1] = rsum(gwa * ct_ref[9][None])
            dscratch[:, B.F_NRM_Z : B.F_NRM_Z + 1] = rsum(gwa * ct_ref[10][None])
            dscratch[:, B.F_WS_X : B.F_WS_X + 1] = rsum(gwg * ct_ref[4][None])
            dscratch[:, B.F_WS_Y : B.F_WS_Y + 1] = rsum(gwg * ct_ref[5][None])
            dscratch[:, B.F_WS_Z : B.F_WS_Z + 1] = rsum(gwg * ct_ref[6][None])
            dscratch[:, B.F_DEPTH : B.F_DEPTH + 1] = rsum(gwa * ct_ref[11][None])
            dscratch[:, B.F_METAL : B.F_METAL + 1] = rsum(gwg * ct_ref[12][None])
            dscratch[:, B.F_ROUGH : B.F_ROUGH + 1] = rsum(gwg * ct_ref[13][None])

        state[0] *= tot_a
        state[2] += jnp.sum(sdot_a * g * w_a, axis=0)
        if not albedo_only:
            state[1] *= tot_g
            state[3] += jnp.sum(sdot_g * g * w_g, axis=0)

        cout = pltpu.make_async_copy(
            dscratch, dpairs_hbm.at[pl.ds(base, CHUNK), :], sem_out
        )
        cout.start()
        cout.wait()
        return 0

    jax.lax.fori_loop(0, num_chunks, chunk_body, 0)


def _min_depth_kernel(
    starts_ref, counts_ref, height_ref, pairs_hbm, out_ref, scratch, sem
):
    """Per-tile MIN of F_DEPTH over covering pairs — the hardware depth-test
    semantics of the reference's 6 instanced shadow draws (gl_FragDepth =
    radial distance, GL_LESS; GaussianShadowPass.cpp:156-236,
    gaussianPointLightCubeMapShadowPS.glsl:17). Order-independent: no sorted
    traversal or transmittance needed."""
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    tile_id = ti * pl.num_programs(1) + tj
    start = starts_ref[tile_id]
    end = start + counts_ref[tile_id]

    px, py = _pixel_coords(ti, tj, height_ref[0].astype(jnp.float32))
    out_ref[...] = jnp.full((1, TILE_H, TILE_W), 3e38, jnp.float32)

    num_chunks = (end - start + CHUNK - 1) // CHUNK

    def dma(slot, c):
        return pltpu.make_async_copy(
            pairs_hbm.at[pl.ds(start + c * CHUNK, CHUNK), :],
            scratch.at[slot],
            sem.at[slot],
        )

    @pl.when(num_chunks > 0)
    def _():
        dma(0, 0).start()

    def chunk_body(c, _):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < num_chunks)
        def _():
            dma(1 - slot, c + 1).start()

        dma(slot, c).wait()
        s = scratch[slot]
        base = start + c * CHUNK
        g, _, _ = _splat_eval_chunk(s, px, py, _live_mask(base, end))
        z = jnp.where(g > 0.0, _row(s, B.F_DEPTH), 3e38)
        out_ref[0] = jnp.minimum(out_ref[0], jnp.min(z, axis=0))
        return 0

    jax.lax.fori_loop(0, num_chunks, chunk_body, 0)


def min_depth_tiles(pair_data, tile_starts, tile_counts, height_arr, ty, tx,
                    interpret):
    """(1, ty*TILE_H, tx*TILE_W) per-pixel min of F_DEPTH over covering
    pairs; 3e38 where uncovered. Forward-only (like the reference's shadow
    pass)."""
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ty, tx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (1, TILE_H, TILE_W), lambda i, j, *_: (0, i, j),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, B.PAIR_WIDTH), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _min_depth_kernel,
        out_shape=jax.ShapeDtypeStruct(
            (1, ty * TILE_H, tx * TILE_W), jnp.float32
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_starts, tile_counts, height_arr, pair_data)


def _additive_kernel(
    starts_ref, counts_ref, height_ref, pairs_hbm, out_ref, scratch, sem
):
    """Order-independent additive blending (GL_ONE, GL_ONE) of the constant
    overdraw color per covering gaussian — the reference's OVERDRAW debug
    mode (GaussianSplattingPass.cpp:63-66, gaussianSplattingPS.glsl:34-35:
    each fragment adds (.01, .005, 0, .01))."""
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    tile_id = ti * pl.num_programs(1) + tj
    start = starts_ref[tile_id]
    end = start + counts_ref[tile_id]

    px, py = _pixel_coords(ti, tj, height_ref[0].astype(jnp.float32))
    out_ref[...] = jnp.zeros((1, TILE_H, TILE_W), jnp.float32)

    num_chunks = (end - start + CHUNK - 1) // CHUNK

    def dma(slot, c):
        return pltpu.make_async_copy(
            pairs_hbm.at[pl.ds(start + c * CHUNK, CHUNK), :],
            scratch.at[slot],
            sem.at[slot],
        )

    @pl.when(num_chunks > 0)
    def _():
        dma(0, 0).start()

    def chunk_body(c, _):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < num_chunks)
        def _():
            dma(1 - slot, c + 1).start()

        dma(slot, c).wait()
        s = scratch[slot]
        base = start + c * CHUNK
        g, _, _ = _splat_eval_chunk(s, px, py, _live_mask(base, end))
        out_ref[0] += jnp.sum((g > 0.0).astype(jnp.float32), axis=0)
        return 0

    jax.lax.fori_loop(0, num_chunks, chunk_body, 0)


def overdraw_tiles(pair_data, tile_starts, tile_counts, height_arr, ty, tx,
                   interpret):
    """(1, ty*TILE_H, tx*TILE_W) per-pixel covering-gaussian COUNT (scale by
    the overdraw constant downstream). Forward-only debug visualization."""
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ty, tx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (1, TILE_H, TILE_W), lambda i, j, *_: (0, i, j),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, B.PAIR_WIDTH), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _additive_kernel,
        out_shape=jax.ShapeDtypeStruct(
            (1, ty * TILE_H, tx * TILE_W), jnp.float32
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_starts, tile_counts, height_arr, pair_data)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def composite_tiles(pair_data, tile_starts, tile_counts, height_arr, ty, tx,
                    interpret, albedo_only=False):
    """pair_data: (P, NUM_FIELDS) from binning (CHUNK-aligned layout);
    returns the (NUM_CH, ty*8, tx*128) G-buffer. Differentiable w.r.t.
    pair_data via the hand-written backward kernel. With albedo_only, only
    the rgba channels (+T_a) are computed — the training hot path."""
    out, _ = _composite_fwd(pair_data, tile_starts, tile_counts, height_arr,
                            ty, tx, interpret, albedo_only)
    return out


def _composite_fwd(pair_data, tile_starts, tile_counts, height_arr, ty, tx,
                   interpret, albedo_only):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ty, tx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (NUM_CH, TILE_H, TILE_W), lambda i, j, *_: (0, i, j),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, B.PAIR_WIDTH), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _make_forward_kernel(albedo_only),
        out_shape=jax.ShapeDtypeStruct((NUM_CH, ty * TILE_H, tx * TILE_W), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_starts, tile_counts, height_arr, pair_data)
    return out, (pair_data, tile_starts, tile_counts, height_arr, out)


def _composite_bwd(ty, tx, interpret, albedo_only, residuals, ct):
    pair_data, tile_starts, tile_counts, height_arr, out = residuals

    # per-pixel Btot per group, + the T-channels' own cotangent contribution
    res_a = sum(out[c] * ct[c] for c in ALPHA_GROUP) + ct[CH_TA] * out[CH_TA]
    res_g = sum(out[c] * ct[c] for c in G_GROUP) + ct[CH_TG] * out[CH_TG]
    res_a = res_a[None]
    res_g = res_g[None]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ty, tx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((NUM_CH, TILE_H, TILE_W), lambda i, j, *_: (0, i, j)),
            pl.BlockSpec((1, TILE_H, TILE_W), lambda i, j, *_: (0, i, j)),
            pl.BlockSpec((1, TILE_H, TILE_W), lambda i, j, *_: (0, i, j)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((CHUNK, B.PAIR_WIDTH), jnp.float32),
            pltpu.VMEM((CHUNK, B.PAIR_WIDTH), jnp.float32),
            pltpu.VMEM((4, TILE_H, TILE_W), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    dpairs = pl.pallas_call(
        functools.partial(_backward_kernel, albedo_only=albedo_only),
        out_shape=jax.ShapeDtypeStruct(pair_data.shape, jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_starts, tile_counts, height_arr, pair_data, ct, res_a, res_g)

    # dead slots (inter-tile padding, overflow tail) carry no gradient; use
    # where() not multiply — the unwritten tail may hold NaN garbage
    dpairs = jnp.where((pair_data[:, B.F_VALID] > 0.5)[:, None], dpairs, 0.0)
    return dpairs, None, None, None


composite_tiles.defvjp(_composite_fwd, _composite_bwd)
