"""Per-tile front-to-back compositing — Pallas TPU kernels with a
hand-written backward pass, over the sort-carry pair layout of binning.py.

This is the TPU-native replacement for the reference's instanced-quad draw +
ROP hardware blending (reference: GaussianSplattingPass.cpp:37-97 issuing
glDrawElementsIndirect with blending ONE_MINUS_DST_ALPHA, ONE). A TPU has no
raster-output units, so the sorted "under" operator runs explicitly: each
(8, 128)-pixel tile walks its depth-ordered pair list, updating premultiplied
accumulators and two transmittance planes in VMEM.

Pair data arrives field-major — an (F_pad, P) f32 buffer (binning.py), so a
chunk of 128 pairs is ONE lane-aligned (F_pad, 128) DMA of a few KB instead
of round 1's 64 KB padded-record window (the pair buffer shrank 8x). Tile
ranges are contiguous and unpadded: the kernel rounds its window start down
to the 128-lane alignment Mosaic requires and masks the out-of-range rows.
The backward kernel writes gradient windows the same way; boundary windows
shared with the previous tile are read-modify-written, which is race-free
because a Pallas TPU grid executes sequentially on the core.

Quad half-axes are NOT carried per pair: they are recomputed in-kernel from
the 3 conic floats (ops.projection.axes_from_conic — the same helper
project_splats uses, so dense/tiled stay bit-identical) at per-PAIR (not
per-pixel) cost.

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
are needed.

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

from ..ops.projection import axes_from_conic
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


def _live_mask(base, start, end):
    """(CHUNK, 1, 1) mask of chunk rows within [start, end) — the window is
    rounded down to lane alignment, so rows before `start` exist too."""
    rows = base + jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
    return (jnp.logical_and(rows >= start, rows < end))[..., None]


def _splat_eval_chunk(s, idx, px, py, live):
    """Coverage-masked gaussian falloff for ALL pairs of the chunk at once.

    s: (CHUNK, F_pad) transposed chunk; idx: field name -> column;
    px/py: (TILE_H, TILE_W); live: (CHUNK, 1, 1). Returns (g, dx, dy), each
    (CHUNK, TILE_H, TILE_W). Quad axes are recomputed from the conic at
    per-pair cost (reference VS quad: gaussianSplattingVS.glsl:32)."""

    def col(name):
        f = idx[name]
        return s[:, f : f + 1][..., None]

    dx = col("mean_x") - px[None]
    dy = col("mean_y") - py[None]
    ca, cb, cc = col("conic_a"), col("conic_b"), col("conic_c")
    power = -(0.5 * ca * dx * dx + cb * dx * dy + 0.5 * cc * dy * dy)
    g = jnp.exp(jnp.minimum(power, 0.0))

    mjx, mjy, mnx, mny = axes_from_conic(ca, cb, cc)
    det = mjx * mny - mnx * mjy
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    rdet = 1.0 / det  # one divide per PAIR, not per pixel
    u = (-dx * mny + mnx * dy) * rdet
    v = (-mjx * dy + dx * mjy) * rdet
    inside = (jnp.abs(u) <= 1.0) & (jnp.abs(v) <= 1.0)
    g = jnp.where(inside & live, g, 0.0)
    return g, dx, dy


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


def _tile_range(starts_ref):
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    tile_id = ti * pl.num_programs(1) + tj
    start = starts_ref[tile_id]
    end = starts_ref[tile_id + 1]
    aligned = (start // CHUNK) * CHUNK
    num_chunks = jnp.where(
        end > start, (end - aligned + CHUNK - 1) // CHUNK, 0
    )
    return ti, tj, start, end, aligned, num_chunks


def _make_forward_kernel(idx, f_pad, albedo_only):
    """Forward kernel factory. albedo_only skips the g-group channels
    (position/metal-rough) and normal/depth — the training hot path only
    consumes premultiplied rgba. DMA is double-buffered: chunk c+1 streams in
    while chunk c composites."""

    def _forward_kernel(
        starts_ref,          # scalar prefetch: (num_tiles + 1,) int32
        height_ref,          # scalar prefetch: (1,) int32 image height
        fields_hbm,          # (F_pad, P) f32 in HBM
        out_ref,             # (NUM_CH, TILE_H, TILE_W) VMEM
        scratch,             # (2, F_pad, CHUNK) VMEM double buffer
        sem,                 # DMA semaphores (2,)
    ):
        ti, tj, start, end, aligned, num_chunks = _tile_range(starts_ref)
        px, py = _pixel_coords(ti, tj, height_ref[0].astype(jnp.float32))

        out_ref[...] = jnp.zeros((NUM_CH, TILE_H, TILE_W), jnp.float32)
        out_ref[CH_TA] = jnp.ones((TILE_H, TILE_W), jnp.float32)
        out_ref[CH_TG] = jnp.ones((TILE_H, TILE_W), jnp.float32)

        def dma(slot, c):
            return pltpu.make_async_copy(
                fields_hbm.at[:, pl.ds(aligned + c * CHUNK, CHUNK)],
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
            s = jnp.transpose(scratch[slot])  # (CHUNK, F_pad)
            base = aligned + c * CHUNK

            g, _, _ = _splat_eval_chunk(s, idx, px, py,
                                        _live_mask(base, start, end))
            alpha = s[:, idx["alpha"] : idx["alpha"] + 1][..., None]
            ag = jnp.minimum(alpha * g, 0.9999)

            def col(name):
                f = idx[name]
                return s[:, f : f + 1][..., None]

            # exclusive within-chunk transmittances x carried-in transmittance
            ex_a = _cumprod_excl(1.0 - ag)
            tot_a = ex_a[CHUNK - 1] * (1.0 - ag[CHUNK - 1])
            w_a = ex_a * out_ref[CH_TA][None]
            gw_a = g * w_a
            agw = alpha * gw_a

            out_ref[0] += jnp.sum(col("col_r") * agw, axis=0)
            out_ref[1] += jnp.sum(col("col_g") * agw, axis=0)
            out_ref[2] += jnp.sum(col("col_b") * agw, axis=0)
            out_ref[3] += jnp.sum(agw, axis=0)

            if not albedo_only:
                ex_g = _cumprod_excl(1.0 - g)
                tot_g = ex_g[CHUNK - 1] * (1.0 - g[CHUNK - 1])
                gw_g = g * ex_g * out_ref[CH_TG][None]
                out_ref[8] += jnp.sum(col("nrm_x") * gw_a, axis=0)
                out_ref[9] += jnp.sum(col("nrm_y") * gw_a, axis=0)
                out_ref[10] += jnp.sum(col("nrm_z") * gw_a, axis=0)
                out_ref[11] += jnp.sum(col("depth") * gw_a, axis=0)
                out_ref[4] += jnp.sum(col("ws_x") * gw_g, axis=0)
                out_ref[5] += jnp.sum(col("ws_y") * gw_g, axis=0)
                out_ref[6] += jnp.sum(col("ws_z") * gw_g, axis=0)
                out_ref[7] += jnp.sum(gw_g, axis=0)
                out_ref[12] += jnp.sum(col("metal") * gw_g, axis=0)
                out_ref[13] += jnp.sum(col("rough") * gw_g, axis=0)
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


def _make_backward_kernel(idx, f_pad, albedo_only):
    def _backward_kernel(
        starts_ref,
        height_ref,
        fields_hbm,          # (F_pad, P)
        ct_ref,              # (NUM_CH, TILE_H, TILE_W) cotangent block
        res_a_ref,           # (1, TILE_H, TILE_W): Btot for the a*g group
        res_g_ref,           # (1, TILE_H, TILE_W): Btot for the g group
        dfields_hbm,         # out: (F_pad, P) gradient columns
        scratch,             # (F_pad, CHUNK) in
        dscratch,            # (F_pad, CHUNK) out
        rmw,                 # (F_pad, CHUNK) boundary-window accumulate
        state,               # (4, TILE_H, TILE_W): T_a, T_g, Bpref_a, Bpref_g
        sem_in,
        sem_rmw,
        sem_out,
    ):
        ti, tj, start, end, aligned, num_chunks = _tile_range(starts_ref)
        px, py = _pixel_coords(ti, tj, height_ref[0].astype(jnp.float32))

        state[0] = jnp.ones((TILE_H, TILE_W), jnp.float32)   # T_a
        state[1] = jnp.ones((TILE_H, TILE_W), jnp.float32)   # T_g
        state[2] = jnp.zeros((TILE_H, TILE_W), jnp.float32)  # Bpref_a
        state[3] = jnp.zeros((TILE_H, TILE_W), jnp.float32)  # Bpref_g

        def chunk_body(c, _):
            base = aligned + c * CHUNK
            cin = pltpu.make_async_copy(
                fields_hbm.at[:, pl.ds(base, CHUNK)], scratch, sem_in
            )
            cin.start()
            # boundary window: the previous tile already wrote gradient rows
            # into this lane window — accumulate instead of clobbering. The
            # Pallas grid runs sequentially on the TensorCore, so the
            # read-modify-write cannot race.
            boundary = jnp.logical_and(c == 0, start != aligned)

            @pl.when(boundary)
            def _():
                crm = pltpu.make_async_copy(
                    dfields_hbm.at[:, pl.ds(base, CHUNK)], rmw, sem_rmw
                )
                crm.start()
                crm.wait()

            cin.wait()
            s = jnp.transpose(scratch[...])  # (CHUNK, F_pad)

            def col(name):
                f = idx[name]
                return s[:, f : f + 1][..., None]

            live = _live_mask(base, start, end)
            g, dx, dy = _splat_eval_chunk(s, idx, px, py, live)
            alpha = col("alpha")
            ag = jnp.minimum(alpha * g, 0.9999)

            ex_a = _cumprod_excl(1.0 - ag)
            tot_a = ex_a[CHUNK - 1] * (1.0 - ag[CHUNK - 1])
            w_a = ex_a * state[0][None]

            ct_rgb = (
                col("col_r") * ct_ref[0][None]
                + col("col_g") * ct_ref[1][None]
                + col("col_b") * ct_ref[2][None]
            )
            sdot_a = alpha * (ct_rgb + ct_ref[3][None])
            if not albedo_only:
                sdot_a = (
                    sdot_a
                    + col("nrm_x") * ct_ref[8][None]
                    + col("nrm_y") * ct_ref[9][None]
                    + col("nrm_z") * ct_ref[10][None]
                    + col("depth") * ct_ref[11][None]
                )

            bpref_a = state[2][None] + _cumsum_incl(sdot_a * g * w_a)
            da = -(res_a_ref[0][None] - bpref_a) / (1.0 - ag)
            dL_dg = sdot_a * w_a + da * alpha
            if not albedo_only:
                ex_g = _cumprod_excl(1.0 - g)
                tot_g = ex_g[CHUNK - 1] * (1.0 - g[CHUNK - 1])
                w_g = ex_g * state[1][None]
                sdot_g = (
                    col("ws_x") * ct_ref[4][None]
                    + col("ws_y") * ct_ref[5][None]
                    + col("ws_z") * ct_ref[6][None]
                    + ct_ref[7][None]
                    + col("metal") * ct_ref[12][None]
                    + col("rough") * ct_ref[13][None]
                )
                bpref_g = state[3][None] + _cumsum_incl(sdot_g * g * w_g)
                dgg = -(res_g_ref[0][None] - bpref_g) / jnp.maximum(
                    1.0 - g, 1e-4
                )
                dL_dg = dL_dg + sdot_g * w_g + dgg
            dL_dalpha = g * (ct_rgb + ct_ref[3][None]) * w_a + da * g

            gp = dL_dg * g  # dL/dpower
            ca, cb, cc = col("conic_a"), col("conic_b"), col("conic_c")

            def rsum(x):
                return jnp.sum(jnp.sum(x, axis=2), axis=1, keepdims=True)

            gwa = g * w_a
            gwg = g * w_g if not albedo_only else gwa
            agt = alpha * gwa

            zeros = jnp.zeros((CHUNK, 1), jnp.float32)
            cols_out = [zeros] * f_pad
            cols_out[idx["mean_x"]] = rsum(gp * -(ca * dx + cb * dy))
            cols_out[idx["mean_y"]] = rsum(gp * -(cc * dy + cb * dx))
            cols_out[idx["conic_a"]] = rsum(gp * (-0.5 * dx * dx))
            cols_out[idx["conic_b"]] = rsum(gp * (-dx * dy))
            cols_out[idx["conic_c"]] = rsum(gp * (-0.5 * dy * dy))
            cols_out[idx["col_r"]] = rsum(agt * ct_ref[0][None])
            cols_out[idx["col_g"]] = rsum(agt * ct_ref[1][None])
            cols_out[idx["col_b"]] = rsum(agt * ct_ref[2][None])
            cols_out[idx["alpha"]] = rsum(dL_dalpha)
            if not albedo_only:
                cols_out[idx["nrm_x"]] = rsum(gwa * ct_ref[8][None])
                cols_out[idx["nrm_y"]] = rsum(gwa * ct_ref[9][None])
                cols_out[idx["nrm_z"]] = rsum(gwa * ct_ref[10][None])
                cols_out[idx["ws_x"]] = rsum(gwg * ct_ref[4][None])
                cols_out[idx["ws_y"]] = rsum(gwg * ct_ref[5][None])
                cols_out[idx["ws_z"]] = rsum(gwg * ct_ref[6][None])
                cols_out[idx["depth"]] = rsum(gwa * ct_ref[11][None])
                cols_out[idx["metal"]] = rsum(gwg * ct_ref[12][None])
                cols_out[idx["rough"]] = rsum(gwg * ct_ref[13][None])

            # rows outside [start, end) carry no gradient from this tile
            live2 = live[:, :, 0]  # (CHUNK, 1)
            dT = jnp.concatenate(cols_out, axis=1)  # (CHUNK, F_pad)
            dT = jnp.where(live2, dT, 0.0)
            dvals = jnp.transpose(dT)  # (F_pad, CHUNK)
            dvals = jnp.where(boundary, dvals + rmw[...], dvals)
            dscratch[...] = dvals

            state[0] *= tot_a
            state[2] += jnp.sum(sdot_a * g * w_a, axis=0)
            if not albedo_only:
                state[1] *= tot_g
                state[3] += jnp.sum(sdot_g * g * w_g, axis=0)

            cout = pltpu.make_async_copy(
                dscratch, dfields_hbm.at[:, pl.ds(base, CHUNK)], sem_out
            )
            cout.start()
            cout.wait()
            return 0

        jax.lax.fori_loop(0, num_chunks, chunk_body, 0)

    return _backward_kernel


# ---------------------------------------------------------------------------
# forward-only walkers: per-tile MIN depth (shadows) and overdraw count
# ---------------------------------------------------------------------------


def _make_min_depth_kernel(idx, f_pad):
    """Per-tile MIN of depth over covering pairs — the hardware depth-test
    semantics of the reference's 6 instanced shadow draws (gl_FragDepth =
    radial distance, GL_LESS; GaussianShadowPass.cpp:156-236,
    gaussianPointLightCubeMapShadowPS.glsl:17). Order-independent."""

    def kernel(starts_ref, height_ref, fields_hbm, out_ref, scratch, sem):
        ti, tj, start, end, aligned, num_chunks = _tile_range(starts_ref)
        px, py = _pixel_coords(ti, tj, height_ref[0].astype(jnp.float32))
        out_ref[...] = jnp.full((1, TILE_H, TILE_W), 3e38, jnp.float32)

        def dma(slot, c):
            return pltpu.make_async_copy(
                fields_hbm.at[:, pl.ds(aligned + c * CHUNK, CHUNK)],
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
            s = jnp.transpose(scratch[slot])
            base = aligned + c * CHUNK
            g, _, _ = _splat_eval_chunk(s, idx, px, py,
                                        _live_mask(base, start, end))
            f = idx["depth"]
            z = jnp.where(g > 0.0, s[:, f : f + 1][..., None], 3e38)
            out_ref[0] = jnp.minimum(out_ref[0], jnp.min(z, axis=0))
            return 0

        jax.lax.fori_loop(0, num_chunks, chunk_body, 0)

    return kernel


def _make_overdraw_kernel(idx, f_pad):
    """Order-independent additive blending (GL_ONE, GL_ONE) of the constant
    overdraw color per covering gaussian — the reference's OVERDRAW debug
    mode (GaussianSplattingPass.cpp:63-66, gaussianSplattingPS.glsl:34-35)."""

    def kernel(starts_ref, height_ref, fields_hbm, out_ref, scratch, sem):
        ti, tj, start, end, aligned, num_chunks = _tile_range(starts_ref)
        px, py = _pixel_coords(ti, tj, height_ref[0].astype(jnp.float32))
        out_ref[...] = jnp.zeros((1, TILE_H, TILE_W), jnp.float32)

        def dma(slot, c):
            return pltpu.make_async_copy(
                fields_hbm.at[:, pl.ds(aligned + c * CHUNK, CHUNK)],
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
            s = jnp.transpose(scratch[slot])
            base = aligned + c * CHUNK
            g, _, _ = _splat_eval_chunk(s, idx, px, py,
                                        _live_mask(base, start, end))
            out_ref[0] += jnp.sum((g > 0.0).astype(jnp.float32), axis=0)
            return 0

        jax.lax.fori_loop(0, num_chunks, chunk_body, 0)

    return kernel


def _single_channel_call(kernel, fields, tile_starts, height_arr, ty, tx,
                         f_pad, interpret):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ty, tx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (1, TILE_H, TILE_W), lambda i, j, *_: (0, i, j),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, f_pad, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (1, ty * TILE_H, tx * TILE_W), jnp.float32
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_starts, height_arr, fields)


def min_depth_tiles(binned: B.BinnedPairs, height_arr, ty, tx, interpret):
    """(1, ty*TILE_H, tx*TILE_W) per-pixel min of depth over covering
    pairs; 3e38 where uncovered. Forward-only (like the reference's shadow
    pass). ``binned`` must use the "depth" field variant."""
    idx = B.field_index("depth")
    f_pad = B.padded_rows("depth")
    return _single_channel_call(
        _make_min_depth_kernel(idx, f_pad), binned.fields, binned.tile_starts,
        height_arr, ty, tx, f_pad, interpret,
    )


def overdraw_tiles(binned: B.BinnedPairs, height_arr, ty, tx, interpret):
    """(1, ty*TILE_H, tx*TILE_W) per-pixel covering-gaussian COUNT (scale by
    the overdraw constant downstream). Forward-only debug visualization.
    ``binned`` must use the "overdraw" (or any conic-bearing) variant."""
    idx = B.field_index("overdraw")
    f_pad = B.padded_rows("overdraw")
    return _single_channel_call(
        _make_overdraw_kernel(idx, f_pad), binned.fields, binned.tile_starts,
        height_arr, ty, tx, f_pad, interpret,
    )


# ---------------------------------------------------------------------------
# differentiable composite
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def composite_tiles(fields, tile_starts, height_arr, ty, tx,
                    interpret, albedo_only=False):
    """fields: (F_pad, P) from binning (variant "albedo" if albedo_only else
    "full"); returns the (NUM_CH, ty*8, tx*128) G-buffer. Differentiable
    w.r.t. fields via the hand-written backward kernel."""
    out, _ = _composite_fwd(fields, tile_starts, height_arr,
                            ty, tx, interpret, albedo_only)
    return out


def _composite_fwd(fields, tile_starts, height_arr, ty, tx, interpret,
                   albedo_only):
    variant = "albedo" if albedo_only else "full"
    idx = B.field_index(variant)
    f_pad = B.padded_rows(variant)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ty, tx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (NUM_CH, TILE_H, TILE_W), lambda i, j, *_: (0, i, j),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, f_pad, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _make_forward_kernel(idx, f_pad, albedo_only),
        out_shape=jax.ShapeDtypeStruct(
            (NUM_CH, ty * TILE_H, tx * TILE_W), jnp.float32
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_starts, height_arr, fields)
    return out, (fields, tile_starts, height_arr, out)


def _composite_bwd(ty, tx, interpret, albedo_only, residuals, ct):
    fields, tile_starts, height_arr, out = residuals
    variant = "albedo" if albedo_only else "full"
    idx = B.field_index(variant)
    f_pad = B.padded_rows(variant)

    # per-pixel Btot per group, + the T-channels' own cotangent contribution
    res_a = sum(out[c] * ct[c] for c in ALPHA_GROUP) + ct[CH_TA] * out[CH_TA]
    res_g = sum(out[c] * ct[c] for c in G_GROUP) + ct[CH_TG] * out[CH_TG]
    res_a = res_a[None]
    res_g = res_g[None]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ty, tx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((NUM_CH, TILE_H, TILE_W), lambda i, j, *_: (0, i, j)),
            pl.BlockSpec((1, TILE_H, TILE_W), lambda i, j, *_: (0, i, j)),
            pl.BlockSpec((1, TILE_H, TILE_W), lambda i, j, *_: (0, i, j)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((f_pad, CHUNK), jnp.float32),
            pltpu.VMEM((f_pad, CHUNK), jnp.float32),
            pltpu.VMEM((f_pad, CHUNK), jnp.float32),
            pltpu.VMEM((4, TILE_H, TILE_W), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    dfields = pl.pallas_call(
        _make_backward_kernel(idx, f_pad, albedo_only),
        out_shape=jax.ShapeDtypeStruct(fields.shape, jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_starts, height_arr, fields, ct, res_a, res_g)

    # windows past the last live pair were never written (uninitialized);
    # dead-sentinel rows must carry zero gradient back through the unsort
    num_pairs = tile_starts[ty * tx]
    lanes = jnp.arange(fields.shape[1], dtype=jnp.int32)
    dfields = jnp.where((lanes < num_pairs)[None, :], dfields, 0.0)
    return dfields, None, None


composite_tiles.defvjp(_composite_fwd, _composite_bwd)
