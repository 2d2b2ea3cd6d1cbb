"""Per-tile front-to-back compositing — Pallas TPU kernels with a
hand-written backward pass, over the sort-carry pair layout of binning.py.

This is the TPU-native replacement for the reference's instanced-quad draw +
ROP hardware blending (reference: GaussianSplattingPass.cpp:37-97 issuing
glDrawElementsIndirect with blending ONE_MINUS_DST_ALPHA, ONE). A TPU has no
raster-output units, so the sorted "under" operator runs explicitly: each
(32, 32)-pixel tile walks its depth-ordered pair list, updating premultiplied
accumulators and two transmittance planes in VMEM. The tile's 1024 pixels
ride a FLAT lane dimension (one (8, 128) f32 register tile per plane row), so
the 2-D tile shape is free to be square — which minimizes quad-span pair
counts (binning.py header).

Engine split, set by round-4 measurements (scripts/exp_raster.py): work goes
to the MXU only where the contraction depth is real; K<=8 contractions are
plain f32 VPU broadcasts (the systolic array pads shallow contractions to
K=128, so a (CHUNK,8)@(8,NPX) "matmul" wastes ~94% of the array — evaluating
the same polynomial elementwise is both faster AND exact):

  * gaussian falloff power and the quad-coverage coordinates (u, v) are
    LINEAR in the pixel-feature basis [1, x, y, x^2, x*y, y^2] (tile-local
    coords); PLANE_EVAL="vpu" (the default) evaluates them as f32 madds —
    identical arithmetic to the dense path. "hybrid" (power plane on the
    MXU at bf16x3) measures 4 ms faster at 1080p but its error is
    structurally unbounded — the polynomial basis has large cancelling
    terms when the mean lies far outside the tile (elongated quads), and
    bf16x3's 2^-16 relative error on those terms reaches ~0.3% of the
    composited depth channel — so it stays a profiling knob. "mxu"
    (everything on the MXU) measures slower (92 ms) AND inexact;
  * the front-to-back transmittance chain is a direct exclusive prefix
    PRODUCT of (1 - a) (TRANSMIT="prod"), log2(CHUNK) Hillis-Steele
    roll+multiply passes — no transcendentals;
  * channel accumulation sum_pairs value[pair] * weight[pair, px] IS a real
    K=CHUNK contraction: a (channels, CHUNK) @ (CHUNK, NPX) bf16x3
    error-compensated MXU matmul (_dot_accum, ~2^-16 relative error — it
    feeds premultiplied channels, never a threshold);
  * the backward pass reduces per-pair gradients over pixels with K=NPX
    moment matmuls against the same feature basis; its shallow
    value-x-cotangent contractions (K=4/K=6) are VPU broadcasts like the
    planes.

Pair data arrives field-major — an (F_pad, P) f32 buffer (binning.py), so a
chunk of 128 pairs is ONE lane-aligned (F_pad, 128) DMA. Tile ranges are
contiguous and unpadded: the kernel rounds its window start down to the
128-lane alignment Mosaic requires and masks the out-of-range rows. The
backward kernel writes gradient windows the same way; boundary windows
shared with the previous tile are read-modify-written, which is race-free
because a Pallas TPU grid executes sequentially on the core.

Quad half-axes are NOT carried per pair: they are recomputed in-kernel from
the 3 conic floats (ops.projection.axes_from_conic — the same helper
project_splats uses, so dense/tiled stay bit-identical) at per-PAIR (not
per-pixel) cost.

Forward deviations from the reference (documented):
  * a tile stops processing once its max alpha-transmittance < 1/255 — the
    reference's hardware blending has no early-out, but contributions below
    that threshold are invisible in 8-bit output (standard 3DGS practice).

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
NPX = TILE_H * TILE_W
NUM_CH = 16
CHUNK = B.CHUNK

ALPHA_GROUP = (0, 1, 2, 3, 8, 9, 10, 11)
G_GROUP = (4, 5, 6, 7, 12, 13)
CH_TA, CH_TG = 14, 15

_MIN_T = 1.0 / 255.0
_MIN_LOG_T = -5.541264  # log(1/255), matching _MIN_T

# kernel tuning knobs (see scripts/profile.py). These are PROFILING-ONLY
# overrides: any value other than the defaults below breaks the
# tiled-vs-dense equivalence guarantee (MS_COMP_PRECISION != "highest"
# flips quad-coverage decisions; MS_COMP_SCAN=0 drops within-chunk depth
# ordering entirely). Unknown values raise instead of silently degrading.
import os as _os

_PREC_NAME = _os.environ.get("MS_COMP_PRECISION", "highest")
if _PREC_NAME not in ("highest", "default", "high"):
    raise ValueError(
        f"MS_COMP_PRECISION={_PREC_NAME!r}: must be 'highest' (default, "
        "correct), 'default', or 'high' (bf16x3; profiling only)"
    )
_EVAL_NAME = _os.environ.get("MS_COMP_EVAL", "vpu")
if _EVAL_NAME not in ("mxu", "vpu", "hybrid"):
    raise ValueError(
        f"MS_COMP_EVAL={_EVAL_NAME!r}: must be 'mxu', 'vpu', or 'hybrid'"
    )
# plane-evaluation strategy, read at TRACE time (module-level for A/B runs)
PLANE_EVAL = _EVAL_NAME
_SCAN_NAME = _os.environ.get("MS_COMP_SCAN", "1")
if _SCAN_NAME not in ("0", "1"):
    raise ValueError(f"MS_COMP_SCAN={_SCAN_NAME!r}: must be '0' or '1'")
_SCAN_ON = _SCAN_NAME == "1"

# Transmittance-chain formulation, read at TRACE time (module-level so the
# profiler can A/B it; the shipped default is fixed below):
#   "prod": direct exclusive prefix PRODUCT of (1 - a) — matches the dense
#           path's arithmetic exactly and needs no transcendentals;
#   "log":  exp(prefix-sum(log(1 - a))) — the round-2/3 formulation (kept
#           for A/B timing; ~1e-6 relative error vs the product).
TRANSMIT = "prod"


def _dot_raw(a, b, precision):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        precision=precision, preferred_element_type=jnp.float32,
    )


def _dotf(a, b):
    """f32-accurate matmul contracting a's dim 1 with b's dim 0.

    "high" = manual bf16x3 error-compensated decomposition (Mosaic's dot
    lowering accepts only DEFAULT/HIGHEST, and HIGHEST costs 6 bf16 MXU
    passes; 3 passes carry ~f32 accuracy for this kernel's O(1e3)-bounded
    magnitudes): with a = a_hi + a_lo, b = b_hi + b_lo rounded through
    bf16, a@b ~= a_hi@b_hi + a_hi@b_lo + a_lo@b_hi (the a_lo@b_lo term is
    below f32 ulp)."""
    if _PREC_NAME == "highest":
        return _dot_raw(a, b, jax.lax.Precision.HIGHEST)
    if _PREC_NAME == "default":
        return _dot_raw(a, b, jax.lax.Precision.DEFAULT)
    a_hi = a.astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    d = jax.lax.Precision.DEFAULT
    return (
        _dot_raw(a_hi, b_hi, d) + _dot_raw(a_hi, b_lo, d)
        + _dot_raw(a_lo, b_hi, d)
    )


def _dott(a, b):
    """Contract dim 0 of both operands: (K, M) x (K, N) -> (M, N), same
    precision policy as _dotf."""
    if _PREC_NAME in ("highest", "default"):
        prec = (jax.lax.Precision.HIGHEST if _PREC_NAME == "highest"
                else jax.lax.Precision.DEFAULT)
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32,
        )
    return _dotf(jnp.transpose(a), b)


# timing-probe knob for _dot_accum (module-level, trace-time; 3 = shipped
# bf16x3 error compensation, 1 = single bf16 pass — A/B PROFILING ONLY,
# 1 loses ~2^-8 relative accuracy on accumulated channels/gradients)
ACCUM_PASSES = 3


def _dot_accum(a, b, transpose_a=False):
    """Error-compensated bf16x3 matmul for ACCUMULATION sites (channel sums,
    gradient moments) — never for coverage-deciding planes. 3 DEFAULT MXU
    passes instead of HIGHEST's 6; relative error ~2^-16 of the term
    magnitudes, far inside the tiled-vs-dense tolerance (these sums feed
    premultiplied channels / gradients, not any hard threshold)."""
    if transpose_a:
        a = jnp.transpose(a)
    a_hi = a.astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)

    def dot(x, y):
        return jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if ACCUM_PASSES == 1:
        return dot(a_hi, b_hi)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return dot(a_hi, b_hi) + dot(a_hi, b_lo) + dot(a_lo, b_hi)


def _shift_rows(x, d, fill=0.0):
    """Shift rows down by d (``fill`` shifted in)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(rows >= d, pltpu.roll(x, d, axis=0), fill)


def _prefix_prod_rows(x, inclusive):
    """f32 prefix PRODUCT along the pair dimension (axis 0): the same
    log2(CHUNK) Hillis-Steele passes as _prefix_rows with multiplies instead
    of adds — no log/exp transcendentals. This is bitwise closer to the
    dense path (rasterize.py computes T as a running product) than the
    log-space chain; deep-stack underflow flushes to 0, which is exactly a
    fully-opaque tail."""
    y = x if inclusive else _shift_rows(x, 1, 1.0)
    d = 1
    while d < x.shape[0]:
        y = y * _shift_rows(y, d, 1.0)
        d *= 2
    return y


def _prefix_rows(x, inclusive):
    """f32 prefix sum along the pair dimension (axis 0) of (CHUNK, NPX):
    log2(CHUNK) Hillis-Steele roll+add VPU passes. Replaces the
    (CHUNK, CHUNK) lower-triangular matmul, which at HIGHEST costs 6 MXU
    passes of K=CHUNK depth — the single most expensive op of the round-2
    kernel (~6.5 us/chunk). Plain f32 adds in tree order: the same accuracy
    class as the f32 matmul it replaces (transmittance chains tolerate
    reordering; coverage never flows through here)."""
    y = x if inclusive else _shift_rows(x, 1)
    d = 1
    while d < x.shape[0]:
        y = y + _shift_rows(y, d)
        d *= 2
    return y


def _pixel_features():
    """(8, NPX) pixel-feature rows [1, x, y, x^2, x*y, y^2, 0, 0] in
    tile-LOCAL coordinates: x = col + .5, y = row + .5 of the flattened
    row-major (TILE_H, TILE_W) pixel index."""
    q = jax.lax.broadcasted_iota(jnp.int32, (1, NPX), 1)
    x = (q % TILE_W).astype(jnp.float32) + 0.5
    y = (q // TILE_W).astype(jnp.float32) + 0.5
    one = jnp.ones((1, NPX), jnp.float32)
    zero = jnp.zeros((1, NPX), jnp.float32)
    return jnp.concatenate([one, x, y, x * x, x * y, y * y, zero, zero], 0)


def _live_col(base, start, end):
    """(CHUNK, 1) mask of chunk rows within [start, end) — the window is
    rounded down to lane alignment, so rows before `start` exist too."""
    rows = base + jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
    return jnp.logical_and(rows >= start, rows < end)


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


def _tile_origin(ti, tj, height):
    """Tile-local frame: window-space pixel px = tjf*TILE_W + x,
    py = py0 - y for local feature coords x, y (see _pixel_features)."""
    tjf = tj.astype(jnp.float32) * TILE_W
    py0 = height - ti.astype(jnp.float32) * TILE_H
    return tjf, py0


def _chunk_planes(st, idx, tjf, py0, feats, live):
    """power/u/v planes for all (pair, pixel) of the chunk via ONE
    (3*CHUNK, 8) @ (8, NPX) matmul, plus the coverage-masked falloff.

    st: (CHUNK, F_pad) chunk records; feats: (8, NPX) pixel features;
    live: (CHUNK, 1) bool. Returns (g, mxp, myp) with g (CHUNK, NPX).
    Quad axes are recomputed from the conic at per-PAIR cost (reference VS
    quad: gaussianSplattingVS.glsl:32)."""

    def col(name):
        f = idx[name]
        return st[:, f:f + 1]

    ca, cb, cc = col("conic_a"), col("conic_b"), col("conic_c")
    mxp = col("mean_x") - tjf       # dx = mxp - x
    myp = col("mean_y") - py0       # dy = myp + y

    mjx, mjy, mnx, mny = axes_from_conic(ca, cb, cc)
    det = mjx * mny - mnx * mjy
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    rdet = 1.0 / det  # one divide per PAIR, not per pixel

    # power = -(.5*ca*dx^2 + cb*dx*dy + .5*cc*dy^2) expanded in [1,x,y,...];
    # u = rdet*(-dx*mny + mnx*dy); v = rdet*(-mjx*dy + dx*mjy) — affine
    c_pw = (
        -(0.5 * ca * mxp * mxp + cb * mxp * myp + 0.5 * cc * myp * myp),
        ca * mxp + cb * myp,
        -(cb * mxp + cc * myp),
        -0.5 * ca,
        cb,
        -0.5 * cc,
    )
    c_u = (rdet * (mnx * myp - mny * mxp), rdet * mny, rdet * mnx)
    c_v = (rdet * (mxp * mjy - mjx * myp), -rdet * mjy, -rdet * mjx)

    if PLANE_EVAL == "mxu":
        z = jnp.zeros((CHUNK, 1), jnp.float32)
        a_pw = jnp.concatenate(list(c_pw) + [z, z], axis=1)
        a_u = jnp.concatenate(list(c_u) + [z] * 5, axis=1)
        a_v = jnp.concatenate(list(c_v) + [z] * 5, axis=1)
        planes = _dotf(jnp.concatenate([a_pw, a_u, a_v], axis=0), feats)
        pw = planes[:CHUNK]
        u = planes[CHUNK:2 * CHUNK]
        v = planes[2 * CHUNK:3 * CHUNK]
    elif PLANE_EVAL == "hybrid":
        # coverage-deciding u/v in exact f32 on the VPU; the power plane —
        # which only scales the falloff, never gates coverage — on the MXU
        # at bf16x3 (3 DEFAULT passes instead of HIGHEST's 6)
        z = jnp.zeros((CHUNK, 1), jnp.float32)
        a_pw = jnp.concatenate(list(c_pw) + [z, z], axis=1)
        pw = _dot_accum(a_pw, feats)
        xp, yp = feats[1:2], feats[2:3]
        u = c_u[0] + c_u[1] * xp + c_u[2] * yp
        v = c_v[0] + c_v[1] * xp + c_v[2] * yp
    else:  # "vpu": all planes in plain f32 madds
        xp, yp = feats[1:2], feats[2:3]
        xx, xy, yy = feats[3:4], feats[4:5], feats[5:6]
        pw = (c_pw[0] + c_pw[1] * xp + c_pw[2] * yp
              + c_pw[3] * xx + c_pw[4] * xy + c_pw[5] * yy)
        u = c_u[0] + c_u[1] * xp + c_u[2] * yp
        v = c_v[0] + c_v[1] * xp + c_v[2] * yp

    inside = (jnp.maximum(jnp.abs(u), jnp.abs(v)) <= 1.0) & live
    g = jnp.where(inside, jnp.exp(jnp.minimum(pw, 0.0)), 0.0)
    return g, mxp, myp


def _make_forward_kernel(idx, f_pad, albedo_only):
    """Forward kernel factory. albedo_only skips the g-group channels
    (position/metal-rough) and normal/depth — the training hot path only
    consumes premultiplied rgba. DMA is double-buffered: chunk c+1 streams in
    while chunk c composites. Accumulators live in a (NUM_CH, NPX) scratch
    (rows CH_TA/CH_TG hold transmittances: linear products init 1.0 under
    TRANSMIT="prod", log-space sums under "log") and are reshaped into the
    output block once per tile."""

    def _forward_kernel(
        starts_ref,          # scalar prefetch: (num_tiles + 1,) int32
        height_ref,          # scalar prefetch: (1,) int32 image height
        fields_hbm,          # (F_pad, P) f32 in HBM
        out_ref,             # (NUM_CH, TILE_H, TILE_W) VMEM
        acc,                 # (NUM_CH, NPX) VMEM accumulators
        scratch,             # (2, F_pad, CHUNK) VMEM double buffer
        sem,                 # DMA semaphores (2,)
    ):
        ti, tj, start, end, aligned, num_chunks = _tile_range(starts_ref)
        tjf, py0 = _tile_origin(ti, tj, height_ref[0].astype(jnp.float32))
        feats = _pixel_features()
        prod = TRANSMIT == "prod"

        acc[...] = jnp.zeros((NUM_CH, NPX), jnp.float32)
        if prod:  # T rows carry the product directly; identity is 1
            acc[CH_TA:CH_TA + 1] = jnp.ones((1, NPX), jnp.float32)
            acc[CH_TG:CH_TG + 1] = jnp.ones((1, NPX), jnp.float32)

        def dma(slot, c):
            return pltpu.make_async_copy(
                fields_hbm.at[:, pl.ds(aligned + c * CHUNK, CHUNK)],
                scratch.at[slot],
                sem.at[slot],
            )

        @pl.when(num_chunks > 0)
        def _():
            dma(0, 0).start()

        stop_thresh = _MIN_T if prod else _MIN_LOG_T

        def chunk_cond(state):
            c, ta_max = state
            return jnp.logical_and(c < num_chunks, ta_max > stop_thresh)

        def chunk_body(state):
            c, _ = state
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < num_chunks)
            def _():
                dma(1 - slot, c + 1).start()

            dma(slot, c).wait()
            st = jnp.transpose(scratch[slot])  # (CHUNK, F_pad)
            base = aligned + c * CHUNK

            def col(name):
                f = idx[name]
                return st[:, f:f + 1]

            g, _, _ = _chunk_planes(st, idx, tjf, py0, feats,
                                    _live_col(base, start, end))
            alpha = col("alpha")
            agr = alpha * g                       # raw, accumulation weight
            ag = jnp.minimum(agr, 0.9999)         # clamped, transmittance
            if prod:
                om = 1.0 - ag
                cum = _prefix_prod_rows(om, inclusive=False)
                e_a = cum * acc[CH_TA:CH_TA + 1]
            elif _SCAN_ON:
                lg = jnp.log(1.0 - ag)
                cum = _prefix_rows(lg, inclusive=False)  # exclusive prefix
                e_a = jnp.exp(cum + acc[CH_TA:CH_TA + 1])
            else:  # timing-experiment knob: no within-chunk ordering
                lg = jnp.log(1.0 - ag)
                cum = jnp.zeros_like(lg)
                e_a = jnp.exp(cum + acc[CH_TA:CH_TA + 1])
            agw = agr * e_a

            ones = jnp.ones((CHUNK, 1), jnp.float32)
            c_a = jnp.concatenate(
                [col("col_r"), col("col_g"), col("col_b"), ones], axis=1
            )
            acc[0:4] += _dot_accum(c_a, agw, transpose_a=True)

            if not albedo_only:
                gw_a = g * e_a
                if prod:
                    omg = 1.0 - g
                    cumg = _prefix_prod_rows(omg, inclusive=False)
                    gw_g = g * (cumg * acc[CH_TG:CH_TG + 1])
                else:
                    lgg = jnp.log(jnp.maximum(1.0 - g, 1e-37))
                    cumg = _prefix_rows(lgg, inclusive=False)
                    gw_g = g * jnp.exp(cumg + acc[CH_TG:CH_TG + 1])
                c_n = jnp.concatenate(
                    [col("nrm_x"), col("nrm_y"), col("nrm_z"), col("depth")],
                    axis=1,
                )
                acc[8:12] += _dot_accum(c_n, gw_a, transpose_a=True)
                c_g = jnp.concatenate(
                    [col("ws_x"), col("ws_y"), col("ws_z"), ones,
                     col("metal"), col("rough")], axis=1,
                )
                gvals = _dot_accum(c_g, gw_g, transpose_a=True)
                acc[4:8] += gvals[0:4]
                acc[12:14] += gvals[4:6]
                if prod:
                    acc[CH_TG:CH_TG + 1] *= (
                        cumg[CHUNK - 1:CHUNK] * omg[CHUNK - 1:CHUNK]
                    )
                else:
                    acc[CH_TG:CH_TG + 1] += (
                        cumg[CHUNK - 1:CHUNK] + lgg[CHUNK - 1:CHUNK]
                    )

            if prod:
                acc[CH_TA:CH_TA + 1] *= (
                    cum[CHUNK - 1:CHUNK] * om[CHUNK - 1:CHUNK]
                )
            else:
                acc[CH_TA:CH_TA + 1] += (
                    cum[CHUNK - 1:CHUNK] + lg[CHUNK - 1:CHUNK]
                )
            return c + 1, jnp.max(acc[CH_TA:CH_TA + 1])

        c_final, _ = jax.lax.while_loop(
            chunk_cond, chunk_body,
            (jnp.int32(0), jnp.float32(1.0 if prod else 0.0)),
        )

        # early exit leaves the prefetched next chunk's DMA in flight
        @pl.when(c_final < num_chunks)
        def _():
            dma(jax.lax.rem(c_final, 2), c_final).wait()

        if not prod:
            acc[CH_TA:CH_TA + 1] = jnp.exp(acc[CH_TA:CH_TA + 1])
            acc[CH_TG:CH_TG + 1] = (
                jnp.exp(acc[CH_TG:CH_TG + 1]) if not albedo_only
                else jnp.ones((1, NPX), jnp.float32)
            )
        elif albedo_only:
            acc[CH_TG:CH_TG + 1] = jnp.ones((1, NPX), jnp.float32)
        out_ref[...] = acc[...][None]

    return _forward_kernel


def _make_backward_kernel(idx, f_pad, albedo_only):
    """Backward kernel factory. Round-4 DMA schedule (the round-3 kernel was
    start->wait serial on BOTH the input and the output copy per chunk):

      * input windows are double-buffered like the forward — chunk c+1
        streams in while chunk c's gradients are computed;
      * the output window copy is asynchronous with up to two in flight
        (one per dscratch slot): chunk c's store is waited only when chunk
        c+2 reuses its slot, before a boundary read-modify-write (the only
        cross-tile window overlap — both slots drain first), and at the end
        of the LAST grid step. Per-slot SMEM flags keep every sem_out wait
        paired with exactly one start. The grid is sequential on the core,
        so the chain is race-free.
    """

    def _backward_kernel(
        starts_ref,
        height_ref,
        fields_hbm,          # (F_pad, P)
        ct_ref,              # (1, NUM_CH, NPX) cotangent tile row
        res_a_ref,           # (1, 1, NPX): Btot for the a*g group
        res_g_ref,           # (1, 1, NPX): Btot for the g group
        dfields_hbm,         # out: (F_pad, P) gradient columns
        scratch,             # (2, F_pad, CHUNK) in, double-buffered
        dscratch,            # (2, F_pad, CHUNK) out, chained
        rmw,                 # (F_pad, CHUNK) boundary-window accumulate
        state,               # (4, NPX): logT_a, logT_g, Bpref_a, Bpref_g
        pending,             # SMEM (1,): outstanding out-DMA slot, -1 none
        sem_in,              # DMA (2,)
        sem_rmw,
        sem_out,             # DMA (2,)
    ):
        ti, tj, start, end, aligned, num_chunks = _tile_range(starts_ref)
        tjf, py0 = _tile_origin(ti, tj, height_ref[0].astype(jnp.float32))
        feats = _pixel_features()
        featsT = jnp.transpose(feats)               # (NPX, 8)
        ct = ct_ref[0]                              # (NUM_CH, NPX)
        ct_rgbaT = jnp.transpose(ct[0:4])           # (NPX, 4)
        res_a = res_a_ref[0]                        # (1, NPX)
        if not albedo_only:
            ct_nT = jnp.transpose(ct[8:12])         # (NPX, 4) nrm+depth
            ct_g6 = jnp.concatenate(
                [ct[4:8], ct[12:14]], axis=0
            )                                       # ws xyz, gacc, met, rgh
            ct_g6T = jnp.transpose(ct_g6)           # (NPX, 6)
            res_g = res_g_ref[0]                    # (1, NPX)

        prod = TRANSMIT == "prod"
        state[...] = jnp.zeros((4, NPX), jnp.float32)
        if prod:  # rows 0/1 carry T products directly; identity is 1
            state[0:2] = jnp.ones((2, NPX), jnp.float32)

        first = jnp.logical_and(ti == 0, tj == 0)

        @pl.when(first)
        def _():
            pending[0] = 0
            pending[1] = 0

        def din(slot, c):
            return pltpu.make_async_copy(
                fields_hbm.at[:, pl.ds(aligned + c * CHUNK, CHUNK)],
                scratch.at[slot], sem_in.at[slot],
            )

        def dout(slot, base):
            return pltpu.make_async_copy(
                dscratch.at[slot], dfields_hbm.at[:, pl.ds(base, CHUNK)],
                sem_out.at[slot],
            )

        def wait_slot(s):
            """Consume slot s's outstanding store, if any (the window
            offset in the reconstructed descriptor is irrelevant — the wait
            only consumes the semaphore for the copy's byte count)."""

            @pl.when(pending[s] == 1)
            def _():
                pltpu.make_async_copy(
                    dscratch.at[s],
                    dfields_hbm.at[:, pl.ds(0, CHUNK)],
                    sem_out.at[s],
                ).wait()

            pending[s] = 0

        @pl.when(num_chunks > 0)
        def _():
            din(0, 0).start()

        def chunk_body(c, _):
            base = aligned + c * CHUNK
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < num_chunks)
            def _():
                din(1 - slot, c + 1).start()

            # boundary window: the previous tile already wrote gradient rows
            # into this lane window — accumulate instead of clobbering. Its
            # store may still be in flight: drain both slots first.
            boundary = jnp.logical_and(c == 0, start != aligned)

            @pl.when(boundary)
            def _():
                wait_slot(0)
                wait_slot(1)
                crm = pltpu.make_async_copy(
                    dfields_hbm.at[:, pl.ds(base, CHUNK)], rmw, sem_rmw
                )
                crm.start()
                crm.wait()

            # the dscratch slot we are about to fill may hold the c-2 store
            wait_slot(slot)

            din(slot, c).wait()
            st = jnp.transpose(scratch[slot])  # (CHUNK, F_pad)

            def col(name):
                f = idx[name]
                return st[:, f:f + 1]

            live = _live_col(base, start, end)
            g, mxp, myp = _chunk_planes(st, idx, tjf, py0, feats, live)
            alpha = col("alpha")
            agr = alpha * g
            ag = jnp.minimum(agr, 0.9999)
            if prod:
                om = 1.0 - ag
                cum = _prefix_prod_rows(om, inclusive=False)
                e_a = cum * state[0:1]               # per-pixel T_a weights
            else:
                lg = jnp.log(1.0 - ag)
                cum = _prefix_rows(lg, inclusive=False)
                e_a = jnp.exp(cum + state[0:1])      # per-pixel T_a weights
            gw_a = g * e_a

            # per-pair-value x cotangent contractions have K=4/K=6 — the MXU
            # pads such contractions to K=128 (6-16x wasted array cycles), so
            # evaluate them as exact f32 VPU broadcasts instead (same change
            # as PLANE_EVAL="vpu" for the forward planes)
            ct_rgb3 = (
                col("col_r") * ct[0:1] + col("col_g") * ct[1:2]
                + col("col_b") * ct[2:3] + ct[3:4]
            )                                        # (CHUNK, NPX)
            sdot_a = alpha * ct_rgb3
            if not albedo_only:
                sdot_a = sdot_a + (
                    col("nrm_x") * ct[8:9] + col("nrm_y") * ct[9:10]
                    + col("nrm_z") * ct[10:11] + col("depth") * ct[11:12]
                )

            p_a = sdot_a * gw_a
            bpref_a = state[2:3] + _prefix_rows(p_a, inclusive=True)
            da = -(res_a - bpref_a) / (1.0 - ag)
            dL_dg = sdot_a * e_a + da * alpha
            if not albedo_only:
                if prod:
                    omg = 1.0 - g
                    cumg = _prefix_prod_rows(omg, inclusive=False)
                    e_g = cumg * state[1:2]
                else:
                    lgg = jnp.log(jnp.maximum(1.0 - g, 1e-37))
                    cumg = _prefix_rows(lgg, inclusive=False)
                    e_g = jnp.exp(cumg + state[1:2])
                gw_g = g * e_g
                # K=6 contraction -> exact f32 VPU broadcasts (see ct_rgb3)
                sdot_g = (
                    col("ws_x") * ct_g6[0:1] + col("ws_y") * ct_g6[1:2]
                    + col("ws_z") * ct_g6[2:3] + ct_g6[3:4]
                    + col("metal") * ct_g6[4:5] + col("rough") * ct_g6[5:6]
                )
                p_g = sdot_g * gw_g
                bpref_g = state[3:4] + _prefix_rows(p_g, inclusive=True)
                dgg = -(res_g - bpref_g) / jnp.maximum(1.0 - g, 1e-4)
                dL_dg = dL_dg + sdot_g * e_g + dgg

            gp = dL_dg * g                           # dL/dpower
            dal = g * (ct_rgb3 * e_a + da)           # dL/dalpha plane

            # moments over pixels: one (2*CHUNK, NPX) @ (NPX, 8) matmul
            mom = _dot_accum(jnp.concatenate([gp, dal], axis=0), featsT)
            m0 = mom[:CHUNK, 0:1]
            mx = mom[:CHUNK, 1:2]
            my = mom[:CHUNK, 2:3]
            mxx = mom[:CHUNK, 3:4]
            mxy = mom[:CHUNK, 4:5]
            myy = mom[:CHUNK, 5:6]
            d_alpha = mom[CHUNK:, 0:1]

            ca, cb, cc = col("conic_a"), col("conic_b"), col("conic_c")
            gx = mxp * m0 - mx                       # sum gp * dx
            gy = myp * m0 + my                       # sum gp * dy
            d_mean_x = -(ca * gx + cb * gy)
            d_mean_y = -(cc * gy + cb * gx)
            d_ca = -0.5 * (mxp * mxp * m0 - 2.0 * mxp * mx + mxx)
            d_cb = -(mxp * myp * m0 + mxp * my - myp * mx - mxy)
            d_cc = -0.5 * (myp * myp * m0 + 2.0 * myp * my + myy)

            d_rgb = _dot_accum(agr * e_a, ct_rgbaT[:, 0:3])  # (CHUNK, 3)

            zeros = jnp.zeros((CHUNK, 1), jnp.float32)
            cols_out = [zeros] * f_pad
            cols_out[idx["mean_x"]] = d_mean_x
            cols_out[idx["mean_y"]] = d_mean_y
            cols_out[idx["conic_a"]] = d_ca
            cols_out[idx["conic_b"]] = d_cb
            cols_out[idx["conic_c"]] = d_cc
            cols_out[idx["col_r"]] = d_rgb[:, 0:1]
            cols_out[idx["col_g"]] = d_rgb[:, 1:2]
            cols_out[idx["col_b"]] = d_rgb[:, 2:3]
            cols_out[idx["alpha"]] = d_alpha
            if not albedo_only:
                d_n = _dot_accum(gw_a, ct_nT)            # (CHUNK, 4)
                d_g6 = _dot_accum(gw_g, ct_g6T)          # (CHUNK, 6)
                cols_out[idx["nrm_x"]] = d_n[:, 0:1]
                cols_out[idx["nrm_y"]] = d_n[:, 1:2]
                cols_out[idx["nrm_z"]] = d_n[:, 2:3]
                cols_out[idx["depth"]] = d_n[:, 3:4]
                cols_out[idx["ws_x"]] = d_g6[:, 0:1]
                cols_out[idx["ws_y"]] = d_g6[:, 1:2]
                cols_out[idx["ws_z"]] = d_g6[:, 2:3]
                cols_out[idx["metal"]] = d_g6[:, 4:5]
                cols_out[idx["rough"]] = d_g6[:, 5:6]

            # rows outside [start, end) carry no gradient from this tile
            dT = jnp.concatenate(cols_out, axis=1)   # (CHUNK, F_pad)
            dT = jnp.where(live, dT, 0.0)
            dvals = jnp.transpose(dT)                # (F_pad, CHUNK)
            dvals = jnp.where(boundary, dvals + rmw[...], dvals)
            dscratch[slot] = dvals

            if prod:
                state[0:1] *= cum[CHUNK - 1:CHUNK] * om[CHUNK - 1:CHUNK]
            else:
                state[0:1] += cum[CHUNK - 1:CHUNK] + lg[CHUNK - 1:CHUNK]
            state[2:3] = bpref_a[CHUNK - 1:CHUNK]
            if not albedo_only:
                if prod:
                    state[1:2] *= (
                        cumg[CHUNK - 1:CHUNK] * omg[CHUNK - 1:CHUNK]
                    )
                else:
                    state[1:2] += (
                        cumg[CHUNK - 1:CHUNK] + lgg[CHUNK - 1:CHUNK]
                    )
                state[3:4] = bpref_g[CHUNK - 1:CHUNK]

            dout(slot, base).start()
            pending[slot] = 1
            return 0

        jax.lax.fori_loop(0, num_chunks, chunk_body, 0)

        # drain before the program ends (the last grid step) — intermediate
        # steps leave stores in flight for the next step's wait_slot; only
        # the shared boundary window can overlap across tiles and the rmw
        # path drains both slots before touching it.
        last = jnp.logical_and(
            ti == pl.num_programs(0) - 1, tj == pl.num_programs(1) - 1
        )

        @pl.when(last)
        def _():
            wait_slot(0)
            wait_slot(1)

    return _backward_kernel


# ---------------------------------------------------------------------------
# forward-only walkers: per-tile MIN depth (shadows) and overdraw count
# ---------------------------------------------------------------------------


def _coverage(st, idx, tjf, py0, feats, live):
    """(CHUNK, NPX) bool coverage = inside quad with non-underflowed
    falloff — matches g > 0 of the compositing path."""
    g, _, _ = _chunk_planes(st, idx, tjf, py0, feats, live)
    return g > 0.0


def _make_min_depth_kernel(idx, f_pad):
    """Per-tile MIN of depth over covering pairs — the hardware depth-test
    semantics of the reference's 6 instanced shadow draws (gl_FragDepth =
    radial distance, GL_LESS; GaussianShadowPass.cpp:156-236,
    gaussianPointLightCubeMapShadowPS.glsl:17). Order-independent."""

    def kernel(starts_ref, height_ref, fields_hbm, out_ref, acc, scratch,
               sem):
        ti, tj, start, end, aligned, num_chunks = _tile_range(starts_ref)
        tjf, py0 = _tile_origin(ti, tj, height_ref[0].astype(jnp.float32))
        feats = _pixel_features()
        acc[...] = jnp.full((1, NPX), 3e38, jnp.float32)

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
            st = jnp.transpose(scratch[slot])
            base = aligned + c * CHUNK
            cov = _coverage(st, idx, tjf, py0, feats,
                            _live_col(base, start, end))
            f = idx["depth"]
            z = jnp.where(cov, st[:, f:f + 1], 3e38)
            acc[0:1] = jnp.minimum(
                acc[0:1], jnp.min(z, axis=0, keepdims=True)
            )
            return 0

        jax.lax.fori_loop(0, num_chunks, chunk_body, 0)
        out_ref[...] = acc[...][None]

    return kernel


def _make_overdraw_kernel(idx, f_pad):
    """Order-independent additive blending (GL_ONE, GL_ONE) of the constant
    overdraw color per covering gaussian — the reference's OVERDRAW debug
    mode (GaussianSplattingPass.cpp:63-66, gaussianSplattingPS.glsl:34-35).
    The count reduction over pairs is a (1, CHUNK) @ (CHUNK, NPX) matmul."""

    def kernel(starts_ref, height_ref, fields_hbm, out_ref, acc, scratch,
               sem):
        ti, tj, start, end, aligned, num_chunks = _tile_range(starts_ref)
        tjf, py0 = _tile_origin(ti, tj, height_ref[0].astype(jnp.float32))
        feats = _pixel_features()
        ones_row = jnp.ones((1, CHUNK), jnp.float32)
        acc[...] = jnp.zeros((1, NPX), jnp.float32)

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
            st = jnp.transpose(scratch[slot])
            base = aligned + c * CHUNK
            cov = _coverage(st, idx, tjf, py0, feats,
                            _live_col(base, start, end))
            acc[0:1] += _dotf(ones_row, cov.astype(jnp.float32))
            return 0

        jax.lax.fori_loop(0, num_chunks, chunk_body, 0)
        out_ref[...] = acc[...][None]

    return kernel


def _check_pair_axis(fields):
    """The kernels DMA CHUNK-aligned windows out of fields; a pair axis that
    is not a CHUNK multiple lets the last window overrun the array, where
    pl.ds clamps the start and silently composites shifted rows. bin_pairs
    pads; reject anything else loudly."""
    if fields.shape[1] % CHUNK:
        raise ValueError(
            f"fields pair axis {fields.shape[1]} must be a multiple of "
            f"CHUNK={CHUNK} (bin_pairs pads automatically)"
        )


def _single_channel_call(kernel, fields, tile_starts, height_arr, ty, tx,
                         f_pad, interpret):
    _check_pair_axis(fields)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ty, tx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (1, 1, NPX), lambda i, j, *_: (i * tx + j, 0, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, NPX), jnp.float32),
            pltpu.VMEM((2, f_pad, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_t = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (ty * tx, 1, NPX), jnp.float32
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_starts, height_arr, fields)
    return _tiles_to_image(out_t, ty, tx, 1)


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


def _tiles_to_image(out_t, ty, tx, ch):
    """(ty*tx, ch, NPX) tile-major kernel output -> (ch, ty*TILE_H,
    tx*TILE_W) image. Mosaic requires output blocks whose trailing dims are
    (8k, 128k)-divisible, so kernels write flat (1, ch, NPX) tile rows and
    this ONE XLA transpose (~133 MB at 1080p, well under a ms) assembles the
    image; pixel q of a tile is (y, x) = (q // TILE_W, q % TILE_W), matching
    _pixel_features."""
    return (
        out_t.reshape(ty, tx, ch, TILE_H, TILE_W)
        .transpose(2, 0, 3, 1, 4)
        .reshape(ch, ty * TILE_H, tx * TILE_W)
    )


def _image_to_tiles(img, ty, tx):
    """Inverse of _tiles_to_image: (ch, ty*TILE_H, tx*TILE_W) ->
    (ty*tx, ch, NPX)."""
    ch = img.shape[0]
    return (
        img.reshape(ch, ty, TILE_H, tx, TILE_W)
        .transpose(1, 3, 0, 2, 4)
        .reshape(ty * tx, ch, NPX)
    )


def _composite_fwd(fields, tile_starts, height_arr, ty, tx, interpret,
                   albedo_only):
    variant = "albedo" if albedo_only else "full"
    idx = B.field_index(variant)
    f_pad = B.padded_rows(variant)
    _check_pair_axis(fields)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ty, tx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (1, NUM_CH, NPX), lambda i, j, *_: (i * tx + j, 0, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((NUM_CH, NPX), jnp.float32),
            pltpu.VMEM((2, f_pad, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_t = pl.pallas_call(
        _make_forward_kernel(idx, f_pad, albedo_only),
        out_shape=jax.ShapeDtypeStruct(
            (ty * tx, NUM_CH, NPX), jnp.float32
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_starts, height_arr, fields)
    out = _tiles_to_image(out_t, ty, tx, NUM_CH)
    return out, (fields, tile_starts, height_arr, out)


def _composite_bwd(ty, tx, interpret, albedo_only, residuals, ct):
    fields, tile_starts, height_arr, out = residuals

    # per-pixel Btot per group, + the T-channels' own cotangent contribution
    res_a = sum(out[c] * ct[c] for c in ALPHA_GROUP) + ct[CH_TA] * out[CH_TA]
    res_g = sum(out[c] * ct[c] for c in G_GROUP) + ct[CH_TG] * out[CH_TG]
    # kernel inputs ride the flat tile-major layout (see _tiles_to_image)
    ct_t = _image_to_tiles(ct, ty, tx)
    res_a_t = _image_to_tiles(res_a[None], ty, tx)
    res_g_t = _image_to_tiles(res_g[None], ty, tx)

    variant = "albedo" if albedo_only else "full"
    idx = B.field_index(variant)
    f_pad = B.padded_rows(variant)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ty, tx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, NUM_CH, NPX), lambda i, j, *_: (i * tx + j, 0, 0)),
            pl.BlockSpec((1, 1, NPX), lambda i, j, *_: (i * tx + j, 0, 0)),
            pl.BlockSpec((1, 1, NPX), lambda i, j, *_: (i * tx + j, 0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, f_pad, CHUNK), jnp.float32),   # in, dbl-buffered
            pltpu.VMEM((2, f_pad, CHUNK), jnp.float32),   # out, chained
            pltpu.VMEM((f_pad, CHUNK), jnp.float32),      # rmw
            pltpu.VMEM((4, NPX), jnp.float32),
            pltpu.SMEM((2,), jnp.int32),                  # pending flags
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    dfields = pl.pallas_call(
        _make_backward_kernel(idx, f_pad, albedo_only),
        out_shape=jax.ShapeDtypeStruct(fields.shape, jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_starts, height_arr, fields, ct_t, res_a_t, res_g_t)

    # windows past the last live pair were never written (uninitialized);
    # dead-sentinel rows must carry zero gradient back through the unsort
    num_pairs = tile_starts[ty * tx]
    lanes = jnp.arange(fields.shape[1], dtype=jnp.int32)
    dfields = jnp.where((lanes < num_pairs)[None, :], dfields, 0.0)
    return dfields, None, None


composite_tiles.defvjp(_composite_fwd, _composite_bwd)
