"""Sort-carry tile binning: the TPU-native replacement for the reference's
global GPU radix sort + gather (reference:
src/renderer/renderPasses/RadixSortPass.cpp, thirdParty/RadixSort.hpp,
radixSortPrepass.glsl, radixSortGather.glsl).

The reference sorts ALL splats by view depth once and lets ROP hardware blend
quads in that order. A TPU has no ROP, so compositing is explicit per pixel
tile; the global sort becomes per-tile depth-ordered pair lists.

Design (round 2 — rebuilt from measured TPU primitive costs; see
scripts/ubench*.py):

  * ``lax.sort`` costs ~7 ms per 3.5M int32 keys and only ~2.6 ms per extra
    carried operand, while row gathers cost ~9 ns/row + ~0.9 ns/float and
    scatters ~5-9 ns/element. The round-1 pipeline (expand -> gather tables ->
    sort indices -> scatter relayout -> gather 24-float records) paid five
    P-scale random-access passes (~236 ms at 3.5M pairs); this design pays
    approximately ONE sort that carries the field values themselves.

  * (tile, splat) pair expansion is CLASS-SPLIT to minimize sorted rows
    (round 5; sort cost is ~linear in rows x operands):
      - class A: the FIRST tile of every valid splat's span rectangle.
        One row per splat, no expansion machinery at all — the field
        columns ARE the rows. Covers ~70% of all live pairs on the bench
        scene (most splats span exactly one 32x32 tile).
      - class C: tiles 2..span of multi-tile splats, through the exact
        budgeted expansion (cumsum slot allocation + one merged gather) at
        a calibrated small capacity.
    Total sorted rows = N + c_capacity (~2.7M on the 1080p bench scene vs
    5.2M for the round-4 fixed-3-slot broadcast — the sort halves).

  * ONE ``lax.sort`` over all candidate rows with keys (tile, view_depth
    [, rowid]), CARRYING every per-pair field column. Sorting on the f32
    depth directly replaces the round-2a global argsort+scatter rank pass
    (two more P-scale passes) at the cost of one extra key operand. The
    rowid tertiary key reproduces the dense rasterizer's stable tie-break
    (splat index order) for coincident depths. Dead slots get a sentinel
    tile and sort past the live pairs.

  * Per-tile ranges come from ONE searchsorted over the sorted keys. Ranges
    are contiguous (no padding): the compositing kernel rounds its DMA window
    down to CHUNK alignment and masks, and the backward kernel read-modify-
    writes shared boundary windows — safe because a TPU Pallas grid executes
    sequentially on the core.

  * Differentiability: the only non-jax-differentiable step is the sort; it
    is wrapped in a custom VJP whose backward UN-sorts the incoming field
    cotangents by the carried row id (one more cheap sort). Everything
    around it (broadcasts, the class-C record gather) autodiffs natively.

Tiles are (32, 32) pixels — 1024 px, still exactly one (8, 128) f32 VPU
register tile per (pair, pixel) plane row inside the composite kernel (the
kernel's pixel axis is a FLAT 1024-lane dimension; the tile's 2-D shape only
affects which pixels those lanes are). Square tiles minimize the quad-span
perimeter effect: on the bench scene, (32, 32) tiles produce 2.59M pairs
where (8, 128) produced 3.54M (-27% compositing work) at the same sorted-row
count (measured, scripts/exp_bin2.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import segments
from ..ops.projection import ProjectedSplats

import os as _os

# Tile shape: PROFILING-ONLY override (scripts/profile.py A/B runs). The
# composite kernel's pixel axis is a flat TILE_H*TILE_W lane dimension, so
# any shape with NPX a multiple of 128 works; (32, 32) measured best on the
# 1080p bench scene (pair count vs per-pair pixel work tradeoff).
TILE_H = int(_os.environ.get("M2S_TILE_H", "32"))
TILE_W = int(_os.environ.get("M2S_TILE_W", "32"))
if (TILE_H * TILE_W) % 128 or TILE_H < 8 or TILE_W < 8:
    raise ValueError(
        f"tile shape ({TILE_H}, {TILE_W}): TILE_H*TILE_W must be a multiple "
        "of 128 (flat lane dimension) and both sides >= 8"
    )

# compositing kernel DMA granularity (lane-aligned windows); PROFILING-ONLY
# override M2S_COMP_CHUNK, must stay a multiple of 128 (Mosaic lane slices)
CHUNK = int(_os.environ.get("M2S_COMP_CHUNK", "128"))
if CHUNK % 128:
    raise ValueError(f"M2S_COMP_CHUNK={CHUNK} must be a multiple of 128")

# ---------------------------------------------------------------------------
# field registry: names -> row index in the (F_pad, P) pair-field buffer
# ---------------------------------------------------------------------------

FIELDS_ALBEDO = (
    "mean_x", "mean_y", "conic_a", "conic_b", "conic_c",
    "col_r", "col_g", "col_b", "alpha",
)
FIELDS_FULL = FIELDS_ALBEDO + (
    "nrm_x", "nrm_y", "nrm_z", "ws_x", "ws_y", "ws_z",
    "depth", "metal", "rough",
)
FIELDS_DEPTH = ("mean_x", "mean_y", "conic_a", "conic_b", "conic_c", "depth")
FIELDS_OVERDRAW = ("mean_x", "mean_y", "conic_a", "conic_b", "conic_c")

VARIANT_FIELDS = {
    "albedo": FIELDS_ALBEDO,
    "full": FIELDS_FULL,
    "depth": FIELDS_DEPTH,
    "overdraw": FIELDS_OVERDRAW,
}


def field_index(variant: str) -> dict:
    return {name: i for i, name in enumerate(VARIANT_FIELDS[variant])}


def padded_rows(variant: str) -> int:
    """Sublane-multiple row count of the (F_pad, P) buffer (clean in-kernel
    transposes)."""
    f = len(VARIANT_FIELDS[variant])
    return -(-f // 8) * 8


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BinnedPairs:
    """Per-tile depth-ordered pair field lists: tile t owns rows
    [tile_starts[t], tile_starts[t+1]) of ``fields`` (contiguous, unpadded)."""

    fields: jax.Array       # (F_pad, P_cap) f32, sorted by (tile, depth rank)
    tile_starts: jax.Array  # (num_tiles + 1,) int32
    num_pairs: jax.Array    # scalar int32 (live pairs)
    dropped_pairs: jax.Array  # scalar int32: class-C pairs lost to the budget

    @property
    def capacity(self):
        return self.fields.shape[1]

    @property
    def tile_counts(self):
        return self.tile_starts[1:] - self.tile_starts[:-1]


def tiles_for(width: int, height: int) -> tuple[int, int]:
    return -(-height // TILE_H), -(-width // TILE_W)


# ---------------------------------------------------------------------------
# sort with carried values + custom unsort VJP
# ---------------------------------------------------------------------------


def _f0(like):
    return np.zeros(like.shape, dtype=jax.dtypes.float0)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _sort_carry(num_keys, *ops):
    """ops = (tile int32, depth f32, rowid int32, *f32 values); the first
    num_keys (=3) operands are sort keys — rowid doubles as a stable
    tie-break. Returns the fully sorted tuple. Differentiable w.r.t. the
    value operands: the backward pass re-sorts the cotangents by the carried
    row id (the permutation inverse), far cheaper than a P-scale gather.

    is_stable=False everywhere here: the rowid key makes every key tuple
    unique, so stability is vacuous — and the unstable path measures ~5 ms
    faster at 5M rows (scripts/exp_bin.py)."""
    return tuple(jax.lax.sort(ops, num_keys=num_keys, is_stable=False))


def _sort_carry_fwd(num_keys, *ops):
    out = tuple(jax.lax.sort(ops, num_keys=num_keys, is_stable=False))
    return out, out[num_keys - 1]  # rowid_sorted


def _sort_carry_bwd(num_keys, rowid_sorted, cts):
    dvals = cts[num_keys:]
    unsorted = jax.lax.sort(
        (rowid_sorted, *dvals), num_keys=1, is_stable=False
    )[1:]
    zero_keys = (
        _f0(rowid_sorted),                               # tile (int32)
        jnp.zeros(rowid_sorted.shape, jnp.float32),      # depth (f32 key)
        _f0(rowid_sorted),                               # rowid (int32)
    )
    return zero_keys + tuple(unsorted)


_sort_carry.defvjp(_sort_carry_fwd, _sort_carry_bwd)


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------


def _tile_geom(proj: ProjectedSplats, width: int, height: int,
               band_ty=None):
    """Elementwise per-splat tile bbox + validity (no expansion).

    band_ty: optional (ty_lo, ty_hi) int32 arrays per splat clamping the
    tile-row range — the per-face scissor of the fused shadow cubemap
    (6 faces stacked vertically in one tall image; a splat's pairs must not
    bleed into the neighboring face's band)."""
    ty, tx = tiles_for(width, height)
    res_half = jnp.asarray([width, height], jnp.float32) * 0.5
    mean_px = (proj.mean_ndc + 1.0) * res_half  # GL window coords, y up
    # parallelogram extent per axis: |maj| + |min| componentwise (+ a hair of
    # slack so the in-kernel axes recomputation can never exceed the bbox)
    ext = jnp.abs(proj.axes_px[:, 0]) + jnp.abs(proj.axes_px[:, 1]) + 1e-3

    x_lo = mean_px[:, 0] - ext[:, 0]
    x_hi = mean_px[:, 0] + ext[:, 0]
    row_c = jnp.asarray(height, jnp.float32) - mean_px[:, 1]  # row 0 = top
    y_lo = row_c - ext[:, 1]
    y_hi = row_c + ext[:, 1]

    ty_lo, ty_hi = (0, ty - 1) if band_ty is None else band_ty
    tx0 = jnp.clip(jnp.floor(x_lo / TILE_W).astype(jnp.int32), 0, tx - 1)
    tx1 = jnp.clip(jnp.floor(x_hi / TILE_W).astype(jnp.int32), 0, tx - 1)
    ty0 = jnp.clip(jnp.floor(y_lo / TILE_H).astype(jnp.int32), ty_lo, ty_hi)
    ty1 = jnp.clip(jnp.floor(y_hi / TILE_H).astype(jnp.int32), ty_lo, ty_hi)

    on_screen = (x_hi >= 0) & (x_lo < width) & (y_hi >= 0) & (y_lo < height)
    valid = proj.valid & on_screen
    if band_ty is not None:
        # a quad entirely outside its band claims no tiles; the double clip
        # above can produce ty0 > ty1 there, which yields sy <= 0 pairs
        band_rows_lo = ty_lo.astype(jnp.float32) * TILE_H
        band_rows_hi = (ty_hi + 1).astype(jnp.float32) * TILE_H
        valid = valid & (y_hi >= band_rows_lo) & (y_lo < band_rows_hi)
    sx = tx1 - tx0 + 1
    sy = ty1 - ty0 + 1
    return mean_px, tx0, ty0, sx, sy, valid


def _record_columns(proj: ProjectedSplats, mean_px, variant: str):
    cols = {
        "mean_x": mean_px[:, 0],
        "mean_y": jnp.asarray(0.0),  # filled by caller (row coords differ)
        "conic_a": proj.conic[:, 0],
        "conic_b": proj.conic[:, 1],
        "conic_c": proj.conic[:, 2],
        "col_r": proj.color[:, 0],
        "col_g": proj.color[:, 1],
        "col_b": proj.color[:, 2],
        "alpha": proj.color[:, 3],
        "nrm_x": proj.normal[:, 0],
        "nrm_y": proj.normal[:, 1],
        "nrm_z": proj.normal[:, 2],
        "ws_x": proj.wspos[:, 0],
        "ws_y": proj.wspos[:, 1],
        "ws_z": proj.wspos[:, 2],
        "depth": proj.depth,
        "metal": proj.pbr[:, 0],
        "rough": proj.pbr[:, 1],
    }
    cols["mean_y"] = mean_px[:, 1]
    return [cols[name] for name in VARIANT_FIELDS[variant]]


# ---------------------------------------------------------------------------
# the binner
# ---------------------------------------------------------------------------


def default_c_capacity(n_splats: int) -> int:
    """Uncalibrated class-C budget: generous (overflowing drops the
    beyond-first-tile pairs of multi-tile splats). Callers with telemetry
    use calibrate_overflow."""
    return max(4 * n_splats, 1 << 13)


def bin_pairs(
    proj: ProjectedSplats,
    width: int,
    height: int,
    c_capacity: int = 0,
    variant: str = "full",
    differentiable: bool = True,
    band_ty=None,
) -> BinnedPairs:
    """Build depth-ordered per-tile pair field lists from projected splats.

    band_ty: optional per-splat (ty_lo, ty_hi) tile-row clamp (see
    _tile_geom) — used by the fused shadow cubemap."""
    n = proj.capacity
    ty, tx = tiles_for(width, height)
    num_tiles = ty * tx
    # static bit budget of packed_geom below: tx0 7 bits, ty0 11, sx 7
    if tx > 127 or ty > 2047:
        raise ValueError(
            f"image {width}x{height} exceeds the binner's packed-geometry "
            f"budget ({127 * TILE_W}x{2047 * TILE_H} max); widen packed_geom"
        )
    if not c_capacity:
        c_capacity = default_c_capacity(n)

    mean_px, tx0, ty0, sx, sy, valid = _tile_geom(proj, width, height,
                                                  band_ty)
    pairs_n = sx * sy

    # near->far within tile comes from sorting on the f32 view depth
    # directly (radixSortPrepass.glsl:29-32 invariant, minus the
    # float-bits-to-uint trick a comparison sort does not need)
    depth = proj.depth

    vals = _record_columns(proj, mean_px, variant)
    nf = len(vals)

    # ---- class A: first tile of every valid splat — zero expansion -------
    # One row per splat: the field columns ARE the rows, the tile is the
    # span rectangle's row-major first tile (ty0, tx0). No broadcast, no
    # gathers; ~70% of live pairs on the bench scene ride here.
    live_a = valid
    tile_a = ty0 * tx + tx0
    depth_a = depth
    vals_a = vals

    # ---- class C: exact budgeted expansion for tiles 2..span -------------
    counts_c = jnp.where(valid & (pairs_n > 1), pairs_n - 1, 0)
    off_c, tot_c = segments.alloc_slots(counts_c, c_capacity)
    # ONE owner fill (scatter+cummax cost scales with the 1.5M producer
    # starts, ~14 ms each at this size — so fill once and recover `local`
    # from a narrow per-owner gather of the segment offsets instead of a
    # second fill)
    owner_c = segments.fill_value(
        off_c, counts_c, c_capacity, jnp.arange(n, dtype=jnp.int32)
    )
    owner_c = jnp.maximum(owner_c, 0)
    live_c = jnp.arange(c_capacity, dtype=jnp.int32) < tot_c
    # ONE merged (C, F+3)-row gather for segment offset + packed tile
    # geometry + depth + field values (gather cost is ~per-ROW, so merging
    # the former separate geometry and record gathers halves it; the int32
    # columns ride as bitcast f32 lanes — bit-exact roundtrip). The gather
    # is differentiable: its VJP is the scatter-add back onto the class-C
    # splats; the int columns are constants w.r.t. autodiff inputs.
    # (tx0 <= tx-1 <= 126 in 7 bits, ty0 in 11, sx <= tx <= 127 in 7 —
    # guaranteed by the static guard above, so no silent clamping)
    packed_geom = tx0 | (ty0 << 7) | (sx << 18)
    # Bit 30 is OR'd in before the int32->f32 bitcast so the lane holds a
    # NORMAL float bit pattern (exponent != 0): both payloads are < 2^25,
    # whose raw patterns are f32 denormals, and XLA does not guarantee
    # denormals survive f32 data movement on TPU (a flush-to-zero would
    # silently land every class-C pair on tile 0). Masked off after the
    # gather; tests/test_tiled.py::test_bitcast_gather_roundtrip guards the
    # round trip on-device at every variant's record width.
    _B30 = np.int32(1 << 30)
    geom2f = jax.lax.bitcast_convert_type(
        jnp.stack([off_c | _B30, packed_geom | _B30], axis=1), jnp.float32
    )  # (N, 2) int32 bits in f32 lanes
    rec = jnp.concatenate(
        [geom2f, jnp.stack(vals + [depth], axis=1)], axis=1
    )  # (N, 2 + F + 1)
    rec_c = jax.lax.optimization_barrier(rec[owner_c])  # (C, 2 + F + 1)
    gc = jax.lax.bitcast_convert_type(rec_c[:, 0:2], jnp.int32) & ~_B30
    # +1: the span's first (row-major) tile rides in class A, so this
    # segment's slot j is span tile j+1
    local_c = jnp.arange(c_capacity, dtype=jnp.int32) - gc[:, 0] + 1
    tc = gc[:, 1]
    tx0_c = tc & 127
    ty0_c = (tc >> 7) & 2047
    sx_c = jnp.maximum((tc >> 18) & 127, 1)
    dy_c = local_c // sx_c
    dx_c = local_c - dy_c * sx_c
    tile_c = (ty0_c + dy_c) * tx + tx0_c + dx_c
    vals_c = [rec_c[:, 2 + i] for i in range(nf)]
    depth_c = rec_c[:, 2 + nf]

    # ---- concatenate rows, sort once with carried fields ------------------
    tile_rows = jnp.concatenate([
        jnp.where(live_a, tile_a, num_tiles),
        jnp.where(live_c, tile_c, num_tiles),
    ])
    depth_rows = jnp.concatenate([depth_a, depth_c])
    rows = tile_rows.shape[0]
    val_rows = [
        jnp.concatenate([a, c]) for a, c in zip(vals_a, vals_c)
    ]
    carried = val_rows

    if differentiable:
        # rowid doubles as a tertiary tie-break key: equal-depth pairs keep
        # concatenation order (splat-index order WITHIN class A and within
        # class C; a class-C pair always ties after every class-A pair,
        # which can differ from the dense path's global stable argsort on
        # exact f32 depth ties — negligible, and an extra owner key would
        # cost ~2.6 ms/3.5M rows). The non-differentiable branch has no
        # rowid and relies on lax.sort's default stability instead.
        rowid = jnp.arange(rows, dtype=jnp.int32)
        out = _sort_carry(3, tile_rows, depth_rows, rowid, *carried)
        sorted_vals = out[3:]
    else:
        out = tuple(jax.lax.sort(
            (tile_rows, depth_rows, *carried), num_keys=2
        ))
        sorted_vals = out[2:]

    tile_starts = jnp.searchsorted(
        out[0], jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    f_pad = padded_rows(variant)
    pad = [jnp.zeros((rows,), jnp.float32)] * (f_pad - nf)
    fields = jnp.stack(list(sorted_vals) + pad)  # (F_pad, rows)
    # Pad the pair axis to a CHUNK multiple: the compositing kernels DMA
    # [aligned, aligned + k*CHUNK) windows; with the compact N + cap row
    # count the last tile's window could overrun the array, and pl.ds
    # CLAMPS the start — silently shifting every row in the chunk and
    # compositing the wrong pairs (round-4's 3N slack masked this).
    rows_pad = (-rows) % CHUNK
    if rows_pad:
        fields = jnp.pad(fields, ((0, 0), (0, rows_pad)))

    # class-C pairs beyond the budget are DROPPED — surface the count so
    # callers (tests, bench, pipelines) can assert/log instead of silently
    # rendering holes (round-2 weak point #3)
    dropped = jnp.maximum(jnp.sum(counts_c) - c_capacity, 0)

    return BinnedPairs(
        fields=fields,
        tile_starts=tile_starts,
        num_pairs=tile_starts[num_tiles],
        dropped_pairs=dropped,
    )


# ---------------------------------------------------------------------------
# calibration
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("width", "height"))
def required_overflow(proj: ProjectedSplats, width: int, height: int,
                      band_ty=None):
    """Exact class-C (beyond-first-tile) pair requirement — O(N)
    elementwise. Class A (one row per splat) is statically sized, so this is
    the only budget to calibrate."""
    _, _, _, sx, sy, valid = _tile_geom(proj, width, height, band_ty)
    pairs_n = sx * sy
    return jnp.sum(jnp.where(valid & (pairs_n > 1), pairs_n - 1, 0))


def round_pow2_budget(need, floor: int = 8192) -> int:
    """Round a measured pair/slot requirement up to a power of two (so
    similar scenes share a compile), with a floor. The ONE policy every
    budget-calibration site uses (pipeline, shadows, fit, bench) — keep
    them aligned by calling this, not by copying the expression."""
    return 1 << max(int(need) - 1, floor).bit_length()


def calibrate_overflow(
    proj: ProjectedSplats, width: int, height: int, round_to: int = 8192
) -> int:
    """Concrete class-C budget for this projection, rounded up for layout
    friendliness. Identical output to any larger budget."""
    need = int(required_overflow(proj, width, height))
    return max(-(-need // round_to) * round_to, round_to)
