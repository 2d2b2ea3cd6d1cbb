"""Sort-based tile binning: the TPU-native replacement for the reference's
global GPU radix sort + gather (reference:
src/renderer/renderPasses/RadixSortPass.cpp, thirdParty/RadixSort.hpp,
radixSortPrepass.glsl, radixSortGather.glsl).

The reference sorts ALL splats by view depth once and lets ROP hardware blend
quads in that order. A TPU has no ROP, so compositing is explicit per pixel
tile; the global sort becomes:

  depth ranks (one global sort)  ->  (tile, rank) pair expansion (slot
  allocation, ops/segments.py)   ->  one lexicographic sort of the pairs ->
  per-tile contiguous ranges.

Within each tile range the pairs are depth-ordered, which is exactly the
invariant the reference's ``floatBitsToUint(viewZ)`` radix key establishes
(radixSortPrepass.glsl:29-32).

Tiles are (8, 128) pixels — one native f32 VPU tile — rather than the CUDA-
conventional 16x16: the lane dimension stays fully utilized in the composite
kernel and elongated tiles cost fewer pairs for typical splat radii.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..ops import segments
from ..ops.projection import ProjectedSplats

TILE_H = 8
TILE_W = 128

# pair feature-row layout, shape (NUM_FIELDS, P); padded to a sublane multiple
F_MEAN_X, F_MEAN_Y = 0, 1
F_CONIC_A, F_CONIC_B, F_CONIC_C = 2, 3, 4
F_COL_R, F_COL_G, F_COL_B, F_ALPHA = 5, 6, 7, 8
F_NRM_X, F_NRM_Y, F_NRM_Z = 9, 10, 11
F_WS_X, F_WS_Y, F_WS_Z = 12, 13, 14
F_DEPTH = 15
F_METAL, F_ROUGH = 16, 17
F_AX_MAJ_X, F_AX_MAJ_Y, F_AX_MIN_X, F_AX_MIN_Y = 18, 19, 20, 21
F_VALID = 22
NUM_FIELDS = 24   # logical fields
# Physical pair-record width. HBM lane-tiles arrays to 128 floats anyway, so a
# (P, 128) buffer costs no more memory than (P, 24) — and it makes every
# (CHUNK, PAIR_WIDTH) DMA slice tiling-aligned (Mosaic requires lane slices in
# multiples of 128).
PAIR_WIDTH = 128


CHUNK = 128  # compositing kernel DMA granularity; tile ranges are aligned
# to CHUNK so each tile's backward gradient writes are disjoint.


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BinnedSplats:
    """Per-tile depth-ordered splat pair lists in a CHUNK-aligned layout:
    tile k owns padded slots [tile_starts[k], tile_starts[k+1]) (a multiple
    of CHUNK wide) of which the first tile_counts[k] are live pairs."""

    pair_data: jax.Array    # (P, PAIR_WIDTH) f32, sorted by (tile, depth rank)
    pair_splat: jax.Array   # (P,) int32 source splat index (-1 = dead slot)
    tile_starts: jax.Array  # (num_tiles + 1,) int32, CHUNK-aligned
    tile_counts: jax.Array  # (num_tiles,) int32 live pairs per tile
    num_pairs: jax.Array    # scalar int32 (live pairs before padding)

    @property
    def capacity(self):
        return self.pair_data.shape[0]


def tiles_for(width: int, height: int) -> tuple[int, int]:
    return -(-height // TILE_H), -(-width // TILE_W)


@partial(jax.jit, static_argnames=("width", "height"))
def required_pairs(proj: ProjectedSplats, width: int, height: int) -> jax.Array:
    """Exact (tile, splat) pair requirement for this projection — O(N).
    Rasterization cost is ~linear in pair capacity (sort + expansion +
    compositing chunks), so sizing the budget to the scene is a direct
    speedup; see ops/conversion.calibrate for the same pattern."""
    n = proj.capacity
    ty, tx = tiles_for(width, height)
    res_half = jnp.asarray([width, height], jnp.float32) * 0.5
    mean_px = (proj.mean_ndc + 1.0) * res_half
    ext = jnp.abs(proj.axes_px[:, 0]) + jnp.abs(proj.axes_px[:, 1])
    x_lo = mean_px[:, 0] - ext[:, 0]
    x_hi = mean_px[:, 0] + ext[:, 0]
    row_c = jnp.asarray(height, jnp.float32) - mean_px[:, 1]
    y_lo = row_c - ext[:, 1]
    y_hi = row_c + ext[:, 1]
    tx0 = jnp.clip(jnp.floor(x_lo / TILE_W).astype(jnp.int32), 0, tx - 1)
    tx1 = jnp.clip(jnp.floor(x_hi / TILE_W).astype(jnp.int32), 0, tx - 1)
    ty0 = jnp.clip(jnp.floor(y_lo / TILE_H).astype(jnp.int32), 0, ty - 1)
    ty1 = jnp.clip(jnp.floor(y_hi / TILE_H).astype(jnp.int32), 0, ty - 1)
    on_screen = (x_hi >= 0) & (x_lo < width) & (y_hi >= 0) & (y_lo < height)
    valid = proj.valid & on_screen
    span_x = tx1 - tx0 + 1
    span_y = ty1 - ty0 + 1
    pairs = jnp.sum(jnp.where(valid, span_x * span_y, 0))
    cols = jnp.sum(jnp.where(valid, span_x, 0))
    return jnp.stack([pairs, cols])


def calibrate_pairs(
    proj: ProjectedSplats, width: int, height: int, round_to: int = 8192
) -> tuple[int, int]:
    """Concrete (pair, tile-column) budgets for this projection, rounded up for
    layout friendliness. Identical output to any larger budgets."""
    need = required_pairs(proj, width, height)
    p, r = int(need[0]), int(need[1])
    up = lambda v: max(-(-v // round_to) * round_to, round_to)
    return up(p), up(r)


@partial(jax.jit, static_argnames=("width", "height", "pair_capacity", "max_tiles_per_splat", "row_capacity"))
def bin_splats(
    proj: ProjectedSplats,
    width: int,
    height: int,
    pair_capacity: int,
    max_tiles_per_splat: int = 0,
    row_capacity: int = 0,
) -> BinnedSplats:
    """Build depth-ordered per-tile pair lists from projected splats."""
    n = proj.capacity
    ty, tx = tiles_for(width, height)
    num_tiles = ty * tx
    res_half = jnp.asarray([width, height], jnp.float32) * 0.5

    mean_px = (proj.mean_ndc + 1.0) * res_half  # GL window coords, y up
    # parallelogram extent per axis: |maj| + |min| componentwise
    ext = jnp.abs(proj.axes_px[:, 0]) + jnp.abs(proj.axes_px[:, 1])  # (N, 2)

    # convert the y range to row coordinates (row 0 = top of the image)
    x_lo = mean_px[:, 0] - ext[:, 0]
    x_hi = mean_px[:, 0] + ext[:, 0]
    row_c = jnp.asarray(height, jnp.float32) - mean_px[:, 1]
    y_lo = row_c - ext[:, 1]
    y_hi = row_c + ext[:, 1]

    tx0 = jnp.clip(jnp.floor(x_lo / TILE_W).astype(jnp.int32), 0, tx - 1)
    tx1 = jnp.clip(jnp.floor(x_hi / TILE_W).astype(jnp.int32), 0, tx - 1)
    ty0 = jnp.clip(jnp.floor(y_lo / TILE_H).astype(jnp.int32), 0, ty - 1)
    ty1 = jnp.clip(jnp.floor(y_hi / TILE_H).astype(jnp.int32), 0, ty - 1)

    # cull splats whose extent misses the viewport entirely
    on_screen = (x_hi >= 0) & (x_lo < width) & (y_hi >= 0) & (y_lo < height)
    valid = proj.valid & on_screen

    span_x = tx1 - tx0 + 1
    span_y = ty1 - ty0 + 1

    # global depth ranks: one sort, like the reference's radix pass
    order = jnp.argsort(jnp.where(valid, proj.depth, jnp.inf), stable=True)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))

    # ---- two-level monotone expansion (no dynamic div/mod, native cummax
    # fills; same playbook as ops/conversion.py stage 2-3). Splats span
    # fewer tiles horizontally (128-px-wide tiles) than vertically, so
    # level 1 expands the narrow x-span and level 2 the y-span — the level-1
    # table gather runs at ~half the rows of the y-first order.
    tcol_cap = row_capacity or pair_capacity
    n_tcols = jnp.where(valid, span_x, 0)
    if max_tiles_per_splat:
        n_tcols = jnp.minimum(n_tcols, max_tiles_per_splat)
    tcol_off, tcol_total = segments.alloc_slots(n_tcols, tcol_cap)
    tcol_local, _, tcol_splat = segments.expand_monotone(
        tcol_off, n_tcols, tcol_cap, value=jnp.arange(n, dtype=jnp.int32)
    )
    tcol_splat = jnp.maximum(tcol_splat, 0)
    tcol_live = jnp.arange(tcol_cap, dtype=jnp.int32) < tcol_total

    # per-tile-column data: one packed int gather from a narrow table
    coltab = jnp.stack([tx0, span_y, ty0, rank], axis=1)  # (N, 4) int32
    ct = jax.lax.optimization_barrier(coltab[tcol_splat])  # (tcol_cap, 4)
    c_tile_x = ct[:, 0] + tcol_local
    c_span = jnp.where(tcol_live, ct[:, 1], 0)
    c_ty0 = ct[:, 2]
    c_rank = ct[:, 3]
    if max_tiles_per_splat:
        c_span = jnp.minimum(c_span, max_tiles_per_splat)

    # level 2: tile-column -> (tile, splat) pair; forward-fill the column id
    # (monotone) and recover everything else via ONE narrow gather
    offsets, total = segments.alloc_slots(c_span, pair_capacity)
    local, _, pair_col = segments.expand_monotone(
        offsets, c_span, pair_capacity,
        value=jnp.arange(tcol_cap, dtype=jnp.int32),
    )
    pair_col = jnp.maximum(pair_col, 0)
    in_budget = jnp.arange(pair_capacity, dtype=jnp.int32) < total

    ptab = jnp.stack(
        [c_tile_x, c_ty0, c_rank, tcol_splat], axis=1
    )  # (tcol_cap, 4)
    pt = jax.lax.optimization_barrier(ptab[pair_col])  # (pair_capacity, 4)
    tile_y = pt[:, 1] + local
    tile_id = jnp.where(in_budget, tile_y * tx + pt[:, 0], num_tiles)
    pair_rank = jnp.where(in_budget, pt[:, 2], n)
    owner = pt[:, 3]

    # one sort orders every tile's list front-to-back. Pack (tile, rank)
    # into a single int32 key when the bits fit (common case) — a 1-key,
    # 2-operand sort is markedly cheaper than a 2-key, 3-operand one.
    rank_bits = max((n - 1).bit_length(), 1)
    if (num_tiles + 1).bit_length() + rank_bits <= 31:
        key = tile_id * (1 << rank_bits) + jnp.minimum(pair_rank, n)
        key_sorted, splat_sorted = jax.lax.sort((key, owner), num_keys=1)
        tile_sorted = key_sorted >> rank_bits
    else:
        tile_sorted, _, splat_sorted = jax.lax.sort(
            (tile_id, pair_rank, owner), num_keys=2
        )

    contiguous_starts = segments.segment_starts(tile_sorted, num_tiles)
    counts = contiguous_starts[1:] - contiguous_starts[:-1]

    # re-lay each tile's run into a CHUNK-aligned padded slot range so the
    # compositing kernel's per-tile DMA windows never overlap a neighbor
    padded_counts = ((counts + CHUNK - 1) // CHUNK) * CHUNK
    padded_capacity = pair_capacity + num_tiles * CHUNK
    padded_offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded_counts).astype(jnp.int32)]
    )
    pair_live = tile_sorted < num_tiles
    # Per-tile constant shift maps sorted position -> padded slot, so the
    # re-layout is ONE tiny-table gather + ONE 1-D scatter (the previous
    # inverse-map scheme paid two extra ~12ns/row gathers at pair scale).
    shift = padded_offsets[:num_tiles] - contiguous_starts[:num_tiles]
    dest = jnp.where(
        pair_live,
        shift[jnp.minimum(tile_sorted, num_tiles - 1)]
        + jnp.arange(pair_capacity, dtype=jnp.int32),
        padded_capacity,  # dead pairs dropped via out-of-range scatter
    )
    sp_padded = (
        jnp.full((padded_capacity,), -1, jnp.int32)
        .at[dest]
        .set(splat_sorted, mode="drop")
    )
    live = sp_padded >= 0  # (padded_capacity,)
    sp_idx = jnp.maximum(sp_padded, 0)

    record = jnp.concatenate(
        [
            mean_px,                      # 0, 1
            proj.conic,                   # 2, 3, 4
            proj.color,                   # 5..8
            proj.normal,                  # 9..11
            proj.wspos,                   # 12..14
            proj.depth[:, None],          # 15
            proj.pbr,                     # 16, 17
            proj.axes_px.reshape(n, 4),   # 18..21
            jnp.ones((n, 1), jnp.float32),   # 22 F_VALID
            jnp.zeros((n, 1), jnp.float32),  # 23
        ],
        axis=-1,
    )  # (N, NUM_FIELDS)
    stacked = jax.lax.optimization_barrier(record[sp_idx])
    stacked = jnp.where(live[:, None], stacked, 0.0)
    pair_data = jnp.pad(stacked, ((0, 0), (0, PAIR_WIDTH - NUM_FIELDS)))
    pair_splat = jnp.where(live, sp_idx, -1)

    return BinnedSplats(
        pair_data=pair_data,
        pair_splat=pair_splat,
        tile_starts=padded_offsets,
        tile_counts=counts,
        num_pairs=total,
    )
