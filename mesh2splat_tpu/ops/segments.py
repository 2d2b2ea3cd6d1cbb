"""Segment/slot allocation primitives: the TPU-native replacement for GPU
atomic appends (reference: converterFS.glsl:46, gaussianSplattingPrepassCS.glsl:191)
and for the vendored radix-sort pipeline's list building
(reference: thirdParty/RadixSort.hpp).

The core trick: a producer i claiming ``count_i`` contiguous output slots is
an exclusive cumsum; mapping each slot back to its producer is a scatter of
producer ids at segment starts followed by a running max — all dense,
static-shaped, O(P) ops that XLA/TPU execute at HBM bandwidth.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def alloc_slots(counts: jax.Array, capacity: int):
    """counts: (T,) int32 >= 0. Returns (offsets, total) where producer t owns
    slots [offsets[t], offsets[t] + counts[t]) clipped to capacity."""
    offsets = jnp.cumsum(counts) - counts
    total = jnp.minimum(offsets[-1] + counts[-1], capacity)
    return offsets, total


def slot_owner(offsets: jax.Array, counts: jax.Array, capacity: int) -> jax.Array:
    """Inverse of alloc_slots: (capacity,) producer index per slot (-1 before
    the first live producer). Producers with count 0 never win."""
    t = offsets.shape[0]
    starts = jnp.where(counts > 0, offsets, capacity)
    marks = jnp.zeros((capacity + 1,), jnp.int32)
    ids = jnp.arange(1, t + 1, dtype=jnp.int32)
    marks = marks.at[jnp.clip(starts, 0, capacity)].max(ids)
    return jax.lax.associative_scan(jnp.maximum, marks[:capacity]) - 1


def expand_to_slots(offsets, counts, capacity):
    """Returns (owner, local, in_budget): per-slot producer id, the slot's
    local index within its producer's segment, and a liveness mask.

    Gather-free: TPU gathers cost ~8ms per million rows, so instead of
    ``offsets[owner]`` / ``counts[owner]`` we scatter each segment's start
    slot and end slot at its start position and forward-fill with running
    maxima — three scans, all at HBM bandwidth."""
    t = offsets.shape[0]
    starts = jnp.where(counts > 0, offsets, capacity)
    idx = jnp.clip(starts, 0, capacity)

    ids = jnp.arange(1, t + 1, dtype=jnp.int32)
    marks = jnp.zeros((capacity + 1,), jnp.int32).at[idx].max(ids)
    owner = jax.lax.associative_scan(jnp.maximum, marks[:capacity]) - 1

    # segment start slot, forward-filled (offset+1 so 0 means "none yet")
    smarks = jnp.zeros((capacity + 1,), jnp.int32).at[idx].max(offsets + 1)
    seg_start = jax.lax.associative_scan(jnp.maximum, smarks[:capacity]) - 1

    # segment end slot (exclusive), forward-filled
    emarks = jnp.zeros((capacity + 1,), jnp.int32).at[idx].max(offsets + counts)
    seg_end = jax.lax.associative_scan(jnp.maximum, emarks[:capacity])

    slot = jnp.arange(capacity, dtype=jnp.int32)
    local = slot - seg_start
    in_budget = jnp.logical_and(owner >= 0, slot < seg_end)
    return jnp.maximum(owner, 0), local, in_budget


def segment_starts(sorted_keys: jax.Array, num_segments: int) -> jax.Array:
    """Given sorted integer keys (P,), return (num_segments + 1,) start
    offsets so segment k spans [starts[k], starts[k+1]). Keys >= num_segments
    (the invalid-sentinel convention) fall past the end."""
    seg = jnp.arange(num_segments + 1, dtype=sorted_keys.dtype)
    return jnp.searchsorted(sorted_keys, seg, side="left").astype(jnp.int32)
