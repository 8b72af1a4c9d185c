"""Fixed-capacity match-offset emission (SURVEY.md §7.3 stage 2, hard part #1).

TPU/XLA has no dynamic shapes, so "return the list of match offsets" becomes
"return a fixed-capacity int32 buffer + a count + an overflow flag".  This is
the TPU-native equivalent of the reference's per-work-item result buffer
readback (SURVEY.md component R12): one-pass padded emission.

All algorithm ops produce a boolean *start mask* over text positions
(mask[i] == True iff a match starts at byte i); this module turns masks into
(count, offsets, overflow) triples under jit.
"""

from __future__ import annotations

import jax.numpy as jnp

# Default per-call offset capacity.  Callers can raise it; counts are always
# exact even when the offset buffer overflows.
DEFAULT_CAPACITY = 65536

FILL = -1  # padding value in offset buffers


def mask_to_matches(mask: jnp.ndarray, capacity: int):
    """Convert a boolean start-position mask into fixed-capacity results.

    Returns (count:int32 scalar, offsets:int32[capacity] sorted with -1 pad,
    overflow:bool scalar).

    Extraction is cumsum + unique-index scatter, NOT ``jnp.nonzero(size=)``:
    the latter lowers to a full O(N log N) sort on TPU (~2.4 s for 256 MiB —
    measured; it dominated the whole pipeline).  Here each masked position
    writes itself at its rank; every update index is globally unique
    (ranks < N for matches; a disjoint N+capacity+pos band for the rest,
    all dropped as out-of-bounds), so XLA emits the vectorized scatter.
    Output order is ascending by construction (rank increases with
    position).
    """
    n = mask.shape[0]
    count = jnp.sum(mask, dtype=jnp.int32)
    ranks = jnp.cumsum(mask, dtype=jnp.int32) - 1
    pos = jnp.arange(n, dtype=jnp.int32)
    idx = jnp.where(mask, ranks, n + capacity + pos)
    offsets = (
        jnp.full((capacity,), FILL, jnp.int32)
        .at[idx]
        .set(pos, mode="drop", unique_indices=True)
    )
    return count, offsets, count > capacity


def masked_positions(mask: jnp.ndarray, capacity: int, fill: int = FILL):
    """First ``capacity`` positions where mask is True, ascending, padded
    with ``fill`` — same scatter-based extraction as mask_to_matches."""
    n = mask.shape[0]
    ranks = jnp.cumsum(mask, dtype=jnp.int32) - 1
    pos = jnp.arange(n, dtype=jnp.int32)
    idx = jnp.where(mask, ranks, n + capacity + pos)
    return (
        jnp.full((capacity,), fill, jnp.int32)
        .at[idx]
        .set(pos, mode="drop", unique_indices=True)
    )


def valid_start_mask(mask: jnp.ndarray, n: jnp.ndarray, m: int) -> jnp.ndarray:
    """Zero out mask entries at positions that cannot start a match because
    they fall beyond ``n - m`` (padding / halo tail).  ``n`` may be traced."""
    pos = jnp.arange(mask.shape[0], dtype=jnp.int32)
    return mask & (pos <= n - m)


# ---------------------------------------------------------------------------
# Nibble-space emission: the Pallas kernels emit one int32 per 4 text bytes
# (bit b of word w = match starting at byte 4w+b).  Extracting counts and
# offsets directly from this representation avoids ever materializing the
# bool[N] mask — on TPU a (N/4, 4)-shaped expansion acquires a padded
# T(8,128) layout and a 32x memory blow-up (measured: 34 GB for 256 MiB).
# ---------------------------------------------------------------------------


def nibble_valid(nib: jnp.ndarray, limit) -> jnp.ndarray:
    """Clear bits at byte positions > ``limit`` (int32[NW] nibbles)."""
    word_pos = jnp.arange(nib.shape[0], dtype=jnp.int32) * 4
    keep = jnp.clip(limit - word_pos + 1, 0, 4)
    return nib & ((1 << keep) - 1)


def nibble_to_matches(nib: jnp.ndarray, limit, capacity: int):
    """(count, offsets[capacity], overflow) from an int32[NW] nibble mask.

    ``limit``: maximum valid start position (apply n-m and any kernel
    coverage cut).  Four unique-index scatters (one per bit lane) write
    each match at its global rank; output is ascending with -1 padding.
    """
    nib = nibble_valid(nib, limit)
    nw = nib.shape[0]
    b0 = nib & 1
    b1 = (nib >> 1) & 1
    b2 = (nib >> 2) & 1
    b3 = (nib >> 3) & 1
    pc = b0 + b1 + b2 + b3
    count = jnp.sum(pc, dtype=jnp.int32)
    prefix = jnp.cumsum(pc, dtype=jnp.int32) - pc  # exclusive prefix ranks
    word_pos = jnp.arange(nw, dtype=jnp.int32) * 4
    # unique out-of-range band for non-matches: capacity + 4N + 4w + b
    big = capacity + 4 * nw + word_pos
    out = jnp.full((capacity,), FILL, jnp.int32)

    def put(out, bit, local_rank, b):
        idx = jnp.where(bit == 1, prefix + local_rank, big + b)
        return out.at[idx].set(
            word_pos + b, mode="drop", unique_indices=True
        )

    out = put(out, b0, 0, 0)
    out = put(out, b1, b0, 1)
    out = put(out, b2, b0 + b1, 2)
    out = put(out, b3, b0 + b1 + b2, 3)
    return count, out, count > capacity


def nibble_positions(nib: jnp.ndarray, limit, capacity: int, fill: int):
    """First ``capacity`` set-bit byte positions (ascending, ``fill``-padded)
    — candidate extraction for screen+verify pipelines."""
    _, out, _ = nibble_to_matches(nib, limit, capacity)
    return jnp.where(out >= 0, out, fill)


def merge_region_matches(c1, o1, v1, c2, o2, v2, capacity: int, offset2):
    """Merge (count, offsets, overflow) of a kernel region with a tail
    region starting at byte ``offset2``; region-1 offsets all precede
    region-2 offsets, so the merge is a shifted scatter append."""
    cap2 = o2.shape[0]
    o2g = jnp.where(o2 >= 0, o2 + offset2, -1)
    idx2 = jnp.where(
        o2 >= 0,
        c1 + jnp.arange(cap2, dtype=jnp.int32),
        capacity + cap2 + jnp.arange(cap2, dtype=jnp.int32),
    )
    out = o1.at[idx2].set(o2g, mode="drop", unique_indices=True)
    count = c1 + c2
    return count, out, v1 | v2 | (count > capacity)
