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
    overflow:bool scalar).  ``jnp.nonzero(..., size=...)`` lowers to a
    sort/scan on TPU — fine outside the hot inner scan.
    """
    count = jnp.sum(mask, dtype=jnp.int32)
    (offsets,) = jnp.nonzero(mask, size=capacity, fill_value=FILL)
    return count, offsets.astype(jnp.int32), count > capacity


def valid_start_mask(mask: jnp.ndarray, n: jnp.ndarray, m: int) -> jnp.ndarray:
    """Zero out mask entries at positions that cannot start a match because
    they fall beyond ``n - m`` (padding / halo tail).  ``n`` may be traced."""
    pos = jnp.arange(mask.shape[0], dtype=jnp.int32)
    return mask & (pos <= n - m)
