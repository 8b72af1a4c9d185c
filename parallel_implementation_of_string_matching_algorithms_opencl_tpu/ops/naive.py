"""Naive (shift-AND window compare) matcher op — jnp compute path.

TPU-native redesign of the reference's naive OpenCL kernel (SURVEY.md
component R1): instead of one work-item per position doing a byte loop, we
compute, for each pattern index j, the vectorized compare
``text[j : j+N] == pattern[j]`` and AND the m shifted masks together.  XLA
fuses the whole chain into one VPU loop over the text; there is no
data-dependent control flow and no gather.

This op is also the exact-verification workhorse for the other algorithms'
candidate masks, and the semantic ground truth for the Pallas kernels.
"""

from __future__ import annotations

import jax.numpy as jnp


def naive_start_mask(text: jnp.ndarray, pattern: jnp.ndarray) -> jnp.ndarray:
    """Boolean mask over positions: mask[i] == (text[i:i+m] == pattern).

    ``text`` is uint8[N]; ``pattern`` is uint8[m] (m static via shape).  The
    mask is computed for every i in [0, N); positions whose window crosses the
    end of the *valid* region must be cleared by the caller via
    ``emit.valid_start_mask`` (the pad bytes are zeros, so a pattern of zeros
    could otherwise false-positive in the tail).
    """
    n_pos = text.shape[0]
    m = pattern.shape[0]
    padded = jnp.pad(text, (0, m))
    mask = padded[0:n_pos] == pattern[0]
    for j in range(1, m):
        mask &= padded[j : j + n_pos] == pattern[j]
    return mask
