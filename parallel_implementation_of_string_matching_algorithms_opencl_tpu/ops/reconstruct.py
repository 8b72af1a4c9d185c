"""Block-sum -> (count, offsets, overflow) reconstruction, word-space.

Round-3 rework of the sparse reconstruction (SURVEY.md §7.3 stage 2 /
R12).  The round-2 version gathered candidate 512-byte rows from
``text.reshape(nb, 512)`` — a hidden FULL-BUFFER relayout copy on TPU
(268 MB temp per call at 256 MiB, measured; and the tier ``lax.switch``
duplicated it per branch) — then rank-selected offsets at ~0.1-0.2 us per
extracted rank, which collapsed on match-dense inputs (round-2 VERDICT
missing #3/#4).  This version:

- gathers candidate 4 KiB CHUNK rows from the pre-shaped ``(N/4096,
  1024)`` int32 word view the scan kernels already consume (zero-copy
  host view; row gathers measure ~12.5 ns/row);
- verifies them with the same SWAR word compares as the kernels
  (window-compare ground truth — algorithm-agnostic, exactly as before);
- extracts offsets with the sort-based primitives (ops/extract), whose
  cost scales with the candidate plane, not per-rank;
- escalates match-DENSE inputs to one full naive rescan with nibble
  emission plus a T-slot dense extraction — bounded-cost for any input,
  no silent cliff.

Every branch recounts by exact window compare, so one function serves the
exact scans (naive/KMP: bs are match counts) and the screened scans
(BM probes / RK hashes: bs are candidate counts).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels import swar
from . import extract

FILL = extract.FILL

# Sparse gather width: fixed (no lax.switch tier ladder — a switch costs
# ~0.3 ms even without operand copies).  8192 chunk rows = 64 MB of
# gathered+verified words, ~0.5 ms on v5e; inputs with more candidate
# chunks go dense.
SPARSE_CHUNKS = 8192
# Sparse second-level slot-overflow side-plane budget (rows with > DENSE_T
# matches whose rank range intersects [0, capacity)); escalates 8x inside
# dense_extract before giving up to the drain path.
SPARSE_OVERFLOW_ROWS = 512
DENSE_OVERFLOW_ROWS = 2048


def full_words2d(text_u8, words):
    """(R, 1024) int32 chunk-row view of the padded buffer.  2-D input
    passes through untouched (the host's zero-copy view); 1-D/None inputs
    (distributed shard bodies, whose halo-extended shard is assembled
    on-device) pay one in-jit relayout."""
    if words is not None and words.ndim == 2:
        return words
    w = words if words is not None else swar._as_words(text_u8)
    r = -(-w.shape[0] // 1024)
    if w.shape[0] != r * 1024:
        w = jnp.pad(w, (0, r * 1024 - w.shape[0]))
    return w.reshape(r, 1024)


def _verify_chunks(x2d, gids, P, M, Mnp, limit):
    """int32[cap_g, 1024] nibble plane: bit a of word w of gathered chunk
    g = exact match starting at byte gids[g]*4096 + 4w + a, validity-
    clamped to ``limit`` (which also zeroes fill rows: their unclipped
    gids put word_pos past limit)."""
    R = x2d.shape[0]
    nw = P.shape[1]
    gc = jnp.clip(gids, 0, R - 1)
    win = jnp.concatenate(
        [x2d[gc], x2d[jnp.clip(gc + 1, 0, R - 1)][:, :nw]], axis=1
    )
    nib = jnp.zeros((gids.shape[0], 1024), jnp.int32)
    for a in range(4):
        acc = None
        for k in range(nw):
            if Mnp[a, k] == 0:
                continue
            w = win[:, k : k + 1024]
            eq = (w == P[a, k]) if Mnp[a, k] == -1 else (
                (w & M[a, k]) == P[a, k]
            )
            acc = eq if acc is None else (acc & eq)
        nib |= acc.astype(jnp.int32) << a
    word_pos = gids[:, None] * 4096 + 4 * jnp.arange(
        1024, dtype=jnp.int32
    )[None, :]
    keep = jnp.clip(limit - word_pos + 1, 0, 4)
    return nib & ((1 << keep) - 1)


def extract_region(bs, x2d, text_u8, n, P, m, limit, capacity: int,
                   config):
    """(count, offsets[capacity], overflow) for the kernel-covered region.

    ``bs``: int32[NB] per-512B-block start counts from any scan kernel —
    exact (naive/KMP) or a candidate superset (BM probe / RK hash screen),
    validity already applied in-kernel.  ``x2d``: the (R, 1024) word view
    (full_words2d).  ``limit``: max valid start (min(n-m, cut-1)).  Counts
    are exact in every branch; offsets are the ascending first
    ``capacity`` matches (all-FILL with overflow=True only on the
    adversarial dense-overflow give-up path — drain recovers).
    """
    Mnp = swar.mask_words(m)
    M = jnp.asarray(Mnp)
    Lr = bs.shape[0] // 8
    chunkc = jnp.sum(bs.reshape(Lr, 8), axis=1)
    cap_g = min(SPARSE_CHUNKS, Lr)
    ncand = jnp.sum(chunkc > 0, dtype=jnp.int32)
    # Candidate chunks beyond the fixed gather width are the ONE condition
    # sparse cannot absorb (its extraction work is otherwise bounded by the
    # compact plane + the rank<capacity relevance window inside
    # dense_extract); everything else stays on the cheap path.
    use_dense = ncand > cap_g

    def sparse(_):
        gids = extract.sorted_nonzero_ids(chunkc, cap_g, fill=Lr)
        nib = _verify_chunks(x2d, gids, P, M, Mnp, limit)
        c_sm = jnp.sum(extract._popcount4(nib), dtype=jnp.int32)
        rows2 = nib.reshape(cap_g * 8, 128)
        rc2 = jnp.sum(extract._popcount4(rows2), axis=1)
        base2 = (
            gids[:, None] * 4096
            + 512 * jnp.arange(8, dtype=jnp.int32)[None, :]
        ).reshape(-1)
        offs, ok = extract.dense_extract(
            rows2, rc2, base2, capacity,
            overflow_rows=SPARSE_OVERFLOW_ROWS,
        )
        # ~ok offsets hide gaps (sorted compaction) — blank them; the
        # count stays exact and overflow=True routes callers to drain.
        offs = jnp.where(ok, offs, jnp.int32(FILL))
        return c_sm, offs, ok

    def dense(_):
        # Full naive rescan with nibble emission: exact verify of EVERY
        # position (the probe/hash screen buys nothing on match-dense
        # inputs), clamped to this region via n' = limit + m.
        n_r = jnp.minimum(jnp.asarray(n, jnp.int32), limit + m)
        nib2d, bs2, _cut = swar.naive_nib(
            text_u8, n_r, P, m,
            chunk_bytes=config.pallas_chunk_bytes,
            interpret=config.interpret, words=x2d, emit_nib=True,
        )
        nb2 = bs2.shape[0]
        rows = nib2d.reshape(nb2, 128)
        offs, ok = extract.dense_extract(
            rows, bs2, 512 * jnp.arange(nb2, dtype=jnp.int32), capacity,
            overflow_rows=DENSE_OVERFLOW_ROWS,
        )
        offs = jnp.where(ok, offs, jnp.int32(FILL))
        return jnp.sum(bs2, dtype=jnp.int32), offs, ok

    if Lr <= cap_g:
        # Every chunk fits the sparse gather — the dense branch is
        # statically unreachable; skip the cond (it costs ~0.3 ms and
        # compiles a second kernel).
        count, offs, ok = sparse(None)
    else:
        count, offs, ok = jax.lax.cond(
            use_dense, dense, sparse, operand=None
        )
    return count, offs, (count > capacity) | ~ok
