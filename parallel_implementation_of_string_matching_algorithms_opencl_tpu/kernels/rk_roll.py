"""Rolling-hash Rabin-Karp Pallas kernel (SURVEY.md R2, BASELINE config 2).

The dense "recompute the window hash at every position" formulation costs
m MACs per position and blows the scoped-VMEM stack for full tiles; the
*rolling* form — the actual Rabin-Karp algorithm — is O(1) per byte:

    H <- H * B  -  text[p-m] * B^m  +  text[p]          (wrapping mod 2**32)

It maps onto the sub-chunk-serial decomposition of kernels/shift_and.py:
1024 independent rolling hashes per tile (128 chunks x 8 sub-chunks), one
per element of an (8, 128) VPU register, each consuming one byte per step.

The departing byte text[p-m] is re-read from the staged words at a fixed
lag.  To keep every offset static and aligned (Mosaic requirement), each
sub-chunk's word stream is FRONT-PADDED with DELTA zero words
(DELTA = qo rounded up to 8, qo = m//4): one aligned (8, DELTA+8, 128)
block read per group then serves both the current 8 words (at static
offsets DELTA..DELTA+7) and their departing words (at static offsets
DELTA+j-qo[-1]); the zero pad doubles as the "no departing byte yet"
window warm-up, so no masking is needed.

Multi-pattern is where RK pays off (BASELINE.json:8 — 8 patterns): the
hash rolls ONCE and compares against k pattern hashes; candidates for ANY
pattern OR into one end-position nibble mask.  The kernel is a *screen*:
the caller converts end->start (shift_and.end_nibble3_to_start_nib) and
exactly verifies the (~N/2**32 false-positive rate) candidates per pattern
with the jnp gather-compare (ops/rabin_karp._verify_candidates).

B and B^m are baked in as int32 constants; two's-complement wrap equals
the uint32 host tables (ops/tables.rk_constants) bit-for-bit.

CONFIG-2 COST MODEL (round-5 measured, 1 GB / k=8 / m=16, tier 327680,
capacity 2^19 — BENCH_MATRIX.json config-2 row with scan/extract split):

- union-screen SCAN: 44.9 ms/GB measured (same-day window in the box's
  ~2x-slow compute state — see BENCH_DRIFT_AB.json); the Omega(k)
  k-cmp+(k-1)-or per-position VPU floor is ~16.8 ms/GB at k=8 (the
  in-kernel comment below), so the scan runs at ~2.7x floor in this
  window, consistent with the k=1 efficiency ratio.
- EXTRACTION: 35.0 ms/GB measured e2e on the 'blocks' path, decomposing
  (exp/multi_breakdown at the same tier) into: candidate-id
  prepass+compaction ~2.2 ms, block gather (327680 x 133-word rows,
  ~174 MB moved twice) 6.8 ms measured, the k*4-plane verify ~13.4 G
  VPU ops (~21 ms at this window's VPU rate; the FLOOR of the block
  design — every gathered position verifies against every pattern), and
  capacity-bounded sort machinery for the remainder.  The round-5
  PATTERN-SELECTED path (`multi_gather='pselect'`, now the default)
  broke that floor: the kernel's 'pmask' emission tells extraction WHICH
  <=2 patterns to verify per block, cutting the verify k/2-fold —
  config-2 e2e 80 -> 70 ms, then the union-emission host
  split (per-pattern sorts off the device) -> 66 ms (12.5 -> 15.1
  GB/s), exact
  (exp/pselect_ab.py; stage deltas exp/pselect_breakdown.py: scan 45.4,
  rank 4.2, gather 5.7, 2-chain verify 10.2, sorts+side+counts 9.7,
  tail epilogue 2.8).  The SCAN is now ~64% of the config-2 wall.
  The round-5 GROUP-granular attempt (verify only each block's occupied
  32-byte group; `multi_gather='groups'`) cut the verify ~16x but
  measured SLOWER e2e (23.4 vs 21.7 ms at 256 MiB) and degenerates on
  real multi-pattern density (blocks holding matches in >1 group are
  common, overflowing any bounded side plane) — kept as a tested
  experimental mode / measured negative (ARCHITECTURE.md).  Lesson pair:
  splitting verify ACROSS PATTERNS (pselect) pays; splitting WITHIN
  blocks (groups) does not.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import swar as _swar
from .shift_and import _layout, end_nibble3_to_start_nib
from .swar import DEFAULT_CHUNK_BYTES

MAX_RK_PATTERN = 509  # bounded by the per-sub-chunk halo


def rk_roll_supported(m: int) -> bool:
    return 2 <= m <= MAX_RK_PATTERN


def _delta(m: int) -> int:
    """Front-pad words: the departing-byte lag rounded up to sublane size."""
    qo = m // 4
    return -(-(qo + 1) // 8) * 8


def _kernel(n_ref, tgt_ref, *refs, G, m, B, Bm, k,
            DELTA, emit="nib", W8=0, C=0, Nk=0, fused=False, HS=0):
    """fused=False: refs = (x3_ref, out_ref, *scratch), x3_ref the
    (8, DELTA+G*8, 128) front-padded relayout.  fused=True: refs =
    (x_ref, nxt_ref, out_ref, x3_scratch, *rest) with x_ref one NATURAL
    (C/32, 1024) word-row block — shift_and._stage_subchunks builds the
    front-padded layout in VMEM (front zeros written once at tile 0; the
    zero pad doubles as the warm-up window exactly as in _layout).
    emit='nib': out_ref = nibE (8, G*8, 128), bit b of word g = hash hit
    ENDING at scan byte 4*g+b.  emit='bsums': out_ref = (8, W8/128, 128)
    per-512-byte-block CANDIDATE-start counts (validity applied; the
    end->start fold + clamp are shift_and._end_to_start_bsums); candidates
    are exactly verified downstream by the window-compare sparse
    reconstruction (ops/reconstruct.extract_region)."""
    from .shift_and import (
        _end_to_start_bmask,
        _end_to_start_bsums,
        _end_to_start_pmask,
        _stage_subchunks,
    )

    if fused:
        x_ref, nxt_ref, out_ref, x3_ref, *scratch = refs
        _stage_subchunks(x_ref, nxt_ref, x3_ref, W8=W8, HS=HS, DELTA=DELTA,
                         G8=G * 8)
    else:
        x3_ref, out_ref, *scratch = refs
    nibE_ref = scratch[0] if emit in ("bsums", "bmask", "pmask") else out_ref
    qo, ro = divmod(m, 4)
    # Word-level roll: the byte recurrence H <- H*B + (new - old*Bm) has a
    # serial int32-multiply chain per BYTE; with d_b = new_b - old_b*Bm
    # and the Horner prefix t_b = t_{b-1}*B + d_b, the four in-word hashes
    # H(t+1+b) = H*B^{b+1} + t_b come from INDEPENDENT multiplies of the
    # word-entry H, and the carried state advances once per word
    # (H <- H*B^4 + t_3).  Same wrapping mod-2^32 values bit-for-bit;
    # total multiplies/word go 8 -> 11 but the loop-carried latency chain
    # shrinks 4x — a win on the VPU, whose mul throughput outruns the
    # chain latency this kernel was bound by.
    wrap = lambda v: (v & 0xFFFFFFFF) - (1 << 32) \
        if (v & 0xFFFFFFFF) >= (1 << 31) else (v & 0xFFFFFFFF)
    Bu = B & 0xFFFFFFFF
    B2, B3, B4 = wrap(Bu * Bu), wrap(Bu**3), wrap(Bu**4)
    # Hoist the k target hashes out of the word/byte loops: tgt_ref[p]
    # inside them is 4*8*k scalar-load+broadcasts per group.
    tgts = [tgt_ref[p] for p in range(k)]

    def group(g, H):
        base = pl.multiple_of(g * 8, 8)
        blk = x3_ref[:, pl.ds(base, DELTA + 8), :]  # old..current words
        nibs = []
        for j in range(8):
            wv = blk[:, DELTA + j, :]
            ds = []
            for b in range(4):
                new_c = (wv >> (8 * b)) & 0xFF
                # departing byte: scan pos t-m -> word tw-qo(-1), byte …
                if b >= ro:
                    w_old = blk[:, DELTA + j - qo, :]
                    oc = b - ro
                else:
                    w_old = blk[:, DELTA + j - qo - 1, :]
                    oc = b + 4 - ro
                old_c = (w_old >> (8 * oc)) & 0xFF
                ds.append(new_c - old_c * Bm)
            t = ds[0]
            ts = [t]
            for b in range(1, 4):
                t = t * B + ds[b]
                ts.append(t)
            Hs = (H * B + ts[0], H * B2 + ts[1],
                  H * B3 + ts[2], H * B4 + ts[3])
            nib = jnp.zeros((8, 128), jnp.int32)
            if emit == "pmask":
                # Per-word k-bit PATTERN masks instead of per-byte end
                # flags: bit p = any of this word's four end positions
                # hash-hit pattern p.  Word granularity suffices — the
                # downstream pattern-selected verify only needs to know
                # WHICH pattern to verify per candidate block
                # (ops/reconstruct.extract_region_multi_pselect); same
                # compare count as the union screen, restructured
                # per-pattern.
                for p in range(k):
                    eqp = (
                        (Hs[0] == tgts[p]) | (Hs[1] == tgts[p])
                        | (Hs[2] == tgts[p]) | (Hs[3] == tgts[p])
                    )
                    nib |= eqp.astype(jnp.int32) << p
            else:
                # k-membership floor (round-4 measured): the screen needs
                # ~k cmp + (k-1) or per position — k=8 measured 12.2 ms vs
                # k=1's 4.1 at 256 MiB, ~2x the ~15-op/position VPU floor
                # (same efficiency ratio as k=1, so it is throughput, not
                # the chain).  Tree-OR of the compares measured 13.3 ms
                # (no win, recorded); hoisting the k SMEM target reads out
                # of the word/byte loops (tgts above) is kept as the cheap
                # form.
                for b in range(4):
                    hit = None
                    for p in range(k):
                        eq = Hs[b] == tgts[p]
                        hit = eq if hit is None else (hit | eq)
                    nib |= hit.astype(jnp.int32) << b
            H = Hs[3]
            nibs.append(nib)
        nibE_ref[:, pl.ds(base, 8), :] = jnp.stack(nibs, axis=1)
        return H

    jax.lax.fori_loop(0, G, group, jnp.zeros((8, 128), jnp.int32))
    if emit == "bsums":
        _end_to_start_bsums(n_ref, nibE_ref, out_ref, m=m, W8=W8, C=C, Nk=Nk)
    elif emit == "bmask":
        _end_to_start_bmask(n_ref, nibE_ref, out_ref, m=m, W8=W8, C=C, Nk=Nk)
    elif emit == "pmask":
        _end_to_start_pmask(n_ref, nibE_ref, out_ref, m=m, W8=W8, C=C, Nk=Nk)


@functools.lru_cache(maxsize=256)
def _build_call(Nk: int, C: int, m: int, B: int, Bm: int, k: int,
                interpret: bool, emit: str = "nib",
                vma: frozenset = frozenset(), fused: bool = False):
    W8 = C // 32
    HS = max(1, -(-(m - 1) // 4))
    G = -(-(W8 + HS) // 8)
    G8 = G * 8
    DELTA = _delta(m)
    L = Nk // C
    nt = L // 128
    if emit in ("bsums", "bmask", "pmask"):
        assert C % 4096 == 0
        nbs = W8 // 128
        out_specs = pl.BlockSpec((8, nbs, 128), lambda i, n, t: (0, 0, i),
                                 memory_space=pltpu.VMEM)
        out_shape = _swar._sds((8, nbs, L), jnp.int32, vma)
        scratch = [pltpu.VMEM((8, G8, 128), jnp.int32)]
    else:
        out_specs = pl.BlockSpec((8, G8, 128), lambda i, n, t: (0, 0, i),
                                 memory_space=pltpu.VMEM)
        out_shape = _swar._sds((8, G8, L), jnp.int32, vma)
        scratch = []
    if fused:
        rpt = C // 32
        nrows = Nk // 4096
        in_specs = [
            pl.BlockSpec((rpt, 1024), lambda i, n, t: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (8, 1024),
                lambda i, n, t: (
                    jnp.minimum((i + 1) * rpt // 8, nrows // 8 - 1), 0
                ),
                memory_space=pltpu.VMEM,
            ),
        ]
        scratch = [pltpu.VMEM((8, DELTA + G8, 128), jnp.int32)] + scratch
    else:
        in_specs = [
            pl.BlockSpec((8, DELTA + G8, 128), lambda i, n, t: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # n, targets
        grid=(nt,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    kern = functools.partial(_kernel, G=G, m=m, B=B, Bm=Bm, k=k, DELTA=DELTA,
                             emit=emit, W8=W8, C=C, Nk=Nk, fused=fused,
                             HS=HS)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )


def _prepare(text_u8, n, targets, m, base: int, chunk_bytes: int, words,
             need_whole_blocks: bool):
    """Shared driver setup for both emission modes: kernel-threshold check,
    feed selection (fused natural view vs XLA relayout), int32-wrapped
    base/B^m constants, and the bitcast hash targets.  Returns None below
    the kernel threshold, else (feed, fused, tgt, B_i32, Bm_i32, Nk, cut).
    ``fused``: feed is the raw (Nk/4096, 1024) word-row view and the
    kernel stages the sub-chunk layout in VMEM (no HBM relayout)."""
    from .shift_and import _fused_ok

    N = text_u8.shape[0]
    C = chunk_bytes
    tile_bytes = 128 * C
    Nk = (N // tile_bytes) * tile_bytes
    if Nk < max(tile_bytes, _swar.MIN_KERNEL_BYTES) or (
        need_whole_blocks and C % 4096 != 0
    ):
        return None
    W = C // 4
    HS = max(1, -(-(m - 1) // 4))
    G8 = -(-(W // 8 + HS) // 8) * 8
    L = Nk // C
    if words is not None and words.ndim == 2 and _fused_ok(C):
        feed, fused = words[: Nk // 4096], True
    else:
        if words is None:
            words = _swar._as_words(text_u8[:Nk])
        elif words.ndim == 2:
            # pre-shaped host view: leading-dim slice, then ONE relayout
            # inside _layout's reshape (same cost as the 1-D path)
            words = words[: Nk // (4 * words.shape[1])]
        else:
            words = words[: Nk // 4]
        feed, fused = _layout(words, L, W, HS, G8, front=_delta(m)), False
    B = int(base) & 0xFFFFFFFF
    Bm = pow(B, m, 1 << 32)
    B_i32 = B - (1 << 32) if B >= (1 << 31) else B
    Bm_i32 = Bm - (1 << 32) if Bm >= (1 << 31) else Bm
    tgt = jax.lax.bitcast_convert_type(
        jnp.asarray(targets, jnp.uint32).reshape(-1), jnp.int32
    )
    cut = Nk - (m - 1) if m > 1 else Nk
    return feed, fused, tgt, B_i32, Bm_i32, Nk, cut


def rk_candidate_nib(text_u8, n, targets, m, base: int, *,
                     chunk_bytes: int = DEFAULT_CHUNK_BYTES,
                     interpret: bool = False, words=None):
    """(candidate start-nibble int32[Nk/4], cut) from the rolling-hash
    screen, or (None, 0) below the kernel threshold.

    ``targets``: uint32[k] pattern hashes (ops/tables.rk_hash semantics).
    Positions >= cut are NOT covered; the caller must handle [cut, N).
    """
    prep = _prepare(text_u8, n, targets, m, base, chunk_bytes, words,
                    need_whole_blocks=False)
    if prep is None:
        return None, 0
    feed, fused, tgt, B_i32, Bm_i32, Nk, cut = prep
    C = chunk_bytes
    call = _build_call(Nk, C, m, B_i32, Bm_i32, int(tgt.shape[0]), interpret,
                       vma=_swar.vma_of(feed), fused=fused)
    args = (feed, feed) if fused else (feed,)
    nibE = call(jnp.asarray(n, jnp.int32).reshape(1), tgt, *args)
    return end_nibble3_to_start_nib(nibE, C // 8, m), cut


def rk_candidate_bsums(text_u8, n, targets, m, base: int, *,
                       chunk_bytes: int = DEFAULT_CHUNK_BYTES,
                       interpret: bool = False, words=None,
                       emit: str = "bsums"):
    """(candidate block sums int32[Nk/512], cut) — the bsums-only rolling
    screen, or (None, 0) below the kernel threshold.  Counts are HASH-HIT
    counts per 512-byte block (validity-clamped); the consumer must verify
    (ops/reconstruct.extract_region word-compares candidate chunks,
    which both verifies and recounts exactly).

    ``emit='bmask'``: each block's int32 is a 16-bit SUB-BLOCK OCCUPANCY
    MASK (bit g = candidate start in 32-byte group g) instead of a count —
    same shape/HBM cost, still nonzero exactly where candidates exist;
    feeds the group-granular extraction
    (reconstruct.extract_region_multi_groups).

    ``emit='pmask'``: each block's int32 is a k-bit PATTERN-HIT mask
    (bit p = pattern p's hash hit a window starting in this block — a
    per-pattern superset); feeds the pattern-selected extraction
    (reconstruct.extract_region_multi_pselect), which verifies each
    single-pattern block against only its one flagged pattern."""
    prep = _prepare(text_u8, n, targets, m, base, chunk_bytes, words,
                    need_whole_blocks=True)
    if prep is None:
        return None, 0
    feed, fused, tgt, B_i32, Bm_i32, Nk, cut = prep
    C = chunk_bytes
    call = _build_call(Nk, C, m, B_i32, Bm_i32, int(tgt.shape[0]), interpret,
                       emit=emit, vma=_swar.vma_of(feed), fused=fused)
    args = (feed, feed) if fused else (feed,)
    bs = call(jnp.asarray(n, jnp.int32).reshape(1), tgt, *args)
    bs_flat = bs.transpose(2, 0, 1).reshape(-1)
    return bs_flat, cut
