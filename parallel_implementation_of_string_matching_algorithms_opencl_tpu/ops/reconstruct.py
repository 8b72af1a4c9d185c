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

# Sparse gather width: fixed per text-size class (no lax.switch tier
# ladder — a switch costs ~0.3 ms even without operand copies).  8192
# chunk rows = 64 MB of gathered+verified words, ~0.5 ms on v5e; 4096
# halves that for texts <= 256 MiB (whose candidate counts are
# proportionally smaller — measured +16 GB/s on the BM headline); inputs
# with more candidate chunks go dense, whose rescan is bounded anyway.
SPARSE_CHUNKS = 8192
SPARSE_CHUNKS_SMALL = 4096
SMALL_TEXT_CHUNKS = 65536  # <= 256 MiB
# Sparse second-level slot-overflow side-plane budget (rows with > DENSE_T
# matches whose rank range intersects [0, capacity)); escalates 8x inside
# dense_extract before giving up to the drain path.
SPARSE_OVERFLOW_ROWS = 512
DENSE_OVERFLOW_ROWS = 2048
# Small-count tier (round 5): sparse candidate profiles (BM/RK screens on
# ordinary corpora leave a few thousand candidate chunks at most) pay
# dense_extract's fixed machinery — the T-slot decode over cap_g*8 rows
# and a ~(cap_g*8*T + side*512)-key sort — regardless of how few
# candidates exist.  A 512-chunk tier runs the same pipeline at 1/8 width
# (side budget 256, escalating 8x to 2048; past that ok=False routes to
# drain exactly like the wide tier's own give-up).  Measured: BM recon
# 2.2 -> ~0.7 ms at 256 MiB english (exp/bm_breakdown.py).
SMALL_G = 512
SMALL_OVERFLOW_ROWS = 256


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
    nw = Mnp.shape[1]
    Lr = bs.shape[0] // 8
    chunkc = jnp.sum(bs.reshape(Lr, 8), axis=1)
    cap_g = min(
        SPARSE_CHUNKS_SMALL if Lr <= SMALL_TEXT_CHUNKS else SPARSE_CHUNKS,
        Lr,
    )
    # Candidate chunks beyond the fixed gather width are the ONE condition
    # sparse cannot absorb (its extraction work is otherwise bounded by the
    # compact plane + the rank<capacity relevance window inside
    # dense_extract); everything else stays on the cheap path.  nblk
    # (candidate 512B blocks) upper-bounds the MATCH-bearing rows (a match
    # block is necessarily a candidate block), which lets the compacted
    # branch run unguarded: the tier selector admits it only when nblk
    # fits the compaction budget.
    ncand = jnp.sum(chunkc > 0, dtype=jnp.int32)
    nblk = jnp.sum(bs > 0, dtype=jnp.int32)

    def sparse_w(cg, overflow_rows=SPARSE_OVERFLOW_ROWS, compact=False,
                 _=None):
        gids = extract.sorted_nonzero_ids(chunkc, cg, fill=Lr)
        nib = _verify_chunks(x2d, gids, P, M, Mnp, limit)
        c_sm = jnp.sum(extract._popcount4(nib), dtype=jnp.int32)
        rows2 = nib.reshape(cg * 8, 128)
        rc2 = jnp.sum(extract._popcount4(rows2), axis=1)
        base2 = (
            gids[:, None] * 4096
            + 512 * jnp.arange(8, dtype=jnp.int32)[None, :]
        ).reshape(-1)
        if compact:
            # Wide-tier row compaction (round 5): dense_extract's slot
            # decode + sort scale with its ROW count, and the chunk
            # verify hands it cg*8 = 32768 rows even when only ~1k hold
            # matches (BM headline: 2837 candidate chunks, 976 matches).
            # Rank-select the match-bearing 512B rows into a 2*cg plane
            # first.  NO inner guard: this branch is reachable only when
            # nblk <= 2*cg (the switch selector below), and match rows
            # <= nblk, so the budget cannot be exceeded.  An inner
            # guard cond measured as a whole extra dispatch (~0.3 ms,
            # exp/recon_compact.py / cond_passthrough).
            budget = 2 * cg
            ids = extract.sorted_nonzero_ids(
                (rc2 > 0).astype(jnp.int32), budget, cg * 8
            )
            idc = jnp.clip(ids, 0, cg * 8 - 1)
            live = ids < cg * 8
            rows2 = jnp.where(live[:, None], rows2[idc], 0)
            rc2 = jnp.where(live, rc2[idc], 0)
            base2 = jnp.where(live, base2[idc], 0)
        offs, ok = extract.dense_extract(
            rows2, rc2, base2, capacity,
            overflow_rows=overflow_rows,
        )
        # ~ok offsets hide gaps (sorted compaction) — blank them; the
        # count stays exact and overflow=True routes callers to drain.
        offs = jnp.where(ok, offs, jnp.int32(FILL))
        return c_sm, offs, ok

    sparse = functools.partial(sparse_w, cap_g, SPARSE_OVERFLOW_ROWS, False)

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

    # Count-tiered gather, ALL pattern lengths (round 5).  Two costs make
    # the fixed-width path wasteful on sparse candidate profiles:
    # (a) long patterns — the verify chain scales with nw (4*nw masked
    # compares over cap_g*(1024+nw) words, ~4-5 ms at nw=65/cap_g=4096)
    # even when ~no chunk is a candidate (the round-5 fix for the
    # config-3 m=256 row, VERDICT weak #3); (b) every pattern length —
    # dense_extract's slot decode runs over cap_g*8 rows and its sort
    # over cap_g*8*T + side*512 keys regardless of the candidate count
    # (~2.2 ms of the BM recon at 256 MiB english with 2.8k candidate
    # chunks, exp/bm_breakdown.py).  ONE lax.switch picks, in precedence
    # order: small tier (ncand <= SMALL_G, 1/8-width pipeline) /
    # wide+compact (nblk fits the 2*cap_g row budget) / wide-plain /
    # dense.  All selection happens in this one dispatch — inner guard
    # conds each measured as another ~0.3 ms (exp/recon_compact.py), the
    # difference that left e2e slower than round 4 despite 2.2-2.7x
    # faster components.
    if Lr > cap_g:
        branches = [
            functools.partial(sparse_w, SMALL_G, SMALL_OVERFLOW_ROWS, False),
            functools.partial(sparse_w, cap_g, SPARSE_OVERFLOW_ROWS, True),
            sparse,
            dense,  # reachable: ncand can exceed cap_g
        ]
        sel = jnp.where(
            ncand <= SMALL_G,
            0,
            jnp.where(nblk <= 2 * cap_g, 1, 2),
        )
        sel = jnp.where(ncand > cap_g, 3, sel)
        count, offs, ok = jax.lax.switch(sel, branches, None)
    else:
        # Small region (Lr <= cap_g, i.e. texts small enough that one
        # sparse gather covers every chunk): single zero-dispatch call —
        # the tier machinery exists for LARGE texts' sparse profiles,
        # and here the gather width already equals Lr (round-5 review:
        # the first cut tiered this band too, paying switch dispatch +
        # extra branch compiles on 2-16 MiB texts for nothing).
        count, offs, ok = sparse(None)
    return count, offs, (count > capacity) | ~ok


def _pay_planes(win, word_pos, P_all, M, Mnp, limit):
    """[4] int32[R, 128] membership planes over gathered block rows: bit p
    of plane ``a`` word ``w`` = exact match of pattern p starting at byte
    ``word_pos[r, w] + a``, validity-clamped to ``limit``.  ``win``:
    int32[R, 128 + nw(+)] lane-shifted-readable rows.  THE shared
    k-pattern word-compare chain — one implementation for the block tier,
    the groups side plane, and the groups exact-count fallback (a fix or
    guard here cannot drift per call site; the round-5 XLA miscompile
    guard taught that lesson)."""
    k = P_all.shape[0]
    nw = Mnp.shape[1]
    pay = []
    for a in range(4):
        plane = jnp.zeros((win.shape[0], 128), jnp.int32)
        for p in range(k):
            accv = None
            for kk in range(nw):
                if Mnp[a, kk] == 0:
                    continue
                w = win[:, kk : kk + 128]
                eq = (w == P_all[p, a, kk]) if Mnp[a, kk] == -1 else (
                    (w & M[a, kk]) == P_all[p, a, kk]
                )
                accv = eq if accv is None else (accv & eq)
            plane |= accv.astype(jnp.int32) << p
        pay.append(jnp.where(word_pos + a <= limit, plane, 0))
    return pay


def _pad_sort_pair(fk, fv, capacity: int):
    """Sorted (keys, vals) truncated/INF-padded to ``capacity``."""
    if fk.shape[0] < capacity:
        padn = capacity - fk.shape[0]
        fk = jnp.concatenate(
            [fk, jnp.full((padn,), extract.INF, jnp.int32)])
        fv = jnp.concatenate([fv, jnp.zeros((padn,), jnp.int32)])
    sk, sv = jax.lax.sort((fk, fv), num_keys=1)
    return sk[:capacity], sv[:capacity]


# Multi-pattern candidate-block gather tiers (512-byte granularity: the
# union of k patterns' matches is block-dense long before it is
# chunk-dense, and the gather + k-pattern verify cost is what scales with
# the tier — the 327680 tier exists because config 2's ~267k candidate
# blocks sat at 51% utilization of a lone 524288 tier; 131072 because the
# 256 MiB-class profile (~72k blocks, round-4 exp/multi_breakdown.py) sat
# at 22% of 327680, and gather/verify/decode all scale with tier width).
MULTI_BLOCK_TIERS = (16384, 131072, 327680, 524288)


def extract_region_multi(bs, x2d, text_u8, n, patterns, P_all, limit,
                         capacity: int, config, emit_union: bool = False):
    """Stacked (counts[k], offsets[k, capacity], overflows[k]) from ONE
    union candidate-block-sums plane (the k-hash rolling screen).

    ``emit_union=True`` returns (counts[k], upos[capacity],
    uval[capacity], overflows[k]) instead: the ascending union positions
    with per-position k-bit membership, SKIPPING the k per-pattern
    capacity-sized compaction sorts — the single-device caller splits
    per pattern on the host (order-preserving np compress), which is
    where those sorts' only consumer lives.  uval is zeroed on INF/fill
    slots.  The distributed/streaming callers keep the stacked form
    their collectives consume.

    Candidate 512-byte blocks are gathered once and verified against all k
    patterns in word space; per-(word, alignment) membership packs into
    four k-bit payload planes, so ONE sort-pair orders the union positions
    with their pattern sets and each pattern compacts its subset with a
    capacity-sized sort.  Replaces the round-2 multi path whose per-rank
    union extraction and text.reshape relayouts held config 2 at 3.4 GB/s.

    ``patterns``: uint8[k, m]; ``P_all``: int32[k, 4, nw] SWAR pattern
    words (multi_pattern_words).  Counts are exact whenever every candidate
    block fits the big gather tier; past that (adversarial) the counts fall
    back to an exact dense slab recount and offsets report as overflowed.
    """
    from . import emit as _emit

    k, m = patterns.shape
    # One payload plane holds one pattern per int32 bit (sign bit
    # excluded); callers with larger sets split into groups of 31
    # (models/multi.py) — a silent k=40 here would shift past bit 31 and
    # drop patterns without any error.
    assert k <= 31, "extract_region_multi holds <= 31 patterns per call"
    Mnp = swar.mask_words(m)
    M = jnp.asarray(Mnp)
    nw = Mnp.shape[1]
    nb = bs.shape[0]
    xblk = x2d.reshape(-1, 128)
    R8 = xblk.shape[0]
    nblk = jnp.sum(bs > 0, dtype=jnp.int32)
    tiers = sorted({min(t, nb) for t in MULTI_BLOCK_TIERS})

    def tier(cap_b: int):
        bids = extract.sorted_nonzero_ids(bs, cap_b, fill=nb)
        bc = jnp.clip(bids, 0, R8 - 1)
        win = jnp.concatenate(
            [xblk[bc], xblk[jnp.clip(bc + 1, 0, R8 - 1)][:, :nw]], axis=1
        )
        word_pos = bids[:, None] * 512 + 4 * jnp.arange(
            128, dtype=jnp.int32)[None, :]
        pay = _pay_planes(win, word_pos, P_all, M, Mnp, limit)
        union_nib = jnp.zeros((cap_b, 128), jnp.int32)
        for a in range(4):
            union_nib |= (pay[a] != 0).astype(jnp.int32) << a
        rc = jnp.sum(extract._popcount4(union_nib), axis=1)
        union_count = jnp.sum(rc, dtype=jnp.int32)
        pos_base = bids * 512  # fill rows already zeroed by validity

        T = 4
        keys, vals = extract.slot_decode(union_nib, rc, pos_base, T, pay)
        # side plane: rows with > T union matches intersecting [0, capacity)
        rank_base = extract.cumsum_i32(rc) - rc
        relevant = (rc > T) & (rank_base < capacity)
        n_rel = jnp.sum(relevant, dtype=jnp.int32)
        OC = 2048
        ok = n_rel <= OC

        def _with_side():
            oids = extract.sorted_nonzero_ids(
                relevant.astype(jnp.int32), OC, cap_b
            )
            oc = jnp.clip(oids, 0, cap_b - 1)
            ovalid = (oids < cap_b)[:, None]
            orows = jnp.where(ovalid, union_nib[oc], 0)
            opay = [jnp.where(ovalid, pay[a][oc], 0) for a in range(4)]
            obase = jnp.where(oids < cap_b, pos_base[oc], 0)
            okeys, ovals = extract.nib_rows_keys_payload(orows, obase, opay)
            return _pad_sort_pair(
                jnp.concatenate([keys.reshape(-1), okeys.reshape(-1)]),
                jnp.concatenate([vals.reshape(-1), ovals.reshape(-1)]),
                capacity,
            )

        def _no_side():
            # No row spilled past its T slots: the side keys would be
            # all-INF, so the OC-row gather + OC*512 extra sort input
            # (~45% of the union sort-pair at OC=2048) is skipped.
            return _pad_sort_pair(keys.reshape(-1), vals.reshape(-1),
                                  capacity)

        upos, uval = jax.lax.cond(n_rel == 0, _no_side, _with_side)
        offs = []
        if not emit_union:
            for p in range(k):
                keyp = jnp.where(
                    ((uval >> p) & 1) == 1, upos, jnp.int32(extract.INF)
                )
                sp = jax.lax.sort(keyp)
                spo = jnp.where(sp == extract.INF, jnp.int32(FILL), sp)
                # ~ok (side-plane overflow) loses rows beyond OC
                # entirely — a sorted compaction would hide the
                # mid-stream gaps, so blank the buffer (mirrors
                # extract_region's give-up path; valid_prefix/drain
                # consumers then see all-FILL, not a clean-looking
                # gapped prefix).
                offs.append(jnp.where(ok, spo, jnp.int32(FILL)))
        # Per-pattern counts: from the sorted union buffer when it holds
        # every union position (the common case — one cheap pass), else an
        # exact recount over the payload planes (cond keeps the ~8 ms
        # k*4-plane popcount off the hot path).  The buffer is only
        # complete when ok too: on side-plane overflow the rows past OC
        # never entered it, so counting membership bits there would
        # undercount — the pay-plane recount is exact here since every
        # candidate block was gathered (nblk <= cap_b on this branch).
        uvalid = jnp.where(upos != extract.INF, uval, 0)
        counts = jax.lax.cond(
            ok & (union_count <= capacity),
            lambda: jnp.stack([
                jnp.sum((uvalid >> p) & 1, dtype=jnp.int32)
                for p in range(k)
            ]),
            lambda: jnp.stack([
                sum(jnp.sum((pay[a] >> p) & 1, dtype=jnp.int32)
                    for a in range(4))
                for p in range(k)
            ]),
        )
        trunc = (union_count > capacity) | ~ok | (nblk > cap_b)
        if emit_union:
            return (counts, upos, jnp.where(ok, uvalid, 0),
                    jnp.broadcast_to(trunc, (k,)))
        return counts, jnp.stack(offs), jnp.broadcast_to(trunc, (k,))

    def giveup():
        # Candidate blocks beyond the big gather (adversarial): exact
        # counts via the dense slab recount; offsets unrecoverable here
        # (drain/windowed re-extraction recovers them).
        counts = jnp.stack([
            _emit._dense_block_count(text_u8, patterns[p], nb, limit)
            for p in range(k)
        ])
        if emit_union:
            return (counts, jnp.full((capacity,), extract.INF, jnp.int32),
                    jnp.zeros((capacity,), jnp.int32), jnp.ones((k,), bool))
        offs = jnp.full((k, capacity), FILL, jnp.int32)
        return counts, offs, jnp.ones((k,), bool)

    if len(tiers) == 1:
        out = tier(tiers[0])
    else:
        branches = [lambda c=c: tier(c) for c in tiers]
        sel = sum((nblk > t).astype(jnp.int32) for t in tiers[:-1])
        if nb > tiers[-1]:
            branches.append(giveup)
            sel = sel + (nblk > tiers[-1]).astype(jnp.int32)
        out = jax.lax.switch(sel, branches)
    if emit_union:
        counts, upos, uval, trunc = out
        return counts, upos, uval, (counts > capacity) | trunc
    counts, offs, trunc = out
    return counts, offs, (counts > capacity) | trunc


def extract_region_multi_pselect(bmask, x2d, text_u8, n, patterns, P_all,
                                 limit, capacity: int, config,
                                 emit_union: bool = False):
    """Pattern-SELECTED multi-pattern extraction — round-5 config-2 rework.

    Same contract as ``extract_region_multi`` but consumes the kernel's
    k-bit PATTERN-HIT masks (``rk_candidate_bsums(emit='pmask')``): the
    rolling screen already knows WHICH patterns' hashes hit each block,
    so a block flagged for at most S=2 patterns verifies against ONLY
    those — per-row one-hot selection of each flagged pattern's SWAR
    words (k scalar multiply-adds per (word, alignment) constant, over
    (cap_b,) vectors) replaces the k full compare chains.  The block
    path's k*4*nw plane verify (~13.4 G VPU ops at 1 GB / k=8, its
    measured floor) drops k/S-fold.  S=2 is set by the measured bit
    distribution at the config-2 profile (1 GB english, k=8: 96.2% of
    candidate blocks carry one pattern bit, 3.75% two, 0.02% three —
    a 1-bit-only main path flooded the side plane with the 10k two-bit
    blocks and blanket-overflowed); blocks flagged for >S patterns take
    a bounded side plane that runs the full k-chain (exact; past OC the
    same ok=False -> drain give-up as every sibling).

    Correctness leans on the kernel fold's per-pattern superset contract
    (kernels/shift_and._end_to_start_pmask): pattern p's true-match
    blocks ALWAYS carry bit p, so a block's matches can only belong to
    its flagged patterns.

    Inputs whose >2-bit block population exceeds the side budget (e.g.
    >= 3 hash-equal or systematically co-occurring patterns at scale —
    duplicates are supported) fall back WHOLESALE to the blocks path via
    a top-level cond: extract_region_multi is value-agnostic on its bs
    plane (nonzero-ness only), so it consumes the pmask directly.
    Without this, such inputs blanket-blanked every offset that the
    blocks path handled inline (round-5 review finding, covered by
    tests/test_extract.py::test_pselect_many_multibit_blocks_fallback).
    """
    from . import emit as _emit

    k, m = patterns.shape
    assert k <= 31, "pmask holds <= 31 patterns per plane"
    Mnp = swar.mask_words(m)
    M = jnp.asarray(Mnp)
    nw = Mnp.shape[1]
    nb = bmask.shape[0]
    xblk = x2d.reshape(-1, 128)
    R8 = xblk.shape[0]
    nblk = jnp.sum(bmask != 0, dtype=jnp.int32)
    tiers = sorted({min(t, nb) for t in MULTI_BLOCK_TIERS})
    # T=4 union slots per row (like the blocks path): T=2 measured a
    # perf wash at the config-2 profile, and the larger T halves the
    # side-plane pressure from single/double-bit rows holding 3-4
    # matches (the side must hold EVERY non-main row — its matches back
    # the exact count path — so side headroom is robustness).
    T = 4
    OC = 2048

    def tier(cap_b: int):
        bids, sb = extract.sorted_nonzero_pairs(bmask, cap_b, fill=nb)
        bc = jnp.clip(bids, 0, R8 - 1)
        win = jnp.concatenate(
            [xblk[bc], xblk[jnp.clip(bc + 1, 0, R8 - 1)][:, :nw]], axis=1
        )
        live = bids < nb
        pc = _popcount32(sb)
        inmain = (pc >= 1) & (pc <= 2) & live
        fs1 = sb & (-sb)  # lowest flagged pattern bit
        rem = sb & ~fs1
        fs2 = rem & (-rem)  # second bit (0 for single-bit rows)
        word_pos = bids[:, None] * 512 + 4 * jnp.arange(
            128, dtype=jnp.int32)[None, :]
        main_col = inmain[:, None]
        pay = []
        union_nib = jnp.zeros((cap_b, 128), jnp.int32)
        for a in range(4):
            plane = jnp.zeros((cap_b, 128), jnp.int32)
            for fsel in (fs1, fs2):
                oh = [((fsel >> p) & 1) for p in range(k)]
                accv = None
                for kk in range(nw):
                    if Mnp[a, kk] == 0:
                        continue
                    Pk = oh[0] * P_all[0, a, kk]
                    for p in range(1, k):
                        Pk = Pk + oh[p] * P_all[p, a, kk]
                    w = win[:, kk : kk + 128]
                    eq = (w == Pk[:, None]) if Mnp[a, kk] == -1 else (
                        (w & M[a, kk]) == Pk[:, None]
                    )
                    accv = eq if accv is None else (accv & eq)
                # fsel == 0 (no second pattern) zeroes the contribution.
                plane |= accv.astype(jnp.int32) * fsel[:, None]
            plane = jnp.where(
                main_col & (word_pos + a <= limit), plane, 0
            )
            pay.append(plane)
            union_nib |= (plane != 0).astype(jnp.int32) << a
        rc = jnp.sum(extract._popcount4(union_nib), axis=1)
        pos_base = bids * 512  # fill/side rows: plane already zeroed
        keys, vals = extract.slot_decode(union_nib, rc, pos_base, T, pay)
        main_row = inmain & (rc <= T)
        # zero the slot keys of main rows that overflowed T (they go to
        # the side plane with the >2-bit rows)
        keys = jnp.where(main_row[:, None], keys, jnp.int32(extract.INF))
        vals = jnp.where(main_row[:, None], vals, 0)
        keys_main = keys.reshape(-1)
        vals_main = vals.reshape(-1)
        main_union = jnp.sum(jnp.where(main_row, rc, 0), dtype=jnp.int32)
        side_row = ((pc > 2) | (inmain & (rc > T))) & live
        n_side = jnp.sum(side_row, dtype=jnp.int32)
        ok = n_side <= OC

        def _with_side(oc_rows: int):
            # Full k-chain verify of the (bounded) side rows — the shared
            # pay-plane machinery (_pay_planes).  oc_rows is tiered on
            # n_side: each side row adds 512 sort keys, and the common
            # post-S=2 side population is tiny (53 three-bit blocks at
            # the 1 GB config-2 profile) — a fixed 2048-row plane would
            # put 1M dead keys through the union sort.
            oids = extract.sorted_nonzero_ids(
                side_row.astype(jnp.int32), oc_rows, cap_b
            )
            oc = jnp.clip(oids, 0, cap_b - 1)
            ovalid = (oids < cap_b)[:, None]
            owin = jnp.where(ovalid, win[oc], 0)
            oblk = jnp.where(oids < cap_b, bids[oc], nb)
            wp = oblk[:, None] * 512 + 4 * jnp.arange(
                128, dtype=jnp.int32)[None, :]
            spay = _pay_planes(owin, wp, P_all, M, Mnp, limit)
            s_nib = jnp.zeros((oc_rows, 128), jnp.int32)
            for a in range(4):
                s_nib |= (spay[a] != 0).astype(jnp.int32) << a
            okeys, ovals = extract.nib_rows_keys_payload(
                s_nib, oblk * 512, spay
            )
            s_union = jnp.sum(extract._popcount4(s_nib), dtype=jnp.int32)
            up, uv = _pad_sort_pair(
                jnp.concatenate([keys_main, okeys.reshape(-1)]),
                jnp.concatenate([vals_main, ovals.reshape(-1)]),
                capacity,
            )
            return up, uv, s_union

        def _no_side():
            up, uv = _pad_sort_pair(keys_main, vals_main, capacity)
            return up, uv, jnp.int32(0)

        OC_SMALL = 256
        upos, uval, side_union = jax.lax.switch(
            (n_side > 0).astype(jnp.int32)
            + (n_side > OC_SMALL).astype(jnp.int32),
            [
                _no_side,
                functools.partial(_with_side, OC_SMALL),
                functools.partial(_with_side, OC),
            ],
        )
        union_count = main_union + side_union

        def _counts_buffer():
            # The sorted union buffer holds EVERY union position (it fits
            # capacity and the side plane fit) — per-pattern counts are k
            # cheap membership-bit sums over (capacity,) vectors.
            uvalid = jnp.where(upos != extract.INF, uval, 0)
            return jnp.stack([
                jnp.sum((uvalid >> p) & 1, dtype=jnp.int32)
                for p in range(k)
            ])

        def _counts_full():
            # Buffer incomplete (union > capacity, or side overflow):
            # offsets report truncated, counts MUST stay exact — full
            # k-chain recount of EVERY gathered row (exact because every
            # candidate block was gathered: nblk <= cap_b on this tier).
            wp = (jnp.where(live, bids, nb)[:, None] * 512
                  + 4 * jnp.arange(128, dtype=jnp.int32)[None, :])
            planes = _pay_planes(win, wp, P_all, M, Mnp, limit)
            return jnp.stack([
                sum(jnp.sum((planes[a] >> p) & 1, dtype=jnp.int32)
                    for a in range(4))
                for p in range(k)
            ])

        counts = jax.lax.cond(
            ok & (union_count <= capacity), _counts_buffer, _counts_full
        )
        trunc = (union_count > capacity) | ~ok | (nblk > cap_b)
        if emit_union:
            uvalid = jnp.where((upos != extract.INF) & ok, uval, 0)
            return counts, upos, uvalid, jnp.broadcast_to(trunc, (k,))
        offs = []
        for p in range(k):
            keyp = jnp.where(
                ((uval >> p) & 1) == 1, upos, jnp.int32(extract.INF)
            )
            sp = jax.lax.sort(keyp)
            spo = jnp.where(sp == extract.INF, jnp.int32(FILL), sp)
            offs.append(jnp.where(ok, spo, jnp.int32(FILL)))
        return counts, jnp.stack(offs), jnp.broadcast_to(trunc, (k,))

    def giveup():
        counts = jnp.stack([
            _emit._dense_block_count(text_u8, patterns[p], nb, limit)
            for p in range(k)
        ])
        if emit_union:
            return (counts, jnp.full((capacity,), extract.INF, jnp.int32),
                    jnp.zeros((capacity,), jnp.int32), jnp.ones((k,), bool))
        offs = jnp.full((k, capacity), FILL, jnp.int32)
        return counts, offs, jnp.ones((k,), bool)

    def _pselect_tiers(_):
        if len(tiers) == 1:
            out = tier(tiers[0])
        else:
            branches = [lambda c=c: tier(c) for c in tiers]
            sel = sum((nblk > t).astype(jnp.int32) for t in tiers[:-1])
            if nb > tiers[-1]:
                branches.append(giveup)
                sel = sel + (nblk > tiers[-1]).astype(jnp.int32)
            out = jax.lax.switch(sel, branches)
        if emit_union:
            counts, upos, uval, trunc = out
            return counts, upos, uval, (counts > capacity) | trunc
        counts, offs, trunc = out
        return counts, offs, (counts > capacity) | trunc

    def _blocks_fallback(_):
        # >OC multi-bit blocks: every one of them would land on the side
        # plane and blanket-blank the offsets — run the uniform all-k
        # block verify instead (it reads only nonzero-ness off bs, so
        # the pmask plane feeds it directly).
        return extract_region_multi(
            bmask, x2d, text_u8, n, patterns, P_all, limit, capacity,
            config, emit_union=emit_union,
        )

    nmulti = jnp.sum(_popcount32(bmask) > 2, dtype=jnp.int32)
    return jax.lax.cond(nmulti <= OC, _pselect_tiers, _blocks_fallback,
                        operand=None)


def _popcount16(x):
    """Per-element popcount of the low 16 bits of int32 (SWAR with masks —
    arithmetic shifts are fine because every shifted-in sign bit lands on
    a masked-out position)."""
    x = x & 0xFFFF
    x = x - ((x >> 1) & 0x5555)
    x = (x & 0x3333) + ((x >> 2) & 0x3333)
    x = (x + (x >> 4)) & 0x0F0F
    return (x + (x >> 8)) & 0x1F


def _popcount32(x):
    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F
    x = x + (x >> 8)
    x = x + (x >> 16)
    return x & 0x3F


def extract_region_multi_groups(bmask, x2d, text_u8, n, patterns, P_all,
                                limit, capacity: int, config):
    """Group-granular multi-pattern extraction — round-5 config-2 rework.

    Same contract as ``extract_region_multi`` but consumes the kernel's
    16-bit SUB-BLOCK OCCUPANCY masks (``rk_candidate_bsums(emit='bmask')``)
    instead of counts.  The r4 block design verified all 512 positions of
    every candidate block against all k patterns (~13.4 G VPU ops at 1 GB /
    k=8 — the measured extraction majority); here each candidate block's
    single occupied 32-byte group is selected into a (cap_b, 16)-word slab
    (16 static slices weighted by a one-hot of the mask's bit index — no
    gather) and only its 32 positions are verified, on fully-lane-utilized
    1-D vectors: ~16x less verify ALU and a T=2 slot sort half the size.
    Blocks whose mask has >1 group set, or >T union matches, fall to a
    bounded side plane that runs the full-block verify (exact, gated on
    existence).  Counts are exact whenever every candidate block fits the
    tier, as before.

    Requires nw <= 9 (m <= 33): the selected slab holds 16 words, and a
    chain anchored at group word 7 reaches word 7 + nw - 1.  Callers gate
    on that and fall back to the block path otherwise.
    """
    from . import emit as _emit

    k, m = patterns.shape
    assert k <= 31, "extract_region_multi_groups holds <= 31 patterns"
    Mnp = swar.mask_words(m)
    M = jnp.asarray(Mnp)
    nw = Mnp.shape[1]
    assert nw <= 9, "group slab (16 words) cannot cover the compare chain"
    nb = bmask.shape[0]
    xblk = x2d.reshape(-1, 128)
    R8 = xblk.shape[0]
    nblk = jnp.sum(bmask != 0, dtype=jnp.int32)
    tiers = sorted({min(t, nb) for t in MULTI_BLOCK_TIERS})
    T = 2
    OC2 = 2048

    def tier(cap_b: int):
        bids, sb = extract.sorted_nonzero_pairs(bmask, cap_b, fill=nb)
        bc = jnp.clip(bids, 0, R8 - 1)
        # 16 halo words (vs the block path's nw): the group slab spans
        # [8*gsel, 8*gsel + 16) and gsel=15 reaches word 135.
        win = jnp.concatenate(
            [xblk[bc], xblk[jnp.clip(bc + 1, 0, R8 - 1)][:, :16]], axis=1
        )
        pc16 = _popcount16(sb)
        fs16 = sb & (-sb) & 0xFFFF
        gsel = _popcount16(fs16 - 1)  # 16 when sb == 0 (fill rows)
        single = pc16 == 1
        gw16 = jnp.zeros((cap_b, 16), jnp.int32)
        for g in range(16):
            oh = (gsel == g).astype(jnp.int32)
            gw16 = gw16 + oh[:, None] * win[:, 8 * g : 8 * g + 16]
        # MISCOMPILATION GUARD (jax 0.9.0 / libtpu 0.0.34, TPU v5e): when
        # XLA fuses this one-hot weighted-sum build with the downstream
        # compare chain, the fused kernel returns wrong compare results
        # (bit 16 of a verified row read back 0; eager, CPU-jit, and the
        # barriered form all agree on 1 — regression covered by
        # tests/test_kernels.py::test_rk_multi_gather_modes_parity).  The
        # barrier forces gw16 to materialize — performance-neutral (21 MB
        # at the largest tier).
        gw16 = jax.lax.optimization_barrier(gw16)
        # Transposed (16, cap_b) slab: the compare chains below run on
        # 8-row slices whose LANES are the cap_b blocks (fully utilized
        # vectors, ~160 large fused ops — a per-(t, a) scalar-column form
        # measured launch-overhead-bound: 1280 tiny ops).
        gwT = gw16.T
        pos_base = bids * 512 + jnp.minimum(gsel, 15) * 32
        # 32-bit validity mask of the group's bytes: bit b valid iff
        # pos_base + b <= limit AND the row is a live single-group row.
        lim32 = limit - pos_base
        vm = jnp.where(
            lim32 >= 31,
            jnp.int32(-1),
            jnp.where(
                lim32 < 0,
                0,
                (jnp.left_shift(1, jnp.clip(lim32, 0, 30) + 1) - 1),
            ),
        )
        vm = jnp.where(single & (bids < nb), vm, 0)
        patm = []
        for p in range(k):
            bits_p = jnp.zeros((cap_b,), jnp.int32)
            for a in range(4):
                accv = None
                for kk in range(nw):
                    if Mnp[a, kk] == 0:
                        continue
                    w = gwT[kk : kk + 8]  # row t = group word t, all rows
                    eq = (w == P_all[p, a, kk]) if Mnp[a, kk] == -1 \
                        else ((w & M[a, kk]) == P_all[p, a, kk])
                    accv = eq if accv is None else (accv & eq)
                # Pack rows t=0..7 as bits 4t+a: products have disjoint
                # bits, so the int32 sum IS the bitwise OR (incl. the
                # wrapped bit 31).
                wa = jnp.asarray(
                    (np.uint32(1) << (4 * np.arange(8, dtype=np.uint32)
                                      + np.uint32(a))).view(np.int32)
                )
                bits_p = bits_p + jnp.sum(
                    accv.astype(jnp.int32) * wa[:, None], axis=0,
                    dtype=jnp.int32,
                )
            patm.append(bits_p & vm)
        union32 = patm[0]
        for p in range(1, k):
            union32 = union32 | patm[p]
        rc = _popcount32(union32)
        side_row = ((pc16 > 1) | (single & (rc > T))) & (bids < nb)
        main_row = single & (rc <= T) & (bids < nb)
        u = jnp.where(main_row, union32, 0)
        patm_m = [jnp.where(main_row, pm, 0) for pm in patm]
        # T=2 slots off the first two set bits.
        keys_main, vals_main = [], []
        for _slot in range(T):
            fs = u & (-u)
            b = _popcount32(fs - 1)
            bcl = jnp.clip(b, 0, 31)
            keys_main.append(
                jnp.where(u != 0, pos_base + bcl, jnp.int32(extract.INF))
            )
            v = jnp.zeros((cap_b,), jnp.int32)
            for p in range(k):
                v |= ((patm_m[p] >> bcl) & 1) << p
            vals_main.append(jnp.where(u != 0, v, 0))
            u = u & (~fs)
        keys_main = jnp.concatenate(keys_main)
        vals_main = jnp.concatenate(vals_main)
        main_counts = jnp.stack([
            jnp.sum(_popcount32(pm), dtype=jnp.int32) for pm in patm_m
        ])
        main_union = jnp.sum(jnp.where(main_row, rc, 0), dtype=jnp.int32)
        n_side = jnp.sum(side_row, dtype=jnp.int32)
        ok = n_side <= OC2

        def _with_side():
            # Full-block verify of the (bounded) side rows — the shared
            # pay-plane chain (_pay_planes) on OC2 rows.
            oids = extract.sorted_nonzero_ids(
                side_row.astype(jnp.int32), OC2, cap_b
            )
            oc = jnp.clip(oids, 0, cap_b - 1)
            ovalid = (oids < cap_b)[:, None]
            owin = jnp.where(ovalid, win[oc], 0)
            oblk = jnp.where(oids < cap_b, bids[oc], nb)
            word_pos = oblk[:, None] * 512 + 4 * jnp.arange(
                128, dtype=jnp.int32)[None, :]
            pay = _pay_planes(owin, word_pos, P_all, M, Mnp, limit)
            union_nib = jnp.zeros((OC2, 128), jnp.int32)
            for a in range(4):
                union_nib |= (pay[a] != 0).astype(jnp.int32) << a
            okeys, ovals = extract.nib_rows_keys_payload(
                union_nib, oblk * 512, pay
            )
            s_counts = jnp.stack([
                sum(jnp.sum((pay[a] >> p) & 1, dtype=jnp.int32)
                    for a in range(4))
                for p in range(k)
            ])
            s_union = jnp.sum(
                extract._popcount4(union_nib), dtype=jnp.int32
            )
            up, uv = _pad_sort_pair(
                jnp.concatenate([keys_main, okeys.reshape(-1)]),
                jnp.concatenate([vals_main, ovals.reshape(-1)]),
                capacity,
            )
            return up, uv, s_counts, s_union

        def _no_side():
            up, uv = _pad_sort_pair(keys_main, vals_main, capacity)
            return up, uv, jnp.zeros((k,), jnp.int32), jnp.int32(0)

        upos, uval, side_counts, side_union = jax.lax.cond(
            n_side == 0, _no_side, _with_side
        )

        def _counts_fast():
            return main_counts + side_counts, main_union + side_union

        def _counts_full():
            # Side plane overflowed (adversarial: > OC2 blocks that are
            # multi-group or match-dense): offsets report truncated, but
            # counts MUST stay exact — recount EVERY gathered row at full
            # block width (the shared _pay_planes chain, paid only here).
            word_pos = (jnp.where(bids < nb, bids, nb)[:, None] * 512
                        + 4 * jnp.arange(128, dtype=jnp.int32)[None, :])
            planes = _pay_planes(win, word_pos, P_all, M, Mnp, limit)
            cs = [sum(jnp.sum((planes[a] >> p) & 1, dtype=jnp.int32)
                      for a in range(4)) for p in range(k)]
            un = jnp.zeros((cap_b, 128), jnp.int32)
            for a in range(4):
                un |= (planes[a] != 0).astype(jnp.int32) << a
            return (jnp.stack(cs),
                    jnp.sum(extract._popcount4(un), dtype=jnp.int32))

        counts, union_count = jax.lax.cond(ok, _counts_fast, _counts_full)
        offs = []
        for p in range(k):
            keyp = jnp.where(
                ((uval >> p) & 1) == 1, upos, jnp.int32(extract.INF)
            )
            sp = jax.lax.sort(keyp)
            spo = jnp.where(sp == extract.INF, jnp.int32(FILL), sp)
            offs.append(jnp.where(ok, spo, jnp.int32(FILL)))
        trunc = (union_count > capacity) | ~ok | (nblk > cap_b)
        return counts, jnp.stack(offs), jnp.broadcast_to(trunc, (k,))

    def giveup():
        counts = jnp.stack([
            _emit._dense_block_count(text_u8, patterns[p], nb, limit)
            for p in range(k)
        ])
        offs = jnp.full((k, capacity), FILL, jnp.int32)
        return counts, offs, jnp.ones((k,), bool)

    if len(tiers) == 1:
        counts, offs, trunc = tier(tiers[0])
    else:
        branches = [lambda c=c: tier(c) for c in tiers]
        sel = sum((nblk > t).astype(jnp.int32) for t in tiers[:-1])
        if nb > tiers[-1]:
            branches.append(giveup)
            sel = sel + (nblk > tiers[-1]).astype(jnp.int32)
        counts, offs, trunc = jax.lax.switch(sel, branches)
    return counts, offs, (counts > capacity) | trunc
