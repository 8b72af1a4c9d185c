"""Bit-parallel prefix-automaton Pallas kernel (KMP's TPU execution engine).

The classic KMP scan is ``state = dfa[state, byte]`` — a 2-D table gather
whose general form Mosaic does not support (tpu.dynamic_gather requires
operand/indices/output to share one 2-D shape; see kernels/swar.py for the
other hardware constraints).  The bit-parallel Shift-AND automaton
(Baeza-Yates–Gonnet) computes the *same* prefix-automaton semantics — bit j
of the state word D is "pattern prefix of length j+1 ends at this byte" —
with a transition that IS expressible on the VPU:

    D = ((D << 1) | 1) & B[byte]        # branchless automaton step
    match ends here  <=>  bit (m-1) of D

``B[c]`` (bit j set iff pattern[j] == c) is a 256-entry table looked up per
byte via two lane-wise ``tpu.dynamic_gather``s over lane-replicated (8, 128)
halves plus a select.  One int32 state word per lane supports m <= 32; the
dense-DFA jnp path (ops/kmp.py) remains the reference implementation and
serves longer patterns.

Decomposition: each (128, W)-word tile = 128 chunks x 8 sub-chunks, giving
1024 independent automata, one per VPU element of an (8, 128) register —
full occupancy.  A sub-chunk owns matches STARTING in its C/8 bytes and
scans (m-1) halo bytes past its end (prefix-automaton state at a match
start depends only on bytes [start, start+m), so starting each automaton
cold at its sub-chunk is exact — SURVEY.md §7.4 item 6; and a match
starting before a sub-chunk can never be reported by it, so the merge is
duplicate-free).

The kernel emits an END-position nibble mask in sub-chunk-major layout
(8, G8, L) — bit b of word g flags a match *ending* at scan byte 4g+b —
written one aligned (8, 8, 128) register group at a time (Mosaic requires
provably-aligned dynamic sublane offsets).  The end→start shift by (m-1)
and the byte-order restore happen outside the kernel in word space
(``end_nibble3_to_start_nib``) — never expanding to bool[N].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import swar as _swar
from .swar import DEFAULT_CHUNK_BYTES

# State words per lane: K = ceil(m/32).  Gather cost grows with K (two
# dynamic_gathers per state word per byte), so throughput falls roughly as
# 1/K; K = 8 covers the full BASELINE.json:9 pattern range (4..256 bytes)
# on-kernel.  The dense-DFA jnp path covers longer patterns.
MAX_STATE_WORDS = 8
MAX_SHIFT_AND_PATTERN = 32 * MAX_STATE_WORDS


def shift_and_supported(m: int) -> bool:
    return 1 <= m <= MAX_SHIFT_AND_PATTERN


def _fused_ok(C: int) -> bool:
    """The fused natural feed needs whole word-rows per chunk (the
    in-kernel (128, rpc, 1024) reshape) and sub-chunks that never straddle
    a word-row (the per-sub-chunk transpose slices): C in
    {4096, 8192, 16384, 32768}."""
    W8 = C // 32
    return C % 4096 == 0 and W8 <= 1024 and 1024 % W8 == 0


def b_table(pattern: np.ndarray) -> np.ndarray:
    """int32[K, 2, 8, 128]: lane-replicated B-table halves per state word.

    B_k[c] bit j == (pattern[32k + j] == c); halves [0]=c<128, [1]=c>=128,
    each broadcast across the 8 sublanes so a lane-wise dynamic_gather with
    indices (c & 127) reads it directly.
    """
    pat = np.asarray(pattern, dtype=np.uint8)
    m = len(pat)
    K = max(1, -(-m // 32))
    B = np.zeros((K, 256), dtype=np.uint32)
    for j, c in enumerate(pat):
        B[j // 32, c] |= np.uint32(1) << np.uint32(j % 32)
    halves = B.view(np.int32).reshape(K, 2, 128)
    return np.broadcast_to(halves[:, :, None, :], (K, 2, 8, 128)).copy()


def _stage_subchunks(x_ref, nxt_ref, x3_ref, *, W8, HS, DELTA, G8):
    """Stage one NATURAL-layout tile into the sub-chunk-major VMEM scratch
    — the round-4 fused feed that kills the XLA relayout copies
    (round-3 VERDICT weak #2: ~2 full-buffer copies, ~14% of RK's e2e).

    ``x_ref``: (rows_per_tile, 1024) block of the (N/4096, 1024) host word
    view (rows_per_tile = C/32 — 128 chunks x C/4096 rows).  ``nxt_ref``:
    (8, 1024) block whose row 0 is the NEXT tile's first word-row (8 rows
    because Mosaic requires sublane-divisible blocks; index clamped on the
    final tile — the garbage only feeds halo positions past the kernel
    coverage cut, which validity masks, same argument as swar._stage_ext).
    ``x3_ref``: (8, DELTA+G8, 128) scratch laid out exactly like
    ``_layout``'s output: DELTA front-pad zeros, W8 real words, HS halo
    words of the global stream, zero pad to G8.

    Mechanics (all Mosaic-native, measured +0.16 ms over a pure read at
    256 MiB vs +2.8 ms for the XLA relayout): per sub-chunk, W8/128
    128x128 transposes move [chunk, word] -> [word, chunk]; intra-chunk
    halos copy from the next sub-chunk's staged words; the chunk-crossing
    halo (s=7) is a sublane roll of each chunk's first words with the
    next tile's row spliced into lane 127.  Front/back zero pads are
    written once at grid step 0 (scratch persists; later tiles never
    touch those words)."""
    rpc = W8 // 128  # word-rows per chunk (C/4096)
    xv = x_ref[:]
    x4 = xv.reshape(128, rpc, 1024)  # [chunk, row, col]

    @pl.when(pl.program_id(0) == 0)
    def _zero_pads():
        if DELTA:
            x3_ref[:, :DELTA, :] = jnp.zeros((8, DELTA, 128), jnp.int32)
        back = G8 - (W8 + HS)
        if back:
            x3_ref[:, DELTA + W8 + HS :, :] = jnp.zeros(
                (8, back, 128), jnp.int32
            )

    for s in range(8):
        r, part = divmod(s * W8, 1024)
        for wb in range(W8 // 128):
            x3_ref[s, DELTA + wb * 128 : DELTA + (wb + 1) * 128, :] = (
                x4[:, r, part + wb * 128 : part + (wb + 1) * 128].T
            )
    # Halos: the HS words of the GLOBAL stream after each sub-chunk.
    for s in range(7):
        x3_ref[s, DELTA + W8 : DELTA + W8 + HS, :] = x3_ref[
            s + 1, DELTA : DELTA + HS, :
        ]
    # s=7: first HS words of the NEXT chunk (lane c+1; lane 127 = next
    # tile's chunk 0 via nxt_ref).  HS <= 127 always (m <= 509), so one
    # 128-word slab covers it.
    h128 = x4[:, 0, :128]  # (128 chunks, first 128 words)
    rolled = pltpu.roll(h128, shift=127, axis=0)  # row c <- chunk c+1
    row = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    hv = jnp.where(row == 127, nxt_ref[0:1, :128], rolled)
    x3_ref[7, DELTA + W8 : DELTA + W8 + HS, :] = hv.T[:HS, :]


def _end_to_start_bsums(n_ref, nibE_ref, bs_ref, *, m, W8, C, Nk):
    """Fold the END-position nibble plane (VMEM) to per-512-byte-block
    START counts with validity applied — the bsums-only epilogue that lets
    the kernel skip the O(N) nibble HBM write entirely (the start nibbles
    live and die in registers/VMEM).

    Start word g' of a sub-chunk draws bit b from end word g'+q bit b+r
    (q, r = divmod(m-1, 4)) — the same static-slice shift as
    ``end_nibble3_to_start_nib``, done in-kernel.  Validity mirrors
    swar._validity_nibble: element [s, g', lane] of grid step i covers
    byte (i*128+lane)*C + s*(C/8) + 4*g'."""
    sn = _fold_start_nibbles(n_ref, nibE_ref, m=m, W8=W8, C=C, Nk=Nk)
    pc = (sn & 1) + ((sn >> 1) & 1) + ((sn >> 2) & 1) + ((sn >> 3) & 1)
    nbs = W8 // 128  # 512-byte blocks per sub-chunk
    per = jnp.sum(pc.reshape(8, nbs, 128, 128), axis=2)  # (8, nbs, 128)
    bs_ref[...] = per


def _start_word_grid(n_ref, *, m, W8, C, Nk):
    """(word_pos, nlim) for the (8, W8, 128) start-word plane of this grid
    step: element [s, g', lane] covers byte (i*128+lane)*C + s*(C/8) +
    4*g'; nlim = the last valid start.  THE shared validity grid for
    every end->start fold — a clamp fix here cannot drift per fold
    (the _pay_planes doctrine)."""
    i = pl.program_id(0)
    shp = (8, W8, 128)
    sub = jax.lax.broadcasted_iota(jnp.int32, shp, 0)
    gw = jax.lax.broadcasted_iota(jnp.int32, shp, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, shp, 2)
    word_pos = (i * 128 + lane) * C + sub * (C // 8) + gw * 4
    nlim = jnp.minimum(n_ref[0], jnp.int32(Nk)) - m
    return word_pos, nlim


def _fold_start_nibbles(n_ref, nibE_ref, *, m, W8, C, Nk):
    """Shared end->start fold + validity clamp: returns the START-position
    nibble plane (8, W8, 128) (see ``_end_to_start_bsums`` docstring)."""
    q, r = divmod(m - 1, 4)
    E = nibE_ref[:]  # (8, G8, 128); words hold 4 low bits only
    lo = E[:, q : q + W8, :]
    if r == 0:
        sn = lo
    else:
        hi = E[:, q + 1 : q + 1 + W8, :]
        sn = ((lo >> r) | (hi << (4 - r))) & 0xF
    word_pos, nlim = _start_word_grid(n_ref, m=m, W8=W8, C=C, Nk=Nk)
    keep = jnp.clip(nlim - word_pos + 1, 0, 4)
    return sn & ((1 << keep) - 1)


def _end_to_start_pmask(n_ref, nibE_ref, bs_ref, *, m, W8, C, Nk):
    """Fold per-END-WORD k-bit PATTERN-HIT masks to per-512-byte-block
    pattern masks (round 5, the 'pmask' emission behind multi_gather=
    'pselect').  A window starting at byte 4*gw'+a ends in word gw'+q
    (r == 0) or gw'+q / gw'+q+1 (r > 0), q, r = divmod(m-1, 4) — so
    OR-ing those end words' masks onto start word gw' marks, per pattern,
    a word-granular SUPERSET of the true start words; the block fold then
    ORs 128 words per block (log-halving — no bitwise-or reduce
    primitive).  Validity is word-granular (word_pos <= n-m keeps any
    word containing a valid start).  Exactness contract: bit p of block b
    is set for EVERY true match of pattern p starting in b (superset per
    pattern); spurious bits cost only verify width downstream."""
    q, r = divmod(m - 1, 4)
    E = nibE_ref[:]  # (8, G8, 128) k-bit pattern masks per end word
    sm = E[:, q : q + W8, :]
    if r:
        sm = sm | E[:, q + 1 : q + 1 + W8, :]
    word_pos, nlim = _start_word_grid(n_ref, m=m, W8=W8, C=C, Nk=Nk)
    sm = jnp.where(word_pos <= nlim, sm, 0)
    nbs = W8 // 128
    x = sm.reshape(8, nbs, 128, 128)
    h = 128
    while h > 1:
        h //= 2
        x = x[:, :, :h, :] | x[:, :, h : 2 * h, :]
    bs_ref[...] = x.reshape(8, nbs, 128)


def _end_to_start_bmask(n_ref, nibE_ref, bs_ref, *, m, W8, C, Nk):
    """Like ``_end_to_start_bsums`` but emits, per 512-byte block, a 16-BIT
    SUB-BLOCK OCCUPANCY MASK (bit g = any candidate start in the block's
    g-th 32-byte group) instead of the count.  Same output shape and HBM
    cost; downstream consumers that only test ``bs != 0`` (candidate-id
    compaction) are unaffected, while the group-granular multi-pattern
    extraction (ops/reconstruct.extract_region_multi_groups) uses the bits
    to verify 13 words per candidate block instead of 133."""
    sn = _fold_start_nibbles(n_ref, nibE_ref, m=m, W8=W8, C=C, Nk=Nk)
    nz = (sn != 0).astype(jnp.int32)  # (8, W8, 128)
    # any-per-8-word group (rank-4 reshape + reduce, the same family as
    # the bsums epilogue's (8, nbs, 128, 128) fold)
    sumg = jnp.sum(nz.reshape(8, W8 // 8, 8, 128), axis=2)
    nbs = W8 // 128
    m4 = (sumg > 0).astype(jnp.int32).reshape(8, nbs, 16, 128)
    mask = jnp.zeros((8, nbs, 128), jnp.int32)
    for g in range(16):
        mask |= m4[:, :, g, :] << g
    bs_ref[...] = mask


def _kernel(n_ref, bt_ref, *refs, G, m, K,
            emit="nib", W8=0, C=0, Nk=0, pat_bytes=None, path="auto",
            fused=False, HS=0):
    """Inputs depend on the feed mode:
    - fused=False: refs = (x3_ref, out_ref, *scratch) with x3_ref the
      pre-relayouted (8, G*8, 128) words — sub-chunk s of chunk l at
      [s, :, l], zero-padded past the (W8 + HS) real words.
    - fused=True (round-4 default for 2-D word views): refs = (x_ref,
      nxt_ref, out_ref, x3_scratch, *rest) with x_ref one NATURAL
      (C/32, 1024) tile block; ``_stage_subchunks`` builds the same
      layout in VMEM, so the HBM relayout never exists.
    emit='nib': out_ref = nibE (8, G*8, 128) int32 — bit b of [s, g, l] =
    match ENDING at scan byte 4*g+b of sub-chunk s of chunk l.
    emit='bsums': out_ref = (8, W8/128, 128) per-512-byte-block START
    counts (validity applied); nibE goes to a VMEM scratch and is folded
    by ``_end_to_start_bsums`` — no O(N) HBM write.
    bt_ref: (K, 2, 8, 128) B-table halves; state spans K int32 words with
    the shift carry rippling from word k-1's bit 31 into word k's bit 0.

    For m <= 16 the whole B entry fits 16 bits, so the two halves pack
    into one word (lo | hi<<16) and each byte costs ONE dynamic_gather
    instead of two.  (Measured per-gather cost is modest — m=16's one
    gather vs m=32's two differ by only ~0.3 ms of 9.4 at 256 MiB; the
    step is bound by total VPU op throughput across the whole
    gather+shift+AND+hit-extract chain, which is why both the compare-B
    and composed-4 alternatives below measured as losses.)"""
    if fused:
        x_ref, nxt_ref, out_ref, x3_ref, *scratch = refs
        _stage_subchunks(x_ref, nxt_ref, x3_ref, W8=W8, HS=HS, DELTA=0,
                         G8=G * 8)
    else:
        x3_ref, out_ref, *scratch = refs
    nibE_ref = scratch[0] if emit == "bsums" else out_ref
    hi_bit = (m - 1) % 32
    compare_b = pat_bytes is not None and K == 1
    packed16 = K == 1 and m <= 16 and not compare_b
    if packed16:
        ptab = bt_ref[0, 0] | (bt_ref[0, 1] << 16)
    elif not compare_b:
        halves = [(bt_ref[k, 0], bt_ref[k, 1]) for k in range(K)]
    if compare_b:
        # B[c] from static compares instead of a dynamic_gather: one VPU
        # compare per DISTINCT pattern byte (<= m <= 32), each OR-ing in
        # that value's precomputed bit mask.  MEASURED NEGATIVE on v5e
        # (10.93 ms vs 9.46 ms for the gather at 256 MiB, m=16): ~14
        # compare+select chains cost more than one gather — the step is
        # VPU-op-throughput bound, not gather bound.  Kept as an opt-in
        # (pat_key=...) for the record; specializes the executable per
        # pattern like the BM probe constants (persisted cache).
        val_masks = {}
        for j, cb in enumerate(pat_bytes):
            val_masks[cb] = val_masks.get(cb, 0) | (1 << j)
        # two's-complement wrap: bit 31 (m=32) overflows int32 as a
        # Python int
        val_masks = {
            cb: (v - (1 << 32) if v >= (1 << 31) else v)
            for cb, v in val_masks.items()
        }

    def lookup(k, ci, is_lo):
        if packed16:
            g = jnp.take_along_axis(ptab, ci, axis=1)
            return jnp.where(
                is_lo, g & 0xFFFF, jax.lax.shift_right_logical(g, 16)
            )
        return jnp.where(
            is_lo,
            jnp.take_along_axis(halves[k][0], ci, axis=1),
            jnp.take_along_axis(halves[k][1], ci, axis=1),
        )

    def lookup_compare(c):
        acc = jnp.zeros(c.shape, jnp.int32)
        for cb, mval in val_masks.items():
            acc |= jnp.where(c == cb, jnp.int32(mval), jnp.int32(0))
        return acc

    # (A batched variant hoisting all 32 B-lookups ahead of the D-chain
    # measured 10.44 ms vs 9.46 ms interleaved at 256 MiB — Mosaic already
    # pipelines the independent gathers; the hoist only added register
    # pressure.  Keep the interleaved form for the per-byte path.)

    def _ext4(ws, p):
        """Logical bits p..p+3 of the multiword state as a low nibble."""
        w, r = divmod(p, 32)
        v = jax.lax.shift_right_logical(ws[w], r) if r else ws[w]
        if r >= 29 and w + 1 < len(ws):
            v |= ws[w + 1] << (32 - r)
        return v & 0xF

    def group_composed(g, D):
        # Four automaton steps composed into ONE word-level step:
        #   D4 = (D<<4 | 15) & AND_b (B[c_b] << (3-b) | ones)
        # (the AND masks commute past later shifts: (X&B)<<1 ==
        # (X<<1)&(B<<1)), so the serial dependency chain shrinks from
        # ~3 ops/byte to ~2 ops/WORD; gathers and the per-byte hit bits
        # (single-bit extracts of D and the gathered B words) all sit off
        # the critical path.  Exactness vs the per-byte step is fuzzed in
        # tests and was verified over m in [5,256] multiword.
        base = pl.multiple_of(g * 8, 8)
        blk = x3_ref[:, pl.ds(base, 8), :]  # (8, 8, 128)
        nibs = []
        for j in range(8):
            wv = blk[:, j, :]
            if compare_b:
                gs = [
                    (lookup_compare((wv >> (8 * b)) & 0xFF),)
                    for b in range(4)
                ]
            else:
                gs = []
                for b in range(4):
                    c = (wv >> (8 * b)) & 0xFF
                    ci = c & 127
                    is_lo = c < 128
                    gs.append(
                        tuple(lookup(k, ci, is_lo) for k in range(K))
                    )
            # hit_t for byte b=t-1: bit (m-1) of the t-step state =
            # bit (m-1-t) of D AND_{j<t} bit (m-t+j) of B[c_j]; gathered
            # as aligned nibbles (bit k of nib_rev <-> t = 4-k).
            nr = _ext4(D, m - 5)
            for b in range(4):
                F = _ext4(gs[b], m - 4 + b)
                if b > 0:
                    F |= (0xF << (4 - b)) & 0xF  # neutral where t <= b
                nr &= F
            nib = (
                ((nr & 1) << 3) | ((nr & 2) << 1)
                | ((nr & 4) >> 1) | ((nr & 8) >> 3)
            )
            newD = []
            for k in range(K):
                H = None
                for b in range(4):
                    s = 3 - b
                    if s == 0:
                        t = gs[b][k]
                    elif k > 0:
                        t = (gs[b][k] << s) | jax.lax.shift_right_logical(
                            gs[b][k - 1], 32 - s
                        )
                    else:
                        t = (gs[b][k] << s) | ((1 << s) - 1)
                    H = t if H is None else H & t
                v = D[k] << 4
                v = v | 15 if k == 0 else v | jax.lax.shift_right_logical(
                    D[k - 1], 28
                )
                newD.append(v & H)
            D = tuple(newD)
            nibs.append(nib)
        nibE_ref[:, pl.ds(base, 8), :] = jnp.stack(nibs, axis=1)
        return D

    def group_perbyte(g, D):
        base = pl.multiple_of(g * 8, 8)
        blk = x3_ref[:, pl.ds(base, 8), :]  # (8, 8, 128)
        nibs = []
        for j in range(8):
            wv = blk[:, j, :]
            nib = jnp.zeros((8, 128), jnp.int32)
            for b in range(4):
                c = (wv >> (8 * b)) & 0xFF
                carries = [jnp.int32(1)] + [
                    jax.lax.shift_right_logical(D[k - 1], 31) & 1
                    for k in range(1, K)
                ]
                if compare_b:
                    D = (((D[0] << 1) | 1) & lookup_compare(c),)
                else:
                    ci = c & 127
                    is_lo = c < 128
                    D = tuple(
                        ((D[k] << 1) | carries[k]) & lookup(k, ci, is_lo)
                        for k in range(K)
                    )
                hit = jax.lax.shift_right_logical(D[K - 1], hi_bit) & 1
                nib |= hit << b
            nibs.append(nib)
        nibE_ref[:, pl.ds(base, 8), :] = jnp.stack(nibs, axis=1)
        return D

    # Measured (TPU v5e, 256 MiB, interleaved A/B): composed-4 LOSES at
    # every K — 10.53 vs 9.38 ms (m=16), 11.33 vs 9.68 (m=32), 15.91 vs
    # 15.65 (m=64).  Mosaic pipelines the 3-op/byte dependency chain
    # already; the composed form's extra per-byte hit-extraction vector
    # ops cost more than the shortened chain saves.  Default: per-byte.
    #
    # Composed-2 (round-4 VERDICT #4a) is a recorded STRUCTURAL negative,
    # bracketed by the composed-4 measurement above: (i) a precomputed
    # pair table BB[c1*256+c2] = (B[c1]<<1) & B[c2] cannot cut gathers —
    # tpu.dynamic_gather indexes 128 lanes, so a 64Ki-entry lookup
    # decomposes into a 512-plane select tree (>=9 select levels over 512
    # gathered planes) vs the 2 half-gathers/byte it would replace; and
    # (ii) the table-free form ((D<<2)|2) & (B[c1]<<1) & B[c2] | (1&B[c2])
    # is exactly the mask-commuting identity group_composed applies at
    # width 4 — same B gathers, same extra hit-extraction ops, HALF the
    # chain shortening that already lost at width 4.  The per-byte step is
    # not chain-bound (the hoist experiment showed gathers pipeline), so
    # no composition width can win.
    group = group_composed if path == "composed" and m >= 5 else group_perbyte

    jax.lax.fori_loop(
        0, G, group, tuple(jnp.zeros((8, 128), jnp.int32) for _ in range(K))
    )
    if emit == "bsums":
        _end_to_start_bsums(n_ref, nibE_ref, out_ref, m=m, W8=W8, C=C, Nk=Nk)


# Step-path override for A/B measurement: "auto" (= per-byte; measured
# faster at every K), "perbyte", or "composed" (the 4-steps-in-one
# word-level form — kept as a measured negative, see _kernel).
STEP_PATH = "auto"


@functools.lru_cache(maxsize=256)
def _build_call(Nk: int, C: int, m: int, interpret: bool,
                emit: str = "nib", pat_key: bytes | None = None,
                path: str = "auto", vma: frozenset = frozenset(),
                fused: bool = False):
    W8 = C // 32  # words per sub-chunk
    HS = max(1, -(-(m - 1) // 4))
    G = -(-(W8 + HS) // 8)
    G8 = G * 8
    K = max(1, -(-m // 32))
    L = Nk // C
    nt = L // 128
    if emit == "bsums":
        assert C % 4096 == 0, "bsums mode needs whole 512B blocks/sub-chunk"
        nbs = W8 // 128
        out_specs = pl.BlockSpec((8, nbs, 128), lambda i, n: (0, 0, i),
                                 memory_space=pltpu.VMEM)
        out_shape = _swar._sds((8, nbs, L), jnp.int32, vma)
        scratch = [pltpu.VMEM((8, G8, 128), jnp.int32)]
    else:
        out_specs = pl.BlockSpec((8, G8, 128), lambda i, n: (0, 0, i),
                                 memory_space=pltpu.VMEM)
        out_shape = _swar._sds((8, G8, L), jnp.int32, vma)
        scratch = []
    if fused:
        # Natural-feed mode: one (C/32, 1024) word-row block per tile plus
        # the next tile's first row; the sub-chunk-major staging happens
        # in VMEM (_stage_subchunks) so no HBM relayout is ever written.
        rpt = C // 32  # word-rows per tile (= 128 chunks x C/4096 rows)
        nrows = Nk // 4096
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # B tables (K,2,8,128)
            pl.BlockSpec((rpt, 1024), lambda i, n: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (8, 1024),
                lambda i, n: (
                    jnp.minimum((i + 1) * rpt // 8, nrows // 8 - 1), 0
                ),
                memory_space=pltpu.VMEM,
            ),
        ]
        scratch = [pltpu.VMEM((8, G8, 128), jnp.int32)] + scratch
    else:
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # B tables (K,2,8,128)
            pl.BlockSpec((8, G8, 128), lambda i, n: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # n (validity input for bsums mode)
        grid=(nt,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    kern = functools.partial(_kernel, G=G, m=m, K=K, emit=emit, W8=W8, C=C,
                             Nk=Nk,
                             pat_bytes=(tuple(pat_key) if pat_key else None),
                             path=path, fused=fused, HS=HS)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )


def _layout(words: jnp.ndarray, L: int, W: int, HS: int, G8: int,
            front: int = 0):
    """(8, front+G8, L) sub-chunk-major word layout with per-sub-chunk
    halos, zero-padded to G8 real words plus ``front`` leading zero words
    (the rolling-hash kernel reads departing bytes at a static negative
    offset through this pad)."""
    W8 = W // 8
    wr = words.reshape(L * 8, W8)  # row j = sub-chunk j (global order)
    # Halo: the next HS words of the GLOBAL stream (may span several
    # following sub-chunks when m-1 > sub-chunk bytes).
    n_blocks = -(-HS // W8)
    wz = jnp.concatenate(
        [wr, jnp.zeros((n_blocks, W8), jnp.int32)], axis=0
    )
    parts, rem, k = [], HS, 0
    while rem > 0:
        take = min(W8, rem)
        parts.append(wz[k + 1 : k + 1 + L * 8, :take])
        rem -= take
        k += 1
    halo = jnp.concatenate(parts, axis=1)
    ext = jnp.concatenate([wr, halo], axis=1)  # (L*8, W8+HS)
    back = G8 - (W8 + HS)
    if front or back:
        ext = jnp.pad(ext, ((0, 0), (front, back)))
    return ext.reshape(L, 8, front + G8).transpose(1, 2, 0)


def end_nibble3_to_start_nib(nibE: jnp.ndarray, Cp: int, m: int):
    """(8, G8, L) end-position nibbles -> int32[N/4] START nibbles in byte
    order — pure word-space bit plumbing (never expands to bool[N]; a
    (..., 4)-shaped expansion acquires a 32x-padded TPU layout).

    A match ending at scan byte t starts at sb = t-(m-1); with
    q, r = divmod(m-1, 4), start word g' draws bit b from end word g'+q
    bit b+r (or g'+q+1, bit b+r-4).
    """
    q, r = divmod(m - 1, 4)
    Cw = Cp // 4  # owned start words per sub-chunk
    E = nibE.transpose(2, 0, 1)  # (L, 8, G8) scan-order words
    lo = jax.lax.slice_in_dim(E, q, q + Cw, axis=2)
    if r == 0:
        sn = lo
    else:
        hi = jax.lax.slice_in_dim(E, q + 1, q + 1 + Cw, axis=2)
        sn = ((lo >> r) | (hi << (4 - r))) & 0xF
    return sn.reshape(-1)  # (L*8*Cw,) == N/4 words in byte order


def kmp_nib(text_u8, n, bt, m, *,
            chunk_bytes: int = DEFAULT_CHUNK_BYTES,
            interpret: bool = False, words=None, pat_key: bytes = None):
    """(start-nibble int32[Nk/4], cut) via the Shift-AND prefix automaton,
    or (None, 0) below the kernel threshold.  ``bt`` is the (K,2,8,128)
    table from ``b_table``; ``words`` the host int32 view of the text.
    Validity for n is applied downstream (ops/emit.nibble_to_matches)."""
    N = text_u8.shape[0]
    C = chunk_bytes
    tile_bytes = 128 * C
    Nk = (N // tile_bytes) * tile_bytes
    if Nk < max(tile_bytes, _swar.MIN_KERNEL_BYTES):
        return None, 0
    W = C // 4
    HS = max(1, -(-(m - 1) // 4))
    G8 = -(-(W // 8 + HS) // 8) * 8
    L = Nk // C
    if words is not None and words.ndim == 2 and _fused_ok(C):
        # Fused natural feed: the kernel stages sub-chunk-major layout in
        # VMEM from the (N/4096, 1024) view directly — no HBM relayout.
        x2 = words[: Nk // 4096]
        call = _build_call(Nk, C, m, interpret, pat_key=pat_key,
                           path=STEP_PATH, vma=_swar.vma_of(x2),
                           fused=True)
        nibE = call(jnp.asarray(n, jnp.int32).reshape(1), bt, x2, x2)
        cut = Nk - (m - 1) if m > 1 else Nk
        return end_nibble3_to_start_nib(nibE, C // 8, m), cut
    if words is None:
        words = _swar._as_words(text_u8[:Nk])
    elif words.ndim == 2:
        # pre-shaped (N/4096, 1024) host view: leading-dim slice, then ONE
        # relayout inside _layout's reshape (same cost as the 1-D path)
        words = words[: Nk // (4 * words.shape[1])]
    else:
        words = words[: Nk // 4]
    x3e = _layout(words, L, W, HS, G8)
    call = _build_call(Nk, C, m, interpret, pat_key=pat_key,
                       path=STEP_PATH, vma=_swar.vma_of(x3e))
    nibE = call(jnp.asarray(n, jnp.int32).reshape(1), bt, x3e)
    cut = Nk - (m - 1) if m > 1 else Nk
    return end_nibble3_to_start_nib(nibE, C // 8, m), cut


def kmp_bsums(text_u8, n, bt, m, *,
              chunk_bytes: int = DEFAULT_CHUNK_BYTES,
              interpret: bool = False, words=None, pat_key: bytes = None):
    """(block sums int32[Nk/512], cut) — the bsums-only Shift-AND scan, or
    (None, 0) below the kernel threshold.

    The kernel folds end-position nibbles to validity-clamped START counts
    per 512-byte block entirely in VMEM (``_end_to_start_bsums``), writing
    only Nk/512 int32 to HBM — kernel traffic drops from read N + write N
    to read N + write N/128.  Offsets are reconstructed sparsely by
    ops/reconstruct.extract_region (window-compare ground truth == the
    automaton's match set)."""
    N = text_u8.shape[0]
    C = chunk_bytes
    tile_bytes = 128 * C
    Nk = (N // tile_bytes) * tile_bytes
    if Nk < max(tile_bytes, _swar.MIN_KERNEL_BYTES) or C % 4096 != 0:
        return None, 0
    W = C // 4
    HS = max(1, -(-(m - 1) // 4))
    G8 = -(-(W // 8 + HS) // 8) * 8
    L = Nk // C
    if words is not None and words.ndim == 2 and _fused_ok(C):
        x2 = words[: Nk // 4096]
        call = _build_call(Nk, C, m, interpret, emit="bsums",
                           pat_key=pat_key, path=STEP_PATH,
                           vma=_swar.vma_of(x2), fused=True)
        bs = call(jnp.asarray(n, jnp.int32).reshape(1), bt, x2, x2)
    else:
        if words is None:
            words = _swar._as_words(text_u8[:Nk])
        elif words.ndim == 2:
            # pre-shaped (N/4096, 1024) host view: leading-dim slice, then
            # ONE relayout inside _layout's reshape (same as the 1-D path)
            words = words[: Nk // (4 * words.shape[1])]
        else:
            words = words[: Nk // 4]
        x3e = _layout(words, L, W, HS, G8)
        call = _build_call(Nk, C, m, interpret, emit="bsums",
                           pat_key=pat_key, path=STEP_PATH,
                           vma=_swar.vma_of(x3e))
        bs = call(jnp.asarray(n, jnp.int32).reshape(1), bt, x3e)  # (8,nbs,L)
    # Global 512B-block order: block [s, jb, l] covers byte
    # l*C + s*(C/8) + jb*512  ->  lane-major, then sub-chunk, then jb.
    bs_flat = bs.transpose(2, 0, 1).reshape(-1)
    cut = Nk - (m - 1) if m > 1 else Nk
    return bs_flat, cut
