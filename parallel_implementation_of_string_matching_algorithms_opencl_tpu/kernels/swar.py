"""SWAR Pallas kernels: word-packed exact matching scans (SURVEY.md R1/R4).

Hardware constraints that shaped this design (measured on TPU v5e):

- Mosaic has **no int8 vector compare** on this target, so byte-at-a-time
  compares cannot compile.  Text is therefore processed as little-endian
  int32 *words* (4 bytes per lane element) — the classic SWAR technique —
  which is also ~4x fewer vector ops than a byte scan.
- The VPU register is (8, 128) int32, so predication (skip) granularity is
  one register = 4 KiB of packed text; finer skips cannot pay.

Layout: the padded text (N bytes, N % (128*C) == 0) is viewed as int32 and
reshaped to (L, W): row l holds chunk l's C bytes as W = C/4 words.  A grid
step processes a (128, W) tile — 128 chunks — plus a (128, HALO_WORDS) halo
holding the first 512 bytes of each *next* chunk, so matches spanning chunk
boundaries are found by the owning chunk (supports m <= 509).

Round-3 feed rework: callers ship the int32 word view PRE-SHAPED as
(N/4096, 1024) — a zero-copy numpy view on the host — because a 1-D->2-D
``reshape`` inside jit is a full-buffer relayout copy on TPU (measured:
+0.2 ms/256 MiB on the scan, +268 MB temp on the old text.reshape
reconstruction).  The halo is now assembled IN-KERNEL from a sublane roll
of the tile plus one (8, HALO_WORDS) block of the next tile, replacing the
host-side 33 MB halo concat.

Matching per word: for each alignment a in 0..3, a match starting at byte
4w + a of a chunk satisfies

    AND_k  (ext[w + k] & M[a, k]) == P[a, k]          k in [0, nw)

where P[a]/M[a] are the pattern placed at byte offset a in a zeroed word
buffer and its 0xFF byte-occupancy mask (wildcard bytes compare as true).
Interior words have an all-ones mask and skip the AND.

Two kernels share this machinery:

- ``naive_nib``   — every position verified (the honest O(n*m) scan, R1).
- ``screened_nib``— Boyer-Moore-style probe-word screen.  Default sparse
  execution (``screen_only=True``): the kernel emits CANDIDATE positions
  from the probe compares alone — no in-kernel verify at all — and the
  window-compare sparse reconstruction verifies outside; this is the
  TPU-native answer to BM's skip loop (work beyond the cheap screen
  scales with candidates, not text) and measured FASTER than the naive
  chain once the fused variant's per-tile ``pl.when`` verify (a pipeline
  stall) was dropped.  The fused tile-skip kernel remains for nib
  emission / bm_screen='fused' (R4, BASELINE.json:5 "skip-loop for BM").

All kernels emit per-512-byte-block popcounts (bsums-only by default);
nib mode adds the *nibble mask* (int32[L, W], bit a of word w = match
starting at byte 4w+a).  Counts and offsets are extracted without ever
expanding to bool[N] (ops/emit).  ``nibble_to_bool`` remains as a
reference decoder for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO_WORDS = 128          # 512-byte halo per chunk
MAX_PATTERN = HALO_WORDS * 4 - 3  # 509
DEFAULT_CHUNK_BYTES = 8192  # C: bytes per chunk (VMEM-tuned on v5e)
MIN_KERNEL_BYTES = 1 << 20  # below this the jnp path wins (compile+pad cost)


def vma_of(x) -> frozenset:
    """Varying-axes of a traced operand (empty outside a checked
    shard_map).  pallas_call out_shapes inside shard_map(check_vma=True)
    must carry the mesh axes they vary over; reading them off the operand
    keeps the kernels mesh-agnostic (same trick as ops/vma.taint)."""
    import jax as _jax

    try:
        return frozenset(_jax.typeof(x).vma)
    except Exception:
        return frozenset()


def _sds(shape, dtype, vma: frozenset):
    return (jax.ShapeDtypeStruct(shape, dtype, vma=vma) if vma
            else jax.ShapeDtypeStruct(shape, dtype))


def swar_supported(m: int, interpret: bool) -> bool:
    """Kernel path eligibility (platform checked separately)."""
    del interpret
    return 1 <= m <= MAX_PATTERN


def mask_words(m: int) -> np.ndarray:
    """int32[4, nw] byte-occupancy masks — a function of m alone, so it is
    concrete at trace time and its structure can be baked into the kernel."""
    nw = (3 + m + 3) // 4
    M = np.zeros((4, nw), dtype=np.uint32)
    for a in range(4):
        msk = np.zeros(nw * 4, dtype=np.uint8)
        msk[a : a + m] = 0xFF
        M[a] = msk.view(np.uint32)
    return M.view(np.int32)


def pattern_words(pattern: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(P, M) int32[4, nw]: word/mask variants for byte alignments 0..3.

    nw = number of words the pattern can touch in the worst alignment.
    Little-endian packing to match the device's uint8->int32 bitcast.
    """
    pat = np.asarray(pattern, dtype=np.uint8)
    m = len(pat)
    nw = (3 + m + 3) // 4
    P = np.zeros((4, nw), dtype=np.uint32)
    for a in range(4):
        buf = np.zeros(nw * 4, dtype=np.uint8)
        buf[a : a + m] = pat
        P[a] = buf.view(np.uint32)
    return P.view(np.int32), mask_words(m)


def _probe_indices(M: np.ndarray) -> tuple:
    """Per-alignment probe word indices for the screen.

    Up to two interior (all-ones-mask) words, maximally separated — eight
    fully-constrained bytes make sub-block skips frequent even on natural-
    language text where any 4-byte pattern fragment recurs constantly.
    Falls back to masked word 0 for tiny patterns."""
    out = []
    for a in range(4):
        full = np.nonzero(M[a] == -1)[0]
        if len(full) >= 2:
            out.append((int(full[0]), int(full[-1])))
        elif len(full) == 1:
            out.append((int(full[0]),))
        else:
            out.append((0,))
    return tuple(out)


def probe_table(pattern: np.ndarray, use_gs: bool = False,
                single: bool = False) -> np.ndarray:
    """int32[4, 2] bad-character-scored probe word indices per alignment
    (SURVEY.md R4/R10 — the "bad-char skip" heuristic driving the kernel's
    screen).

    Each candidate full word is scored by the summed bad-character shift of
    its four bytes (``m-1-last_occurrence`` — exactly the BM bad-char
    table): bytes that occur nowhere later in the pattern are the most
    discriminative, the same rarity signal BM's skip rule exploits.  Words
    whose 4-byte value recurs as another 4-gram of the pattern are heavily
    penalized (a repeated probe value doubles the screen's false-positive
    surface — e.g. periodic patterns).  The best pair wins, word separation
    as tiebreak.  Indices ship to the kernel as runtime scalars, so
    same-length patterns share one compiled executable.

    ``use_gs=True`` (bm_probes='table_gs') additionally adds each probe
    word's summed good-suffix shifts (``ops.tables.bm_good_suffix``) to
    its score: a word whose 4-byte region sits where pattern suffixes do
    NOT recur is a stronger anchor against self-similar patterns — the
    other half of BM's skip rule (BASELINE.json:10 "bad-char + good-
    suffix skip kernel").  Measured round 4 (exp/gs_probe_bench.py): see
    BASELINE.md for the adopt/negative record.
    """
    pat = np.asarray(pattern, dtype=np.uint8)
    m = len(pat)
    Mnp = mask_words(m)
    last = {}
    for j, c in enumerate(pat.tolist()):
        last[c] = j
    bc = {c: m - 1 - j for c, j in last.items()}
    gs = None
    if use_gs:
        from ..ops import tables as _tables

        gs = _tables.bm_good_suffix(pat)
    grams = {}
    for j in range(max(0, m - 3)):
        g = bytes(pat[j : j + 4])
        grams[g] = grams.get(g, 0) + 1
    out = np.zeros((4, 2), np.int32)
    for a in range(4):
        full = np.nonzero(Mnp[a] == -1)[0]
        if len(full) == 0:
            continue  # masked word 0 (tiny pattern) — kernel applies mask
        scores = []
        for k in full.tolist():
            b = bytes(pat[4 * k - a : 4 * k - a + 4])
            s = sum(bc[c] for c in b)
            if gs is not None:
                # good[j+1] = shift when the suffix pat[j+1:] matched and
                # pat[j] mismatched: large where this region's suffixes
                # don't recur elsewhere in the pattern.
                lo = 4 * k - a
                s += sum(int(gs[j + 1]) for j in range(lo, lo + 4))
            if grams.get(b, 0) > 1:
                s -= 16 * m  # repeated 4-gram: weak probe
            scores.append((s, k))
        scores.sort(reverse=True)
        best = scores[0][1]
        if single or len(scores) == 1:
            # ``single=True`` (bm_probes='table_gs1'): ONE probe word per
            # alignment — half the screen's compare ALU at the cost of a
            # weaker screen (more candidates for the sparse verify, whose
            # cost is count-adaptive).  Measured A/B in BASELINE.md.
            out[a] = (best, best)
        else:
            # Partner: SEPARATION-primary, score as tiebreak.  Adjacent
            # probe pairs read as one wider slice but screen barely better
            # than a single probe (neighboring text bytes are correlated);
            # measured on v5e at 256 MiB english/m=16, the (0,1)-style
            # adjacent pick cost 4.61 ms vs 3.75 ms for maximally-
            # separated probes.  Separation also mirrors BM's own
            # heuristic structure: bad-char consults the window END, good-
            # suffix the matched tail — two distant anchor points.
            k2 = max(
                ((abs(k - best), s), k) for s, k in scores if k != best
            )[1]
            out[a] = (min(best, k2), max(best, k2))
    return out


# ---------------------------------------------------------------------------
# Kernel bodies
# ---------------------------------------------------------------------------


def _compare_chain(ext, a, W, P, M, Mnp):
    """AND-chain of word compares for alignment ``a`` over ``ext`` lane
    offsets [k, k+W); P/M are SMEM refs, Mnp the host-side mask copy (used
    to skip identity ANDs on interior words at trace time)."""
    nw = Mnp.shape[1]
    acc = None
    for k in range(nw):
        if Mnp[a, k] == 0:
            continue  # pattern does not touch this word at this alignment
        w = ext[:, k : k + W]
        if Mnp[a, k] == -1:
            eq = w == P[a, k]
        else:
            eq = (w & M[a, k]) == P[a, k]
        acc = eq if acc is None else (acc & eq)
    return acc


def _validity_nibble(nib, nlim_words, i, W, C):
    """Clear nibble bits for start positions beyond n-m (padding tail).

    ``nlim_words`` = n - m (max valid start).  Word (row r, lane w) of grid
    step i covers byte positions base + [0, 4); keep bit a iff pos+a <= nlim.
    """
    row = jax.lax.broadcasted_iota(jnp.int32, nib.shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, nib.shape, 1)
    word_pos = (i * 128 + row) * C + col * 4
    keep = jnp.clip(nlim_words - word_pos + 1, 0, 4)
    return nib & ((1 << keep) - 1)


def _popcount_nibble(nib):
    b = (nib & 1) + ((nib >> 1) & 1) + ((nib >> 2) & 1) + ((nib >> 3) & 1)
    return jnp.sum(b, dtype=jnp.int32)


def _block_sums(nib, W):
    """Per-tile block sums: bs[j, r] = popcount of nib[r, 128j:128j+128]
    (one 128-word = 512-byte block per vector row), zero-padded to at
    least 8 rows (Mosaic block-shape minimum)."""
    pc = (nib & 1) + ((nib >> 1) & 1) + ((nib >> 2) & 1) + ((nib >> 3) & 1)
    jb = W // 128
    per = jnp.sum(pc.reshape(128, jb, 128), axis=2)  # (128, jb)
    bs = per.T  # (jb, 128)
    if jb < 8:
        bs = jnp.concatenate(
            [bs, jnp.zeros((8 - jb, 128), jnp.int32)], axis=0
        )
    return bs


# Above this nw, the naive kernel's AND chain runs as a fori_loop (constant
# IR size, bounded VMEM stack) instead of a static unroll: Mosaic allocates
# full-tile temporaries per unrolled compare, which OOMs scoped VMEM for
# larger patterns and blows up compile time.
STATIC_NW = 5


def _loop_chain(ext_ref, a, W, nw, P_ref, M_ref):
    """AND-chain over k in [0, nw) as a fori_loop.

    Mosaic requires provably-aligned dynamic vector-load offsets, so the
    lane-shifted view for step k comes from a dynamic rotate
    (tpu.dynamic_rotate via pltpu.roll) of the staged ext value instead of
    an unaligned ref read."""
    ext_all = ext_ref[:]  # (128, W + HALO_WORDS)
    size = ext_all.shape[1]

    # The carry is int32 0/1, not bool: Mosaic rejects i1 vectors as
    # fori_loop carries.
    def body(k, acc):
        # roll right by (size - k) == roll left by k: lane i reads word i+k.
        w = pltpu.roll(ext_all, shift=size - k, axis=1)[:, :W]
        eq = ((w & M_ref[a, k]) == P_ref[a, k]).astype(jnp.int32)
        return acc & eq

    acc0 = ((ext_all[:, 0:W] & M_ref[a, 0]) == P_ref[a, 0]).astype(jnp.int32)
    return jax.lax.fori_loop(1, nw, body, acc0)


def _stage_ext(x_ref, nxt_ref, ext_ref, W):
    """Stage tile words + halo into the contiguous VMEM scratch and return
    the staged value (kernels slice lane-shifted views from it).

    Halo row r = the first HALO_WORDS words of chunk r+1: rows 0..126 come
    from a sublane roll of the tile itself (chunks are contiguous text);
    row 127 reads the NEXT tile's first chunk via the (8, HALO_WORDS)
    ``nxt`` block (clamped to garbage on the last tile — every position it
    could affect is >= the kernel coverage cut and validity-masked).

    The roll covers ONLY the halo columns: rolling the whole (128, W) tile
    and then slicing measured 1.6x slower at 256 MiB (Mosaic does not fuse
    the slice into the roll — exp/screen_kernel_opt.py V1)."""
    xv = x_ref[:]
    ext_ref[:, :W] = xv
    hal = pltpu.roll(xv[:, :HALO_WORDS], shift=127, axis=0)  # row r <- r+1
    ext_ref[:, W:] = hal
    ext_ref[pl.ds(127, 1), W:] = nxt_ref[0:1, :]
    return ext_ref[:]


def _probe_accs(ext, W, P_ref, M_ref, Mnp, probes):
    """Per-alignment probe-screen accumulators: accs[a] is bool (128, W),
    True where ALL of alignment a's probe words match.  The single probe
    loop behind both the fused screen (ORs accs into a tile-hit flag) and
    the candidate screen (packs accs into nibble bits)."""
    out = []
    for a in range(4):
        acc = None
        for k in probes[a]:
            w = ext[:, k : k + W]
            eq = (w == P_ref[a, k]) if Mnp[a, k] == -1 else (
                (w & M_ref[a, k]) == P_ref[a, k]
            )
            acc = eq if acc is None else (acc & eq)
        out.append(acc)
    return out


def _verify_nib(ext_ref, W, P_ref, M_ref, Mnp):
    """Full verify: the 4-alignment AND-chain compare packed as a nibble
    plane (static unroll below STATIC_NW pattern words, fori_loop above)."""
    nw = Mnp.shape[1]
    nib = jnp.zeros((128, W), jnp.int32)
    for a in range(4):
        if nw <= STATIC_NW:
            acc = _compare_chain(ext_ref[:], a, W, P_ref, M_ref, Mnp)
        else:
            acc = _loop_chain(ext_ref, a, W, nw, P_ref, M_ref)
        nib |= acc.astype(jnp.int32) << a
    return nib


def _epilogue(n_ref, cnt_ref, nib_ref, bs_ref, W, C, m):
    """Shared tile epilogue: clamp validity on the tail tile, emit the
    per-512B block sums, accumulate the global count.  One implementation
    for all four kernels — a validity or block-sum fix here cannot drift
    per mode."""
    i = pl.program_id(0)
    tile_last = (i + 1) * (128 * C) - 1
    nlim = n_ref[0] - m

    @pl.when(tile_last > nlim)
    def _():
        nib_ref[:] = _validity_nibble(nib_ref[:], nlim, i, W, C)

    bs = _block_sums(nib_ref[:], W)
    bs_ref[...] = bs

    @pl.when(i == 0)
    def _():
        cnt_ref[0, 0] = 0

    cnt_ref[0, 0] += jnp.sum(bs, dtype=jnp.int32)


def _naive_kernel(n_ref, P_ref, M_ref, x_ref, nxt_ref, cnt_ref, nib_ref,
                  bs_ref, ext_ref, *, W, C, m, Mnp):
    _stage_ext(x_ref, nxt_ref, ext_ref, W)
    nib_ref[:] = _verify_nib(ext_ref, W, P_ref, M_ref, Mnp)
    _epilogue(n_ref, cnt_ref, nib_ref, bs_ref, W, C, m)


def _screened_kernel(n_ref, P_ref, M_ref, x_ref, nxt_ref, cnt_ref, nib_ref,
                     bs_ref, ext_ref, *, W, C, m, Mnp, probes):
    """Boyer-Moore FUSED execution: probe screen, then whole-tile skip
    (bm_screen='fused'; also the nib-emission path).

    Measured design notes: finer-than-tile predication cannot pay (an
    earlier per-(8,128)-sub-block variant spent more on branch overhead
    than the verify it skipped) — and in round 2 the per-TILE ``pl.when``
    itself measured as a pipeline stall (3.75 ms vs 1.75 ms for naive's
    straight-line chain at 256 MiB with ~zero hit tiles).  The default
    sparse path therefore skips in-kernel verification entirely
    (``_screen_cand_kernel`` + window-compare reconstruction outside);
    this fused kernel remains for nib emission and bm_screen='fused'.
    """
    ext = _stage_ext(x_ref, nxt_ref, ext_ref, W)
    accs = _probe_accs(ext, W, P_ref, M_ref, Mnp, probes)
    hit = jnp.any((accs[0] | accs[1]) | (accs[2] | accs[3]))
    nib_ref[:] = jnp.zeros((128, W), jnp.int32)

    @pl.when(hit)
    def _():
        nib_ref[:] = _verify_nib(ext_ref, W, P_ref, M_ref, Mnp)

    _epilogue(n_ref, cnt_ref, nib_ref, bs_ref, W, C, m)


def _bs_from_counts(cnt_w, bs_ref, cnt_ref, W):
    """Lite epilogue tail shared by the bsums-only kernel bodies: fold an
    int32[128, W] per-word count plane into the per-512B block sums and
    the running total — no nibble plane involved."""
    jb = W // 128
    per = jnp.sum(cnt_w.reshape(128, jb, 128), axis=2)  # (128, jb)
    bs = per.T
    if jb < 8:
        bs = jnp.concatenate([bs, jnp.zeros((8 - jb, 128), jnp.int32)],
                             axis=0)
    bs_ref[...] = bs

    @pl.when(pl.program_id(0) == 0)
    def _():
        cnt_ref[0, 0] = 0

    cnt_ref[0, 0] += jnp.sum(bs, dtype=jnp.int32)


def _naive_sparse_kernel(n_ref, P_ref, M_ref, x_ref, nxt_ref, cnt_ref,
                         bs_ref, ext_ref, *, W, C, m, Mnp):
    """Naive full verify, bsums-only (round 5): per-word EXACT match
    counts summed straight from the four alignment compare chains.  The
    nibble pack, its popcount, and the nib scratch round trip are dead
    work when the sparse reconstruction consumes only block sums (it
    re-extracts offsets by re-verifying gathered chunks of the word
    view) — the same insight as the screen-lite kernel, except here the
    per-ALIGNMENT tail validity is kept so bs stay exact per-block match
    counts (alignment a of word at word_pos is valid iff
    word_pos + a <= n - m, i.e. a < keep — _validity_nibble's algebra
    without the nibble)."""
    _stage_ext(x_ref, nxt_ref, ext_ref, W)
    nw = Mnp.shape[1]
    accs = []
    for a in range(4):
        if nw <= STATIC_NW:
            acc = _compare_chain(
                ext_ref[:], a, W, P_ref, M_ref, Mnp
            ).astype(jnp.int32)
        else:
            acc = _loop_chain(ext_ref, a, W, nw, P_ref, M_ref)
        accs.append(acc)

    i = pl.program_id(0)
    nlim = n_ref[0] - m
    tile_last = (i + 1) * (128 * C) - 1
    row = jax.lax.broadcasted_iota(jnp.int32, (128, W), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (128, W), 1)
    word_pos = (i * 128 + row) * C + col * 4
    keep = jnp.clip(nlim - word_pos + 1, 0, 4)
    cnt_w = jnp.zeros((128, W), jnp.int32)
    for a in range(4):
        cnt_w += jnp.where(
            tile_last > nlim, jnp.where(keep > a, accs[a], 0), accs[a]
        )
    _bs_from_counts(cnt_w, bs_ref, cnt_ref, W)


def _screen_cand_kernel(n_ref, P_ref, M_ref, x_ref, nxt_ref, cnt_ref,
                        bs_ref, ext_ref, *, W, C, m, Mnp, probes):
    """Boyer-Moore CANDIDATE screen: the probe compares alone, emitted as
    candidate block sums — no in-kernel verify, no per-tile ``pl.when``
    branch.  The fused variant's predicated verify stalls the tile
    pipeline even when ~no tile hits (measured 3.75 ms vs naive's 1.75 ms
    straight-line chain at 256 MiB); this kernel streams pure compares and
    delegates exact verification to the window-compare sparse
    reconstruction (ops/reconstruct.extract_region — the same
    candidates-are-a-superset contract as the Rabin-Karp hash screen,
    including the exact recount and the overflow/truncation flag).

    LITE epilogue (round 5, exp/screen_kernel_opt.py): because the sparse
    reconstruction re-verifies gathered chunks from the word view, screen
    block sums only need to mark WHICH blocks hold candidates — so the
    per-alignment nibble pack, the popcount, and the nib scratch round
    trip are all dead work here.  bs = per-block count of words with an
    any-alignment probe hit (a valid candidate superset; per-word
    validity clamp keeps the tail tile from flooding the chunk ranking).
    Measured 2.66x faster than the nibble-pack form in the same window
    (4.87 -> 1.83 ms at 256 MiB english / m=16 incl. the narrow halo
    roll; block sums bit-exact on that corpus)."""
    ext = _stage_ext(x_ref, nxt_ref, ext_ref, W)
    accs = _probe_accs(ext, W, P_ref, M_ref, Mnp, probes)
    cand = ((accs[0] | accs[1]) | (accs[2] | accs[3])).astype(jnp.int32)

    i = pl.program_id(0)
    nlim = n_ref[0] - m
    row = jax.lax.broadcasted_iota(jnp.int32, cand.shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, cand.shape, 1)
    word_pos = (i * 128 + row) * C + col * 4
    tile_last = (i + 1) * (128 * C) - 1
    cand = jnp.where(
        tile_last > nlim, jnp.where(word_pos <= nlim, cand, 0), cand
    )
    _bs_from_counts(cand, bs_ref, cnt_ref, W)


def _screened_dyn_kernel(n_ref, P_ref, M_ref, pr_ref, x_ref, nxt_ref, cnt_ref,
                         nib_ref, bs_ref, ext_ref, *, W, C, m, Mnp):
    """Boyer-Moore execution with TABLE-DRIVEN probes: identical skip
    structure to ``_screened_kernel``, but the probe word indices arrive as
    runtime scalars (pr_ref: int32[4, 2], from ``probe_table`` — bad-char-
    scored rarity selection).  The probe view comes from a dynamic rotate
    (tpu.dynamic_rotate) since the index is not a compile-time constant;
    same-length patterns share one executable."""
    ext = _stage_ext(x_ref, nxt_ref, ext_ref, W)
    size = ext.shape[1]

    scr = None
    for a in range(4):
        acc = None
        for s in range(2):
            k = pr_ref[a, s]
            w = pltpu.roll(ext, shift=size - k, axis=1)[:, :W]
            # Masked compare: interior probes have an all-ones mask (the
            # AND is then an identity), tiny-pattern probes a partial one.
            eq = (w & M_ref[a, k]) == P_ref[a, k]
            acc = eq if acc is None else (acc & eq)
        scr = acc if scr is None else (scr | acc)
    hit = jnp.any(scr)
    nib_ref[:] = jnp.zeros((128, W), jnp.int32)

    @pl.when(hit)
    def _():
        nib_ref[:] = _verify_nib(ext_ref, W, P_ref, M_ref, Mnp)

    _epilogue(n_ref, cnt_ref, nib_ref, bs_ref, W, C, m)


# ---------------------------------------------------------------------------
# pallas_call builders (cached per shape class)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=256)
def _build_call(Nk: int, C: int, m: int, nw: int, mode: str,
                Mkey: bytes, probes: tuple, interpret: bool,
                nib_out: bool = True, vma: frozenset = frozenset()):
    """mode: 'naive' | 'screened' | 'screened_dyn'.

    ``nib_out=False`` builds the bsums-only variant: the nibble plane lives
    in a VMEM scratch instead of an HBM output, so the kernel's HBM traffic
    drops from (read N + write N) to (read N + write N/128) — the
    emission-prepass shave (round-1 verdict, next #8).  Offsets are then
    reconstructed sparsely from the block sums (ops/reconstruct).
    """
    W = C // 4
    L = Nk // C
    nt = L // 128
    Mnp = np.frombuffer(Mkey, dtype=np.int32).reshape(4, nw)
    assert mode in ("naive", "screened", "screened_dyn", "screen_cand")
    # scalar prefetch: (n, P, M) + the probe-index table in dyn mode
    n_scalars = 4 if mode == "screened_dyn" else 3
    idx = lambda i, *scalars: (i, 0)
    nib_spec = pl.BlockSpec((128, W), idx, memory_space=pltpu.VMEM)
    bs_spec = pl.BlockSpec((max(W // 128, 8), 128), idx,
                           memory_space=pltpu.VMEM)
    # x: one (128, W) tile per grid step; nxt: the NEXT tile's first 8 rows,
    # first HALO_WORDS columns (8-row block index = (i+1)*128/8, clamped on
    # the final tile — garbage there is validity-masked, see _stage_ext).
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_scalars,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((128, W), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (8, HALO_WORDS),
                lambda i, *s: (jnp.minimum(i * 16 + 16, L // 8 - 1), 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            (pl.BlockSpec(memory_space=pltpu.SMEM), nib_spec, bs_spec)
            if nib_out
            else (pl.BlockSpec(memory_space=pltpu.SMEM), bs_spec)
        ),
        scratch_shapes=(
            [pltpu.VMEM((128, W + HALO_WORDS), jnp.int32)]
            if nib_out or mode in ("screen_cand", "naive")
            else [
                pltpu.VMEM((128, W + HALO_WORDS), jnp.int32),
                pltpu.VMEM((128, W), jnp.int32),  # scratch nibble plane
            ]
        ),
    )
    if mode == "screened":
        kern = functools.partial(_screened_kernel, W=W, C=C, m=m, Mnp=Mnp,
                                 probes=probes)
    elif mode == "screen_cand":
        kern = functools.partial(_screen_cand_kernel, W=W, C=C, m=m,
                                 Mnp=Mnp, probes=probes)
    elif mode == "screened_dyn":
        kern = functools.partial(_screened_dyn_kernel, W=W, C=C, m=m, Mnp=Mnp)
    elif not nib_out:
        # Naive bsums-only: the nib-free exact-count body (lite epilogue).
        kern = functools.partial(_naive_sparse_kernel, W=W, C=C, m=m,
                                 Mnp=Mnp)
    else:
        kern = functools.partial(_naive_kernel, W=W, C=C, m=m, Mnp=Mnp)
    if not nib_out and mode not in ("screen_cand", "naive"):
        # Same kernel body; the nibble plane ref is the trailing VMEM
        # scratch rather than an output.  Leading refs: scalar prefetch +
        # inputs (screened: n,P,M,x,h = 5; screened_dyn adds pr = 6).
        # (screen_cand / sparse naive have nib-free bodies — refs map
        # directly.)
        n_lead = n_scalars + 2
        body = kern

        def kern(*refs):
            lead = refs[:n_lead]
            cnt_ref, bs_ref, ext_ref, nib_scr = refs[n_lead:]
            body(*lead, cnt_ref, nib_scr, bs_ref, ext_ref)

    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            (
                _sds((1, 1), jnp.int32, vma),
                _sds((L, W), jnp.int32, vma),
                # per-tile block sums, bs[tile][j, r] = matches in nib row
                # r, lane block j (reordered to flat-block order by the
                # caller)
                _sds((nt * max(W // 128, 8), 128), jnp.int32, vma),
            )
            if nib_out
            else (
                _sds((1, 1), jnp.int32, vma),
                _sds((nt * max(W // 128, 8), 128), jnp.int32, vma),
            )
        ),
        interpret=interpret,
    )


def _as_words(text_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8[N] -> int32[N/4] little-endian words.

    Arithmetic packing from four strided byte streams — NOT
    ``bitcast_convert_type(x.reshape(-1, 4))``: the (N/4, 4)-shaped u8
    intermediate acquires a T(8,128) layout on TPU whose minor-dim padding
    inflates it 32x (34 GB for a 256 MiB text — measured HBM OOM).
    """
    b0 = jax.lax.slice(text_u8, (0,), (text_u8.shape[0],), (4,))
    b1 = jax.lax.slice(text_u8, (1,), (text_u8.shape[0],), (4,))
    b2 = jax.lax.slice(text_u8, (2,), (text_u8.shape[0],), (4,))
    b3 = jax.lax.slice(text_u8, (3,), (text_u8.shape[0],), (4,))
    i = jnp.int32
    return (
        b0.astype(i)
        | (b1.astype(i) << 8)
        | (b2.astype(i) << 16)
        | (b3.astype(i) << 24)
    )


def nibble_to_bool(nib: jnp.ndarray) -> jnp.ndarray:
    """int32[L, W] nibble mask -> bool[L*W*4] start mask (byte order)."""
    bits = (nib[..., None] >> jnp.arange(4, dtype=jnp.int32)) & 1
    return bits.astype(jnp.bool_).reshape(-1)


def as_words2d(text_u8, words, Nk: int, C: int):
    """(L, W) int32 chunk-row view of the first Nk bytes.

    ``words`` pre-shaped (R, C/4) (the host's zero-copy view): a leading-dim
    slice, NO relayout.  1-D words / None: reshaped (a relayout copy inside
    jit — the distributed shard path, where the halo-extended shard cannot
    be a host view)."""
    W = C // 4
    L = Nk // C
    if words is None:
        return _as_words(text_u8[:Nk]).reshape(L, W)
    if words.ndim == 2 and words.shape[1] == W:
        return words[:L]
    return words.reshape(-1)[: Nk // 4].reshape(L, W)


def _run(text_u8, n, P, m, *, mode: str, chunk_bytes: int,
         interpret: bool, words=None, probe_idx=None, static_probes=None,
         emit_nib=True):
    """Shared kernel driver: returns (start-nibble int32[Nk/4], block sums
    int32[Nk/512], cut) or (None, None, 0) when the input is below the
    kernel threshold (caller falls back to the jnp path).  ``probe_idx``
    (int32[4, 2], screened_dyn mode): runtime probe-word indices.
    ``emit_nib=False``: bsums-only kernel — the nibble element of the
    result is None and offsets must be reconstructed sparsely from the
    block sums (ops/emit).  ``words``: the int32 view of the text buffer,
    preferably pre-shaped (N/4096, 1024) (see as_words2d)."""
    N = text_u8.shape[0]
    # Full-tile compare chains spill ~17MB of scoped VMEM at C=8192
    # (measured); a 4 KiB chunk keeps them ~8MB with ~4% slower scans.
    C = min(chunk_bytes, 4096)
    tile_bytes = 128 * C
    Nk = (N // tile_bytes) * tile_bytes
    nw = P.shape[1]
    Mnp = mask_words(m)  # concrete: depends only on m
    M = jnp.asarray(Mnp)
    probes = (tuple(static_probes) if static_probes is not None
              else tuple(_probe_indices(Mnp)))

    if Nk < max(tile_bytes, MIN_KERNEL_BYTES):
        return None, None, 0

    x = as_words2d(text_u8, words, Nk, C)
    call = _build_call(Nk, C, m, nw, mode,
                       Mnp.tobytes(), probes, interpret, emit_nib,
                       vma=vma_of(x))
    # Clamp the kernel's validity to its own coverage: positions past
    # cut = Nk-(m-1) are re-scanned by the caller's tail, so the kernel
    # excludes them, making its nibbles AND block sums exactly the
    # region's final truth (emission can skip its own prepass).
    n_k = jnp.minimum(jnp.asarray(n, jnp.int32), jnp.int32(Nk))
    if mode == "screened_dyn":
        out = call(
            n_k.reshape(1), P, M, jnp.asarray(probe_idx, jnp.int32), x, x
        )
    else:
        out = call(n_k.reshape(1), P, M, x, x)
    if emit_nib:
        _, nib, bs = out
    else:
        (_, bs), nib = out, None
    cut = Nk - (m - 1) if m > 1 else Nk
    W = C // 4
    L = Nk // C
    nt = L // 128
    jblk = W // 128
    jpad = max(jblk, 8)
    bs_flat = (
        bs.reshape(nt, jpad, 128)[:, :jblk]
        .transpose(0, 2, 1)
        .reshape(-1)
    )  # global block g = (tile*128 + r)*jblk + j
    # nib stays (L, W): flatten ONLY when the consumer needs word order
    # (nibble_to_matches); the dense extractor reshapes to (NB, 128) rows
    # directly, which from 2-D is one relayout instead of two.
    return nib, bs_flat, cut


def naive_nib(text_u8, n, P, m, *, chunk_bytes: int = DEFAULT_CHUNK_BYTES,
              interpret: bool = False, words=None, emit_nib=True):
    """(start-nibble int32[Nk/4], block sums, cut) or (None, None, 0) —
    the full-verify (naive) scan.  Pass ``words`` (the host int32 view of
    the text buffer) to skip the device repack.  See ops/emit.py
    nibble_to_matches for the consumption side.  ``emit_nib=False`` keeps
    the nibble plane in VMEM scratch (nib element None) and halves kernel
    HBM traffic; consume via ops/reconstruct.extract_region."""
    return _run(text_u8, n, P, m, mode="naive", chunk_bytes=chunk_bytes,
                interpret=interpret, words=words, emit_nib=emit_nib)


def static_probes_from_table(pr: np.ndarray) -> tuple:
    """Concrete ``probe_table`` output -> per-alignment static probe tuples
    in ``_screened_kernel``'s compile-time ``probes`` form (dedup'd pairs).

    Baking the table-scored indices as constants keeps the screen on
    static lane slices — measured 2.1x faster than the ``screened_dyn``
    runtime-scalar form, whose per-probe ``pltpu.roll`` of the whole
    extended tile dominated the scan (15.6 vs 33+ GB/s at 256 MiB)."""
    pr = np.asarray(pr)
    return tuple(
        tuple(sorted({int(pr[a, 0]), int(pr[a, 1])})) for a in range(4)
    )


def screened_nib(text_u8, n, P, m, *, chunk_bytes: int = DEFAULT_CHUNK_BYTES,
                 interpret: bool = False, words=None, probe_idx=None,
                 static_probes=None, emit_nib=True, screen_only=False):
    """Screened (Boyer-Moore) variant of naive_nib.

    Probe selection, fastest first:
    - ``static_probes`` (from ``static_probes_from_table(probe_table(p))``):
      bad-char-scored probes baked as compile-time constants — one
      executable per distinct probe layout (bounded by m; persisted cache).
    - ``probe_idx``: the same table-scored probes as RUNTIME scalars —
      one executable per pattern length, ~2x slower screen (dynamic
      rotates).
    - neither: positional first/last full-word probes (static).

    ``screen_only=True`` (requires ``emit_nib=False``): the returned block
    sums count probe-screen CANDIDATES, not matches — no in-kernel verify
    runs; consume via ops/reconstruct.extract_region."""
    if screen_only:
        assert not emit_nib, "screen_only is a bsums-only mode"
        mode = "screen_cand"
    else:
        mode = "screened_dyn" if probe_idx is not None else "screened"
    return _run(text_u8, n, P, m, mode=mode, chunk_bytes=chunk_bytes,
                interpret=interpret, words=words, probe_idx=probe_idx,
                static_probes=static_probes, emit_nib=emit_nib)
