"""Parity tests: every algorithm vs the golden oracle (SURVEY.md §4.1-4.2)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from conformance.oracle import find_all

from parallel_implementation_of_string_matching_algorithms_opencl_tpu import (
    MatchConfig,
    available_algorithms,
    match,
)

ALGOS = ["naive", "rabin_karp", "kmp", "boyer_moore"]
# pad_multiple=1024 keeps every small fuzz text at one padded shape, so each
# (algo, m) pair compiles exactly once; chunk=64 still exercises lane seams.
CFG = MatchConfig(capacity=4096, verify_capacity=4096, kmp_chunk=64, bm_chunk=64,
                  pad_multiple=1024)
CFG_CURSOR = CFG.replace(bm_variant="cursor")


def run(text: bytes, pattern: bytes, algo: str, cfg=CFG):
    res = match(text, pattern, algo=algo, config=cfg)
    assert res.count == len(res.offsets) or res.overflow
    return res.offsets_list()


def test_registry_complete():
    assert set(ALGOS) <= set(available_algorithms())


@pytest.mark.parametrize("algo", ALGOS)
def test_simple(algo):
    assert run(b"abracadabra", b"abra", algo) == [0, 7]


@pytest.mark.parametrize("algo", ALGOS)
def test_overlapping(algo):
    assert run(b"aaaa", b"aa", algo) == [0, 1, 2]
    assert run(b"aaaaaaaa", b"aaa", algo) == list(range(6))


@pytest.mark.parametrize("algo", ALGOS)
def test_edges(algo):
    text = b"hello world"
    # m == 1
    assert run(text, b"l", algo) == find_all(text, b"l")
    # pattern == text
    assert run(text, text, algo) == [0]
    # pattern at position 0 and n-m
    assert run(b"xyabcxy", b"xy", algo) == [0, 5]
    # absent
    assert run(text, b"zzz", algo) == []
    # pattern longer than text
    assert run(b"ab", b"abc", algo) == []


@pytest.mark.parametrize("algo", ALGOS)
def test_zero_bytes_and_padding(algo):
    # Patterns containing zero bytes must not false-positive in the padded
    # tail region.
    text = b"\x00\x00a\x00\x00"
    assert run(text, b"\x00\x00", algo) == [0, 3]


@pytest.mark.parametrize("algo", ALGOS)
@pytest.mark.parametrize("alphabet", [b"ab", b"ACGT", bytes(range(256))])
@pytest.mark.parametrize("m", [1, 2, 4, 7, 16, 33])
def test_fuzz_vs_oracle(algo, alphabet, m):
    rng = np.random.default_rng(hash((algo, alphabet, m)) & 0xFFFF)
    alpha = np.frombuffer(alphabet, dtype=np.uint8)
    for trial in range(3):
        n = int(rng.integers(m, 800))
        text = rng.choice(alpha, size=n).tobytes()
        # Half the trials: plant the pattern from the text itself so matches
        # exist; half: random pattern.
        if trial % 2 == 0 and n >= m:
            start = int(rng.integers(0, n - m + 1))
            pattern = text[start : start + m]
        else:
            pattern = rng.choice(alpha, size=m).tobytes()
        assert run(text, pattern, algo) == find_all(text, pattern), (
            algo,
            text[:50],
            pattern,
        )


@pytest.mark.parametrize("m", [2, 5, 16])
def test_bm_cursor_variant_parity(m):
    rng = np.random.default_rng(m)
    alpha = np.frombuffer(b"abc", dtype=np.uint8)
    for _ in range(3):
        n = int(rng.integers(m, 600))
        text = rng.choice(alpha, size=n).tobytes()
        start = int(rng.integers(0, n - m + 1))
        pattern = text[start : start + m]
        assert run(text, pattern, "boyer_moore", CFG_CURSOR) == find_all(
            text, pattern
        )


def test_chunk_boundary_matches():
    # Plant matches straddling every lane-chunk boundary used by KMP/BM
    # cursor variants (chunk=64 in CFG) — SURVEY.md §4.3.
    m = 5
    pattern = b"vwxyz"
    text = bytearray(np.zeros(641, dtype=np.uint8).tobytes())
    starts = [0, 59, 60, 61, 62, 63, 64, 65, 127, 128, 200, 636]
    planted = []
    last_end = -1
    for s in starts:
        if s >= last_end:
            text[s : s + m] = pattern
            planted.append(s)
            last_end = s + m
    text = bytes(text)
    want = find_all(text, pattern)
    assert want == planted
    for algo in ALGOS:
        assert run(text, pattern, algo) == want, algo
    assert run(text, pattern, "boyer_moore", CFG_CURSOR) == want


def test_multi_pattern_rk():
    text = b"the cat sat on the mat with the bat"
    pats = [b"cat", b"mat", b"bat", b"the ", b"zzz"]
    results = match(text, pats, algo="rabin_karp", config=CFG)
    for p, r in zip(pats, results):
        assert r.offsets_list() == find_all(text, p), p


def test_multi_pattern_equal_length_shared_pass():
    text = b"abcabcabcxabc"
    pats = [b"abc", b"bca", b"cxa", b"xyz"]
    results = match(text, pats, algo="rabin_karp", config=CFG)
    for p, r in zip(pats, results):
        assert r.offsets_list() == find_all(text, p), p


def test_capacity_overflow_exact_count():
    text = b"a" * 500
    res = match(text, b"aa", algo="naive", config=CFG.replace(capacity=16))
    assert res.count == 499
    assert res.overflow
    assert res.offsets_list() == list(range(16))


def test_overflow_drain_returns_all_offsets():
    # VERDICT round-1 "missing #6": count > capacity must still be able to
    # enumerate every offset via the windowed re-extraction drain.
    text = b"x" + b"ab" * 49 + b"y" + b"ab" * 60  # 99 'ab' occurrences
    cfg = CFG.replace(capacity=8)
    want = find_all(text, b"ab")
    assert len(want) == 109
    for algo in ALGOS:
        res = match(text, b"ab", algo=algo, config=cfg, drain=True)
        assert res.count == len(want)
        assert not res.overflow
        assert res.offsets_list() == want


def test_drain_noop_without_overflow():
    text = b"hello world hello"
    res = match(text, b"hello", algo="kmp", config=CFG, drain=True)
    assert res.count == 2 and res.offsets_list() == [0, 12]


def test_drain_clustered_matches_split_windows():
    # Matches packed into one small region: the count-derived drain window
    # is sized for the AVERAGE density, so the cluster's window still
    # overflows and must split recursively until every window fits.
    text = bytearray(b"x" * 20_000)
    for i in range(200):
        text[4 * i : 4 * i + 2] = b"ab"
    text = bytes(text)
    want = find_all(text, b"ab")
    assert len(want) == 200
    res = match(text, b"ab", algo="naive",
                config=CFG.replace(capacity=8), drain=True)
    assert res.count == 200 and not res.overflow
    assert res.offsets_list() == want


def test_drain_dense_every_position():
    # Worst case: every position matches; windows are fully dense.
    text = b"a" * 777
    res = match(text, b"aaa", algo="boyer_moore",
                config=CFG.replace(capacity=32), drain=True)
    assert res.count == 775
    assert res.offsets_list() == list(range(775))


def test_utf8_byte_semantics():
    text = "héllo wörld héh".encode("utf-8")
    pattern = "é".encode("utf-8")
    for algo in ALGOS:
        assert run(text, pattern, algo) == find_all(text, pattern)
