"""Unit tests for pattern-table precompute (SURVEY.md §4.4)."""

import numpy as np
import pytest

from parallel_implementation_of_string_matching_algorithms_opencl_tpu.ops import tables


def test_failure_function_textbook():
    # Classic example: ababaca
    fail = tables.failure_function(b"ababaca")
    assert fail.tolist() == [0, 0, 1, 2, 3, 0, 1]


def test_failure_function_repeats():
    assert tables.failure_function(b"aaaa").tolist() == [0, 1, 2, 3]
    assert tables.failure_function(b"abcd").tolist() == [0, 0, 0, 0]


def _kmp_step_reference(pat: bytes, state: int, byte: int) -> int:
    """Slow KMP step via failure links, for DFA cross-checking."""
    fail = tables.failure_function(pat)
    m = len(pat)
    if state == m:
        state = int(fail[m - 1])
    while state > 0 and pat[state] != byte:
        state = int(fail[state - 1])
    return state + 1 if pat[state] == byte else 0


@pytest.mark.parametrize("pat", [b"ab", b"aab", b"ababaca", b"aaaa", b"abcabd"])
def test_kmp_dfa_matches_failure_stepping(pat):
    dfa = tables.kmp_dfa(pat)
    m = len(pat)
    for state in range(m + 1):
        for byte in list(pat) + [0, 255, ord("z")]:
            assert dfa[state, byte] == _kmp_step_reference(pat, state, byte), (
                state,
                byte,
            )


def test_kmp_dfa_scan_finds_overlaps():
    dfa = tables.kmp_dfa(b"aa")
    state, hits = 0, []
    for i, b in enumerate(b"aaaa"):
        state = int(dfa[state, b])
        if state == 2:
            hits.append(i - 1)
    assert hits == [0, 1, 2]


def test_bm_bad_char():
    last = tables.bm_bad_char(b"abcab")
    assert last[ord("a")] == 3
    assert last[ord("b")] == 4
    assert last[ord("c")] == 2
    assert last[ord("z")] == -1


def test_bm_good_suffix_textbook():
    # Known table for "abbab": verified against the classic two-pass
    # construction run by hand.
    good = tables.bm_good_suffix(b"abbab")
    m = 5
    assert len(good) == m + 1
    # Full-match shift must move by the period of the pattern.
    assert good[0] >= 1
    # Shifts are all in [1, m].
    assert all(1 <= s <= m for s in good.tolist())


def test_bm_good_suffix_via_bruteforce():
    # Cross-check good-suffix shifts against a brute-force definition.
    def brute(pat: bytes):
        m = len(pat)
        good = np.zeros(m + 1, dtype=int)
        for i in range(m + 1):
            # suffix pat[i:] matched, mismatch at i-1 (or full match at i=0)
            suf = pat[i:]
            for s in range(1, m + 1):
                ok = True
                # After shifting by s, pattern must agree with the matched
                # suffix where it overlaps...
                for j, c in enumerate(suf):
                    jj = i + j - s
                    if 0 <= jj < m and pat[jj] != c:
                        ok = False
                        break
                # ...and (for i>0) must NOT reproduce the same mismatch.
                if ok and i > 0 and 0 <= i - 1 - s < m and pat[i - 1 - s] == pat[i - 1]:
                    ok = False
                if ok:
                    good[i] = s
                    break
            else:
                good[i] = m
        return good

    for pat in [b"abbab", b"aaaa", b"abcd", b"ababa", b"gcagagag"]:
        got = tables.bm_good_suffix(pat)
        want = brute(pat)
        assert got.tolist() == want.tolist(), pat


def test_rk_base_inverse():
    c = tables.rk_constants(8)
    assert (int(c["base"]) * int(c["base_inv"])) & 0xFFFFFFFF == 1


def test_rk_powers():
    c = tables.rk_constants(4, base=257)
    b = 257
    assert c["powers"].tolist() == [
        (b ** 3) & 0xFFFFFFFF,
        (b ** 2) & 0xFFFFFFFF,
        b,
        1,
    ]


def test_rk_hash_rolling_property():
    c = tables.rk_constants(4, base=257)
    data = b"abcdefgh"
    b = 257
    h0 = int(tables.rk_hash(data[0:4], c))
    h1 = int(tables.rk_hash(data[1:5], c))
    # h1 == (h0 - data[0]*B^3) * B + data[4]  (mod 2^32)
    want = (((h0 - data[0] * pow(b, 3, 1 << 32)) * b) + data[4]) & 0xFFFFFFFF
    assert h1 == want
