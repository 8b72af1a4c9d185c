"""Native host library tests: serial baselines vs oracle, native tables vs
numpy tables, corpus generators, mmap chunk reader (SURVEY.md R6, R8-R11).
"""

import numpy as np
import pytest

from conformance.oracle import find_all
from parallel_implementation_of_string_matching_algorithms_opencl_tpu.ops import tables
from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils import native
from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.io import (
    gen_english,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


@pytest.mark.parametrize("algo", ["naive", "kmp", "boyer_moore", "rabin_karp"])
@pytest.mark.parametrize(
    "pat", [b"t", b"the quick", b"aa", b"zzqx", b"\x00\x01"]
)
def test_serial_vs_oracle(algo, pat):
    text = gen_english(100_000, seed=13) + b"\x00\x01\x00\x01"
    cnt, offs = native.serial_match(text, pat, algo=algo)
    expected = find_all(text, pat)
    assert cnt == len(expected)
    assert offs.tolist() == expected


def test_serial_overlapping():
    cnt, offs = native.serial_match(b"aaaa", b"aa", algo="kmp")
    assert cnt == 3 and offs.tolist() == [0, 1, 2]
    cnt, offs = native.serial_match(b"aaaa", b"aa", algo="boyer_moore")
    assert cnt == 3 and offs.tolist() == [0, 1, 2]


@pytest.mark.parametrize(
    "pat",
    [b"a", b"ab", b"aab", b"abcab", b"aabaabaa", b"abcdabce", bytes(range(100))],
)
def test_native_tables_match_numpy(pat):
    arr = np.frombuffer(pat, np.uint8)
    np.testing.assert_array_equal(
        native.kmp_failure(arr), tables.failure_function(arr)
    )
    np.testing.assert_array_equal(
        native.bm_bad_char(arr), tables.bm_bad_char(arr)
    )
    np.testing.assert_array_equal(
        native.bm_good_suffix(arr), tables.bm_good_suffix(arr)
    )
    np.testing.assert_array_equal(
        native.rk_powers(len(arr), tables.RK_BASE),
        tables.rk_constants(len(arr), None)["powers"],
    )


def test_gen_deterministic():
    a = native.gen_bytes(10_000, seed=7)
    b = native.gen_bytes(10_000, seed=7)
    c = native.gen_bytes(10_000, seed=8)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    d = native.gen_alphabet(50_000, b"ACGT", seed=3)
    assert set(np.unique(d)) <= set(b"ACGT")
    # roughly uniform
    counts = np.bincount(d, minlength=256)[list(b"ACGT")]
    assert counts.min() > 10_000


def test_native_file_reader(tmp_path):
    data = native.gen_bytes(300_000, seed=5).tobytes()
    p = tmp_path / "corpus.bin"
    p.write_bytes(data)
    with native.NativeFile(str(p)) as f:
        assert f.size == len(data)
        buf, got = f.read_chunk(0, 100_000)
        assert got == 100_000 and buf.tobytes() == data[:100_000]
        buf, got = f.read_chunk(250_000, 100_000)  # crosses EOF
        assert got == 50_000
        assert buf[:50_000].tobytes() == data[250_000:]
        assert not buf[50_000:].any()
        buf, got = f.read_chunk(999_999, 10)  # fully past EOF
        assert got == 0 and not buf.any()
