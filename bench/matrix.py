#!/usr/bin/env python
"""Acceptance-config measurement matrix (BASELINE.json:7-11, SURVEY.md §6).

Runs the five driver-set configs (scaled by --scale so smoke runs finish in
minutes) and appends structured rows to BENCH_MATRIX.json:

  1. naive, single 16-byte ASCII pattern, English corpus, CPU-jax backend,
     exact offset parity vs the oracle
  2. Rabin-Karp, 8 patterns, large corpus, single chip
  3. KMP, pattern lengths 4..256, 1-host data-parallel shards with halo
  4. Boyer-Moore, DNA and UTF-8 corpora, full host
  5. all four algorithms, sharded corpus with psum count reduction and
     offset all-gather (N>=2 hosts on a pod; here the multi-device mesh
     exercises the identical code path — cross-host runs only change the
     process bootstrap, parallel/multihost.py)

Usage: python bench/matrix.py [--scale 0.05] [--configs 1,2,3,4,5]
(--scale 1.0 = the full BASELINE sizes: 100MB/1GB/100GB-class).
"""

from __future__ import annotations

import argparse
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import sys
import time


def emit(row):
    print(json.dumps(row), flush=True)
    with open("BENCH_MATRIX.json", "a") as f:
        f.write(json.dumps(row) + "\n")


def timed_match(fn, *args, iters=3, **kw):
    import jax

    r = fn(*args, **kw)  # warm/compile
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args, **kw)
    wall = (time.perf_counter() - t0) / iters
    return r, wall


def config1(scale):
    """Naive / 16B ASCII / English / CPU-jax backend / exact parity."""
    import numpy as np

    from conformance.oracle import find_all
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu import match
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.io import (
        gen_english,
    )

    n = int(100e6 * scale)
    text = gen_english(n, seed=1)
    pat = b"quick brown fox "
    assert len(pat) == 16
    r, wall = timed_match(match, text, pat, algo="naive")
    expected = find_all(text, pat)
    parity = r.count == len(expected) and r.offsets_list() == expected
    emit(
        {
            "config": 1,
            "algo": "naive",
            "n_bytes": n,
            "wall_s": wall,
            "bytes_per_s": n / wall,
            "match_count": r.count,
            "exact_parity": bool(parity),
        }
    )
    assert parity, "config 1 parity FAILED"


def config2(scale):
    """Rabin-Karp multi-pattern (8) / single chip."""
    from conformance.oracle import find_all
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu import match
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.io import (
        gen_english,
    )

    n = int(1e9 * scale)
    text = gen_english(n, seed=2)
    pats = [
        b"quick brown fox ", b"lazy dog and cat", b"parallel device ",
        b"memory vector la", b"pattern match st", b"search algorithm",
        b"some very common", b"repeat often in ",
    ]
    rs, wall = timed_match(match, text, pats, algo="rabin_karp")
    ok = all(
        r.count == len(find_all(text, p)) for r, p in zip(rs, pats)
    )
    emit(
        {
            "config": 2,
            "algo": "rabin_karp_multi8",
            "n_bytes": n,
            "wall_s": wall,
            "bytes_per_s": n / wall,
            "match_counts": [r.count for r in rs],
            "exact_parity": bool(ok),
        }
    )
    assert ok, "config 2 parity FAILED"


def config3(scale):
    """KMP / pattern lengths 4..256 / data-parallel shards with halo."""
    from conformance.oracle import find_all
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu import (
        match_distributed,
    )
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.io import (
        gen_english,
    )

    n = int(100e6 * scale)
    text = bytearray(gen_english(n, seed=3))
    for m in (4, 16, 64, 256):
        pat = bytes(text[5000 : 5000 + m])
        r, wall = timed_match(match_distributed, bytes(text), pat, algo="kmp")
        expected = find_all(bytes(text), pat)
        ok = r.count == len(expected) and r.offsets_list() == expected
        emit(
            {
                "config": 3,
                "algo": f"kmp_dist_m{m}",
                "n_bytes": n,
                "wall_s": wall,
                "bytes_per_s": n / wall,
                "match_count": r.count,
                "exact_parity": bool(ok),
            }
        )
        assert ok, f"config 3 parity FAILED m={m}"


def config4(scale):
    """Boyer-Moore / DNA + UTF-8 corpora / full host."""
    from conformance.oracle import find_all
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu import match
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.io import (
        gen_dna,
        gen_utf8,
    )

    n = int(100e6 * scale)
    for name, corpus in (
        ("dna", gen_dna(n, seed=4)),
        ("utf8", gen_utf8(n // 2, seed=4)),
    ):
        pat = corpus[1000:1024]  # 24-byte pattern drawn from the corpus
        r, wall = timed_match(match, corpus, pat, algo="boyer_moore")
        expected = find_all(corpus, pat)
        ok = r.count == len(expected) and r.offsets_list() == expected
        emit(
            {
                "config": 4,
                "algo": f"boyer_moore_{name}",
                "n_bytes": len(corpus),
                "wall_s": wall,
                "bytes_per_s": len(corpus) / wall,
                "match_count": r.count,
                "exact_parity": bool(ok),
            }
        )
        assert ok, f"config 4 parity FAILED ({name})"


def config5(scale):
    """All four algorithms / sharded corpus / psum + all-gather merge.

    On a pod this runs across N>=2 hosts via parallel/multihost.py; the
    collective path here is identical (shard_map over the data mesh).
    Streaming covers the out-of-HBM sizes.
    """
    import os
    import tempfile

    from conformance.oracle import find_all
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu import (
        match_distributed,
        match_stream,
    )
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.io import (
        gen_english,
    )

    n = int(1e9 * scale)  # BASELINE: 100GB; scaled
    text = gen_english(n, seed=5)
    pat = b"shard merge psum"
    text = text[: n - 16] + pat  # ensure >= 1 match
    expected = find_all(text, pat)
    for algo in ("naive", "rabin_karp", "kmp", "boyer_moore"):
        r, wall = timed_match(match_distributed, text, pat, algo=algo)
        ok = r.count == len(expected) and r.offsets_list() == expected
        emit(
            {
                "config": 5,
                "algo": f"{algo}_dist",
                "n_bytes": n,
                "wall_s": wall,
                "bytes_per_s": n / wall,
                "match_count": r.count,
                "exact_parity": bool(ok),
            }
        )
        assert ok, f"config 5 parity FAILED ({algo})"
    # streaming variant (chunked, resume-capable)
    with tempfile.NamedTemporaryFile(delete=False) as f:
        f.write(text)
        path = f.name
    try:
        t0 = time.perf_counter()
        r = match_stream(path, pat, algo="boyer_moore", chunk_bytes=64 << 20)
        wall = time.perf_counter() - t0
        ok = r.count == len(expected) and [int(x) for x in r.offsets] == expected
        emit(
            {
                "config": 5,
                "algo": "boyer_moore_stream",
                "n_bytes": n,
                "wall_s": wall,
                "bytes_per_s": n / wall,
                "match_count": r.count,
                "exact_parity": bool(ok),
            }
        )
        assert ok, "config 5 streaming parity FAILED"
    finally:
        os.unlink(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=0.05)
    ap.add_argument("--configs", default="1,2,3,4,5")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    fns = {"1": config1, "2": config2, "3": config3, "4": config4, "5": config5}
    for c in args.configs.split(","):
        print(f"--- config {c} (scale {args.scale}) ---", file=sys.stderr)
        fns[c](args.scale)


if __name__ == "__main__":
    main()
