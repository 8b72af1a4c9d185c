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


ROW_EXTRA: dict = {}  # device/scale stamped on every row (set in main)


_CTRL: dict = {}


def _box_control():
    """Per-call ms of a fixed 64 MiB naive-kernel scan, measured right next
    to the row it stamps.  The shared dev box behind the TPU tunnel drifts
    between ~1x and ~20x device-time states on a minutes scale (BASELINE.md
    timing notes); this control makes ranges across reruns interpretable —
    fast-state reference is ~0.45 ms.  TPU backend only (returns None on
    the CPU mesh, whose rows are code-path validation, not chip perf)."""
    import jax

    if jax.default_backend() != "tpu":
        return None
    if "fn" not in _CTRL:
        import jax.numpy as jnp
        import numpy as np

        from parallel_implementation_of_string_matching_algorithms_opencl_tpu.kernels import (  # noqa: E501
            swar,
        )
        from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.io import (  # noqa: E501
            gen_english,
            pad_to_multiple,
        )

        nc = 64 << 20
        tc = pad_to_multiple(
            np.frombuffer(gen_english(nc, seed=99), np.uint8), 1024
        )
        P, _ = swar.pattern_words(np.frombuffer(b"box control probe", np.uint8))
        Pd = jax.device_put(jnp.asarray(P))
        td = jax.device_put(jnp.asarray(tc))
        wd = jax.device_put(jnp.asarray(tc.view(np.int32)))
        fn = jax.jit(
            lambda t, w, n: swar.naive_nib(
                t, n, Pd, 17, chunk_bytes=16384, words=w, emit_nib=False
            )[1]
        )
        jax.block_until_ready(fn(td, wd, jnp.int32(nc)))  # compile
        _CTRL.update(fn=fn, td=td, wd=wd, nc=nc, it=0)
    import jax.numpy as jnp

    fn, td, wd = _CTRL["fn"], _CTRL["td"], _CTRL["wd"]
    nul = jax.jit(lambda x: x + 1)
    int(nul(jnp.int32(0)))
    times, rtts = [], []
    for _ in range(3):
        _CTRL["it"] += 1
        n_i = jnp.int32(_CTRL["nc"] - (_CTRL["it"] % 64))  # replay-proof
        t0 = time.perf_counter()
        # CONSUME an element — the tunnel lazily elides unconsumed
        # executions (see _time_runner), and block_until_ready alone let
        # this control read 0.01 ms for a 64 MiB scan.
        int(fn(td, wd, n_i).reshape(-1)[0])
        times.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        int(nul(jnp.int32(_CTRL["it"])))
        rtts.append(time.perf_counter() - t0)
    # Raw best-of plus the null RTT, NOT the difference: the control scan
    # is ~0.45 ms fast-state, the same order as the RTT, so a subtraction
    # is noise — downstream reads (control - rtt) / 0.45ms as the
    # box-slowness factor, trusting it only when it is >> 1.
    return round(min(times) * 1e3, 3), round(min(rtts) * 1e3, 3)


def emit(row):
    row = {**row, **ROW_EXTRA}
    # Speed-of-light guard: a single-chip scan cannot beat v5e HBM
    # bandwidth (~0.82 TB/s); anything faster is a metrology bug.
    if row.get("bytes_per_s", 0) > 0.9e12 and row.get("n_devices", 1) == 1:
        row["timing_suspect"] = True
    # Round-4 VERDICT weak #4: a parity-false row must never sit in the
    # permanent record unexplained — stamp it at write time, and stamp any
    # earlier same-key rows as superseded so report.py's latest-row-wins
    # lookup is visible in the artifact itself, not just in code.
    if row.get("exact_parity") is False and "note" not in row:
        row["note"] = ("PARITY FAILURE at emit time — investigate before "
                       "trusting; a later same-key row supersedes this one")
    key = (row.get("config"), row.get("algo"), row.get("scale"))
    try:
        ctrl = _box_control()
    except Exception as e:  # a broken control must not kill the bench row
        print(f"box control failed: {e!r}", file=sys.stderr)
        ctrl = None
    if ctrl is not None:
        row["box_control_ms"], row["box_rtt_ms"] = ctrl
    print(json.dumps(row), flush=True)
    try:
        _stamp_superseded(key)
    except Exception as e:  # stamping is hygiene; never lose the new row
        print(f"supersede stamping failed: {e!r}", file=sys.stderr)
    with open("BENCH_MATRIX.json", "a") as f:
        f.write(json.dumps(row) + "\n")


def _stamp_superseded(key):
    """Mark existing BENCH_MATRIX.json rows matching (config, algo, scale)
    as superseded (the incoming row is about to become latest).  The
    rewrite goes through a temp file + os.replace: this log is the
    permanent benchmark record, and an in-place truncate+rewrite would
    turn any mid-write crash (timeout/OOM/tunnel drop) into total loss of
    the history the append-only design protected."""
    if not _os.path.exists("BENCH_MATRIX.json"):
        return
    rows = []
    changed = False
    with open("BENCH_MATRIX.json") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            if ((r.get("config"), r.get("algo"), r.get("scale")) == key
                    and not r.get("superseded")):
                r["superseded"] = True
                changed = True
            rows.append(r)
    if changed:
        tmp = "BENCH_MATRIX.json.tmp"
        with open(tmp, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        _os.replace(tmp, "BENCH_MATRIX.json")


def timed_match(fn, *args, iters=3, **kw):
    import jax

    r = fn(*args, **kw)  # warm/compile
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args, **kw)
    wall = (time.perf_counter() - t0) / iters
    return r, wall


# -- staged timing -----------------------------------------------------------
#
# The scan metric (BASELINE.json:2 bytes/s/chip) is the DEVICE-RESIDENT rate:
# buffers are staged to HBM once and the jitted runner is timed per call
# (operands perturbed so the async path cannot replay).  The one-time host→
# device transfer is reported separately as h2d_s — on this development
# tunnel the link runs at ~15 MB/s, which would otherwise swamp every
# full-scale row with network time that no real TPU host pays.


def _stage(text_np, sharding=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    put = (lambda a: jax.device_put(jnp.asarray(a), sharding)) if sharding \
        else (lambda a: jax.device_put(jnp.asarray(a)))
    t0 = time.perf_counter()
    text_dev = put(text_np)
    # Single-device runners take the pre-shaped (N/4096, 1024) view; the
    # sharded path keeps 1-D words (the shard halo assembly concatenates).
    wv = text_np.view(np.int32)
    words_dev = put(wv if sharding else wv.reshape(-1, 1024))
    jax.block_until_ready((text_dev, words_dev))
    return text_dev, words_dev, time.perf_counter() - t0


def _time_runner(runner, text_dev, words_dev, n, pat_dev, tb_dev, iters=6,
                 passes=3):
    """(warm_output, per_call_s): warm call at exact n (parity source),
    then batch-summed timing passes — ``iters`` calls at distinct n
    (replay-proof), counts accumulated into one device-side sum consumed
    ONCE per pass (count consumption verified to force the full
    executable), a null-op round trip subtracted, best pass kept.  The
    same validated metrology as bench.py; see its docstring for the two
    rejected alternatives and why."""
    import jax
    import jax.numpy as jnp

    out = runner(text_dev, words_dev, jnp.int32(n), pat_dev, tb_dev)
    jax.block_until_ready(out)
    nul = jax.jit(lambda x: x + 1)
    int(nul(jnp.int32(0)))
    vals = []
    it = 0
    for _ in range(passes):
        # batch-summed pass: one tunnel sync per ``iters`` calls — the
        # same validated metrology as bench.py (per-call RTT jitter at
        # 100 MB scales otherwise swamps the 1-2 ms device time).
        t0 = time.perf_counter()
        s = None
        for _i in range(iters):
            it += 1
            o = runner(text_dev, words_dev, jnp.int32(n - 1 - (it % 1024)),
                       pat_dev, tb_dev)
            c = o[0] if getattr(o[0], "ndim", 0) == 0 else o[0].reshape(-1)[0]
            s = c if s is None else s + c
        int(s)
        t1 = time.perf_counter()
        int(nul(jnp.int32(it)))
        t2 = time.perf_counter()
        vals.append(((t1 - t0) - (t2 - t1)) / iters)
    # SOL guard, same as bench.py: a null-RTT spike makes a pass read
    # below the HBM floor; discard those, clamp only if ALL are artifacts.
    sol = n / 850e9
    valid = [v for v in vals if v >= sol]
    return out, (min(valid) if valid else sol)


def _cap(estimate: float) -> int:
    """Offset capacity: next power of two above the expected match count
    (big fixed caps compile huge extraction branches for nothing)."""
    return max(1 << 16, 1 << int(estimate * 2).bit_length())


def _single_result(matcher, out):
    """(count, sorted offsets list) from a single-pattern runner output."""
    import numpy as np

    count = int(out[0])
    offs = np.asarray(out[1])
    return count, [int(x) for x in offs[offs >= 0]]


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
    import numpy as np

    from conformance.oracle import find_all
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.models.multi import (
        RabinKarpMultiMatcher,
    )
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.config import (
        MatchConfig,
    )
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.io import (
        gen_english,
        pad_to_multiple,
    )
    import jax
    import jax.numpy as jnp

    n = int(1e9 * scale)
    text = gen_english(n, seed=2)
    # Half synthetic phrases, half drawn from the corpus so several
    # patterns have real (nonzero) match counts.
    pats = [
        b"quick brown fox ", b"lazy dog and cat", b"parallel device ",
        b"search algorithm",
        text[1000:1016], text[n // 2 : n // 2 + 16],
        text[n // 3 : n // 3 + 16], text[n - 4096 : n - 4080],
    ]
    cap = _cap(2e-4 * n)  # corpus-drawn 16-byte patterns: ~1.5e-4 matches/B
    cfg = MatchConfig(capacity=cap, verify_capacity=cap)
    mm = RabinKarpMultiMatcher(pats, cfg)
    # Tile-multiple padding (2 MiB covers every kernel's grid tile) keeps
    # the jnp-scanned tail at ~m-1 bytes — matcher.match() pads the same
    # way; staged runners must match it or eat a ~0.5 MB tail per call.
    text_np = pad_to_multiple(np.frombuffer(text, np.uint8), 2 << 20)
    # The runner match() itself uses: the UNION-emission fast path when
    # eligible (device skips the k per-pattern capacity sorts; the host
    # splits the sorted union per pattern), else the stacked runner.
    union = mm._union_eligible(len(text_np))
    runner = (mm._runner_union(cfg, mm.k) if union
              else mm._runner(cfg, mm.k))
    text_dev, words_dev, h2d = _stage(text_np)
    pat_dev = jnp.asarray(mm.pattern_arr)
    tb_dev = jax.tree.map(jnp.asarray, mm.tables)
    out, wall = _time_runner(runner, text_dev, words_dev, n, pat_dev, tb_dev)

    # Scan-vs-extract wall split (round-4 VERDICT next #3): time the union
    # hash screen ALONE with the identical protocol; the extraction share
    # is the difference.  Keeps the config-2 row honest about where the
    # wall lives instead of one opaque number.
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.kernels import (
        rk_roll,
    )
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.ops import (
        reconstruct,
        tables as _tables,
    )

    base = int(_tables.RK_BASE)

    def scan_runner(text, words, nn, pat, tb):
        bs, cut = rk_roll.rk_candidate_bsums(
            text, nn, tb["hashes"], 16, base,
            chunk_bytes=cfg.pallas_chunk_bytes,
            words=reconstruct.full_words2d(text, words),
        )
        return (bs.reshape(-1)[0] + cut,)

    _, scan_wall = _time_runner(
        jax.jit(scan_runner), text_dev, words_dev, n, pat_dev, tb_dev
    )
    counts = [int(c) for c in np.asarray(out[0])]
    ok = True
    if union:
        results = mm._assemble_union(out, n, len(text_np))
        for p_i, p in enumerate(pats):
            want = find_all(text, p)
            r = results[p_i]
            ok &= r.count == len(want) and r.offsets_list() == want \
                and not r.overflow
    else:
        offs = np.asarray(out[1])
        for p_i, p in enumerate(pats):
            want = find_all(text, p)
            o = offs[p_i]
            ok &= (counts[p_i] == len(want)
                   and [int(x) for x in o[o >= 0]] == want)
    emit(
        {
            "config": 2,
            "algo": "rabin_karp_multi8",
            "n_bytes": n,
            "wall_s": wall,
            "bytes_per_s": n / wall,
            "scan_wall_s": scan_wall,
            "extract_wall_s": wall - scan_wall,
            "h2d_s": h2d,
            "match_counts": counts,
            "emission_path": "union" if union else "stacked",
            "exact_parity": bool(ok),
        }
    )
    assert ok, "config 2 parity FAILED"


def config3(scale):
    """KMP / pattern lengths 4..256 / data-parallel shards with halo."""
    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from conformance.oracle import find_all
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.parallel.dist import (
        DistributedMatcher,
    )
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.parallel.mesh import (
        DATA_AXIS,
        make_data_mesh,
    )
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.config import (
        MatchConfig,
    )
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.io import (
        gen_english,
        pad_to_multiple,
    )

    n = int(100e6 * scale)
    text = bytearray(gen_english(n, seed=3))
    mesh = make_data_mesh()
    d = mesh.shape[DATA_AXIS]
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    text_np = pad_to_multiple(
        np.frombuffer(bytes(text), np.uint8), (2 << 20) * d  # tile * shards
    )
    text_dev, words_dev, h2d = _stage(text_np, sharding)
    for m in (4, 16, 64, 256):
        # m=4 on english matches ~5e-3/byte (~500k at 100MB) — capacity
        # sized to verify the FULL offset list (counts exact regardless).
        cap = _cap((8e-3 if m == 4 else 2e-4) * n)
        cfg = MatchConfig(capacity=cap, verify_capacity=cap)
        pat = bytes(text[5000 : 5000 + m])
        dm = DistributedMatcher(pat, algo="kmp", config=cfg, mesh=mesh)
        runner = dm._build(mesh, type(dm.matcher), dm.config, m)
        pat_dev = jnp.asarray(dm.matcher.pattern_arr)
        tb_dev = jax.tree.map(jnp.asarray, dm.matcher.tables)
        out, wall = _time_runner(
            runner, text_dev, words_dev, n, pat_dev, tb_dev
        )
        count, _ovf, _scounts, rows = dm.resolve_runner_output(out)
        offs = rows.reshape(-1)
        got = sorted(int(x) for x in offs[offs >= 0])
        expected = find_all(bytes(text), pat)
        ok = count == len(expected) and got == expected
        # Apples-to-apples control (round-4 VERDICT weak #3 compared these
        # dist rows against 256 MiB single-chip numbers, where flat
        # extraction costs amortize differently): the SAME text, SAME
        # window, single-chip runner.  dist/single ratio is then pure
        # wrapper cost.
        single_wall = None
        if d == 1 and m >= 64:
            sm_ = dm.matcher
            srun = sm_._runner(sm_.config)
            td1 = jax.device_put(jnp.asarray(text_np))
            wd1 = jax.device_put(
                jnp.asarray(text_np.view(np.int32).reshape(-1, 1024))
            )
            _, single_wall = _time_runner(srun, td1, wd1, n, pat_dev, tb_dev)
            del td1, wd1
        row = {
            "config": 3,
            "algo": f"kmp_dist_m{m}",
            "n_bytes": n,
            "wall_s": wall,
            "bytes_per_s": n / wall,
            "h2d_s": h2d,
            "match_count": count,
            "exact_parity": bool(ok),
        }
        if single_wall is not None:
            row["single_wall_s"] = single_wall
            row["dist_over_single"] = round(wall / single_wall, 3)
        emit(row)
        assert ok, f"config 3 parity FAILED m={m}"


def config4(scale):
    """Boyer-Moore / DNA + UTF-8 corpora / full host."""
    from conformance.oracle import find_all
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu import match
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.io import (
        gen_dna,
        gen_utf8,
    )

    import numpy as np

    import jax
    import jax.numpy as jnp

    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.models.registry import (
        get_matcher,
    )
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.config import (
        MatchConfig,
    )
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.io import (
        pad_to_multiple,
    )

    n = int(100e6 * scale)
    cap = _cap(1e-4 * n)
    cfg = MatchConfig(capacity=cap, verify_capacity=cap)
    for name, corpus in (
        ("dna", gen_dna(n, seed=4)),
        ("utf8", gen_utf8(n // 2, seed=4)),
    ):
        pat = corpus[1000:1024]  # 24-byte pattern drawn from the corpus
        matcher = get_matcher("boyer_moore")(pat, cfg)
        runner = matcher._runner(matcher.config)
        text_np = pad_to_multiple(
            np.frombuffer(corpus, np.uint8), 2 << 20  # tile multiple
        )
        text_dev, words_dev, h2d = _stage(text_np)
        pat_dev = jnp.asarray(matcher.pattern_arr)
        tb_dev = jax.tree.map(jnp.asarray, matcher.tables)
        out, wall = _time_runner(
            runner, text_dev, words_dev, len(corpus), pat_dev, tb_dev
        )
        count, got = _single_result(matcher, out)
        expected = find_all(corpus, pat)
        ok = count == len(expected) and got == expected
        emit(
            {
                "config": 4,
                "algo": f"boyer_moore_{name}",
                "n_bytes": len(corpus),
                "wall_s": wall,
                "bytes_per_s": len(corpus) / wall,
                "h2d_s": h2d,
                "match_count": count,
                "exact_parity": bool(ok),
            }
        )
        assert ok, f"config 4 parity FAILED ({name})"


def _gen_corpus_file(path: str, total: int, pat: bytes, seed: int = 5,
                     plant_every: int = 1 << 30):
    """Write a ``total``-byte English corpus to ``path`` in 64 MiB segments
    (bounded RAM), planting ``pat`` at every ``plant_every`` boundary and at
    EOF.  Returns the list of planted offsets."""
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.io import (
        gen_english,
    )

    seg = 64 << 20
    planted = []
    with open(path, "wb") as f:
        written = 0
        si = 0
        while written < total:
            chunk = bytearray(gen_english(min(seg, total - written),
                                          seed=seed + si))
            # plant at plant_every boundaries that fall inside this segment
            lo, hi = written, written + len(chunk)
            k = -(-lo // plant_every)
            while k * plant_every + len(pat) <= hi:
                off = k * plant_every - lo
                if off >= 0:
                    chunk[off : off + len(pat)] = pat
                    planted.append(k * plant_every)
                k += 1
            if hi == total and len(chunk) >= len(pat):
                chunk[-len(pat):] = pat
                # The EOF plant may partially overwrite an already-recorded
                # boundary plant; drop any recorded offset it clobbered so
                # the planted-subset parity check can't fail on a
                # corpus-generation artifact.
                planted = [o for o in planted
                           if o + len(pat) <= total - len(pat)]
                planted.append(total - len(pat))
            f.write(chunk)
            written = hi
            si += 1
    return sorted(set(planted))


def config5(scale, stream_bytes: int | None = None,
            dist_bytes: int | None = None):
    """All four algorithms / sharded corpus / psum + all-gather merge.

    On a pod this runs across N>=2 hosts via parallel/multihost.py; the
    collective path here is identical (shard_map over the data mesh).
    Streaming covers the out-of-HBM sizes: the in-memory distributed part
    runs at min(n, 1GB); the streaming part at ``stream_bytes`` (default n)
    with the corpus generated straight to disk in 64 MiB segments.
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

    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.parallel.dist import (
        DistributedMatcher,
    )
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.parallel.mesh import (
        DATA_AXIS,
        make_data_mesh,
    )
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.config import (
        MatchConfig,
    )
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.io import (
        pad_to_multiple,
    )

    n = dist_bytes or min(int(1e9 * scale), 1 << 30)
    text = gen_english(n, seed=5)
    pat = b"shard merge psum"
    text = text[: n - 16] + pat  # ensure >= 1 match
    expected = find_all(text, pat)
    cfg = MatchConfig()
    mesh = make_data_mesh()
    d = mesh.shape[DATA_AXIS]
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    text_np = pad_to_multiple(
        np.frombuffer(text, np.uint8), (2 << 20) * d  # tile * shards
    )
    text_dev, words_dev, h2d = _stage(text_np, sharding)
    for algo in ("naive", "rabin_karp", "kmp", "boyer_moore"):
        dm = DistributedMatcher(pat, algo=algo, config=cfg, mesh=mesh)
        runner = dm._build(mesh, type(dm.matcher), dm.config, dm.m)
        pat_dev = jnp.asarray(dm.matcher.pattern_arr)
        tb_dev = jax.tree.map(jnp.asarray, dm.matcher.tables)
        out, wall = _time_runner(
            runner, text_dev, words_dev, n, pat_dev, tb_dev
        )
        count, _ovf, _scounts, rows = dm.resolve_runner_output(out)
        offs = rows.reshape(-1)
        got = sorted(int(x) for x in offs[offs >= 0])
        ok = count == len(expected) and got == expected
        emit(
            {
                "config": 5,
                "algo": f"{algo}_dist",
                "n_bytes": n,
                "wall_s": wall,
                "bytes_per_s": n / wall,
                "h2d_s": h2d,
                "match_count": count,
                "exact_parity": bool(ok),
            }
        )
        assert ok, f"config 5 parity FAILED ({algo})"
    del text, text_dev, words_dev

    # Streaming variant (chunked, resume-capable, BASELINE 100GB-class):
    # corpus generated straight to disk; parity = planted offsets are a
    # subset of results + spot-window oracle checks (a full in-RAM oracle
    # at 10-100GB would dominate the run).
    sn = stream_bytes or int(1e9 * scale)
    path = os.path.join(tempfile.gettempdir(), f"tpumatch_c5_{sn}.bin")
    t0 = time.perf_counter()
    planted = _gen_corpus_file(path, sn, pat, seed=5, plant_every=1 << 29)
    print(f"  corpus gen: {sn / 1e9:.1f} GB in {time.perf_counter() - t0:.0f}s",
          file=sys.stderr)
    try:
        t0 = time.perf_counter()
        r = match_stream(path, pat, algo="boyer_moore", chunk_bytes=256 << 20)
        wall = time.perf_counter() - t0
        got = set(int(x) for x in r.offsets)
        ok = set(planted).issubset(got) and r.count >= len(planted)
        # spot-check windows around three planted offsets + one random range
        mm = __import__("numpy").memmap(path, dtype="u1", mode="r")
        for off in planted[:3]:
            lo = max(0, off - 4096)
            win = bytes(mm[lo : off + 4096 + len(pat)])
            w_want = [x + lo for x in find_all(win, pat)]
            w_got = [x for x in got if lo <= x <= off + 4096]
            ok &= sorted(w_got) == sorted(
                x for x in w_want if lo <= x <= off + 4096
            )
        del mm
        emit(
            {
                "config": 5,
                "algo": "boyer_moore_stream",
                "n_bytes": sn,
                "wall_s": wall,
                "bytes_per_s": sn / wall,
                "match_count": r.count,
                "exact_parity": bool(ok),
                "parity_mode": "planted-subset+spot-windows",
                # e2e wall includes host->device streaming; on this dev
                # tunnel that link is ~15 MB/s and dominates — a real TPU
                # host's DMA overlaps it away (async double-buffering).
                "io_path": "axon-tunnel-transfer-bound",
            }
        )
        assert ok, "config 5 streaming parity FAILED"
    finally:
        os.unlink(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=0.05)
    ap.add_argument("--configs", default="1,2,3,4,5")
    ap.add_argument("--c5-stream-gb", type=float, default=0.0,
                    help="config-5 streaming corpus size in GB (0 = scale*1GB)")
    ap.add_argument("--c5-dist-mb", type=int, default=0,
                    help="config-5 in-memory distributed size in MB "
                         "(0 = scale*1GB; cap it on the CPU mesh, whose "
                         "8 device threads share 4 cores and trip XLA's "
                         "40s collective-rendezvous timeout at ~1GB)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU jax backend with an 8-device mesh "
                         "(config 1 spec; config 5 collective path)")
    args = ap.parse_args()

    import os

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"devices: {jax.devices()}", file=sys.stderr)
    dev = jax.devices()[0]
    ROW_EXTRA.update(
        device=f"{dev.platform}/{dev.device_kind}",
        n_devices=len(jax.devices()),
        scale=args.scale,
    )

    fns = {"1": config1, "2": config2, "3": config3, "4": config4}
    for c in args.configs.split(","):
        print(f"--- config {c} (scale {args.scale}) ---", file=sys.stderr)
        if c == "5":
            sb = int(args.c5_stream_gb * 1e9) or None
            db = args.c5_dist_mb * (1 << 20) or None
            config5(args.scale, stream_bytes=sb, dist_bytes=db)
        else:
            fns[c](args.scale)


if __name__ == "__main__":
    main()
