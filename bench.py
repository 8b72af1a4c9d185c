#!/usr/bin/env python
"""Benchmark harness: bytes/s/chip per algorithm (BASELINE.json:2).

Prints ONE final JSON line to stdout:
    {"metric": "...", "value": N, "unit": "bytes/s/chip", "vs_baseline": N}

The headline metric is Boyer-Moore bytes/s/chip; ``vs_baseline`` is the ratio
against the driver-set 10 GB/s/chip target (BASELINE.json:5 — the reference
itself published no numbers, BASELINE.json:13).  Per-algorithm detail rows go
to stderr and to BENCH_DETAIL.json.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def bench_algo(algo: str, text_np, n: int, pattern: bytes, iters: int, cfg,
               passes: int = 2):
    import jax
    import jax.numpy as jnp

    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.models.registry import (
        get_matcher,
    )

    matcher = get_matcher(algo)(pattern, cfg)
    runner = matcher._runner(matcher.config)  # per-pattern specialized
    text_dev = jax.device_put(jnp.asarray(text_np))
    # Pre-shaped (N/4096, 1024) word view: zero-copy on the host, saves the
    # kernels/reconstruction an in-jit relayout (kernels/swar.py docstring).
    words_dev = jax.device_put(
        jnp.asarray(text_np.view(np.int32).reshape(-1, 1024))
    )
    pat_dev = jax.device_put(jnp.asarray(matcher.pattern_arr))
    tables_dev = jax.tree.map(lambda a: jax.device_put(jnp.asarray(a)), matcher.tables)

    # Warmup / compile.
    t0 = time.perf_counter()
    out = runner(text_dev, words_dev, jnp.int32(n), pat_dev, tables_dev)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0

    # Timing (round-3 metrology, validated against per-call ground truth):
    # per pass, ``iters`` calls with DISTINCT n operands (replay-proof)
    # are dispatched back-to-back with their counts accumulated into one
    # device-side sum, which is consumed ONCE (one ~30 ms tunnel sync per
    # pass instead of per call, so RTT jitter is amortized /iters).
    # Consuming the count was verified to force the FULL executable
    # (count-only vs all-outputs consumption measured identical).  Two
    # rejected alternatives, both measured: pass-level null-RTT
    # subtraction fabricated near-zero walls when the null spiked ("RK
    # 311 GB/s" for a 4.6 ms kernel); feeding outputs into the next
    # call's operand (chaining) UNDER-reports multi-output executables on
    # this tunnel (0.6 ms for a pipeline whose scan alone exceeds 2 ms).
    # The shared box drifts ~1x-5x on a minutes scale: best pass wins
    # (interference only ever ADDS time).
    nul = jax.jit(lambda x: x + 1)
    int(nul(jnp.int32(0)))
    count = int(out[0])
    # Speed-of-light floor: a scan cannot beat HBM read bandwidth
    # (~819 GB/s on v5e); readings below it are artifacts — clamp + flag.
    sol = n / 850e9
    vals = []
    it_all = 0
    for _ in range(passes):
        t0 = time.perf_counter()
        s = jnp.int32(0)
        for _i in range(iters):
            it_all += 1
            o = runner(text_dev, words_dev, jnp.int32(n - it_all), pat_dev,
                       tables_dev)
            s = s + o[0]
        int(s)
        t1 = time.perf_counter()
        int(nul(jnp.int32(it_all)))
        t2 = time.perf_counter()
        vals.append(((t1 - t0) - (t2 - t1)) / iters)
    # A pass whose null round trip spiked above its batched wall reads
    # below the SOL floor — discard such passes; only if EVERY pass is an
    # artifact do we clamp and flag (min() over raw vals would select
    # exactly the artifact).
    valid = [v for v in vals if v >= sol]
    timing_suspect = not valid
    per_call = min(valid) if valid else sol
    rtt = None

    # VMEM-residency / working-set sanity from XLA's own memory analysis:
    # temp (scratch) memory far below n_bytes means the scan streams tiles
    # through VMEM without HBM round-trips of intermediates (SURVEY.md §5).
    mem = {}
    try:
        compiled = jax.jit(runner).lower(
            text_dev, words_dev, jnp.int32(n), pat_dev, tables_dev
        ).compile()
        ma = compiled.memory_analysis()
        if ma is not None:
            mem = {
                "temp_bytes": getattr(ma, "temp_size_in_bytes", None),
                "peak_bytes": getattr(ma, "peak_memory_in_bytes", None),
            }
    except Exception:
        pass
    return {
        "algo": algo,
        "n_bytes": n,
        "wall_s": per_call,
        "bytes_per_s_per_chip": n / per_call,
        "rtt_s": rtt,
        "compile_s": compile_s,
        "match_count": count,
        "iters": iters,
        "passes": passes,
        "timing_suspect": timing_suspect,
        **mem,
    }


def _dump_detail(path: str, dev, results, extra=None) -> None:
    doc = {"device": f"{dev.platform}/{dev.device_kind}", "results": results}
    if extra:
        doc.update(extra)
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
        f.write("\n")


def drift_moved(results, ref_values, threshold=0.25):
    """[(algo, prior_gbs, head_gbs)] for algorithms whose measured GB/s
    moved more than ``threshold`` relative to the reference values.  Pure
    logic, unit-tested in tests/test_aux.py."""
    moved = []
    for algo, r in results.items():
        old = ref_values.get(algo)
        if not old:
            continue
        new = r["bytes_per_s_per_chip"] / 1e9
        if abs(new - old) / old > threshold:
            moved.append((algo, old, new))
    return moved


def drift_verdict(head_gbs, ref_same_window_gbs, threshold=0.25):
    """'environment' when the reference commit reproduces HEAD's number in
    the same window (the move is box state), 'code' when it does not (the
    reference commit is genuinely faster/slower than HEAD right now)."""
    return ("environment"
            if abs(ref_same_window_gbs - head_gbs) / max(head_gbs, 1e-9)
            < threshold else "code")


def drift_check(results, argv_base, root="."):
    """Round-4 VERDICT weak #6 / next #5: the drift sentinel.

    The shared box behind the tunnel drifts 1x-5x on a minutes scale, so a
    headline drop in an official run is ambiguous between box state and a
    code regression — exactly how the r3->r4 naive halving (120 -> 69 GB/s)
    shipped unflagged.  Disambiguation requires a SAME-WINDOW A/B: when any
    algorithm moves >25% vs the prior round's canonical value
    (``bench/drift_ref.json``), re-run those algorithms at the reference
    commit in a throwaway git worktree, back-to-back in this session, and
    record both rows.  If the reference commit reproduces HEAD's number in
    the same window, the move is environment; if it reproduces its own old
    number, the move is code-caused and the A/B table names the window.

    Returns a dict for BENCH_DETAIL.json's ``drift_check`` key (or None
    when nothing moved / no reference exists).  Never raises: a sentinel
    must not take down the official run.
    """
    import os
    import subprocess
    import tempfile

    ref_path = os.path.join(root, "bench", "drift_ref.json")
    if not os.path.exists(ref_path):
        return None
    try:
        ref = json.load(open(ref_path))
    except Exception:
        return None
    moved = drift_moved(results, ref.get("values", {}))
    if not moved:
        return None
    algos = ",".join(a for a, _, _ in moved)
    commit = ref.get("commit", "")
    print(f"drift sentinel: {algos} moved >25% vs {commit[:7]} "
          f"({', '.join(f'{a} {o:.1f}->{n:.1f}' for a, o, n in moved)}); "
          f"re-benching the reference commit in this window",
          file=sys.stderr)
    out = {"ref_commit": commit, "threshold": 0.25, "rows": []}
    wt = tempfile.mkdtemp(prefix="driftwt_")
    try:
        subprocess.run(["git", "worktree", "add", "--force", wt, commit],
                       cwd=root, check=True, capture_output=True,
                       timeout=120)
        dj = os.path.join(wt, "DRIFT_DETAIL.json")
        # The guard rides an env var, not a flag: the reference commit's
        # bench.py predates the sentinel and would reject unknown flags.
        cmd = [sys.executable, "bench.py", "--algos", algos,
               "--detail-out", dj] + argv_base
        env = dict(os.environ, TPUMATCH_NO_DRIFT="1")

        def run_ref():
            r = subprocess.run(cmd, cwd=wt, capture_output=True,
                               timeout=900, text=True, env=env)
            if r.returncode != 0 or not os.path.exists(dj):
                return None, (r.stderr or "")[-500:]
            return json.load(open(dj))["results"], None

        refres, err = run_ref()
        if refres is None:
            out["error"] = err
            return out
        # Replay-cache sanity gate: the ref run repeats the parent's exact
        # (program, operands) pairs seconds later (same corpus seed; the
        # AOT cache reproduces the executable), and the tunnel's replay
        # cache can serve them WITHOUT executing — measured 299-617
        # "GB/s" for a commit whose direct worktree runs landed 110-160
        # in the same hour.  A ref number far above both the prior
        # canonical and HEAD is that artifact, not a golden window: wait
        # out the cache and re-run once; if it persists, record the row
        # as suspect rather than let a fake A/B decide the verdict.
        implausible = lambda rv_gbs, old, new: (
            rv_gbs is not None and rv_gbs > 1.6 * max(old, new)
        )
        if any(
            implausible(
                (refres.get(a, {}).get("bytes_per_s_per_chip") or 0) / 1e9,
                o, n_,
            )
            for a, o, n_ in moved
        ):
            print("  drift sentinel: ref numbers look replay-inflated; "
                  "draining 30s and re-running once", file=sys.stderr)
            time.sleep(30)
            refres2, _ = run_ref()
            if refres2 is not None:
                refres = refres2
        for algo, old, new in moved:
            rv = refres.get(algo, {}).get("bytes_per_s_per_chip")
            if rv is None:
                # The reference run produced no number for the very algo
                # under investigation — record it loudly instead of
                # emitting an empty-looking A/B (the unflagged-drift
                # ambiguity this sentinel exists to close).
                out["rows"].append({
                    "algo": algo, "prior_canonical_gbs": old,
                    "head_gbs": round(new, 2),
                    "ref_commit_same_window_gbs": None,
                    "verdict": "ref_run_missing_algo",
                })
                print(f"  drift A/B {algo}: reference run returned no "
                      "result for this algorithm", file=sys.stderr)
                continue
            rv /= 1e9
            # Same-window parity between commits => the move is the box;
            # the ref commit reproducing its own old number => code.
            # A ref number still far above both prior and HEAD after the
            # drain-and-retry is the replay artifact — flag, don't judge.
            verdict = ("ref_run_suspect" if implausible(rv, old, new)
                       else drift_verdict(new, rv))
            out["rows"].append({
                "algo": algo, "prior_canonical_gbs": old,
                "head_gbs": round(new, 2),
                "ref_commit_same_window_gbs": round(rv, 2),
                "verdict": verdict,
            })
            print(f"  drift A/B {algo}: prior {old:.1f}, HEAD {new:.1f}, "
                  f"{commit[:7]} same-window {rv:.1f} -> {verdict}",
                  file=sys.stderr)
    except Exception as e:  # sentinel must not fail the official run
        out["error"] = repr(e)[:500]
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       cwd=root, capture_output=True, timeout=60)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=256, help="corpus size in MiB")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--passes", type=int, default=3,
                    help="timing passes; best pass median wins (shared-box noise)")
    ap.add_argument("--algos", default="naive,rabin_karp,kmp,boyer_moore")
    ap.add_argument("--corpus", default="english")
    ap.add_argument("--pattern", default="quick brown fox ")
    ap.add_argument("--headline", default="boyer_moore")
    ap.add_argument("--emission", default=None, choices=["sparse", "nib"],
                    help="override MatchConfig.emission for A/B timing")
    ap.add_argument("--bm-probes", default=None,
                    choices=["table_gs", "table_gs1", "table", "table_dyn",
                             "static"],
                    help="override MatchConfig.bm_probes for A/B timing")
    ap.add_argument("--detail-out", default="BENCH_DETAIL.json")
    ap.add_argument("--no-drift", action="store_true",
                    help="skip the drift sentinel (set on its own re-runs)")
    args = ap.parse_args()

    import jax

    # Kernel compiles over the axon tunnel take minutes; the persistent
    # cache makes repeated bench runs (same shapes) start in seconds.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.config import (
        MatchConfig,
    )
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.io import (
        GENERATORS,
        pad_to_multiple,
    )

    n = args.mb * (1 << 20)
    print(f"generating {args.mb} MiB {args.corpus} corpus ...", file=sys.stderr)
    text = GENERATORS[args.corpus](n, seed=42)
    # Tile-multiple padding (2 MiB covers both the 512 KiB SWAR and 2 MiB
    # sub-chunk-serial tiles): the kernel then owns ~everything and the jnp
    # tail shrinks to the last m-1 bytes.
    text_np = pad_to_multiple(np.frombuffer(text, dtype=np.uint8), 2 << 20)
    pattern = args.pattern.encode()
    cfg = MatchConfig()
    if args.emission:
        cfg = cfg.replace(emission=args.emission)
    if args.bm_probes:
        cfg = cfg.replace(bm_probes=args.bm_probes)
    dev = jax.devices()[0]
    print(f"device: {dev.platform} / {dev.device_kind}", file=sys.stderr)

    TARGET = 10e9  # BM ≥ 10 GB/s/chip, BASELINE.json:5
    results = {}
    for algo in args.algos.split(","):
        r = bench_algo(algo, text_np, n, pattern, args.iters, cfg,
                       passes=args.passes)
        results[algo] = r
        print(
            f"  {algo:12s} {r['bytes_per_s_per_chip'] / 1e9:8.2f} GB/s/chip  "
            f"(best-of-{args.passes} batch-summed passes x {args.iters}, "
            f"{r['wall_s'] * 1e3:.1f} ms, "
            f"count={r['match_count']}, compile {r['compile_s']:.1f}s)",
            file=sys.stderr,
        )

    _dump_detail(args.detail_out, dev, results)

    # The shared box drifts between ~1x and ~5x device-time states on a
    # minutes scale (measured; buffer re-placement does not change it).
    # Algorithms that landed far off the speed-of-light floor get one
    # re-measurement in this later temporal window; keep the better.
    retry = [a for a, r in results.items()
             if r["wall_s"] > 3 * (r["n_bytes"] / 850e9)]
    if retry:
        print(f"far from SOL floor, retry window: {retry}", file=sys.stderr)
        for algo in retry:
            r2 = bench_algo(algo, text_np, n, pattern, args.iters, cfg,
                            passes=args.passes)
            if r2["wall_s"] < results[algo]["wall_s"]:
                results[algo] = r2
                print(
                    f"  {algo}: retry kept "
                    f"{r2['bytes_per_s_per_chip']/1e9:.2f} GB/s",
                    file=sys.stderr,
                )
        _dump_detail(args.detail_out, dev, results)

    import os as _os

    extra = None
    if not args.no_drift and not _os.environ.get("TPUMATCH_NO_DRIFT"):
        argv_base = ["--mb", str(args.mb), "--iters", str(args.iters),
                     "--passes", str(args.passes), "--corpus", args.corpus,
                     "--pattern", args.pattern]
        dc = drift_check(results, argv_base,
                         root=_os.path.dirname(_os.path.abspath(__file__)))
        if dc:
            extra = {"drift_check": dc}
            _dump_detail(args.detail_out, dev, results, extra)
    head = results.get(args.headline) or results[args.algos.split(",")[-1]]
    line = {
        "metric": f"{args.headline} bytes/s/chip ({args.corpus} "
        f"{args.mb}MiB, m={len(pattern)})",
        "value": round(head["bytes_per_s_per_chip"], 1),
        "unit": "bytes/s/chip",
        "vs_baseline": round(head["bytes_per_s_per_chip"] / TARGET, 4),
    }
    if head.get("timing_suspect"):
        line["timing_suspect"] = True
    print(json.dumps(line))


if __name__ == "__main__":
    main()
