#!/usr/bin/env python
"""Scaling-efficiency bench (BASELINE.json:5: ">=90% bytes/s at 2+ hosts").

Measures distributed bytes/s on 1, 2, 4, 8-device data meshes with the
identical shard_map path used on a pod (halo ppermute + psum + all_gather).
Without a real multi-chip slice this runs on forced CPU host devices — the
collective/sharding code is what is being exercised; absolute numbers are
CPU numbers.  On a pod slice the same script reports real ICI scaling.

Usage (CPU mesh): python bench/scaling.py --mb 64
Appends rows to BENCH_SCALING.json.
"""

from __future__ import annotations

import argparse
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=64)
    ap.add_argument("--algo", default="boyer_moore",
                    help="one algorithm, or 'all' for all four")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--force-cpu-devices", type=int, default=8,
                    help="0 = use real devices")
    args = ap.parse_args()

    if args.force_cpu_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.force_cpu_devices}"
        ).strip()
    import jax

    if args.force_cpu_devices:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.parallel.dist import (
        DistributedMatcher,
    )
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.parallel.mesh import (
        make_data_mesh,
    )
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.io import (
        gen_english,
    )

    ndev = len(jax.devices())
    print(f"{ndev} devices: {jax.devices()[0].platform}", file=sys.stderr)
    n = args.mb << 20
    text = gen_english(n, seed=42)
    pat = b"quick brown fox "

    from jax.sharding import NamedSharding, PartitionSpec as P

    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.parallel.mesh import (
        DATA_AXIS,
    )
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.io import (
        pad_to_multiple,
    )
    import jax.numpy as jnp

    algos = (
        ["naive", "rabin_karp", "kmp", "boyer_moore"]
        if args.algo == "all" else [args.algo]
    )
    rows = []
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= ndev]
    for algo in algos:
        base = None
        for d in sizes:
            mesh = make_data_mesh(d)
            dm = DistributedMatcher(pat, algo=algo, mesh=mesh)
            r = dm.match(text)  # warm/compile + correctness reference
            # Time only the sharded computation: device buffers staged once
            # (matching the reference metric: in-memory scan throughput).
            padded = pad_to_multiple(
                np.frombuffer(text, np.uint8),
                (2 << 20) * d,  # tile-multiple shards (see dist.match)
            )
            sh = NamedSharding(mesh, P(DATA_AXIS))
            text_dev = jax.device_put(jnp.asarray(padded), sh)
            words_dev = jax.device_put(jnp.asarray(padded.view(np.int32)), sh)
            runner = dm._build(mesh, type(dm.matcher), dm.config, dm.m)
            pat_dev = jnp.asarray(dm.matcher.pattern_arr)
            tb_dev = jax.tree.map(jnp.asarray, dm.matcher.tables)
            jax.block_until_ready(
                runner(text_dev, words_dev, jnp.int32(n), pat_dev, tb_dev)
            )
            t0 = time.perf_counter()
            outs = [
                runner(text_dev, words_dev, jnp.int32(n - it), pat_dev,
                       tb_dev)
                for it in range(args.iters)
            ]
            jax.block_until_ready(outs[-1])
            wall = (time.perf_counter() - t0) / args.iters
            bps = n / wall
            if base is None:
                base = bps
            eff = bps / (base * d)
            row = {
                "devices": d,
                "algo": algo,
                "n_bytes": n,
                "wall_s": wall,
                "bytes_per_s": bps,
                "scaling_efficiency": eff,
                "match_count": r.count,
                "backend": jax.devices()[0].platform,
                # On forced CPU host devices the row only proves the
                # collective CODE PATH; "scaling" over one physical socket
                # is meaningless and typically anti-scales.  Real efficiency
                # numbers require a pod slice (the >=90% target,
                # BASELINE.json:5); the measured per-collective budget is
                # in BENCH_COLLECTIVES.json (bench/collectives.py).
                "mode": (
                    "cpu-mesh-codepath-only"
                    if jax.devices()[0].platform == "cpu"
                    else "real-devices"
                ),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    with open("BENCH_SCALING.json", "a") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
