#!/usr/bin/env python
"""Per-collective cost microbench for the distributed match step
(round-2 VERDICT next #6: back the >=90% scaling budget with measured
collective costs at realistic shard shapes).

Method: shard_map bodies that isolate ONE collective each — the halo
``ppermute`` (m-1 bytes word-aligned), the count ``psum`` (4 B), and the
capacity-sized offset ``all_gather`` — are timed against an identical
no-collective body on the forced-8-device CPU mesh; the difference is the
collective's end-to-end cost in the XLA runtime.  CPU-mesh microseconds do
NOT transfer to ICI, so each row also carries the ANALYTIC bytes-moved and
its projected wall on v5e links (ICI ~45 GB/s/link bidirectional ring,
DCN ~6.25 GB/s/host guideline), which is what the ARCHITECTURE.md budget
quotes.  Appends rows to BENCH_COLLECTIVES.json.

Usage: python bench/collectives.py [--shard-mb 256] [--capacity 65536]
"""

from __future__ import annotations

import argparse
import json
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import sys
import time

ICI_GBPS = 45e9   # v5e per-link ICI, one direction, order-of-magnitude
DCN_GBPS = 6.25e9  # per-host DCN guideline (50 Gb/s)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shard-mb", type=int, default=256)
    ap.add_argument("--capacity", type=int, default=65536)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--bucket", type=int, default=1024,
                    help="count-sized gather width (config-1 realistic: "
                         "976 matches at 256 MiB english m=16 -> 1024)")
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.parallel.dist import (  # noqa: E501
        _assemble_halo,
    )
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.parallel.mesh import (  # noqa: E501
        DATA_AXIS,
        make_data_mesh,
    )

    D = args.devices
    mesh = make_data_mesh(D)
    shard = args.shard_mb << 20
    halo = args.m - 1
    halo_b = -(-halo // 4) * 4
    cap = args.capacity
    rng = np.random.default_rng(0)
    text = rng.integers(0, 256, size=D * shard, dtype=np.uint8)
    sh = NamedSharding(mesh, P(DATA_AXIS))
    text_dev = jax.device_put(jnp.asarray(text), sh)
    words_dev = jax.device_put(jnp.asarray(text.view(np.int32)), sh)
    offs_dev = jax.device_put(
        jnp.tile(jnp.arange(cap, dtype=jnp.int32), D).reshape(D * cap), sh
    )

    def timed(fn, *xs):
        f = jax.jit(fn)
        jax.block_until_ready(f(*xs))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(*xs)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.iters

    def mk(body):
        return shard_map(body, mesh=mesh,
                         in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
                         out_specs=P(), check_vma=False)

    # baseline: touch the shard, no collective
    def base_body(t, w, o):
        return jnp.sum(w[:16].astype(jnp.int32)) + o[0]

    # halo ppermute (the _assemble_halo used by every distributed match)
    def halo_body(t, w, o):
        ext, ext_w = _assemble_halo(t, w, halo, D, DATA_AXIS)
        return ext_w[-1] + jnp.sum(w[:16].astype(jnp.int32)) + o[0]

    # psum of the per-shard count scalar
    def psum_body(t, w, o):
        c = jnp.sum(w[:16].astype(jnp.int32))
        return jax.lax.psum(c, DATA_AXIS) + o[0]

    # fixed-capacity offset all_gather
    def ag_body(t, w, o):
        g = jax.lax.all_gather(o, DATA_AXIS)  # (D, cap)
        return g[0, 0] + jnp.sum(w[:16].astype(jnp.int32))

    # count-sized two-phase merge (dist_gather='count_sized', the round-4
    # default): phase A reduces scalars only (psum count + pmax of the
    # per-shard valid-entry count); phase B gathers bucket-sized buffers.
    # Measured here as the production structure — two separate jitted
    # dispatches — so the extra dispatch round-trip is IN the number.
    bucket = args.bucket

    def stats_body(t, w, o):
        c = jnp.sum(w[:16].astype(jnp.int32))
        return (jax.lax.psum(c, DATA_AXIS),
                jax.lax.pmax(jnp.minimum(c, cap), DATA_AXIS),
                o)

    stats_fn = jax.jit(shard_map(
        stats_body, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), P(), P(DATA_AXIS)), check_vma=False))

    def bucket_body(o):
        return jax.lax.all_gather(o[:bucket], DATA_AXIS)

    bucket_fn = jax.jit(shard_map(
        bucket_body, mesh=mesh, in_specs=(P(DATA_AXIS),),
        out_specs=P(), check_vma=False))

    def two_phase(t, w, o):
        c, mx, osh = stats_fn(t, w, o)
        int(mx)  # host sync: the bucket choice needs the pmax value
        return bucket_fn(osh)

    def timed_py(fn, *xs):
        jax.block_until_ready(fn(*xs))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*xs)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.iters

    t_base = timed(mk(base_body), text_dev, words_dev, offs_dev)
    rows = []
    for name, body, bytes_moved in (
        ("halo_ppermute", halo_body, halo_b),             # per link
        ("count_psum", psum_body, 4 * (D - 1)),           # ring reduce
        ("offsets_all_gather", ag_body, 4 * cap * (D - 1)),  # per device
    ):
        t = timed(mk(body), text_dev, words_dev, offs_dev)
        dt = max(t - t_base, 0.0)
        rows.append({
            "collective": name,
            "devices": D,
            "shard_bytes": shard,
            "m": args.m,
            "capacity": cap,
            "bytes_moved_per_device": bytes_moved,
            "cpu_mesh_cost_s": dt,
            "ici_projection_s": bytes_moved / ICI_GBPS,
            "dcn_projection_s": bytes_moved / DCN_GBPS,
            "mode": "cpu-mesh-codepath-only",
        })
        print(json.dumps(rows[-1]), flush=True)

    t_tp = timed_py(two_phase, text_dev, words_dev, offs_dev)
    tp_bytes = 4 * bucket * (D - 1) + 4 * D  # bucket gather + scalar ring
    rows.append({
        "collective": "offsets_gather_count_sized",
        "devices": D,
        "shard_bytes": shard,
        "m": args.m,
        "capacity": cap,
        "bucket": bucket,
        "bytes_moved_per_device": tp_bytes,
        "cpu_mesh_cost_s": max(t_tp - t_base, 0.0),
        "ici_projection_s": tp_bytes / ICI_GBPS,
        "dcn_projection_s": tp_bytes / DCN_GBPS,
        "extra_dispatch": True,
        "mode": "cpu-mesh-codepath-only",
    })
    print(json.dumps(rows[-1]), flush=True)

    # context: the single-chip scan wall these costs amortize against
    # (BM 256 MiB ~2.0-2.6 ms measured on v5e this round)
    scan_s = 2.3e-3 * (shard / (256 << 20))
    fixed = [r for r in rows if r["collective"] != "offsets_gather_count_sized"]
    sized = [r for r in rows if r["collective"] != "offsets_all_gather"]
    summary = {
        "collective": "budget_summary",
        "devices": D,
        "shard_bytes": shard,
        "bucket": bucket,
        "scan_wall_s_v5e": scan_s,
        "ici_fraction_of_scan": sum(
            r["ici_projection_s"] for r in fixed) / scan_s,
        "dcn_fraction_of_scan": sum(
            r["dcn_projection_s"] for r in fixed) / scan_s,
        "ici_fraction_count_sized": sum(
            r["ici_projection_s"] for r in sized) / scan_s,
        "dcn_fraction_count_sized": sum(
            r["dcn_projection_s"] for r in sized) / scan_s,
        "mode": "analytic+cpu-mesh",
    }
    rows.append(summary)
    print(json.dumps(summary), flush=True)
    with open("BENCH_COLLECTIVES.json", "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"baseline body: {t_base*1e3:.2f} ms on the CPU mesh",
          file=sys.stderr)


if __name__ == "__main__":
    main()
