#!/usr/bin/env python
"""Experiment: single-pattern extract_region cost at the BM headline
profile (256 MiB english, m=16, ~2.8k candidate chunks, 976 matches).

With the round-5 lite screen kernel at ~1.8 ms, the wide-tier
reconstruction (~2.2 ms) dominates BM e2e.  Its cost is dense_extract's
fixed machinery over cg*8 = 32768 rows: slot decode + a 262k+262k-key
sort, paid regardless of how few rows hold matches (~976 here).

Variants (all chained-timed, same window):
  R0  shipped extract_region (wide tier, cap_g=4096)
  R1  compact-then-extract: after the chunk verify, rank-select the
      match-bearing 512B block rows (budget 2*cg... here 8192) and run
      dense_extract on the compacted plane; lax.cond escalates to the
      full-width plane when the match-row count exceeds the budget
  R2  R1 without the guard cond (lower bound for dispatch cost)
  SW  cost of a bare lax.cond pass-through at this operand size
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from parallel_implementation_of_string_matching_algorithms_opencl_tpu.kernels import swar
from parallel_implementation_of_string_matching_algorithms_opencl_tpu.ops import extract, reconstruct
from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.config import MatchConfig
from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.io import GENERATORS, pad_to_multiple

ITERS = 16
PASSES = 4
nul = jax.jit(lambda x: x + 1)


def timed_chain(fn, n, *args):
    x = jnp.int32(n)
    jax.block_until_ready(fn(x, *args))
    best = None
    for _ in range(PASSES):
        x = jnp.int32(n)
        int(nul(jnp.int32(0)))
        rtt0 = time.perf_counter()
        int(nul(jnp.int32(1)))
        rtt = time.perf_counter() - rtt0
        t0 = time.perf_counter()
        for _ in range(ITERS):
            o = fn(x, *args)
            head = o[0] if isinstance(o, tuple) else o
            x = jnp.int32(n) - (head.reshape(-1)[0].astype(jnp.int32) & 1)
        jax.block_until_ready(x)
        best = min(best, (time.perf_counter() - t0 - rtt) / ITERS) \
            if best else (time.perf_counter() - t0 - rtt) / ITERS
    return best


def compact_extract(bs, x2d, text, nn, P, m, limit, capacity, cfg,
                    guard: bool):
    """R1/R2: the sparse wide tier with post-verify row compaction."""
    Mnp = swar.mask_words(m)
    M = jnp.asarray(Mnp)
    Lr = bs.shape[0] // 8
    chunkc = jnp.sum(bs.reshape(Lr, 8), axis=1)
    cg = 4096
    budget = 2 * cg

    gids = extract.sorted_nonzero_ids(chunkc, cg, fill=Lr)
    nib = reconstruct._verify_chunks(x2d, gids, P, M, Mnp, limit)
    c_sm = jnp.sum(extract._popcount4(nib), dtype=jnp.int32)
    rows2 = nib.reshape(cg * 8, 128)
    rc2 = jnp.sum(extract._popcount4(rows2), axis=1)
    base2 = (
        gids[:, None] * 4096
        + 512 * jnp.arange(8, dtype=jnp.int32)[None, :]
    ).reshape(-1)
    nmr = jnp.sum(rc2 > 0, dtype=jnp.int32)

    def fast(_):
        ids = extract.sorted_nonzero_ids(
            (rc2 > 0).astype(jnp.int32), budget, cg * 8
        )
        idc = jnp.clip(ids, 0, cg * 8 - 1)
        live = (ids < cg * 8)
        rows_c = jnp.where(live[:, None], rows2[idc], 0)
        rc_c = jnp.where(live, rc2[idc], 0)
        base_c = jnp.where(live, base2[idc], 0)
        return extract.dense_extract(
            rows_c, rc_c, base_c, capacity, overflow_rows=256
        )

    def slow(_):
        return extract.dense_extract(
            rows2, rc2, base2, capacity, overflow_rows=512
        )

    if guard:
        offs, ok = jax.lax.cond(nmr <= budget, fast, slow, operand=None)
    else:
        offs, ok = fast(None)
    offs = jnp.where(ok, offs, jnp.int32(extract.FILL))
    return c_sm, offs, ok


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} / {dev.device_kind}", flush=True)
    n = 256 << 20
    text = GENERATORS["english"](n, seed=42)
    text_np = pad_to_multiple(np.frombuffer(text, dtype=np.uint8), 4096)
    pattern = np.frombuffer(b"quick brown fox ", np.uint8)
    m = len(pattern)
    P, _ = swar.pattern_words(pattern)
    cfg = MatchConfig()
    td = jax.device_put(jnp.asarray(text_np))
    wd = jax.device_put(jnp.asarray(text_np.view(np.int32).reshape(-1, 1024)))
    Pd = jax.device_put(jnp.asarray(P))
    pr = swar.probe_table(pattern, use_gs=True)
    probes = swar.static_probes_from_table(pr)

    def kern(nn, t, w):
        _, bs, cut = swar.screened_nib(
            t, nn, Pd, m, words=w, static_probes=probes,
            emit_nib=False, screen_only=True)
        return bs, cut

    bs, cut = jax.jit(kern)(jnp.int32(n), td, wd)
    bs = jax.device_put(bs)
    cut = int(cut)
    limit = min(n - m, cut - 1)

    def r0(nn, bs_, t, w):
        return reconstruct.extract_region(
            bs_, w, t, nn, Pd, m, limit, cfg.capacity, cfg)

    t0 = timed_chain(jax.jit(r0), n, bs, td, wd)
    out0 = jax.jit(r0)(jnp.int32(n), bs, td, wd)
    print(f"R0 shipped wide  : {t0*1e3:6.2f} ms  count={int(out0[0])}",
          flush=True)

    for label, guard in (("R1 compact+guard ", True), ("R2 compact noguard", False)):
        def rf(nn, bs_, t, w, guard=guard):
            return compact_extract(
                bs_, w, t, nn, Pd, m, limit, cfg.capacity, cfg, guard)

        tv = timed_chain(jax.jit(rf), n, bs, td, wd)
        outv = jax.jit(rf)(jnp.int32(n), bs, td, wd)
        o0 = np.asarray(out0[1]); ov = np.asarray(outv[1])
        same = ("exact" if int(outv[0]) == int(out0[0])
                and np.array_equal(o0, ov) else "MISMATCH")
        print(f"{label}: {tv*1e3:6.2f} ms  count={int(outv[0])}  [{same}]",
              flush=True)

    # bare cond dispatch cost at this operand size
    big = jnp.zeros((32768, 128), jnp.int32)

    def sw(nn, x):
        return jax.lax.cond(
            nn > 0, lambda _: (jnp.sum(x[0]), x), lambda _: (nn, x),
            operand=None,
        )

    tsw = timed_chain(jax.jit(sw), n, big)
    print(f"SW bare cond     : {tsw*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
