#!/usr/bin/env python
"""Incremental fused variants of the screened sparse reconstruction.

R0: bs>0 + nblk                  (prepass)
R1: R0 + gids rank-select
R2: R1 + window row gather
R3: R2 + window compare + c_sm
R4: full bsums_to_matches_screened (fixed tier, no switch)
R5: full with the real tier switch
Differences between consecutive rows = cost of the added stage, free of
per-dispatch tunnel overhead.
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
from parallel_implementation_of_string_matching_algorithms_opencl_tpu.models.registry import get_matcher
from parallel_implementation_of_string_matching_algorithms_opencl_tpu.ops import emit
from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.config import MatchConfig
from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.io import GENERATORS, pad_to_multiple

ITERS = 16
nul = jax.jit(lambda x: x + 1)


def timed_chain(fn, n, *args, passes=4):
    x = jnp.int32(n)
    jax.block_until_ready(fn(x, *args))
    best = None
    for _ in range(passes):
        x = jnp.int32(n)
        int(nul(jnp.int32(0)))
        t0 = time.perf_counter()
        int(nul(jnp.int32(1)))
        rtt = time.perf_counter() - t0
        t0 = time.perf_counter()
        for it in range(ITERS):
            o = fn(x, *args)
            head = o[0] if isinstance(o, tuple) else o
            x = jnp.int32(n) - (head.reshape(-1)[0].astype(jnp.int32) & 1)
        jax.block_until_ready(x)
        per = (time.perf_counter() - t0 - rtt) / ITERS
        best = per if best is None else min(best, per)
    return best


def main():
    n = 256 << 20
    m = 16
    pattern = b"quick brown fox "
    text = GENERATORS["english"](n, seed=42)
    text_np = pad_to_multiple(np.frombuffer(text, dtype=np.uint8), 1024)
    cfg = MatchConfig()
    matcher = get_matcher("boyer_moore")(pattern, cfg)
    cfg = matcher.config
    td = jax.device_put(jnp.asarray(text_np))
    wd = jax.device_put(jnp.asarray(text_np.view(np.int32)))
    tabd = jax.tree.map(lambda a: jax.device_put(jnp.asarray(a)), matcher.tables)
    pd = jax.device_put(jnp.asarray(matcher.pattern_arr))

    bs = jax.jit(lambda nn, t, w: swar.screened_nib(
        t, nn, tabd["swar_p"], m, chunk_bytes=cfg.pallas_chunk_bytes,
        words=w, static_probes=cfg.bm_probe_layout,
        emit_nib=False, screen_only=True)[1])(jnp.int32(n), td, wd)
    bs = jax.device_put(bs)
    nb = bs.shape[0]
    L = emit.BLOCK_BYTES
    row_len = L + m - 1
    cut = (n // (128 * 4096)) * (128 * 4096) - (m - 1)
    limit = jnp.int32(min(n - m, cut - 1))
    cap_b = 8192

    def r0(nn, bs_, t):
        blk = bs_ > 0
        return jnp.sum(blk, dtype=jnp.int32),

    def r1(nn, bs_, t):
        blk = bs_ > 0
        gids = emit.masked_positions(blk, cap_b, fill=nb)
        return jnp.sum(gids),

    def r2(nn, bs_, t):
        blk = bs_ > 0
        rows = t[: nb * L].reshape(nb, L)
        gids, win, vmask = emit._gather_candidate_windows(
            blk, rows, cap_b, nb, row_len, limit)
        return jnp.sum(win.astype(jnp.int32)),

    def r3(nn, bs_, t):
        blk = bs_ > 0
        rows = t[: nb * L].reshape(nb, L)
        gids, win, vmask = emit._gather_candidate_windows(
            blk, rows, cap_b, nb, row_len, limit)
        sm = emit.window_start_mask(win, pd) & vmask
        return jnp.sum(sm, dtype=jnp.int32),

    def r4(nn, bs_, t):
        blk = bs_ > 0
        rows = t[: nb * L].reshape(nb, L)
        gids, win, vmask = emit._gather_candidate_windows(
            blk, rows, cap_b, nb, row_len, limit)
        sm = emit.window_start_mask(win, pd) & vmask
        c_sm = jnp.sum(sm, dtype=jnp.int32)
        off = emit._flat_ranks_to_offsets(sm, c_sm, gids, cap_b, cfg.capacity)
        return c_sm, off

    def r5(nn, bs_, t):
        limit_k = jnp.minimum(nn - m, jnp.int32(cut - 1))
        return emit.bsums_to_matches_screened(bs_, t, pd, limit_k, cfg.capacity)

    prev = 0.0
    for name, fn in [("R0 prepass", r0), ("R1 +gids", r1),
                     ("R2 +wingather", r2), ("R3 +compare", r3),
                     ("R4 +offsets", r4), ("R5 full tiered", r5)]:
        tm = timed_chain(jax.jit(fn), n, bs, td)
        print(f"{name:16s} {tm*1e3:7.2f} ms   (delta {max(0, tm-prev)*1e3:6.2f})", flush=True)
        prev = tm


if __name__ == "__main__":
    main()
