#!/usr/bin/env python
"""Sub-stage timing of bsums_to_matches_screened at a fixed tier."""
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


def timed_chain(fn, n, *args, passes=3):
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

    for cap_b in (1024, 2048, 8192):
        print(f"--- tier cap_b={cap_b} (nb={nb}) ---", flush=True)

        # S1: blk + gids rank-select over nb blocks
        def s1(nn, bs_):
            blk = bs_ > 0
            gids = emit.masked_positions(blk, cap_b, fill=nb)
            return gids[0], gids

        t1 = timed_chain(jax.jit(s1), n, bs)
        _, gids = jax.jit(s1)(jnp.int32(n), bs)
        gids = jax.device_put(gids)
        print(f"S1 gids rank-select:    {t1*1e3:7.2f} ms", flush=True)

        # S2: window row gather
        def s2(nn, gids_, t):
            rows = t[: nb * L].reshape(nb, L)
            gc = jnp.clip(gids_, 0, nb - 1)
            win = jnp.concatenate(
                [jnp.take(rows, gc, axis=0),
                 jnp.take(rows, jnp.clip(gc + 1, 0, nb - 1), axis=0)],
                axis=1)[:, :row_len]
            return win.reshape(-1)[0].astype(jnp.int32), win

        t2 = timed_chain(jax.jit(s2), n, gids, td)
        _, win = jax.jit(s2)(jnp.int32(n), gids, td)
        win = jax.device_put(win)
        print(f"S2 window gather:       {t2*1e3:7.2f} ms", flush=True)

        # S3: window compare + vmask
        def s3(nn, win_, gids_):
            gpos = (gids_ * L)[:, None] + jnp.arange(L, dtype=jnp.int32)[None, :]
            vmask = (gpos <= limit) & (gids_ < nb)[:, None]
            sm = emit.window_start_mask(win_, pd) & vmask
            return jnp.sum(sm, dtype=jnp.int32), sm

        t3 = timed_chain(jax.jit(s3), n, win, gids)
        c_sm, sm = jax.jit(s3)(jnp.int32(n), win, gids)
        sm = jax.device_put(sm)
        print(f"S3 window compare:      {t3*1e3:7.2f} ms  count={int(c_sm)}", flush=True)

        # S4: flat rank select -> offsets
        def s4(nn, sm_, gids_):
            c = jnp.sum(sm_, dtype=jnp.int32)
            return emit._flat_ranks_to_offsets(sm_, c, gids_, cap_b, cfg.capacity)

        t4 = timed_chain(jax.jit(s4), n, sm, gids)
        print(f"S4 flat ranks->offsets: {t4*1e3:7.2f} ms", flush=True)
        print(f"   total {((t1+t2+t3+t4))*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
