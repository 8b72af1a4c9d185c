#!/usr/bin/env python
"""Minimal check: lax.switch branches that only ROW-GATHER from a big
UNRESHAPED operand — does XLA insert big copies / temp blowup?"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ITERS = 8
nul = jax.jit(lambda x: x + 1)


def timed_chain(fn, *args, passes=3):
    o = fn(jnp.int32(0), *args)
    jax.block_until_ready(o)
    best = None
    for _ in range(passes):
        x = jnp.int32(0)
        int(nul(jnp.int32(0)))
        t0 = time.perf_counter()
        int(nul(jnp.int32(1)))
        rtt = time.perf_counter() - t0
        t0 = time.perf_counter()
        for it in range(ITERS):
            o = fn(x, *args)
            head = o[0] if isinstance(o, tuple) else o
            x = (head.reshape(-1)[0].astype(jnp.int32) & 1)
        jax.block_until_ready(x)
        per = (time.perf_counter() - t0 - rtt) / ITERS
        best = per if best is None else min(best, per)
    return best


def main():
    rng = np.random.default_rng(0)
    R = 1 << 16  # (65536, 1024) int32 = 256 MiB
    x2d = jax.device_put(jnp.asarray(
        rng.integers(0, 1 << 30, size=(R, 1024), dtype=np.int32)))
    gids = jax.device_put(jnp.asarray(
        np.sort(rng.integers(0, R, size=8192, dtype=np.int32))))

    def branch(cap):
        def f(x, w, g):
            rows = w[jnp.clip(g[:cap] + x, 0, R - 1)]
            return jnp.sum(rows, dtype=jnp.int32)
        return f

    def nocond(x, w, g):
        return branch(8192)(x, w, g)

    def withswitch(x, w, g):
        b = (x % 3).astype(jnp.int32)
        return jax.lax.switch(
            b, [lambda w=w, g=g, c=c: branch(c)(jnp.int32(0), w, g)
                for c in (1024, 4096, 8192)])

    for name, fn in (("no-cond row gather", nocond),
                     ("switch(3) row gather", withswitch)):
        j = jax.jit(fn)
        comp = j.lower(jnp.int32(0), x2d, gids).compile()
        ma = comp.memory_analysis()
        t = timed_chain(j, x2d, gids)
        print(f"{name}: {t*1e3:7.2f} ms  temp={ma.temp_size_in_bytes/1e6:.1f}MB "
              f"peak={ma.peak_memory_in_bytes/1e6:.1f}MB", flush=True)


if __name__ == "__main__":
    main()
