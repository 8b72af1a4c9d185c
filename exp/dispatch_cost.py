#!/usr/bin/env python
"""Micro-measurement: what does a lax.cond / lax.switch layer cost inside
one TPU executable at realistic operand sizes?

Round-5 observed that adding tier/guard conds erased larger component
gains (exp/recon_compact.py); this isolates the per-layer cost: same
compute (sum of a (32768, 128) plane + a 65536-key sort), wrapped in
0 / 1 / 2 / 3 nested cond layers whose predicates are data-dependent
scalars (not constant-foldable).
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ITERS = 16
PASSES = 4
nul = jax.jit(lambda x: x + 1)


def timed(fn, *args):
    jax.block_until_ready(fn(jnp.int32(1), *args))
    best = None
    for _ in range(PASSES):
        int(nul(jnp.int32(0)))
        t0 = time.perf_counter()
        s = None
        for i in range(ITERS):
            o = fn(jnp.int32(1 + (i & 1)), *args)
            s = o if s is None else s + o
        int(s)
        w = (time.perf_counter() - t0) / ITERS
        best = w if best is None else min(best, w)
    return best


def work(x):
    srt = jax.lax.sort(x.reshape(-1)[:65536])
    return jnp.sum(x, dtype=jnp.int32) + srt[0]


def wrap(n_layers):
    def fn(p, x):
        def body(_):
            return work(x)

        out = body
        for _ in range(n_layers):
            prev = out
            out = (lambda prev: lambda _: jax.lax.cond(
                p > 0, prev, lambda __: jnp.int32(0), operand=None
            ))(prev)
        return out(None)

    return jax.jit(fn)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} / {dev.device_kind}", flush=True)
    x = jax.device_put(
        jnp.asarray(np.random.default_rng(0).integers(
            0, 15, size=(32768, 128), dtype=np.int32))
    )
    base = None
    for layers in (0, 1, 2, 3):
        w = timed(wrap(layers), x)
        d = "" if base is None else f"  (+{1e3*(w-base):.3f} ms vs 0)"
        if base is None:
            base = w
        print(f"{layers} cond layers: {w*1e3:7.3f} ms{d}", flush=True)


if __name__ == "__main__":
    main()
