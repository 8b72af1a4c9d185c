#!/usr/bin/env python
"""Primitive cost survey on TPU v5e: sort, scatter variants, gathers,
one-hot selects — to pick the dense-extraction building blocks."""
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
    print(f"device: {jax.devices()[0].device_kind}")

    for sz in (1 << 20, 4 << 20, 16 << 20):
        keys = jax.device_put(jnp.asarray(
            rng.integers(0, 1 << 30, size=sz, dtype=np.int32)))
        t = timed_chain(jax.jit(lambda x, k: jnp.sort(k + x)), keys)
        print(f"sort          {sz>>20:3d}M int32: {t*1e3:8.2f} ms "
              f"({t/sz*1e9:6.2f} ns/elem)", flush=True)

    for sz in (1 << 20, 4 << 20):
        # sort of (key, payload) pairs via 64-bit packing
        keys = jax.device_put(jnp.asarray(
            rng.integers(0, 1 << 30, size=sz, dtype=np.int32)))
        vals = jax.device_put(jnp.asarray(
            rng.integers(0, 1 << 30, size=sz, dtype=np.int32)))
        t = timed_chain(jax.jit(
            lambda x, k, v: jax.lax.sort((k + x, v), num_keys=1)[0]),
            keys, vals)
        print(f"sort pair     {sz>>20:3d}M:       {t*1e3:8.2f} ms", flush=True)

    for nup, cap in ((1 << 20, 1 << 20), (4 << 20, 1 << 20)):
        idx = np.arange(nup, dtype=np.int32)
        rng.shuffle(idx)
        idxs = jax.device_put(jnp.asarray(np.sort(idx)))  # sorted unique
        valn = jax.device_put(jnp.asarray(
            rng.integers(0, 1 << 30, size=nup, dtype=np.int32)))

        def sc(x, i, v):
            out = jnp.full((cap,), -1, jnp.int32)
            return out.at[i + x].set(v, mode="drop", unique_indices=True,
                                     indices_are_sorted=True)

        t = timed_chain(jax.jit(sc), idxs, valn)
        print(f"scatter set u {nup>>20:3d}M->1M:   {t*1e3:8.2f} ms "
              f"({t/nup*1e9:6.2f} ns/upd)", flush=True)

    # one-hot select (R,128)->(R,T) vs take_along_axis
    for R, T in ((1 << 18, 8), (1 << 15, 8)):
        rows = jax.device_put(jnp.asarray(
            rng.integers(0, 16, size=(R, 128), dtype=np.int32)))
        wi = jax.device_put(jnp.asarray(
            rng.integers(0, 128, size=(R, T), dtype=np.int32)))

        def oh(x, r, w):
            c = jnp.arange(128, dtype=jnp.int32)
            out = []
            for j in range(T):
                sel = (c[None, :] == w[:, j:j+1]).astype(jnp.int32)
                out.append(jnp.sum(r * sel, axis=1))
            return jnp.stack(out, axis=1) + x

        t = timed_chain(jax.jit(oh), rows, wi)
        print(f"onehot sel ({R>>10}k,128)->T={T}: {t*1e3:8.2f} ms", flush=True)

        t = timed_chain(jax.jit(
            lambda x, r, w: jnp.take_along_axis(r, w, axis=1) + x), rows, wi)
        print(f"take_along ({R>>10}k,128)->T={T}: {t*1e3:8.2f} ms", flush=True)

    # row gather reference: (cap,128) from (R,128)
    for R, cap in ((1 << 18, 4096), (1 << 18, 65536)):
        rows = jax.device_put(jnp.asarray(
            rng.integers(0, 16, size=(R, 128), dtype=np.int32)))
        bi = jax.device_put(jnp.asarray(
            np.sort(rng.integers(0, R, size=cap, dtype=np.int32))))
        t = timed_chain(jax.jit(lambda x, r, b: r[b + x]), rows, bi)
        print(f"row gather {cap} rows of (256k,128): {t*1e3:8.2f} ms "
              f"({t/cap*1e9:6.1f} ns/row)", flush=True)

    # cumsum along minor of (R,128)
    for R in (1 << 18,):
        rows = jax.device_put(jnp.asarray(
            rng.integers(0, 16, size=(R, 128), dtype=np.int32)))
        t = timed_chain(jax.jit(
            lambda x, r: jnp.cumsum(r + x, axis=1)), rows)
        print(f"cumsum (256k,128) axis1: {t*1e3:8.2f} ms", flush=True)
        t = timed_chain(jax.jit(lambda x, r: jnp.cumsum(
            jnp.sum(r, axis=1) + x)), rows)
        print(f"rowsum+cumsum (256k,):   {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
