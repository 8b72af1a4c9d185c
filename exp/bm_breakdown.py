#!/usr/bin/env python
"""Experiment: component breakdown of the BM e2e pipeline on TPU.

Timing method: CHAINED pipeline — each call's scalar operand depends on the
previous call's output, so the tunnel can neither replay from cache nor
lazily elide; one sync at the end, per-call = (total - null_rtt) / iters.
This resolves sub-ms component times that per-call RTT subtraction cannot
(null RTT jitter is +-1 ms).
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
from parallel_implementation_of_string_matching_algorithms_opencl_tpu.ops import reconstruct
from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.config import MatchConfig
from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.io import GENERATORS, pad_to_multiple

ITERS = 16
PASSES = 3

nul = jax.jit(lambda x: x + 1)


def timed_chain(fn, n, *args):
    """fn(chain_scalar, *args) -> output with a [0]-indexable scalar head.
    Chains fn's scalar output into the next call's scalar input."""
    x = jnp.int32(n)
    jax.block_until_ready(fn(x, *args))  # compile
    best = None
    for _ in range(PASSES):
        x = jnp.int32(n)
        int(nul(jnp.int32(0)))  # flush
        t0 = time.perf_counter()
        rtt0 = time.perf_counter()
        int(nul(jnp.int32(1)))
        rtt = time.perf_counter() - rtt0
        t0 = time.perf_counter()
        for it in range(ITERS):
            o = fn(x, *args)
            head = o[0] if isinstance(o, tuple) else o
            x = jnp.int32(n) - (head.reshape(-1)[0].astype(jnp.int32) & 1)
        jax.block_until_ready(x)
        tot = time.perf_counter() - t0 - rtt
        per = tot / ITERS
        best = per if best is None else min(best, per)
    return best


def breakdown(corpus, mb, pattern, seed=42):
    n = mb << 20
    print(f"=== {corpus} {mb} MiB, m={len(pattern)} ===", flush=True)
    text = GENERATORS[corpus](n, seed=seed)
    text_np = pad_to_multiple(np.frombuffer(text, dtype=np.uint8), 1024)
    cfg = MatchConfig()
    matcher = get_matcher("boyer_moore")(pattern, cfg)
    cfg = matcher.config
    runner = matcher._runner(cfg)
    td = jax.device_put(jnp.asarray(text_np))
    wd = jax.device_put(jnp.asarray(text_np.view(np.int32)))
    pd = jax.device_put(jnp.asarray(matcher.pattern_arr))
    tabd = jax.tree.map(lambda a: jax.device_put(jnp.asarray(a)), matcher.tables)

    m = len(pattern)

    # A. kernel only (chain on bs sum parity)
    def kern(nn, t, w):
        _, bs, cut = swar.screened_nib(
            t, nn, tabd["swar_p"], m, chunk_bytes=cfg.pallas_chunk_bytes,
            words=w, static_probes=cfg.bm_probe_layout,
            emit_nib=False, screen_only=True)
        return jnp.sum(bs), bs

    tk = timed_chain(jax.jit(kern), n, td, wd)
    _, bs = jax.jit(kern)(jnp.int32(n), td, wd)
    bs = jax.device_put(bs)
    nblk = int(jnp.sum(bs > 0))
    ncand = int(jnp.sum(bs))
    print(f"A kernel-only: {tk*1e3:7.2f} ms  ({n/tk/1e9:6.1f} GB/s)  cand={ncand} cand_blocks={nblk}", flush=True)

    # B. reconstruction only (round-5 API: word-space extract_region)
    cut = (n // (128 * 4096)) * (128 * 4096) - (m - 1)
    x2d = reconstruct.full_words2d(td, wd)

    def recon(nn, bs_, t, w):
        limit_k = jnp.minimum(nn - m, cut - 1)
        return reconstruct.extract_region(
            bs_, w, t, nn, tabd["swar_p"], m, limit_k, cfg.capacity, cfg)

    tr = timed_chain(jax.jit(recon), n, bs, td, x2d)
    out = jax.jit(recon)(jnp.int32(n), bs, td, x2d)
    print(f"B recon-only:  {tr*1e3:7.2f} ms  count={int(out[0])}", flush=True)

    # C. e2e
    def e2e(nn, t, w):
        return runner(t, w, nn, pd, tabd)

    te = timed_chain(e2e, n, td, wd)
    out = e2e(jnp.int32(n), td, wd)
    print(f"C e2e:         {te*1e3:7.2f} ms  ({n/te/1e9:6.1f} GB/s) count={int(out[0])}", flush=True)
    print(f"D residual (C-A-B): {(te-tk-tr)*1e3:7.2f} ms", flush=True)
    return dict(kernel=tk, recon=tr, e2e=te, cand=ncand, cand_blocks=nblk)


if __name__ == "__main__":
    dev = jax.devices()[0]
    print(f"device: {dev.platform} / {dev.device_kind}")
    breakdown("english", 256, b"quick brown fox ")
    dna = GENERATORS["dna"](1 << 20, seed=4)
    breakdown("dna", 100, dna[1000:1024])
