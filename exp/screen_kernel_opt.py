#!/usr/bin/env python
"""Experiment: BM candidate-screen kernel cost structure (round 5).

exp/bm_breakdown.py showed the screen KERNEL is ~the whole BM e2e wall
(2.73 ms of ~2.8 ms at 256 MiB english / m=16; recon is trivial at ~2.8k
candidates).  The kernel's per-word work splits into: stage (full-tile
sublane roll for the halo), 8 probe compares + 3 ORs, nibble pack
(4 convert+shift + 3 OR), popcount block sums (7 ops + lane reduce), and
the nib scratch round trip.  Since the sparse reconstruction RE-VERIFIES
gathered chunks from the word view, screen block sums only need to
preserve WHICH blocks hold candidates — the per-alignment packing and
counts are dead work on this path.

Variants measured (256 MiB english, m=16, table_gs probes):
  V0  shipped screen_cand kernel (baseline)
  V1  narrow halo roll: roll only the first HALO_WORDS columns across
      sublanes instead of the whole (128, W) tile
  V2  V1 + lite epilogue: bs = per-block count of any-alignment candidate
      words (no nibble pack, no popcount, no nib scratch)
  V3  V2 with 256-row tiles (1 MB/tile, half the grid steps)
  V4  V2 with 512-row tiles (2 MB/tile)

Parity: every variant's nonzero-block set must equal V0's (V1 bit-exact;
V2+ equal as sets — value semantics change from per-alignment candidate
counts to any-alignment word counts, both valid supersets).
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from parallel_implementation_of_string_matching_algorithms_opencl_tpu.kernels import swar
from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.io import GENERATORS, pad_to_multiple

HALO = swar.HALO_WORDS
ITERS = 16
PASSES = 3

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
        tot = time.perf_counter() - t0 - rtt
        best = min(best, tot / ITERS) if best else tot / ITERS
    return best


# --------------------------------------------------------------------------
# Variant kernels (stand-alone pallas_calls; share swar's probe machinery)
# --------------------------------------------------------------------------


def _stage_narrow(x_ref, nxt_ref, ext_ref, W):
    """Like swar._stage_ext but rolls ONLY the halo columns."""
    xv = x_ref[:]
    R = xv.shape[0]
    ext_ref[:, :W] = xv
    hal = pltpu.roll(xv[:, :HALO], shift=R - 1, axis=0)
    ext_ref[:, W:] = hal
    ext_ref[pl.ds(R - 1, 1), W:] = nxt_ref[0:1, :]
    return ext_ref[:]


def _v1_kernel(n_ref, P_ref, M_ref, x_ref, nxt_ref, cnt_ref, bs_ref,
               ext_ref, nib_scr, *, W, C, m, Mnp, probes):
    ext = _stage_narrow(x_ref, nxt_ref, ext_ref, W)
    accs = swar._probe_accs(ext, W, P_ref, M_ref, Mnp, probes)
    nib = jnp.zeros((128, W), jnp.int32)
    for a in range(4):
        nib |= accs[a].astype(jnp.int32) << a
    nib_scr[:] = nib
    swar._epilogue(n_ref, cnt_ref, nib_scr, bs_ref, W, C, m)


def _lite_epilogue(n_ref, cnt_ref, cand, bs_ref, W, C, m, R):
    """Screen-lite block sums: cand int32[R, W] in {0,1} (any-alignment
    candidate flag per word).  Tail-tile clamp keeps word-granular
    validity (superset: a word with any valid alignment stays)."""
    i = pl.program_id(0)
    tile_last = (i + 1) * (R * C) - 1
    nlim = n_ref[0] - m

    row = jax.lax.broadcasted_iota(jnp.int32, cand.shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, cand.shape, 1)
    word_pos = (i * R + row) * C + col * 4
    cand = jnp.where(
        tile_last > nlim, jnp.where(word_pos <= nlim, cand, 0), cand
    )

    jb = W // 128
    per = jnp.sum(cand.reshape(R, jb, 128), axis=2)  # (R, jb)
    bs = per.T  # (jb, R)
    if jb < 8:
        bs = jnp.concatenate([bs, jnp.zeros((8 - jb, R), jnp.int32)], axis=0)
    bs_ref[...] = bs

    @pl.when(i == 0)
    def _():
        cnt_ref[0, 0] = 0

    cnt_ref[0, 0] += jnp.sum(bs, dtype=jnp.int32)


def _v2_kernel(n_ref, P_ref, M_ref, x_ref, nxt_ref, cnt_ref, bs_ref,
               ext_ref, *, W, C, m, Mnp, probes, R):
    xv = x_ref[:]
    ext_ref[:, :W] = xv
    hal = pltpu.roll(xv[:, :HALO], shift=R - 1, axis=0)
    ext_ref[:, W:] = hal
    ext_ref[pl.ds(R - 1, 1), W:] = nxt_ref[0:1, :]
    ext = ext_ref[:]
    accs = swar._probe_accs(ext, W, P_ref, M_ref, Mnp, probes)
    cand = ((accs[0] | accs[1]) | (accs[2] | accs[3])).astype(jnp.int32)
    _lite_epilogue(n_ref, cnt_ref, cand, bs_ref, W, C, m, R)


@functools.lru_cache(maxsize=64)
def build_variant(kind: str, Nk: int, C: int, m: int, nw: int, Mkey: bytes,
                  probes: tuple, R: int = 128):
    W = C // 4
    L = Nk // C
    nt = L // R
    Mnp = np.frombuffer(Mkey, dtype=np.int32).reshape(4, nw)
    idx = lambda i, *s: (i, 0)
    jb = max(W // 128, 8)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((R, W), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (8, HALO),
                lambda i, *s: (jnp.minimum((i + 1) * (R // 8), L // 8 - 1), 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((jb if R == 128 else W // 128, R), idx,
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=(
            [pltpu.VMEM((R, W + HALO), jnp.int32)]
            + ([pltpu.VMEM((R, W), jnp.int32)] if kind == "v1" else [])
        ),
    )
    if kind == "v1":
        kern = functools.partial(_v1_kernel, W=W, C=C, m=m, Mnp=Mnp,
                                 probes=probes)
    else:
        kern = functools.partial(_v2_kernel, W=W, C=C, m=m, Mnp=Mnp,
                                 probes=probes, R=R)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct(
                (nt * (jb if R == 128 else W // 128), R), jnp.int32
            ),
        ),
    )


def run_variant(kind, text_u8, n, P, m, words, probes, R=128):
    N = text_u8.shape[0]
    C = 4096
    tile = R * C
    Nk = (N // tile) * tile
    nw = P.shape[1]
    Mnp = swar.mask_words(m)
    x = swar.as_words2d(text_u8, words, Nk, C)
    call = build_variant(kind, Nk, C, m, nw, Mnp.tobytes(), probes, R)
    n_k = jnp.minimum(jnp.asarray(n, jnp.int32), jnp.int32(Nk))
    cnt, bs = call(n_k.reshape(1), P, jnp.asarray(Mnp), x, x)
    W = C // 4
    L = Nk // C
    nt = L // R
    jb = W // 128
    jpad = jb if R != 128 else max(jb, 8)
    bs_flat = (
        bs.reshape(nt, jpad, R)[:, :jb].transpose(0, 2, 1).reshape(-1)
    )
    return cnt, bs_flat


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} / {dev.device_kind}", flush=True)
    n = 256 << 20
    text = GENERATORS["english"](n, seed=42)
    text_np = pad_to_multiple(np.frombuffer(text, dtype=np.uint8), 1024)
    pattern = b"quick brown fox "
    m = len(pattern)
    P, M = swar.pattern_words(np.frombuffer(pattern, np.uint8))
    pr = swar.probe_table(np.frombuffer(pattern, np.uint8), use_gs=True)
    probes = swar.static_probes_from_table(pr)
    td = jax.device_put(jnp.asarray(text_np))
    wd = jax.device_put(
        jnp.asarray(text_np.view(np.int32).reshape(-1, 1024)))
    Pd = jax.device_put(jnp.asarray(P))

    # V0: shipped kernel
    def v0(nn, t, w):
        _, bs, _ = swar.screened_nib(
            t, nn, Pd, m, words=w, static_probes=probes,
            emit_nib=False, screen_only=True)
        return jnp.sum(bs), bs

    t0 = timed_chain(jax.jit(v0), n, td, wd)
    _, bs0 = jax.jit(v0)(jnp.int32(n), td, wd)
    nz0 = np.nonzero(np.asarray(bs0))[0]
    print(f"V0 shipped      : {t0*1e3:6.2f} ms  ({n/t0/1e9:6.1f} GB/s)  "
          f"cand_blocks={len(nz0)}", flush=True)

    variants = [
        ("V1 narrow-roll ", "v1", 128),
        ("V2 lite-epilog ", "v2", 128),
        ("V3 lite R=256  ", "v2", 256),
        ("V4 lite R=512  ", "v2", 512),
    ]
    for label, kind, R in variants:
        def vf(nn, t, w, kind=kind, R=R):
            cnt, bs = run_variant(kind, t, nn, Pd, m, w, probes, R)
            return cnt, bs

        try:
            tv = timed_chain(jax.jit(vf), n, td, wd)
            _, bsv = jax.jit(vf)(jnp.int32(n), td, wd)
            nzv = np.nonzero(np.asarray(bsv))[0]
            same = (
                "bit-exact" if np.array_equal(np.asarray(bsv), np.asarray(bs0))
                else ("same-set" if np.array_equal(nzv, nz0) else "MISMATCH")
            )
            print(f"{label}: {tv*1e3:6.2f} ms  ({n/tv/1e9:6.1f} GB/s)  "
                  f"cand_blocks={len(nzv)}  [{same}]", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{label}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
