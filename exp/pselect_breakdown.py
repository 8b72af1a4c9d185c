#!/usr/bin/env python
"""Incremental stage deltas of the pselect config-2 extraction (1 GB,
k=8, m=16).  Batched-sync metrology (same as bench/matrix._time_runner):
each stage jit consumes through to a scalar; delta between consecutive
stages = the added stage's cost."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/bench")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from matrix import _cap, _stage

from parallel_implementation_of_string_matching_algorithms_opencl_tpu.kernels import rk_roll, swar
from parallel_implementation_of_string_matching_algorithms_opencl_tpu.models.multi import RabinKarpMultiMatcher
from parallel_implementation_of_string_matching_algorithms_opencl_tpu.ops import extract, reconstruct, tables
from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.config import MatchConfig
from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.io import gen_english, pad_to_multiple

ITERS = 6
PASSES = 3


def timed(fn, n, *args):
    out = fn(jnp.int32(n), *args)
    jax.block_until_ready(out)
    nul = jax.jit(lambda x: x + 1)
    int(nul(jnp.int32(0)))
    best = None
    it = 0
    for _ in range(PASSES):
        t0 = time.perf_counter()
        s = None
        for _i in range(ITERS):
            it += 1
            o = fn(jnp.int32(n - 1 - (it % 1024)), *args)
            c = o if getattr(o, "ndim", 0) == 0 else o.reshape(-1)[0]
            s = c if s is None else s + c
        int(s)
        w = (time.perf_counter() - t0) / ITERS
        best = w if best is None else min(best, w)
    return best


def main():
    n = int(1e9)
    text = gen_english(n, seed=2)
    pats = [b"quick brown fox ", b"lazy dog and cat", b"parallel device ",
            b"search algorithm", text[1000:1016], text[n // 2 : n // 2 + 16],
            text[n // 3 : n // 3 + 16], text[n - 4096 : n - 4080]]
    cap = _cap(2e-4 * n)
    cfg = MatchConfig(capacity=cap, verify_capacity=cap,
                      multi_gather="pselect")
    mm = RabinKarpMultiMatcher(pats, cfg)
    text_np = pad_to_multiple(np.frombuffer(text, np.uint8), 2 << 20)
    td, wd, _ = _stage(text_np)
    tb = jax.tree.map(jnp.asarray, mm.tables)
    pat_dev = jnp.asarray(mm.pattern_arr)
    base = int(tables.RK_BASE)
    m = 16
    Mnp = swar.mask_words(m)
    M = jnp.asarray(Mnp)
    nw = Mnp.shape[1]
    P_all = tb["swar_ps"]

    def scan(nn, t, w):
        bs, cut = rk_roll.rk_candidate_bsums(
            t, nn, tb["hashes"], m, base, words=w, emit="pmask")
        return bs.reshape(-1)[0] + cut

    def upto(stage):
        def fn(nn, t, w):
            bs, cut = rk_roll.rk_candidate_bsums(
                t, nn, tb["hashes"], m, base, words=w, emit="pmask")
            limit = jnp.minimum(nn - m, cut - 1)
            nb = bs.shape[0]
            xblk = w.reshape(-1, 128)
            R8 = xblk.shape[0]
            cap_b = 327680
            bids, sb = extract.sorted_nonzero_pairs(bs, cap_b, fill=nb)
            if stage == 1:
                return bids[0] + sb[0]
            bc = jnp.clip(bids, 0, R8 - 1)
            win = jnp.concatenate(
                [xblk[bc], xblk[jnp.clip(bc + 1, 0, R8 - 1)][:, :nw]],
                axis=1)
            if stage == 2:
                return jnp.sum(win[:, 0], dtype=jnp.int32)
            live = bids < nb
            pc = reconstruct._popcount32(sb)
            inmain = (pc >= 1) & (pc <= 2) & live
            fs1 = sb & (-sb)
            rem = sb & ~fs1
            fs2 = rem & (-rem)
            word_pos = bids[:, None] * 512 + 4 * jnp.arange(
                128, dtype=jnp.int32)[None, :]
            main_col = inmain[:, None]
            pay = []
            union_nib = jnp.zeros((cap_b, 128), jnp.int32)
            k = 8
            for a in range(4):
                plane = jnp.zeros((cap_b, 128), jnp.int32)
                for fsel in (fs1, fs2):
                    oh = [((fsel >> p) & 1) for p in range(k)]
                    accv = None
                    for kk in range(nw):
                        if Mnp[a, kk] == 0:
                            continue
                        Pk = oh[0] * P_all[0, a, kk]
                        for p in range(1, k):
                            Pk = Pk + oh[p] * P_all[p, a, kk]
                        wv = win[:, kk : kk + 128]
                        eq = (wv == Pk[:, None]) if Mnp[a, kk] == -1 else (
                            (wv & M[a, kk]) == Pk[:, None])
                        accv = eq if accv is None else (accv & eq)
                    plane |= accv.astype(jnp.int32) * fsel[:, None]
                plane = jnp.where(main_col & (word_pos + a <= limit),
                                  plane, 0)
                pay.append(plane)
                union_nib |= (plane != 0).astype(jnp.int32) << a
            rc = jnp.sum(extract._popcount4(union_nib), axis=1)
            if stage == 3:
                return jnp.sum(rc, dtype=jnp.int32)
            pos_base = bids * 512
            keys, vals = extract.slot_decode(union_nib, rc, pos_base, 2,
                                             pay)
            if stage == 4:
                return jnp.sum(keys[:, 0] & 1, dtype=jnp.int32)
            return None
        return fn

    def full_extract(nn, t, w):
        bs, cut = rk_roll.rk_candidate_bsums(
            t, nn, tb["hashes"], m, base, words=w, emit="pmask")
        limit = jnp.minimum(nn - m, cut - 1)
        c, o, v = reconstruct.extract_region_multi_pselect(
            bs, w, t, nn, pat_dev, P_all, limit, cap, cfg)
        return jnp.sum(c) + o[0, 0]

    runner = mm._runner(cfg, mm.k)

    def full_runner(nn, t, w):
        out = runner(t, w, nn, pat_dev, tb)
        return jnp.sum(out[0]) + out[1][0, 0]

    rows = [("S0 scan", jax.jit(scan)),
            ("S1 +rank_pairs", jax.jit(upto(1))),
            ("S2 +gather", jax.jit(upto(2))),
            ("S3 +verify2", jax.jit(upto(3))),
            ("S4 +slot", jax.jit(upto(4))),
            ("S5 full extract", jax.jit(full_extract)),
            ("S6 full runner", full_runner)]
    prev = 0.0
    for label, fn in rows:
        wall = timed(fn, n, td, wd)
        print(f"{label:16s}: {wall*1e3:7.2f} ms  (delta {1e3*(wall-prev):+7.2f})",
              flush=True)
        prev = wall


if __name__ == "__main__":
    main()
