#!/usr/bin/env python
"""Incremental sub-stage timing of the config-2 multi-pattern path (1 GB,
k=8, m=16) — round-4 VERDICT weak #3: extraction holds config 2 at
8.9 GB/s (113 ms for 285k offsets across 8 patterns).

Stages (differences between consecutive rows = cost of the added stage):

SCAN: rk_candidate_bsums union screen only
M0:   bs>0 + nblk                         (prepass)
M1:   M0 + bids rank-select               (sort of nb=2M block ids)
M2:   M1 + candidate window row gather
M3:   M2 + k*4-plane verify + union nib + rc
M4:   M3 + slot_decode (keys+payload vals)
M5:   M4 + side plane + union sort-pair   (upos/uval)
M6:   M5 + per-pattern capacity sorts
M7:   full extract_region_multi fixed tier (+ counts cond)
M8:   full extract_region_multi (real switch)
TAIL: the caller's per-pattern tail-mask + merge_region_matches epilogue
RUN:  the full config-2 runner (scan + extract + tail/merge)
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from parallel_implementation_of_string_matching_algorithms_opencl_tpu.kernels import rk_roll, swar
from parallel_implementation_of_string_matching_algorithms_opencl_tpu.models.multi import RabinKarpMultiMatcher
from parallel_implementation_of_string_matching_algorithms_opencl_tpu.ops import emit, extract, reconstruct, tables
from parallel_implementation_of_string_matching_algorithms_opencl_tpu.ops import rabin_karp as rk_ops
from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.config import MatchConfig
from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.io import gen_english, pad_to_multiple

ITERS = 8
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
    # 256 MiB default: at 1 GiB an earlier draft CLOSED OVER td/wd, which
    # jax embeds as literal constants in the lowered module — the 2 GB
    # compile request hung the tunnel for 25+ min and then failed with
    # HTTP 413 at 512 MB (lesson recorded: operands must be jit ARGUMENTS
    # over a remote-compile tunnel).  Stage RATIOS at 256 MiB transfer;
    # the official config-2 row re-measures the end state at 1 GB.
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256 << 20
    text = gen_english(n, seed=2)
    pats = [
        b"quick brown fox ", b"lazy dog and cat", b"parallel device ",
        b"search algorithm",
        text[1000:1016], text[n // 2: n // 2 + 16],
        text[n // 3: n // 3 + 16], text[n - 4096: n - 4080],
    ]
    k, m = len(pats), 16
    cap = 1 << 19  # matches bench/matrix.py _cap(2e-4 * n)
    cfg = MatchConfig(capacity=cap, verify_capacity=cap)
    mm = RabinKarpMultiMatcher(pats, cfg)
    text_np = pad_to_multiple(np.frombuffer(text, np.uint8), 2 << 20)
    td = jax.device_put(jnp.asarray(text_np))
    wd = jax.device_put(jnp.asarray(text_np.view(np.int32).reshape(-1, 1024)))
    patterns = jax.device_put(jnp.asarray(mm.pattern_arr))
    tb = jax.tree.map(lambda a: jax.device_put(jnp.asarray(a)), mm.tables)
    base = int(tables.RK_BASE)

    def scan(nn, t, w):
        bs, cut = rk_roll.rk_candidate_bsums(
            t, nn, tb["hashes"], m, base,
            chunk_bytes=cfg.pallas_chunk_bytes, words=w)
        return bs.reshape(-1)[0] + cut, bs, cut

    scan_j = jax.jit(scan)
    print("compiling scan ...", flush=True)
    _, bs, cut = scan_j(jnp.int32(n), td, wd)
    cut = int(cut)  # static region split, as in models/multi.py
    t_scan = timed_chain(lambda nn, t, w: scan_j(nn, t, w)[0], n, td, wd)
    bs = jax.device_put(bs)
    nb = int(bs.shape[0])
    nblk_real = int(jnp.sum(bs > 0))
    limit = jnp.minimum(jnp.int32(n) - m, cut - 1)
    limit = jax.device_put(limit)
    print(f"nb={nb} nblk={nblk_real} cap={cap}", flush=True)

    P_all = tb["swar_ps"]
    Mnp = swar.mask_words(m)
    M = jnp.asarray(Mnp)
    nw = Mnp.shape[1]
    tiers = sorted({min(t_, nb) for t_ in reconstruct.MULTI_BLOCK_TIERS})
    cap_b = next(t_ for t_ in tiers if t_ >= nblk_real)
    print(f"tiers={tiers} selected cap_b={cap_b}", flush=True)

    def m0(nn, bs_, t, w):
        return jnp.sum(bs_ > 0, dtype=jnp.int32) + (nn & 0)

    def m1(nn, bs_, t, w):
        bids = extract.sorted_nonzero_ids(bs_, cap_b, fill=nb)
        return bids.reshape(-1)[0] + (nn & 0)

    def _gather(bs_, w):
        xblk = w.reshape(-1, 128)
        R8 = xblk.shape[0]
        bids = extract.sorted_nonzero_ids(bs_, cap_b, fill=nb)
        bc = jnp.clip(bids, 0, R8 - 1)
        win = jnp.concatenate(
            [xblk[bc], xblk[jnp.clip(bc + 1, 0, R8 - 1)][:, :nw]], axis=1)
        return bids, win

    def m2(nn, bs_, t, w):
        bids, win = _gather(bs_, w)
        return win.reshape(-1)[0] + bids.reshape(-1)[0] + (nn & 0)

    def _verify(bs_, lim, w):
        bids, win = _gather(bs_, w)
        word_pos = bids[:, None] * 512 + 4 * jnp.arange(
            128, dtype=jnp.int32)[None, :]
        pay = []
        for a in range(4):
            plane = jnp.zeros((cap_b, 128), jnp.int32)
            for p in range(k):
                acc = None
                for kk in range(nw):
                    if Mnp[a, kk] == 0:
                        continue
                    w = win[:, kk: kk + 128]
                    eq = (w == P_all[p, a, kk]) if Mnp[a, kk] == -1 else (
                        (w & M[a, kk]) == P_all[p, a, kk])
                    acc = eq if acc is None else (acc & eq)
                plane |= acc.astype(jnp.int32) << p
            pay.append(jnp.where(word_pos + a <= lim, plane, 0))
        union_nib = jnp.zeros((cap_b, 128), jnp.int32)
        for a in range(4):
            union_nib |= (pay[a] != 0).astype(jnp.int32) << a
        rc = jnp.sum(extract._popcount4(union_nib), axis=1)
        return bids, pay, union_nib, rc

    def m3(nn, bs_, lim, t, w):
        bids, pay, union_nib, rc = _verify(bs_, lim, w)
        return jnp.sum(rc, dtype=jnp.int32) + (nn & 0)

    def m4(nn, bs_, lim, t, w):
        bids, pay, union_nib, rc = _verify(bs_, lim, w)
        pos_base = bids * 512
        keys, vals = extract.slot_decode(union_nib, rc, pos_base, 4, pay)
        return keys.reshape(-1)[0] + vals.reshape(-1)[0] + (nn & 0)

    def _union(bs_, lim, w):
        bids, pay, union_nib, rc = _verify(bs_, lim, w)
        pos_base = bids * 512
        T = 4
        keys, vals = extract.slot_decode(union_nib, rc, pos_base, T, pay)
        rank_base = extract.cumsum_i32(rc) - rc
        relevant = (rc > T) & (rank_base < cap)
        OC = 2048
        ok = jnp.sum(relevant, dtype=jnp.int32) <= OC
        oids = extract.sorted_nonzero_ids(relevant.astype(jnp.int32), OC, cap_b)
        oc_ = jnp.clip(oids, 0, cap_b - 1)
        ovalid = (oids < cap_b)[:, None]
        orows = jnp.where(ovalid, union_nib[oc_], 0)
        opay = [jnp.where(ovalid, pay[a][oc_], 0) for a in range(4)]
        obase = jnp.where(oids < cap_b, pos_base[oc_], 0)
        okeys, ovals = extract.nib_rows_keys_payload(orows, obase, opay)
        flat_k = jnp.concatenate([keys.reshape(-1), okeys.reshape(-1)])
        flat_v = jnp.concatenate([vals.reshape(-1), ovals.reshape(-1)])
        if flat_k.shape[0] < cap:
            padn = cap - flat_k.shape[0]
            flat_k = jnp.concatenate(
                [flat_k, jnp.full((padn,), extract.INF, jnp.int32)])
            flat_v = jnp.concatenate([flat_v, jnp.zeros((padn,), jnp.int32)])
        srt_k, srt_v = jax.lax.sort((flat_k, flat_v), num_keys=1)
        return srt_k[:cap], srt_v[:cap], ok

    def m5(nn, bs_, lim, t, w):
        upos, uval, ok = _union(bs_, lim, w)
        return upos.reshape(-1)[0] + uval.reshape(-1)[0] + (nn & 0)

    def m6(nn, bs_, lim, t, w):
        upos, uval, ok = _union(bs_, lim, w)
        acc = jnp.int32(0)
        for p in range(k):
            keyp = jnp.where(((uval >> p) & 1) == 1, upos,
                             jnp.int32(extract.INF))
            sp = jax.lax.sort(keyp)
            acc = acc + sp[0]
        return acc + (nn & 0)

    def m7(nn, bs_, lim, t, w):
        saved = reconstruct.MULTI_BLOCK_TIERS
        try:
            reconstruct.MULTI_BLOCK_TIERS = (cap_b,)
            c, o, v = reconstruct.extract_region_multi(
                bs_, w, t, n, patterns, P_all, lim, cap, cfg)
        finally:
            reconstruct.MULTI_BLOCK_TIERS = saved
        return c.reshape(-1)[0] + o.reshape(-1)[0] + (nn & 0)

    def m8(nn, bs_, lim, t, w):
        c, o, v = reconstruct.extract_region_multi(
            bs_, w, t, n, patterns, P_all, lim, cap, cfg)
        return c.reshape(-1)[0] + o.reshape(-1)[0] + (nn & 0)

    def tail_merge(nn, lim, t, w):
        # the caller epilogue: tail masks + per-pattern mask_to_matches +
        # merge_region_matches at full capacity (models/multi.py)
        cut_ = cut
        tail_masks = rk_ops.rk_multi_start_masks(
            t[cut_:], patterns, tb["powers"], tb["hashes"], cap)
        acc = jnp.int32(0)
        c1 = jnp.int32(100)
        o1 = jnp.full((cap,), -1, jnp.int32)
        v1 = jnp.bool_(False)
        for p in range(k):
            tail_valid = emit.valid_start_mask(
                tail_masks[p], jnp.int32(n) - cut_, m)
            c2, o2, v2 = emit.mask_to_matches(tail_valid, cap)
            c, o, v = emit.merge_region_matches(c1, o1, v1, c2, o2, v2,
                                                cap, cut_)
            acc = acc + c + o.reshape(-1)[0]
        return acc + (nn & 0)

    runner = RabinKarpMultiMatcher._runner(cfg, k)

    def full(nn, t, w):
        c, o, v = runner(t, w, nn, patterns, tb)
        return c.reshape(-1)[0] + o.reshape(-1)[0]

    rows = []
    for name, fn, args in [
        ("M0_prepass", m0, (bs, td, wd)),
        ("M1_rank_select", m1, (bs, td, wd)),
        ("M2_gather", m2, (bs, td, wd)),
        ("M3_verify", m3, (bs, limit, td, wd)),
        ("M4_slot_decode", m4, (bs, limit, td, wd)),
        ("M5_union_sort", m5, (bs, limit, td, wd)),
        ("M6_pattern_sorts", m6, (bs, limit, td, wd)),
        ("M7_full_fixed_tier", m7, (bs, limit, td, wd)),
        ("M8_full_switch", m8, (bs, limit, td, wd)),
        ("TAIL_merge_epilogue", tail_merge, (limit, td, wd)),
    ]:
        jf = jax.jit(fn)
        t = timed_chain(jf, n, *args)
        rows.append((name, t))
        print(f"{name:22s} {t*1e3:8.2f} ms", flush=True)
    t_full = timed_chain(jax.jit(full), n, td, wd)
    print(f"{'SCAN_bsums':22s} {t_scan*1e3:8.2f} ms", flush=True)
    print(f"{'FULL_runner':22s} {t_full*1e3:8.2f} ms  "
          f"({n/t_full/1e9:.1f} GB/s)", flush=True)
    prev = 0.0
    print("\ndeltas:")
    for name, t in rows:
        print(f"  {name:22s} +{(t-prev)*1e3:7.2f} ms")
        prev = t


if __name__ == "__main__":
    main()
