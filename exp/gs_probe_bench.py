#!/usr/bin/env python
"""Round-4 VERDICT next #9: good-suffix-informed probe scoring — measure
it or bury it (BASELINE.json:10 "bad-char + good-suffix skip kernel").

``bm_probes='table_gs'`` adds each candidate probe word's summed
good-suffix shifts to its bad-char score (kernels/swar.probe_table).  The
two scorings pick IDENTICAL layouts for ordinary patterns (english, DNA,
UTF-8, pure-periodic, m=8..32 — checked exhaustively below); they differ
only on partially self-similar patterns (e.g. period-3 with a tail,
'ACAC...' with an interior break), so the bench runs exactly those on the
corpora where screen selectivity matters: their own base corpus salted
with near-miss periodic fragments.

Method: warm best-of-5 e2e ``match()`` walls, A/B interleaved (the shared
box drifts 1x-5x on a minutes scale — interleaving keeps a drift window
from crediting either side), plus the SCREEN CANDIDATE COUNT (sum of the
screen's block sums — drift-free, the direct selectivity signal).

Appends rows to exp/GS_PROBE.json; conclusions go to BASELINE.md via
bench/report.py.
"""

from __future__ import annotations

import json
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np


def salted_corpus(base: bytes, frag: bytes, n: int, every: int,
                  seed: int) -> bytes:
    """``base`` corpus with a near-miss fragment planted every ``every``
    bytes — the adversarial regime for a probe screen (fragments share
    the pattern's period so weak probes fire constantly)."""
    arr = bytearray(base)
    rng = np.random.default_rng(seed)
    for pos in range(0, n - len(frag), every):
        jitter = int(rng.integers(0, every // 4))
        p = pos + jitter
        arr[p : p + len(frag)] = frag
    return bytes(arr)


def candidates(matcher, text_np, n):
    """Screen candidate-block total for BM's probe screen (drift-free
    selectivity metric)."""
    import jax
    import jax.numpy as jnp

    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.kernels import (
        swar,
    )

    cfg = matcher.config
    x2d = jnp.asarray(text_np.view(np.int32).reshape(-1, 1024))
    t = jax.tree.map(jnp.asarray, matcher.tables)
    _nib, bs, cut = swar.screened_nib(
        jnp.asarray(text_np), jnp.int32(n), t["swar_p"], matcher.m,
        chunk_bytes=cfg.pallas_chunk_bytes, interpret=False, words=x2d,
        static_probes=cfg.bm_probe_layout, emit_nib=False,
        screen_only=True,
    )
    return int(jnp.sum(bs)), int(cut)


def main():
    import jax

    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.models.algorithms import (
        BoyerMooreMatcher,
    )
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.config import (
        MatchConfig,
    )
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.io import (
        gen_dna,
        gen_english,
        pad_to_multiple,
    )

    N = 256 << 20
    cases = [
        # (name, corpus bytes, pattern) — only layout-DIFFERING patterns
        ("dna_selfsim", gen_dna(N, seed=4), b"ACACACACACGTACAC"),
        ("period3_eng", gen_english(N, seed=4), b"abcabcabcabcabca"),
        (
            "period3_salted",
            salted_corpus(gen_english(N, seed=5), b"abcabcab", N, 4096, 9),
            b"abcabcabcabcabca",
        ),
    ]
    rows = []
    for name, corpus, pat in cases:
        res = {}
        matchers = {}
        for mode in ("table", "table_gs"):
            m = BoyerMooreMatcher(pat, MatchConfig(bm_probes=mode))
            matchers[mode] = m
            res[mode] = {"layout": m.config.bm_probe_layout}
        if res["table"]["layout"] == res["table_gs"]["layout"]:
            rows.append({"case": name, "identical_layout": True})
            print(json.dumps(rows[-1]), flush=True)
            continue
        text_np = pad_to_multiple(
            np.frombuffer(corpus, np.uint8),
            matchers["table"]._pad_target(N),
        )
        # drift-free selectivity
        for mode, m in matchers.items():
            c, cut = candidates(m, text_np, N)
            res[mode]["cand_blocks"] = c
        # interleaved e2e walls
        for mode, m in matchers.items():
            m.match(corpus)  # warm
            res[mode]["walls"] = []
        for _ in range(5):
            for mode, m in matchers.items():
                t0 = time.perf_counter()
                r = m.match(corpus)
                _ = r.count
                res[mode]["walls"].append(time.perf_counter() - t0)
        row = {"case": name, "pattern": pat.decode("latin1"),
               "n_bytes": N, "identical_layout": False}
        for mode in ("table", "table_gs"):
            row[mode] = {
                "layout": [list(map(int, x))
                           for x in res[mode]["layout"]],
                "cand_blocks": res[mode]["cand_blocks"],
                "best_wall_s": min(res[mode]["walls"]),
            }
        row["count"] = r.count
        rows.append(row)
        print(json.dumps(row), flush=True)
    with open(_os.path.join(_os.path.dirname(__file__), "GS_PROBE.json"),
              "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
