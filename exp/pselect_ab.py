#!/usr/bin/env python
"""A/B: config-2 multi-pattern extraction, blocks vs pselect, full scale.

Same corpus/patterns/capacity as bench/matrix.py config2, same batch-
summed metrology (_time_runner).  Run order alternates B-A-B-A to bracket
box drift.  Usage: python exp/pselect_ab.py [--gb 1.0]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo/bench")
from matrix import _cap, _stage, _time_runner  # noqa: E402

from parallel_implementation_of_string_matching_algorithms_opencl_tpu.models.multi import (  # noqa: E402
    RabinKarpMultiMatcher,
)
from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.config import (  # noqa: E402
    MatchConfig,
)
from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.io import (  # noqa: E402
    gen_english,
    pad_to_multiple,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gb", type=float, default=1.0)
    args = ap.parse_args()
    n = int(1e9 * args.gb)
    text = gen_english(n, seed=2)
    pats = [
        b"quick brown fox ", b"lazy dog and cat", b"parallel device ",
        b"search algorithm",
        text[1000:1016], text[n // 2 : n // 2 + 16],
        text[n // 3 : n // 3 + 16], text[n - 4096 : n - 4080],
    ]
    cap = _cap(2e-4 * n)
    text_np = pad_to_multiple(np.frombuffer(text, np.uint8), 2 << 20)
    text_dev, words_dev, _ = _stage(text_np)

    runners = {}
    for mg in ("blocks", "pselect"):
        cfg = MatchConfig(capacity=cap, verify_capacity=cap,
                          multi_gather=mg)
        mm = RabinKarpMultiMatcher(pats, cfg)
        runners[mg] = (
            mm._runner(cfg, mm.k),
            jnp.asarray(mm.pattern_arr),
            jax.tree.map(jnp.asarray, mm.tables),
        )

    from conformance.oracle import find_all
    wants = [find_all(text, p) for p in pats]

    for rnd in range(2):
        for mg in ("blocks", "pselect"):
            runner, pat_dev, tb_dev = runners[mg]
            out, wall = _time_runner(
                runner, text_dev, words_dev, n, pat_dev, tb_dev
            )
            counts = [int(c) for c in np.asarray(out[0])]
            offs = np.asarray(out[1])
            ok = all(
                counts[i] == len(wants[i])
                and [int(x) for x in offs[i][offs[i] >= 0]] == wants[i]
                for i in range(len(pats))
            )
            print(f"round{rnd} {mg:8s}: {wall*1e3:6.1f} ms "
                  f"({n/wall/1e9:5.1f} GB/s)  exact={ok}", flush=True)


if __name__ == "__main__":
    main()
