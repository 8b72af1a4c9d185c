"""Subprocess worker for the 2-process multi-host test (SURVEY.md §3.3).

Launched by tests/test_multihost.py once per simulated host.  Forces the CPU
backend BEFORE any backend initialization (jax is pre-imported by the
environment's sitecustomize, so the platform flip must go through
jax.config — see tests/conftest.py), then runs the collective
``match_multihost`` against a localhost coordinator and dumps the global
result as JSON.

Usage: python _multihost_worker.py <pid> <nprocs> <port> <corpus> <pattern_hex>
       <algo> <out_json> [mode] [chunk_bytes]

``mode``: "whole" (default — match_multihost, slice-in-memory) or
"stream" (match_multihost_streaming, per-host chunked stream with the
count-sized two-phase offset gather).  ``pattern_hex`` may be several
patterns joined with ';' (streaming mode only).
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parallel_implementation_of_string_matching_algorithms_opencl_tpu.parallel import (  # noqa: E402
    multihost,
)
from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.config import (  # noqa: E402
    MatchConfig,
)


def main() -> int:
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    corpus, pattern_hex, algo, out_path = sys.argv[4:8]
    mode = sys.argv[8] if len(sys.argv) > 8 else "whole"
    cfg = MatchConfig(capacity=4096, pad_multiple=64)
    patterns = [bytes.fromhex(h) for h in pattern_hex.split(";")]
    if mode in ("stream", "stream_drain"):
        chunk_bytes = int(sys.argv[9]) if len(sys.argv) > 9 else 1 << 20
        if mode == "stream_drain":
            # Force per-chunk overflow so the streaming drain's re-read +
            # re-extraction actually runs on both hosts.
            cfg = cfg.replace(capacity=16)
        res = multihost.match_multihost_streaming(
            corpus,
            patterns if len(patterns) > 1 else patterns[0],
            algo=algo,
            config=cfg,
            chunk_bytes=chunk_bytes,
            manifest_path=out_path + ".manifest",
            coordinator_address=f"localhost:{port}",
            num_processes=nprocs,
            process_id=pid,
            drain=(mode == "stream_drain"),
        )
    else:
        if mode == "drain":
            cfg = cfg.replace(capacity=16)
        res = multihost.match_multihost(
            corpus,
            patterns[0],
            algo=algo,
            config=cfg,
            coordinator_address=f"localhost:{port}",
            num_processes=nprocs,
            process_id=pid,
            drain=(mode == "drain"),
        )
    reslist = res if isinstance(res, list) else [res]
    with open(out_path, "w") as f:
        json.dump(
            {
                "algo": reslist[0].algo,
                "process_id": pid,
                "process_count": jax.process_count(),
                "global_devices": len(jax.devices()),
                "count": reslist[0].count,
                "offsets": reslist[0].offsets_list(),
                "overflow": reslist[0].overflow,
                "all": [
                    {
                        "algo": r.algo,
                        "count": r.count,
                        "offsets": r.offsets_list(),
                        "overflow": r.overflow,
                    }
                    for r in reslist
                ],
            },
            f,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
