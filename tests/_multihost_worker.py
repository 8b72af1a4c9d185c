"""Subprocess worker for the 2-process multi-host test (SURVEY.md §3.3).

Launched by tests/test_multihost.py once per simulated host.  Forces the CPU
backend BEFORE any backend initialization (jax is pre-imported by the
environment's sitecustomize, so the platform flip must go through
jax.config — see tests/conftest.py), then runs the collective
``match_multihost`` against a localhost coordinator and dumps the global
result as JSON.

Usage: python _multihost_worker.py <pid> <nprocs> <port> <corpus> <pattern_hex>
       <algo> <out_json>
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
    res = multihost.match_multihost(
        corpus,
        bytes.fromhex(pattern_hex),
        algo=algo,
        config=MatchConfig(capacity=4096, pad_multiple=64),
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    with open(out_path, "w") as f:
        json.dump(
            {
                "algo": res.algo,
                "process_id": pid,
                "process_count": jax.process_count(),
                "global_devices": len(jax.devices()),
                "count": res.count,
                "offsets": res.offsets_list(),
                "overflow": res.overflow,
            },
            f,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
