"""Real multi-process multi-host tests (SURVEY.md §3.3, BASELINE config 5).

Spawns N local processes that each run ``jax.distributed.initialize``
against a localhost coordinator on the CPU backend, then execute the
collective ``match_multihost`` — the same code path a TPU pod slice runs,
with DCN collectives riding localhost gRPC here.  Matches are planted
straddling the host-slice boundary so the overlapping-file-read halo is
exercised for real.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
from conformance.oracle import find_all

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_cluster(tmp_path, text: bytes, pattern: bytes, algo: str,
                 nprocs: int = 2, timeout: int = 240):
    # _free_port has an inherent close-then-rebind window; retry on the
    # rare collision instead of failing the test spuriously.
    last = None
    for _ in range(3):
        try:
            return _run_cluster_once(tmp_path, text, pattern, algo,
                                     nprocs, timeout)
        except AssertionError as e:
            last = e
            if "in use" not in str(e) and "Address already" not in str(e):
                raise
    raise last


def _run_cluster_once(tmp_path, text: bytes, pattern: bytes, algo: str,
                      nprocs: int = 2, timeout: int = 240):
    corpus = tmp_path / "corpus.bin"
    corpus.write_bytes(text)
    port = _free_port()
    outs = [tmp_path / f"out_{pid}.json" for pid in range(nprocs)]
    env = dict(os.environ)
    # Workers need the repo root importable; keep whatever the parent
    # already had (site dirs etc.) rather than hardcoding machine paths.
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO_ROOT] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                       if p and p != REPO_ROOT]
    )
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(nprocs), str(port),
             str(corpus), pattern.hex(), algo, str(outs[pid])],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for pid in range(nprocs)
    ]
    results = []
    for p in procs:
        out, err = p.communicate(timeout=timeout)
        assert p.returncode == 0, (
            f"worker failed rc={p.returncode}\nstdout:{out.decode()[-2000:]}"
            f"\nstderr:{err.decode()[-2000:]}"
        )
    for o in outs:
        with open(o) as f:
            results.append(json.load(f))
    return results


@pytest.mark.slow
@pytest.mark.parametrize("algo", ["naive", "kmp"])
def test_two_process_multihost_parity(tmp_path, algo):
    rng = np.random.default_rng(13)
    data = bytearray(rng.integers(97, 101, size=20000, dtype=np.uint8).tobytes())
    pat = b"XSEAMX"
    # Host 0 owns [0, 10000): plant matches inside each slice, straddling
    # the host boundary, at file start and at file end.
    for p in (0, 4321, 10000 - 3, 10006, 17000, 20000 - len(pat)):
        data[p : p + len(pat)] = pat
    text = bytes(data)
    want = find_all(text, pat)
    assert 10000 - 3 in want and len(want) >= 6
    results = _run_cluster(tmp_path, text, pat, algo)
    for r in results:
        assert r["process_count"] == 2
        assert r["global_devices"] == 4  # 2 procs x 2 forced CPU devices
        assert r["count"] == len(want)
        assert r["offsets"] == want
        assert r["algo"].endswith("@hosts2")


@pytest.mark.slow
def test_two_process_multihost_pattern_longer_than_slice(tmp_path):
    # m > one host's owned slice: the overlapping file read must extend
    # past the entire next slice boundary region.
    rng = np.random.default_rng(29)
    data = bytearray(rng.integers(97, 123, size=3000, dtype=np.uint8).tobytes())
    pat = bytes(rng.integers(65, 91, size=2000, dtype=np.uint8).tobytes())
    data[500 : 500 + 2000] = pat  # spans the 1500-byte host boundary
    text = bytes(data)
    want = find_all(text, pat)
    assert want == [500]
    results = _run_cluster(tmp_path, text, pat, "boyer_moore")
    for r in results:
        assert r["count"] == 1 and r["offsets"] == [500]


def test_initialize_cluster_rejects_partial_topology():
    # coordinator_address without num_processes used to silently stay
    # single-process and return per-host partial results as global.
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.parallel import (
        multihost,
    )

    with pytest.raises(ValueError, match="num_processes"):
        multihost.initialize_cluster(
            coordinator_address="localhost:12345", process_id=0
        )
