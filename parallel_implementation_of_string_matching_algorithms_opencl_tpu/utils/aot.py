"""Cross-process AOT executable cache (round-3 VERDICT next #7).

The platform's persistent jax compilation cache NEVER hits across
processes on the axon tunnel — the backend embeds a per-connection nonce
in the cache key (diagnosed round 3 via jax._src.cache_key logging:
computation hashes are stable, final keys differ), so every fresh process
pays the full 20-60 s backend compile per algorithm.  PJRT *executable
serialization* sidesteps the nonce entirely: serialize the compiled
executable once, and any later process deserializes + loads it in ~0.5 s
(measured on TPU v5e over the tunnel, 70 MB Boyer-Moore executable,
Pallas kernels included).

Key design: sha256 of the LOWERED StableHLO text + jax version + device
kind + device count.  Tracing/lowering costs ~1 s per (program, shape
class) per process — cheap — and hashing the lowered module makes the
cache self-invalidating under ANY code or config change, with no
hand-maintained version constants.  Per-process warm-start cost is
therefore lower(~1 s) + deserialize(~0.5 s) per algorithm, vs 20-60 s
cold (target was <=5 s).

Every step degrades gracefully: serialization failures fall back to the
plain jitted call; a corrupt/unreadable cache file is ignored and
recompiled over.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import tempfile
import threading

import jax

# In-memory memo: (jitted fn, arg shape/dtype signature) -> callable.
# Avoids re-lowering (~1 s) on every call of a process's lifetime.  The
# jitted fn itself keys the dict (strong ref — ids would be reusable
# after GC; the matchers cache their jitted runners for the process
# lifetime anyway).
_MEMO: dict = {}
_LOCK = threading.Lock()
_DISABLED = os.environ.get("TPUMATCH_AOT_CACHE", "") == "off"


def cache_dir() -> str:
    d = os.environ.get("TPUMATCH_AOT_CACHE", "")
    if d and d != "off":
        return d
    return os.path.join(
        os.path.expanduser("~"), ".cache", "tpumatch", "aot"
    )


def _signature(args) -> tuple:
    leaves, treedef = jax.tree.flatten(args)
    return (
        tuple(
            (getattr(x, "shape", ()), str(getattr(x, "dtype", type(x))))
            for x in leaves
        ),
        str(treedef),
    )


def _device_tag() -> str:
    d = jax.devices()[0]
    return f"{d.platform}:{d.device_kind}:{len(jax.devices())}"


def call(jitted, args, enabled: bool = True):
    """``jitted(*args)`` through the AOT executable cache.

    ``enabled=False`` (or TPUMATCH_AOT_CACHE=off) calls straight through —
    callers gate on problem size so trace+serialize overhead is never paid
    for sub-millisecond executables.

    Self-healing: a deserialized executable that loads but FAILS at call
    time (e.g. CPU AOT compiled under different machine features, or a
    stale device topology) is evicted — its cache file deleted — and the
    call retried on a fresh compile.  A cache entry can therefore never
    wedge a run.
    """
    if not enabled or _DISABLED:
        return jitted(*args)
    memo_key = (jitted, _signature(args))
    entry = _MEMO.get(memo_key)
    if entry is None:
        with _LOCK:
            entry = _MEMO.get(memo_key)
            if entry is None:
                entry = _load_or_compile(jitted, args)
                _MEMO[memo_key] = entry
    fn, from_cache, path = entry
    try:
        return fn(*args)
    except Exception:
        if not from_cache:
            raise
        # The on-disk executable is incompatible with this process/host:
        # evict and recompile.
        try:
            os.unlink(path)
        except OSError:
            pass
        with _LOCK:
            entry = _load_or_compile(jitted, args)
            _MEMO[memo_key] = entry
        return entry[0](*args)


def _load_or_compile(jitted, args):
    """(callable, came_from_disk_cache, cache_path_or_None)."""
    from jax.experimental import serialize_executable as se

    try:
        lowered = jitted.lower(*args)
        key = hashlib.sha256(
            (lowered.as_text() + jax.__version__ + _device_tag()).encode()
        ).hexdigest()[:32]
    except Exception:
        return (jitted, False, None)  # lowering hiccup: plain jit path
    path = os.path.join(cache_dir(), key + ".pjrt")
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                payload, in_tree, out_tree = pickle.load(f)
            loaded = se.deserialize_and_load(payload, in_tree, out_tree)
            return ((lambda *a: loaded(*a)), True, path)
        except Exception:
            pass  # corrupt/incompatible: recompile below
    compiled = lowered.compile()
    try:
        payload, in_tree, out_tree = se.serialize(compiled)
        os.makedirs(cache_dir(), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=cache_dir(), suffix=".tmp")
        with os.fdopen(fd, "wb") as f:
            pickle.dump((payload, in_tree, out_tree), f)
        os.replace(tmp, path)  # atomic: concurrent processes race safely
    except Exception:
        pass  # serialization unsupported for this executable: still run
    return ((lambda *a: compiled(*a)), False, path)
