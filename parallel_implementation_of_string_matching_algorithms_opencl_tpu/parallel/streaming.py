"""Streaming matcher: unbounded corpora in fixed-size chunks (SURVEY.md §3.4).

TPU-native replacement for "the text does not fit in HBM": a host loop feeds
fixed-shape chunks (so ONE compiled executable serves every chunk) and JAX's
async dispatch overlaps the host→HBM transfer of chunk k+1 with the device
scan of chunk k — the double-buffering the reference would hand-roll with
OpenCL event queues falls out of the runtime (SURVEY.md §5 "checkpoint /
resume", BASELINE.json:11 100GB config).

Chunks overlap by (m-1) bytes so matches straddling a chunk boundary are
found exactly once: a chunk owns matches *starting* in its first
``chunk_bytes`` positions; the (m-1)-byte tail halo is lookahead only.

Resume: a JSON manifest records the last completed chunk; ``resume=True``
skips completed work and re-accumulates from the manifest.
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

from ..models.base import MatchResult
from ..models.registry import get_matcher
from ..utils.config import DEFAULT_CONFIG, MatchConfig


DEFAULT_CHUNK_BYTES = 64 << 20


@dataclasses.dataclass
class _Pending:
    """One in-flight chunk: device futures + host bookkeeping."""

    chunk_idx: int
    start: int
    count: object  # jax scalar (async)
    offsets: object  # jax array (async)
    overflow: object


class StreamingMatcher:
    """Match a pattern over a file/byte-stream of unbounded size."""

    def __init__(
        self,
        pattern: bytes,
        algo: str = "boyer_moore",
        config: MatchConfig = DEFAULT_CONFIG,
        chunk_bytes: int = DEFAULT_CHUNK_BYTES,
        manifest_path: str | None = None,
    ):
        import jax
        import jax.numpy as jnp

        self._jax, self._jnp = jax, jnp
        self.matcher = get_matcher(algo)(pattern, config)
        self.config = config
        self.m = self.matcher.m
        if chunk_bytes % config.pad_multiple:
            raise ValueError("chunk_bytes must be a multiple of config.pad_multiple")
        self.chunk_bytes = chunk_bytes
        # Device chunk shape: owned bytes + (m-1) halo, padded to pad_multiple.
        halo = self.m - 1
        self._dev_len = chunk_bytes + (
            -(-max(halo, 1) // config.pad_multiple) * config.pad_multiple
        )
        self.manifest_path = manifest_path
        self._runner = self.matcher._runner(config)
        self._pat_dev = jnp.asarray(self.matcher.pattern_arr)
        self._tables_dev = jax.tree.map(jnp.asarray, self.matcher.tables)

    # -- chunk iteration ---------------------------------------------------

    def _iter_chunks(self, path: str, start_chunk: int):
        """Yield (chunk_idx, start, valid_n, uint8[_dev_len]) with halo."""
        size = os.path.getsize(path)
        mm = np.memmap(path, dtype=np.uint8, mode="r")
        n_chunks = max(1, -(-size // self.chunk_bytes))
        buf = np.zeros(self._dev_len, dtype=np.uint8)
        for ci in range(start_chunk, n_chunks):
            start = ci * self.chunk_bytes
            stop = min(start + self.chunk_bytes + self.m - 1, size)
            view = mm[start:stop]
            buf[: len(view)] = view
            buf[len(view) :] = 0
            # valid region within this chunk = bytes we may START a match at,
            # plus the lookahead tail; owned starts are < chunk_bytes.
            yield ci, start, len(view), buf.copy()
        del mm

    # -- manifest ----------------------------------------------------------

    def _load_manifest(self, path: str):
        if not self.manifest_path or not os.path.exists(self.manifest_path):
            return None
        with open(self.manifest_path) as f:
            man = json.load(f)
        if (
            man.get("path") != os.path.abspath(path)
            or man.get("chunk_bytes") != self.chunk_bytes
            or man.get("algo") != self.matcher.name
            or man.get("pattern_hex") != self.matcher.pattern_bytes.hex()
        ):
            return None
        return man

    def _save_manifest(self, path: str, next_chunk: int, count: int, offsets: list):
        if not self.manifest_path:
            return
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "path": os.path.abspath(path),
                    "chunk_bytes": self.chunk_bytes,
                    "algo": self.matcher.name,
                    "pattern_hex": self.matcher.pattern_bytes.hex(),
                    "next_chunk": next_chunk,
                    "count": count,
                    "offsets": offsets,
                },
                f,
            )
        os.replace(tmp, self.manifest_path)

    # -- main loop ---------------------------------------------------------

    def match_file(self, path: str, resume: bool = False) -> MatchResult:
        jax, jnp = self._jax, self._jnp
        size = os.path.getsize(path)

        total = 0
        all_offsets: list[int] = []
        overflowed = False
        start_chunk = 0
        if resume:
            man = self._load_manifest(path)
            if man:
                start_chunk = man["next_chunk"]
                total = man["count"]
                all_offsets = list(man["offsets"])

        def resolve(p: _Pending):
            nonlocal total, overflowed
            c = int(p.count)
            offs = np.asarray(p.offsets)
            kept = offs[offs >= 0] + p.start
            total += c
            overflowed |= bool(p.overflow) or (c > len(kept))
            all_offsets.extend(int(x) for x in kept)
            self._save_manifest(path, p.chunk_idx + 1, total, all_offsets)

        pending: _Pending | None = None
        for ci, start, valid_n, buf in self._iter_chunks(path, start_chunk):
            # The chunk owns starts in [0, chunk_bytes); positions in the halo
            # tail belong to the next chunk.  valid_start_mask inside the
            # runner enforces p <= n - m; owned-range truncation is n itself
            # when the chunk is interior (n = chunk_bytes + m - 1 covers
            # exactly the owned starts).
            n_eff = min(valid_n, self.chunk_bytes + self.m - 1)
            count, offsets, ovf = self._runner(
                jnp.asarray(buf),
                jnp.asarray(buf.view(np.int32)),
                jnp.int32(n_eff),
                self._pat_dev,
                self._tables_dev,
            )
            this = _Pending(ci, start, count, offsets, ovf)
            if pending is not None:
                resolve(pending)  # sync chunk k-1 while chunk k computes
            pending = this
        if pending is not None:
            resolve(pending)

        # Offsets within the halo of chunk k duplicate the owned start of
        # chunk k+1 — the runner counts matches starting at ANY position
        # p <= n_eff - m, and for interior chunks n_eff - m = chunk_bytes - 1,
        # so no halo-started match is counted: merge is duplicate-free.
        offs = np.asarray(sorted(all_offsets), dtype=np.int64)
        return MatchResult(
            algo=f"{self.matcher.name}@stream",
            pattern=self.matcher.pattern_bytes,
            n=size,
            count=total,
            offsets=offs,
            overflow=overflowed,
        )


def match_stream(
    path: str,
    pattern: bytes,
    algo: str = "boyer_moore",
    config: MatchConfig | None = None,
    chunk_bytes: int = DEFAULT_CHUNK_BYTES,
    manifest_path: str | None = None,
    resume: bool = False,
) -> MatchResult:
    """Convenience wrapper (see StreamingMatcher)."""
    if isinstance(pattern, str):
        pattern = pattern.encode("utf-8")
    sm = StreamingMatcher(
        bytes(pattern),
        algo=algo,
        config=config or DEFAULT_CONFIG,
        chunk_bytes=chunk_bytes,
        manifest_path=manifest_path,
    )
    return sm.match_file(path, resume=resume)
