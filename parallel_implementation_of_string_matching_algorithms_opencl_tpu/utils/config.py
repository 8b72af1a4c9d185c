"""Framework configuration (SURVEY.md §5 "Config / flag system").

The reference's config surface is ``argv`` positional args; ours is a small
frozen dataclass that the CLI maps onto.  No heavyweight config framework.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class MatchConfig:
    """Knobs for a match run.  All fields are static (affect compilation)."""

    # Offset-buffer capacity per call/shard (counts stay exact on overflow).
    capacity: int = 65536
    # Candidate-verification gather capacity (RK screen / BM filter).
    verify_capacity: int = 131072
    # Lane chunk length for the KMP DFA scan (smaller = more lanes).
    kmp_chunk: int = 2048
    # Lane chunk length for the honest BM cursor variant.
    bm_chunk: int = 4096
    # 'filtered' (vectorized screen+verify, default) or 'cursor' (skip loop).
    bm_variant: str = "filtered"
    # Boyer-Moore screen probe selection: 'table' scores candidate probe
    # words by the pattern's bad-character shifts (rarity-driven, passed to
    # the kernel as runtime scalars so same-length patterns share one
    # executable); 'static' uses the first/last full words baked in at
    # compile time (round-1 behavior).
    bm_probes: str = "table"
    # Pad text length to a multiple of this (TPU lane/sublane friendliness).
    pad_multiple: int = 1024
    # Use Pallas kernels where available ("auto" = on TPU backends only,
    # "on" = force, "off" = pure-XLA path).
    use_pallas: str = "auto"
    # Run Pallas kernels in interpreter mode (debugging / CPU CI).
    interpret: bool = False
    # Bytes per SWAR kernel chunk (per-lane sequential run; VMEM-tuned).
    pallas_chunk_bytes: int = 8192
    # Offset emission for the SWAR kernels: 'sparse' keeps the match-nibble
    # plane in VMEM scratch and reconstructs offsets from per-512B block
    # sums (kernel HBM traffic = read N + write N/128); 'nib' writes the
    # full nibble plane to HBM (read N + write N) and rank-selects it.
    emission: str = "sparse"
    # Rabin-Karp base override (odd uint32); None = ops.tables.RK_BASE.
    rk_base: int | None = None

    def replace(self, **kw) -> "MatchConfig":
        return dataclasses.replace(self, **kw)


DEFAULT_CONFIG = MatchConfig()
