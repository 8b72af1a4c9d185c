"""Golden oracle for exact string matching (SURVEY.md §4.1).

Pure-Python reference: reports ALL (overlapping) occurrences as sorted
0-based byte offsets.  Every algorithm in the framework must match this
byte-for-byte (BASELINE.json:5,7).  Independent of JAX by design.
"""

from __future__ import annotations


def find_all(text: bytes, pattern: bytes) -> list[int]:
    """All 0-based byte offsets where ``pattern`` occurs in ``text``,
    including overlapping occurrences (e.g. ``aa`` in ``aaaa`` -> [0,1,2])."""
    if not pattern:
        raise ValueError("empty pattern")
    out = []
    i = text.find(pattern)
    while i != -1:
        out.append(i)
        i = text.find(pattern, i + 1)
    return out


def find_all_multi(text: bytes, patterns: list[bytes]) -> dict[int, list[int]]:
    """Per-pattern offset lists for a multi-pattern query (keyed by pattern
    index), matching the multi-pattern Rabin-Karp output contract."""
    return {k: find_all(text, p) for k, p in enumerate(patterns)}
