"""Frozen conformance-corpus manifest (SURVEY.md §4.7): generator drift
breaks these checksums on purpose."""

import pytest

from conformance import corpus


@pytest.mark.parametrize("cell", [c[0] for c in corpus.CELLS])
def test_corpus_checksum_frozen(cell):
    assert corpus.checksum(cell) == corpus.MANIFEST[cell]


def test_manifest_covers_all_cells():
    assert set(corpus.MANIFEST) == {c[0] for c in corpus.CELLS}
