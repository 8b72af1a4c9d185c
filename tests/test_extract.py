"""Unit tests for the sort-based extraction primitives (ops/extract) and
the word-space reconstruction (ops/reconstruct) — the round-3 emission
pipeline (SURVEY.md §7.3 stage 2 / hard part #1)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from parallel_implementation_of_string_matching_algorithms_opencl_tpu.ops import (
    extract,
)


def ref_positions(rows, base):
    out = []
    for r in range(rows.shape[0]):
        for c in range(rows.shape[1]):
            for a in range(4):
                if (rows[r, c] >> a) & 1:
                    out.append(int(base[r]) + 4 * c + a)
    return sorted(out)


def rand_plane(R, density, seed, dense_rows=()):
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, 16, size=(R, 128)).astype(np.int32)
    rows[rng.random((R, 128)) >= density] = 0
    for r, v in dense_rows:
        rows[r] = v
    rc = np.stack(
        [((rows >> a) & 1).sum(1) for a in range(4)]
    ).sum(0).astype(np.int32)
    base = (np.arange(R) * 512).astype(np.int32)
    return rows, rc, base


def test_sorted_nonzero_ids():
    rng = np.random.default_rng(0)
    flags = (rng.random(1000) < 0.03).astype(np.int32)
    ids = np.asarray(
        extract.sorted_nonzero_ids(jnp.asarray(flags), 64, fill=1000)
    )
    want = np.flatnonzero(flags)[:64]
    assert np.array_equal(ids[: len(want)], want)
    assert np.all(ids[len(want):] == 1000)
    # cap > R pads with fill
    ids2 = np.asarray(
        extract.sorted_nonzero_ids(jnp.asarray(flags[:10]), 32, fill=10)
    )
    assert ids2.shape == (32,) and np.all(ids2[np.flatnonzero(flags[:10]).size:] == 10)


def test_sorted_nonzero_pairs():
    rng = np.random.default_rng(7)
    flags = np.where(rng.random(1000) < 0.05,
                     rng.integers(1, 1 << 16, size=1000), 0).astype(np.int32)
    ids, vals = extract.sorted_nonzero_pairs(jnp.asarray(flags), 64,
                                             fill=1000)
    ids, vals = np.asarray(ids), np.asarray(vals)
    want = np.flatnonzero(flags)[:64]
    assert np.array_equal(ids[: len(want)], want)
    assert np.array_equal(vals[: len(want)], flags[want])
    assert np.all(ids[len(want):] == 1000) and np.all(vals[len(want):] == 0)
    # cap > R pads with (fill, 0)
    ids2, vals2 = extract.sorted_nonzero_pairs(jnp.asarray(flags[:10]), 32,
                                               fill=10)
    nz = np.flatnonzero(flags[:10]).size
    assert ids2.shape == (32,) and np.all(np.asarray(ids2)[nz:] == 10)
    assert np.all(np.asarray(vals2)[nz:] == 0)


def test_minor_cumsum_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 5, size=(333, 128)).astype(np.int32)
    got = np.asarray(extract.minor_cumsum(jnp.asarray(x)))
    assert np.array_equal(got, np.cumsum(x, axis=1))


def test_onehot_select_matches_fancy_index():
    rng = np.random.default_rng(2)
    x = rng.integers(-5, 99, size=(217, 128)).astype(np.int32)
    idx = rng.integers(0, 128, size=217).astype(np.int32)
    got = np.asarray(extract.onehot_select(jnp.asarray(x), jnp.asarray(idx)))
    assert np.array_equal(got, x[np.arange(217), idx])


def test_decode_rows_sorted_exact():
    rows, rc, base = rand_plane(40, 0.03, seed=3)
    want = ref_positions(rows, base)
    got = np.asarray(
        extract.decode_rows_sorted(jnp.asarray(rows), jnp.asarray(base), 4096)
    )
    got = got[got >= 0]
    assert list(got) == want[:4096]


@pytest.mark.parametrize("capacity", [1 << 14, 64])
def test_dense_extract_mixed_density(capacity):
    # sparse rows + a fully-dense row + a mid row: slot plane + side plane
    rows, rc, base = rand_plane(
        300, 0.1, seed=4,
        dense_rows=[(7, 15), (200, np.r_[[9] * 50, [0] * 78].astype(np.int32))],
    )
    want = ref_positions(rows, base)
    offs, ok = extract.dense_extract(
        jnp.asarray(rows), jnp.asarray(rc), jnp.asarray(base), capacity
    )
    offs = np.asarray(offs)
    offs = offs[offs >= 0]
    assert bool(ok)
    k = min(len(want), capacity)
    assert list(offs) == want[:k]


def test_dense_extract_relevance_bounds_fully_dense():
    # All rows fully dense, small capacity: only the rows whose rank range
    # intersects [0, capacity) matter, so the side plane absorbs them and
    # extraction stays complete through capacity.
    R = 64
    rows = np.full((R, 128), 15, np.int32)
    rc = np.full(R, 512, np.int32)
    base = (np.arange(R) * 512).astype(np.int32)
    offs, ok = extract.dense_extract(
        jnp.asarray(rows), jnp.asarray(rc), jnp.asarray(base), 1 << 10,
        T=4, overflow_rows=2,
    )
    assert bool(ok)
    offs = np.asarray(offs)
    assert list(offs) == list(range(1 << 10))


def test_dense_extract_giveup_flags_not_garbage():
    # More RELEVANT overflow rows (rank range intersecting [0, capacity))
    # than the 8x-escalated side plane: ok=False and the caller must blank
    # offsets (a sorted compaction cannot show gaps).
    R = 64
    rows = np.zeros((R, 128), np.int32)
    rows[:, :8] = 15  # 32 matches/row > T=4
    rc = np.full(R, 32, np.int32)
    base = (np.arange(R) * 512).astype(np.int32)
    # capacity 1024 spans 32 rows > 8*overflow_rows(2) = 16
    offs, ok = extract.dense_extract(
        jnp.asarray(rows), jnp.asarray(rc), jnp.asarray(base), 1 << 10,
        T=4, overflow_rows=2,
    )
    assert not bool(ok)


def test_slot_decode_payload():
    rng = np.random.default_rng(5)
    R = 50
    rows = rng.integers(0, 16, size=(R, 128)).astype(np.int32)
    rows[rng.random((R, 128)) < 0.9] = 0
    rc = np.stack(
        [((rows >> a) & 1).sum(1) for a in range(4)]
    ).sum(0).astype(np.int32)
    base = (np.arange(R) * 512).astype(np.int32)
    pay = [rng.integers(1, 1 << 20, size=(R, 128)).astype(np.int32)
           for _ in range(4)]
    T = 8
    keys, vals = extract.slot_decode(
        jnp.asarray(rows), jnp.asarray(rc), jnp.asarray(base), T,
        [jnp.asarray(p) for p in pay],
    )
    keys, vals = np.asarray(keys), np.asarray(vals)
    for r in range(R):
        if rc[r] > T:
            assert np.all(keys[r] == extract.INF)
            continue
        want = []
        for c in range(128):
            for a in range(4):
                if (rows[r, c] >> a) & 1:
                    want.append((base[r] + 4 * c + a, pay[a][r, c]))
        for j in range(T):
            if j < len(want):
                assert keys[r, j] == want[j][0]
                assert vals[r, j] == want[j][1]
            else:
                assert keys[r, j] == extract.INF


def test_sort_keys_to_offsets_pads_and_fills():
    keys = jnp.asarray(np.array([extract.INF, 7, 3, extract.INF, 5],
                                np.int32))
    out = np.asarray(extract.sort_keys_to_offsets(keys, 8))
    assert list(out) == [3, 5, 7, -1, -1, -1, -1, -1]


def test_extract_region_multi_sideplane_giveup_counts_exact():
    # Regression (round-3 ADVICE high/medium): >OC(2048) relevant
    # slot-overflow rows while the union still fits capacity.  Counts must
    # stay EXACT (pay-plane recount — the sorted buffer is missing every
    # row past the side plane) and offsets must come back all-FILL (a
    # sorted compaction would hide mid-stream gaps), with trunc=True.
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.kernels import (
        swar,
    )
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.ops import (
        reconstruct,
    )
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.config import (
        DEFAULT_CONFIG,
    )

    nb = 2104  # blocks of 512 B (multiple of 8 -> word rows exist)
    hot = 2100  # blocks with >T=4 union matches (> OC = 2048)
    pats = [b"AAAA", b"BBBB"]
    text = np.full(nb * 512, ord("x"), np.uint8)
    w0, w1 = 0, 0
    for b in range(hot):
        for j in range(5):  # 5 union matches/block > T
            text[b * 512 + 16 * j : b * 512 + 16 * j + 4] = ord("A")
            w0 += 1
        if b % 2 == 0:
            text[b * 512 + 128 : b * 512 + 132] = ord("B")
            w1 += 1
    n = nb * 512
    m = 4
    bs = np.zeros(nb, np.int32)
    bs[:hot] = 5 + (np.arange(hot) % 2 == 0)
    x2d = jnp.asarray(text.view(np.int32).reshape(-1, 1024))
    P_all = jnp.asarray(
        np.stack([swar.pattern_words(np.frombuffer(p, np.uint8))[0]
                  for p in pats])
    )
    patterns = np.stack([np.frombuffer(p, np.uint8) for p in pats])
    capacity = 16384  # > union count (11550), rank_base < capacity all rows
    counts, offs, trunc = reconstruct.extract_region_multi(
        jnp.asarray(bs), x2d, jnp.asarray(text), n, patterns, P_all,
        jnp.int32(n - m), capacity, DEFAULT_CONFIG,
    )
    counts, offs, trunc = map(np.asarray, (counts, offs, trunc))
    assert counts[0] == w0 and counts[1] == w1
    assert np.all(trunc)
    assert np.all(offs == reconstruct.FILL)


# -- extract_region tier-selector branches (round-5 single-switch) ---------


@pytest.mark.parametrize("branch", ["small", "compact", "plain", "dense"])
def test_extract_region_tier_selector_branches(branch, monkeypatch):
    """Every branch of the round-5 single-switch tier ladder — small /
    wide+compact / wide-plain / dense — produces oracle-exact counts and
    offsets.  The selector constants are shrunk so each branch is
    reachable from a 256 KiB corpus: Lr=64 chunks, cap_g=32, SMALL_G=8,
    compaction budget 2*cap_g=64 rows.  'plain' is the branch no
    realistic corpus in the suite reaches (many candidate blocks inside
    few chunks); 'dense' needs ncand > cap_g."""
    from conformance.oracle import find_all
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.kernels import (
        swar,
    )
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.ops import (
        reconstruct,
    )
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.config import (
        MatchConfig,
    )
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.io import (
        gen_english,
        pad_to_multiple,
    )

    monkeypatch.setattr(reconstruct, "SMALL_G", 8)
    monkeypatch.setattr(reconstruct, "SPARSE_CHUNKS_SMALL", 32)
    monkeypatch.setattr(swar, "MIN_KERNEL_BYTES", 0)

    n = 64 * 4096  # Lr = 64 4KiB chunks
    pat = b"QZXWVKYJ"
    m = len(pat)
    data = bytearray(gen_english(n, seed=777))
    # chunk c, block b (0..7) -> byte c*4096 + b*512 + small offset
    plants = {
        # <= 8 candidate chunks
        "small": [(c, 0) for c in range(5)],
        # 20 chunks (> SMALL_G=8), one block each: nblk=20 <= 64
        "compact": [(c, 0) for c in range(3, 23)],
        # 20 chunks x 8 blocks = 160 blocks > 64, ncand=20 <= cap_g=32
        "plain": [(c, b) for c in range(10, 30) for b in range(8)],
        # 40 chunks > cap_g=32 -> dense escalation
        "dense": [(c, 0) for c in range(5, 45)],
    }[branch]
    for c, b in plants:
        pos = c * 4096 + b * 512 + 17 + (c % 3)
        data[pos : pos + m] = pat
    text = bytes(data)
    want = find_all(text, pat)
    assert want, branch

    cfg = MatchConfig(interpret=True, pallas_chunk_bytes=512,
                      capacity=4096, pad_multiple=1024)
    tn = pad_to_multiple(np.frombuffer(text, np.uint8), 4096)
    P, _ = swar.pattern_words(np.frombuffer(pat, np.uint8))
    x2d = jnp.asarray(tn.view(np.int32).reshape(-1, 1024))
    td = jnp.asarray(tn)

    # exact bs (naive) AND candidate bs (BM probe screen) through the
    # same selector
    nib, bs_n, cut = swar.naive_nib(
        td, n, jnp.asarray(P), m, chunk_bytes=512, interpret=True,
        words=x2d, emit_nib=False)
    pr = swar.probe_table(np.frombuffer(pat, np.uint8), use_gs=True)
    probes = swar.static_probes_from_table(pr)
    _, bs_s, cut_s = swar.screened_nib(
        td, n, jnp.asarray(P), m, chunk_bytes=512, interpret=True,
        words=x2d, static_probes=probes, emit_nib=False, screen_only=True)
    assert cut == cut_s
    limit = min(n - m, cut - 1)
    kept = [o for o in want if o <= limit]
    for bs in (bs_n, bs_s):
        count, offs, ovf = reconstruct.extract_region(
            bs, x2d, td, jnp.int32(n), jnp.asarray(P), m, limit,
            cfg.capacity, cfg)
        offs = np.asarray(offs)
        assert int(count) == len(kept), branch
        assert [int(x) for x in offs[offs >= 0]] == kept, branch
        assert not bool(ovf), branch


@pytest.mark.slow
def test_pselect_many_multibit_blocks_fallback():
    """Round-5 review regression: >OC (2048) candidate blocks whose
    pattern mask holds >2 bits (here: one pattern tripled, so EVERY one
    of its blocks carries bits {0,1,2}) must NOT blanket-blank offsets —
    the top-level cond in extract_region_multi_pselect falls back to the
    blocks path, which handles them inline and exactly."""
    from conformance.oracle import find_all
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.kernels import (
        swar,
    )
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.models.multi import (
        RabinKarpMultiMatcher,
    )
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.config import (
        MatchConfig,
    )
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.io import (
        gen_english,
    )

    C = 4096
    n = 128 * C * 4  # 4096 candidate-block slots
    data = bytearray(gen_english(n, seed=4242))
    p = b"QZXWVKYJMRTN"
    q = b"ABLKWQPZTRVU"
    for b in range(2500):  # 2500 distinct 512B blocks > OC=2048
        pos = b * 512 + 7
        data[pos : pos + len(p)] = p
    data[512 * 3000 + 5 : 512 * 3000 + 5 + len(q)] = q
    text = bytes(data)
    pats = [p, p, p, q]
    cfg = MatchConfig(interpret=True, pallas_chunk_bytes=C,
                      capacity=8192, verify_capacity=8192,
                      pad_multiple=4096, multi_gather="pselect")
    import unittest.mock as _mock

    with _mock.patch.object(swar, "MIN_KERNEL_BYTES", 0):
        rs = RabinKarpMultiMatcher(pats, cfg).match(text)
    for pat, r in zip(pats, rs):
        want = find_all(text, pat)
        assert r.count == len(want), (pat, r.count, len(want))
        assert r.offsets_list() == want, pat
        assert not r.overflow, pat


@pytest.mark.slow
def test_pselect_k31_bit_boundary():
    """k=31 uses pattern bit 30 (the highest the pmask plane allows);
    the bit-30 pattern's matches must survive the fs/popcount/payload
    bit arithmetic (sign bit is never used, but 1<<30 is the edge)."""
    from conformance.oracle import find_all
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.kernels import (
        swar,
    )
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.models.multi import (
        RabinKarpMultiMatcher,
    )
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.config import (
        MatchConfig,
    )
    from parallel_implementation_of_string_matching_algorithms_opencl_tpu.utils.io import (
        gen_english,
    )

    C = 4096
    n = 128 * C + 777
    data = bytearray(gen_english(n, seed=31))
    pats = [bytes(gen_english(12, seed=3100 + i)) for i in range(31)]
    # plant the FIRST (bit 0) and LAST (bit 30) patterns, plus both in
    # one block (pc=2 two-chain main path at the bit boundary)
    data[100 : 112] = pats[0]
    data[512 * 9 + 5 : 512 * 9 + 17] = pats[30]
    data[512 * 20 + 3 : 512 * 20 + 15] = pats[0]
    data[512 * 20 + 60 : 512 * 20 + 72] = pats[30]
    text = bytes(data)
    cfg = MatchConfig(interpret=True, pallas_chunk_bytes=C,
                      capacity=4096, verify_capacity=4096,
                      pad_multiple=4096, multi_gather="pselect")
    import unittest.mock as _mock

    with _mock.patch.object(swar, "MIN_KERNEL_BYTES", 0):
        rs = RabinKarpMultiMatcher(pats, cfg).match(text)
    hits = 0
    for pat, r in zip(pats, rs):
        want = find_all(text, pat)
        hits += len(want)
        assert r.count == len(want), pat
        assert r.offsets_list() == want, pat
    assert hits >= 4
