"""Count-table algebra (pipelines/tables.py) vs collections.Counter
oracles — the user-side dict idioms of the reference's composition
workflow (/root/reference/docs/src/composition.md), as framework ops."""

import collections

import numpy as np
import pytest

from kmers_tpu.pipelines import (
    CountConfig,
    canonical_count_bytes,
    intersect_counts,
    merge_counts,
    merge_counts_device,
    multiplicity_spectrum,
    subtract_counts,
)


def _table(counter):
    keys = np.array(sorted(counter), dtype=np.uint64)
    return keys, np.array([counter[k] for k in sorted(counter)], np.int64)


def _counter(kmers, counts):
    return collections.Counter(dict(zip(kmers.tolist(), counts.tolist())))


@pytest.fixture(scope="module")
def two_tables():
    rng = np.random.default_rng(5)
    a = collections.Counter(rng.integers(0, 50, 300).tolist())
    b = collections.Counter(rng.integers(25, 75, 300).tolist())
    a = collections.Counter({np.uint64(k): v for k, v in a.items()})
    b = collections.Counter({np.uint64(k): v for k, v in b.items()})
    return a, b


def test_merge_counts_is_counter_sum(two_tables):
    a, b = two_tables
    kmers, counts = merge_counts(*_table(a), *_table(b))
    assert _counter(kmers, counts) == a + b
    assert np.all(kmers[1:] > kmers[:-1])  # sorted unique


def test_intersect_min_is_counter_and(two_tables):
    a, b = two_tables
    kmers, counts = intersect_counts(*_table(a), *_table(b), mode="min")
    assert _counter(kmers, counts) == (a & b)


def test_intersect_sum_totals(two_tables):
    a, b = two_tables
    kmers, counts = intersect_counts(*_table(a), *_table(b), mode="sum")
    expect = {k: a[k] + b[k] for k in set(a) & set(b)}
    assert dict(zip(kmers.tolist(), counts.tolist())) == expect
    with pytest.raises(ValueError):
        intersect_counts(*_table(a), *_table(b), mode="max")


def test_subtract_is_saturating_counter_diff(two_tables):
    a, b = two_tables
    kmers, counts = subtract_counts(*_table(a), *_table(b))
    assert _counter(kmers, counts) == (a - b)


def test_merge_counts_device_matches_host(two_tables):
    a, b = two_tables
    hk, hc = merge_counts(*_table(a), *_table(b))
    dk, dc = merge_counts_device(*_table(a), *_table(b))
    assert np.array_equal(hk, dk) and np.array_equal(hc, dc)


def test_merge_matches_counting_concatenated_input():
    rng = np.random.default_rng(6)
    acgt = np.frombuffer(b"ACGT", np.uint8)
    s1 = bytes(acgt[rng.integers(0, 4, 3000)])
    s2 = bytes(acgt[rng.integers(0, 4, 3000)])
    cfg = CountConfig(K=15)
    k1, c1 = canonical_count_bytes(s1, cfg)
    k2, c2 = canonical_count_bytes(s2, cfg)
    km, cm = merge_counts(k1, c1, k2, c2)
    # merging per-record tables == counting the N-joined records
    kj, cj = canonical_count_bytes(s1 + b"N" + s2, cfg)
    assert np.array_equal(km, kj) and np.array_equal(cm, cj)


def test_merge_counts_object_dtype_k_gt_31():
    # K>31 tables are object arrays of Python ints
    a = np.array([1 << 70, (1 << 80) + 3], dtype=object)
    ac = np.array([2, 1], dtype=np.int64)
    b = np.array([(1 << 80) + 3, 1 << 90], dtype=object)
    bc = np.array([5, 4], dtype=np.int64)
    kmers, counts = merge_counts(a, ac, b, bc)
    assert kmers.tolist() == [1 << 70, (1 << 80) + 3, 1 << 90]
    assert counts.tolist() == [2, 6, 4]


def test_multiplicity_spectrum():
    counts = np.array([1, 1, 2, 5, 5, 5, 9], np.int64)
    spec = multiplicity_spectrum(counts)
    assert spec[1] == 2 and spec[2] == 1 and spec[5] == 3 and spec[9] == 1
    assert spec[0] == 0 and spec.sum() == counts.size
    clamped = multiplicity_spectrum(counts, max_multiplicity=4)
    assert clamped[4] == 4 and clamped.size == 5
    # fixed layout: max_multiplicity+1 bins even when nothing reaches it
    low = multiplicity_spectrum(np.array([1, 2], np.int64), max_multiplicity=8)
    assert low.size == 9 and low[1] == 1 and low[2] == 1 and low[8] == 0


def test_merge_counts_device_int32_overflow_falls_back():
    from kmers_tpu.pipelines.tables import merge_counts_device

    # counts near 2^31: the device int32 merge would wrap; the guard must
    # route to the int64-safe host merge instead
    k = np.array([5, 9], np.uint64)
    big = np.array([2**30 + 7, 3], np.int64)
    mk, mc = merge_counts_device(k, big, k, big)
    assert mk.tolist() == [5, 9]
    assert mc.tolist() == [2**31 + 14, 6]


def test_empty_tables():
    e = np.zeros(0, np.uint64)
    ec = np.zeros(0, np.int64)
    k, c = merge_counts(e, ec, e, ec)
    assert k.size == 0 and c.size == 0
    k, c = intersect_counts(e, ec, e, ec)
    assert k.size == 0
    k, c = subtract_counts(e, ec, e, ec)
    assert k.size == 0
    assert multiplicity_spectrum(ec).tolist() == [0, 0]


# ---- algebraic properties (hypothesis) ----

from hypothesis import given, settings, strategies as st


def _rand_table(draw, max_key=40):
    items = draw(
        st.dictionaries(
            st.integers(0, max_key), st.integers(1, 6), max_size=12
        )
    )
    keys = np.array(sorted(items), dtype=np.uint64)
    return keys, np.array([items[k] for k in sorted(items)], np.int64)


tables = st.composite(_rand_table)()


@settings(max_examples=60, deadline=None)
@given(tables, tables, tables)
def test_merge_associative_commutative(a, b, c):
    ab_c = merge_counts(*merge_counts(*a, *b), *c)
    a_bc = merge_counts(*a, *merge_counts(*b, *c))
    ba = merge_counts(*b, *a)
    ab = merge_counts(*a, *b)
    for x, y in ((ab_c, a_bc), (ab, ba)):
        assert np.array_equal(x[0], y[0]) and np.array_equal(x[1], y[1])


@settings(max_examples=60, deadline=None)
@given(tables, tables)
def test_subtract_merge_roundtrip(a, b):
    # (a + b) - b == a
    merged = merge_counts(*a, *b)
    back = subtract_counts(*merged, *b)
    assert np.array_equal(back[0], a[0]) and np.array_equal(back[1], a[1])


@settings(max_examples=60, deadline=None)
@given(tables, tables)
def test_intersect_bounded_by_both(a, b):
    k, c = intersect_counts(*a, *b, mode="min")
    ca = dict(zip(a[0].tolist(), a[1].tolist()))
    cb = dict(zip(b[0].tolist(), b[1].tolist()))
    for key, cnt in zip(k.tolist(), c.tolist()):
        assert cnt == min(ca[key], cb[key]) and cnt >= 1
    # intersection keys = key-set intersection
    assert set(k.tolist()) == set(ca) & set(cb)


def test_jaccard_exact_and_containment():
    import numpy as np

    from kmers_tpu.pipelines import canonical_count
    from kmers_tpu.pipelines.tables import containment, jaccard_exact

    rng = np.random.default_rng(13)
    s = "".join("ACGT"[i] for i in rng.integers(0, 4, 4000))
    ka, _ = canonical_count(s, K=15)
    kb, _ = canonical_count(s[:2500], K=15)
    # B's kmers all come from A's sequence: containment(B in A) == 1
    assert containment(kb, ka) == 1.0
    j = jaccard_exact(ka, kb)
    assert 0.0 < j < 1.0 and abs(j - kb.size / ka.size) < 1e-12
    assert jaccard_exact(ka, ka) == 1.0
    e = np.zeros(0, np.uint64)
    assert jaccard_exact(e, e) == 1.0 and containment(e, ka) == 1.0
