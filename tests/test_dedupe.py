"""Dedupe: numpy bloom/cuckoo kernels + the Spark sidecars + exact anti-join."""

import numpy as np
import pytest

from ant_spark.operators.dedupe import (
    BloomSidecar,
    CuckooSidecar,
    bloom_add,
    bloom_test,
)

M_BITS = 1 << 16
K = 7


def test_bloom_kernel_no_false_negatives():
    rng = np.random.default_rng(7)
    items = rng.integers(-(2**62), 2**62, size=2000, dtype=np.int64).view(np.uint64)
    bits = np.zeros(M_BITS // 8, dtype=np.uint8)
    bloom_add(bits, items, K, M_BITS)
    assert bloom_test(bits, items, K, M_BITS).all()


def test_bloom_kernel_low_false_positive():
    rng = np.random.default_rng(7)
    items = rng.integers(-(2**62), 2**62, size=2000, dtype=np.int64).view(np.uint64)
    others = rng.integers(-(2**62), 2**62, size=2000, dtype=np.int64).view(np.uint64)
    bits = np.zeros(M_BITS // 8, dtype=np.uint8)
    bloom_add(bits, items, K, M_BITS)
    fp = bloom_test(bits, others, K, M_BITS).mean()
    assert fp < 0.05  # 2000 items in 64Kbit, k=7 → well under 5%


def test_cuckoo_kernel_roundtrip():
    c = CuckooSidecar(n_buckets=1, n_slots=1 << 12)
    rng = np.random.default_rng(3)
    items = rng.integers(-(2**62), 2**62, size=1500, dtype=np.int64).view(np.uint64)
    table = np.zeros(c.n_slots, dtype=np.uint16)
    c._add_np(table, items)
    assert c._test_np(table, items).mean() > 0.999  # kicked-out drops are rare
    others = rng.integers(-(2**62), 2**62, size=1500, dtype=np.int64).view(np.uint64)
    assert c._test_np(table, others).mean() < 0.02


@pytest.mark.parametrize("sidecar_cls", [BloomSidecar, CuckooSidecar])
def test_sidecar_spark_roundtrip(spark, sidecar_cls):
    if sidecar_cls is BloomSidecar:
        sc = BloomSidecar(n_buckets=4, m_bits=1 << 16)
    else:
        sc = CuckooSidecar(n_buckets=4, n_slots=1 << 12)
    hashes = spark.range(200).selectExpr("xxhash64(cast(id as string)) as url_hash")
    state0 = sc.empty_state(spark)
    # nothing present initially
    t0 = sc.test(hashes, state0)
    assert t0.filter("maybe_seen").count() == 0
    state1 = sc.add(hashes, state0)
    state1 = state1.persist()
    t1 = sc.test(hashes, state1)
    assert t1.filter("NOT maybe_seen").count() == 0  # no false negatives
    fresh = spark.range(200, 400).selectExpr("xxhash64(cast(id as string)) as url_hash")
    t2 = sc.test(fresh, state1)
    assert t2.filter("maybe_seen").count() <= 4  # fp rate tiny at this fill
    state1.unpersist()


def test_exact_new_collision_safe(spark):
    from ant_spark.operators.dedupe import exact_new

    cand = spark.createDataFrame(
        [(1, "http://a/"), (1, "http://collision/"), (2, "http://b/")],
        "url_hash long, url string",
    )
    seen = spark.createDataFrame([(1, "http://a/")], "url_hash long, url string")
    out = sorted(r["url"] for r in exact_new(cand, seen).collect())
    # same hash, different url → must NOT be dropped (exact mode never drops)
    assert out == ["http://b/", "http://collision/"]


def test_first_occurrence(spark):
    from ant_spark.operators.dedupe import first_occurrence

    df = spark.createDataFrame(
        [(10, 5, 0), (10, 3, 1), (10, 3, 0), (20, 1, 0)],
        "url_hash long, parent_seq long, link_idx int",
    )
    out = first_occurrence(df, "url_hash", ["parent_seq", "link_idx"]).collect()
    got = {r["url_hash"]: (r["parent_seq"], r["link_idx"]) for r in out}
    assert got == {10: (3, 0), 20: (1, 0)}
