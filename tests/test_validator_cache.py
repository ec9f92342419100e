"""Reference-statistics cache (reference validators/cache.py parity)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from truthound_spark.validators.cache import (
    CacheConfig,
    CategoricalStatistics,
    NumericStatistics,
    ReferenceCache,
    cached_numeric_statistics,
    cached_psi,
    get_global_cache,
    hash_dataframe,
    make_cache_key,
    reset_global_cache,
)


def test_numeric_statistics_from_dataframe(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)] + [(None,)], "v double")
    s = NumericStatistics.from_dataframe(df, "v", n_bins=10)
    assert s.count == 101 and s.null_count == 1
    assert s.min == 0.0 and s.max == 99.0
    assert abs(s.mean - 49.5) < 1e-9
    assert len(s.histogram_counts) == 10 and sum(s.histogram_counts) == 100
    assert len(s.quantile_values) == len(s.quantile_probs)
    assert s.estimate_memory_bytes() < 10_000


def test_categorical_statistics_topk_cap(spark):
    rows = [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 20 + [(None,)]
    df = spark.createDataFrame(rows, "v string")
    s = CategoricalStatistics.from_dataframe(df, "v", max_categories=2)
    assert s.count == 101 and s.null_count == 1 and s.distinct_count == 3
    assert s.value_counts == {"a": 50, "b": 30}
    assert s.truncated


def test_lru_eviction_and_stats():
    c = ReferenceCache(CacheConfig(max_entries=2))
    c.put("k1", "v1")
    c.put("k2", "v2")
    assert c.get("k1") == "v1"  # k1 now MRU
    c.put("k3", "v3")           # evicts k2 (LRU)
    assert c.get("k2") is None
    assert c.get("k1") == "v1" and c.get("k3") == "v3"
    st = c.get_stats()
    assert st["evictions"] == 1 and st["hits"] == 3 and st["misses"] == 1
    assert "k1" in c and "k2" not in c and len(c) == 2


def test_ttl_expiry():
    c = ReferenceCache(CacheConfig(ttl_seconds=0.05))
    c.put("k", 1)
    assert c.get("k") == 1
    time.sleep(0.08)
    assert c.get("k") is None and "k" not in c


def test_make_cache_key_and_hash(spark):
    assert make_cache_key("psi", "price") == "psi|price|v1"
    assert make_cache_key("psi", ["b", "a"], extra="x") == "psi|a:b|v1|x"
    df1 = spark.createDataFrame([(1,)], "a int")
    df2 = spark.createDataFrame([(1,)], "a int")
    df3 = spark.createDataFrame([(2,)], "a int")
    assert hash_dataframe(df1) == hash_dataframe(df2)
    assert hash_dataframe(df1) != hash_dataframe(df3)


def test_cached_psi_matches_uncached_and_skips_baseline_scan(spark):
    from truthound_spark.drift.detectors import psi

    base = spark.range(0, 2000).select((F.col("id") % 100).cast("double").alias("v"))
    cur = spark.range(0, 2000).select((F.col("id") % 80).cast("double").alias("v"))
    cache = ReferenceCache()
    r_plain = psi(base, cur, "v")
    r1 = cached_psi(base, cur, "v", cache=cache, baseline_key="b1")
    r2 = cached_psi(base, cur, "v", cache=cache, baseline_key="b1")
    assert abs(r1.statistic - r_plain.statistic) < 1e-12
    assert abs(r2.statistic - r_plain.statistic) < 1e-12
    st = cache.get_stats()
    assert st["hits"] == 1 and st["misses"] == 1  # second call hit the cache


def test_cached_numeric_statistics_global_cache(spark):
    reset_global_cache()
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "v double")
    s1 = cached_numeric_statistics(df, "v", key="fixed")
    s2 = cached_numeric_statistics(df, "v", key="fixed")
    assert s1 is s2
    assert get_global_cache().get_stats()["hits"] == 1
    reset_global_cache()
