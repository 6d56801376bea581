"""caching.locked_get: the per-key locked memoization every session
cache accessor routes through (warm-up chains run concurrently, so
double-build races must be structurally impossible)."""

from __future__ import annotations

import threading
import time
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import functions as F

from apl_commissions_etl_spark.caching import locked_get


def test_single_build_under_contention():
    cache: dict = {}
    calls = []
    barrier = threading.Barrier(8)

    def build():
        calls.append(1)
        time.sleep(0.05)  # widen the race window
        return "value"

    def hit():
        barrier.wait()
        return locked_get(cache, ("app", "sf"), build)

    with ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(lambda _: hit(), range(8)))
    assert results == ["value"] * 8
    assert len(calls) == 1, "builder must run exactly once per key"


def test_distinct_keys_build_concurrently():
    cache: dict = {}
    in_flight = []
    peak = []
    guard = threading.Lock()
    barrier = threading.Barrier(4)

    def build(k):
        with guard:
            in_flight.append(k)
            peak.append(len(in_flight))
        time.sleep(0.05)
        with guard:
            in_flight.remove(k)
        return k

    def hit(k):
        barrier.wait()
        return locked_get(cache, k, lambda: build(k))

    with ThreadPoolExecutor(max_workers=4) as pool:
        results = list(pool.map(hit, range(4)))
    assert sorted(results) == [0, 1, 2, 3]
    # different keys must not serialize behind one another
    assert max(peak) >= 2


def test_hit_path_returns_cached_value():
    cache = {("k",): 42}
    assert locked_get(cache, ("k",), lambda: 0) == 42


def test_failed_build_not_cached():
    cache: dict = {}
    attempts = []

    def failing():
        attempts.append(1)
        raise RuntimeError("boom")

    for _ in range(2):
        try:
            locked_get(cache, "k", failing)
        except RuntimeError:
            pass
    assert len(attempts) == 2 and "k" not in cache
    # a later successful build fills the slot
    assert locked_get(cache, "k", lambda: "ok") == "ok"


def test_session_cache_data_plane_is_pure():
    """SessionCache keeps its lock table OFF the data plane (r6
    ADVICE: the sentinel-key design leaked a non-value entry into any
    iteration/len/serialization of the cache)."""
    import json

    from apl_commissions_etl_spark.caching import SessionCache

    cache = SessionCache()
    assert locked_get(cache, "a", lambda: 1) == 1
    assert locked_get(cache, "b", lambda: 2) == 2
    assert locked_get(cache, "a", lambda: 99) == 1  # hit path
    # iterate / len / serialize see ONLY real entries
    assert sorted(cache) == ["a", "b"]
    assert len(cache) == 2
    assert dict(cache.items()) == {"a": 1, "b": 2}
    assert json.loads(json.dumps(cache)) == {"a": 1, "b": 2}
    cache.clear()
    assert locked_get(cache, "a", lambda: 7) == 7  # locks survive clear


def test_plain_dict_fallback_still_works():
    cache = {}
    assert locked_get(cache, "k", lambda: 5) == 5
    assert locked_get(cache, "k", lambda: 9) == 5


def test_session_ckpt_storage_level_adapts_to_heap():
    """session_ckpt picks serialized blocks under small heaps (the 1g
    gate session) and deserialized under big ones (48g bench/test
    sessions) — pinned with a stub so the policy can't silently
    regress."""
    from pyspark.storagelevel import StorageLevel

    from apl_commissions_etl_spark.caching import session_ckpt

    captured = {}

    class FakeRuntime:
        def __init__(self, heap):
            self._heap = heap

        def maxMemory(self):
            return self._heap

    class FakeDF:
        def __init__(self, heap):
            rt = FakeRuntime(heap)

            class R:
                @staticmethod
                def getRuntime():
                    return rt

            class Lang:
                Runtime = R

            class Java:
                lang = Lang

            class JVM:
                java = Java

            class SC:
                _jvm = JVM()

            class Session:
                sparkContext = SC()

            self.sparkSession = Session()

        def localCheckpoint(self, eager=True, storageLevel=None):
            captured["level"] = storageLevel
            return self

    session_ckpt(FakeDF(1 << 30))  # 1 GiB: the gate's bare default
    assert captured["level"] == StorageLevel.MEMORY_AND_DISK  # serialized

    session_ckpt(FakeDF(48 << 30))  # the 48g service session
    assert captured["level"] == StorageLevel.MEMORY_AND_DISK_DESER


def test_session_cache_reports_partitioning_and_survives_clearcache(
    spark,
):
    """The keyed session_cache contract (r12): the checkpoint's
    LogicalRDD REPORTS hashpartitioning(key), so a consumer grouping
    on the key (or a superset) plans with no consumer-side Exchange —
    and, unlike a CacheManager-backed persist, the layout survives
    ``spark.catalog.clearCache()`` untouched (checkpoint blocks are
    RDD storage, not cache entries)."""
    import pytest

    from apl_commissions_etl_spark.caching import _big_heap, session_cache

    if not _big_heap(spark.range(1)):
        pytest.skip(
            "keyed session_cache layout requires a >=8GiB driver heap "
            "(small-heap sessions deliberately fall back to the plain "
            "checkpoint — run with SPARK_DRIVER_MEM>=8g)"
        )

    df = session_cache(
        spark.range(100).withColumn("k", (F.col("id") % 7)), ("k",)
    )

    def consumer_exchanges() -> int:
        return (
            df.groupBy("k", (F.col("k") * 2).alias("k2"))
            .count()
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
            .count("Exchange")
        )

    assert consumer_exchanges() == 0
    spark.catalog.clearCache()
    assert consumer_exchanges() == 0  # immune to cache eviction


def test_reattach_restores_evicted_cache_entries(spark):
    """clearCache() evicts CacheManager entries while the module
    SessionCaches keep handing out the same DataFrame handles; without
    re-attachment every consumer replans against full lineage (r12:
    the staging dims are ``.cache()``d through track_persisted).
    reattach() must restore the entry for every tracked frame."""
    from pyspark.storagelevel import StorageLevel

    from apl_commissions_etl_spark.caching import (
        reattach,
        track_persisted,
    )

    df = track_persisted(
        spark.range(100).withColumn("k", (F.col("id") % 7)).cache()
    )
    df.count()
    assert df.storageLevel != StorageLevel.NONE

    spark.catalog.clearCache()
    assert df.storageLevel == StorageLevel.NONE

    n = reattach()
    assert n >= 1
    assert df.storageLevel != StorageLevel.NONE
    plan_restored = (
        df.groupBy("k").count()._jdf.queryExecution().executedPlan().toString()
    )
    assert "InMemoryTableScan" in plan_restored
    df.unpersist()
    caching_mod = __import__(
        "apl_commissions_etl_spark.caching", fromlist=["_TRACKED"]
    )
    caching_mod._TRACKED.remove(df)  # keep the scratch frame out of later reattaches
