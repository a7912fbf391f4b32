"""Bloom-filter membership index (operators/bloom_index.py) — the
no-false-negative contract, measured fpp vs design, idempotent updates,
build-vs-incremental equivalence, determinism, sizing math, and the
map-only probe plan the scale claim rests on."""

from __future__ import annotations

import math
import os

import pytest

from pyspark.sql import functions as F

from serverless_etl_bi_on_aws_spark.operators.bloom_index import (
    bits_for,
    bloom_saturation,
    build_bloom_index,
    dedup_against_bloom,
    probe_bloom,
    read_bloom_meta,
    update_bloom_index,
)


def _keys(spark, lo, hi, prefix="k"):
    return spark.range(lo, hi).select(
        F.concat(F.lit(prefix), F.col("id")).alias("key")
    )


def test_no_false_negatives_and_bounded_fp(spark, tmp_path):
    idx = str(tmp_path / "idx")
    build_bloom_index(_keys(spark, 0, 1000), "key", idx, expected_items=1000, fpp=0.01)
    probed = probe_bloom(_keys(spark, 0, 3000), "key", idx)
    flags = {r.key: r.maybe_seen for r in probed.collect()}
    # EVERY indexed key flags true — the contract dedup correctness rests on
    assert all(flags[f"k{i}"] for i in range(1000))
    fp = sum(flags[f"k{i}"] for i in range(1000, 3000))
    assert fp / 2000 <= 0.03  # designed 1%, generous margin


def test_probe_is_deterministic_and_map_only(spark, tmp_path):
    idx = str(tmp_path / "idx")
    build_bloom_index(_keys(spark, 0, 500), "key", idx, expected_items=500)
    probed = probe_bloom(_keys(spark, 0, 2000), "key", idx)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    a = sorted((r.key, r.maybe_seen) for r in probed.collect())
    b = sorted(
        (r.key, r.maybe_seen)
        for r in probe_bloom(_keys(spark, 0, 2000).repartition(13), "key", idx).collect()
    )
    assert a == b


def test_update_idempotent_and_equals_oneshot(spark, tmp_path):
    one, inc = str(tmp_path / "one"), str(tmp_path / "inc")
    build_bloom_index(_keys(spark, 0, 800), "key", one, num_bits=1 << 13, num_hashes=5)
    build_bloom_index(_keys(spark, 0, 400), "key", inc, num_bits=1 << 13, num_hashes=5)
    update_bloom_index(_keys(spark, 400, 800), "key", inc)
    # replay the same batch: bits unchanged (idempotence)
    before = open(os.path.join(inc, "bits.bin"), "rb").read()
    update_bloom_index(_keys(spark, 400, 800), "key", inc)
    assert open(os.path.join(inc, "bits.bin"), "rb").read() == before
    # incremental == one-shot, bit for bit
    assert before == open(os.path.join(one, "bits.bin"), "rb").read()


def test_dedup_against_bloom_both_directions(spark, tmp_path):
    idx = str(tmp_path / "idx")
    build_bloom_index(_keys(spark, 0, 100), "key", idx, expected_items=100, fpp=0.001)
    batch = _keys(spark, 50, 150)
    new = {r.key for r in dedup_against_bloom(batch, "key", idx).collect()}
    cand = {r.key for r in
            dedup_against_bloom(batch, "key", idx, keep_flagged=True).collect()}
    # flagged ⊇ all true members; survivors ∩ members = ∅ (no false negatives)
    members = {f"k{i}" for i in range(50, 100)}
    assert members <= cand
    assert not (new & members)
    assert new | cand == {r.key for r in batch.collect()}
    assert not (new & cand)


def test_bits_for_sizing_math():
    m, k = bits_for(1000, 0.01)
    # textbook optimum: ~9585 bits, 7 hashes
    assert abs(m - 9585) <= 8 and k == 7
    # design fpp holds under the standard approximation
    fpp = (1 - math.exp(-k * 1000 / m)) ** k
    assert fpp <= 0.0105
    with pytest.raises(ValueError, match="expected_items"):
        bits_for(0)
    with pytest.raises(ValueError, match="fpp"):
        bits_for(100, 1.5)


def test_build_validates_knobs(spark, tmp_path):
    ks = _keys(spark, 0, 10)
    with pytest.raises(ValueError, match="num_bits"):
        build_bloom_index(ks, "key", str(tmp_path / "a"), num_bits=100, num_hashes=3)
    with pytest.raises(ValueError, match="num_hashes"):
        build_bloom_index(ks, "key", str(tmp_path / "b"), num_bits=1024, num_hashes=0)
    with pytest.raises(ValueError, match="expected_items"):
        build_bloom_index(ks, "key", str(tmp_path / "c"))
    with pytest.raises(FileNotFoundError):
        read_bloom_meta(str(tmp_path / "nope"))


def test_saturation_tracks_fill(spark, tmp_path):
    idx = str(tmp_path / "idx")
    build_bloom_index(_keys(spark, 0, 100), "key", idx, num_bits=1 << 12, num_hashes=4)
    s1 = bloom_saturation(idx)
    update_bloom_index(_keys(spark, 100, 800), "key", idx)
    s2 = bloom_saturation(idx)
    assert 0 < s1 < s2 < 1
    # ~expected fill 1-e^(-kn/m) after the update: 1-e^(-4*800/4096) ≈ 0.54
    assert abs(s2 - (1 - math.exp(-4 * 800 / 4096))) < 0.05


def test_tree_combine_handles_many_partitions(spark, tmp_path):
    """>fan-in partitions force at least one OR tree stage; result must
    equal a single-partition build bit-for-bit."""
    idx_many, idx_one = str(tmp_path / "m"), str(tmp_path / "o")
    ks = _keys(spark, 0, 2000)
    build_bloom_index(ks.repartition(64), "key", idx_many, num_bits=1 << 13, num_hashes=5)
    build_bloom_index(ks.coalesce(1), "key", idx_one, num_bits=1 << 13, num_hashes=5)
    assert (
        open(os.path.join(idx_many, "bits.bin"), "rb").read()
        == open(os.path.join(idx_one, "bits.bin"), "rb").read()
    )


def test_update_serialized_by_writer_lease(spark, tmp_path):
    """r14 ADVICE (medium): update_bloom_index is a read-modify-write on
    bits.bin — two concurrent updaters would silently lose each other's
    OR'd bits (a lost key probes FALSE and its duplicates re-admit,
    breaking the no-false-negative contract). The fix is the same
    single-writer lease the peer index updaters take: with the lease
    held, a second updater fails loudly instead of interleaving."""
    from serverless_etl_bi_on_aws_spark.util import LeaseHeldError, writer_lease

    idx = str(tmp_path / "idx")
    build_bloom_index(_keys(spark, 0, 100), "key", idx, expected_items=200)
    with writer_lease(idx, owner="concurrent-writer"):
        with pytest.raises(LeaseHeldError):
            update_bloom_index(_keys(spark, 100, 150), "key", idx)
    # lease released -> the update goes through and the keys are present
    update_bloom_index(_keys(spark, 100, 150), "key", idx)
    probed = probe_bloom(_keys(spark, 100, 150), "key", idx)
    assert all(r.maybe_seen for r in probed.collect())


def test_probe_broadcast_cached_and_invalidated_on_update(spark, tmp_path):
    """r14 ADVICE (low): probe_bloom used to create a fresh broadcast of
    the FULL bit array on every call — unbounded accumulation in the
    per-micro-batch streaming loop. The cache must (a) reuse one
    broadcast across probes of an unchanged filter, (b) invalidate when
    an update replaces bits.bin, so a cached probe never reads stale
    bits."""
    from serverless_etl_bi_on_aws_spark.operators import bloom_index as bi

    idx = str(tmp_path / "idx")
    build_bloom_index(_keys(spark, 0, 100), "key", idx, expected_items=300)
    bi._BITS_BC_CACHE.clear()
    probe_bloom(_keys(spark, 0, 50), "key", idx).collect()
    assert len(bi._BITS_BC_CACHE) == 1
    bc1 = next(iter(bi._BITS_BC_CACHE.values()))[1]
    probe_bloom(_keys(spark, 0, 50), "key", idx).collect()
    assert len(bi._BITS_BC_CACHE) == 1
    assert next(iter(bi._BITS_BC_CACHE.values()))[1] is bc1  # reused, not re-broadcast
    # an update replaces bits.bin -> the NEXT probe must see the new keys
    # (stale-cache reads would flag them false and re-admit duplicates)
    update_bloom_index(_keys(spark, 0, 100, prefix="z"), "key", idx)
    probed = probe_bloom(_keys(spark, 0, 100, prefix="z"), "key", idx)
    assert all(r.maybe_seen for r in probed.collect())
    assert next(iter(bi._BITS_BC_CACHE.values()))[1] is not bc1


def test_stale_plan_survives_index_update(spark, tmp_path):
    """r15 ADVICE (medium): a lazily-held DataFrame built from an
    earlier probe_bloom and EXECUTED after an update_bloom_index must
    still run — the superseded broadcast is unpersisted (re-fetchable
    from the driver), not destroyed (which fails the stale plan at
    runtime with 'Broadcast used after destroy')."""
    from serverless_etl_bi_on_aws_spark.operators import bloom_index as bi

    idx = str(tmp_path / "idx")
    build_bloom_index(_keys(spark, 0, 100), "key", idx, expected_items=300)
    bi._BITS_BC_CACHE.clear()
    stale = probe_bloom(_keys(spark, 0, 50), "key", idx)  # plan built, NOT run
    stale.count()  # materialize the broadcast once
    update_bloom_index(_keys(spark, 0, 100, prefix="z"), "key", idx)
    # fresh probe sees the new keys through the re-read broadcast...
    fresh = probe_bloom(_keys(spark, 0, 100, prefix="z"), "key", idx)
    assert all(r.maybe_seen for r in fresh.collect())
    # ...and the stale plan still executes against its own snapshot
    assert all(r.maybe_seen for r in stale.collect())
