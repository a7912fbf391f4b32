"""Bloom-filter membership index — the JOIN-FREE scale path for
"have we already ingested this document?" dedup.

The persisted hash/minhash/url indexes (operators/hash_index.py,
dedup_index.py) answer the incremental-dedup question with an equi-join
probe against block-partitioned parquet — exact, but every probe batch
pays a shuffle against index triples. At 100 TB the first-mile filter in
front of that join is a Bloom filter of every key ever admitted: a few
GiB of bits broadcast once per executor turns the overwhelmingly common
case ("never seen") into a map-only column check, and only the rows the
filter flags go on to the exact index probe (or are dropped outright,
where a ~fpp loss of genuinely-new docs is an accepted trade — the
standard crawl-dedup posture).

Contract (classic Bloom semantics, stated so downstream code can rely
on them):

* **No false negatives** — every key that was fed to
  :func:`build_bloom_index` / :func:`update_bloom_index` probes
  ``maybe_seen = true``. This is what makes drop-on-flag safe for
  EXACTNESS of the dedup guarantee (nothing already admitted is ever
  re-admitted).
* **Bounded false positives** — a never-indexed key probes true with
  probability ~``(1 - e^(-k*n/m))^k``; size ``num_bits`` for the
  expected corpus (``bits_for`` helper). Flagged rows may be routed to
  the exact index for confirmation instead of dropped.
* **Deterministic** — bit positions are ``xxhash64(key, seed_i) mod m``
  (Spark's defined 64-bit xxHash, seeds 0..k-1), so the same corpus
  always builds the same bits and a probe is reproducible across runs,
  partitionings, and replays. Updates are idempotent by construction
  (setting bits is).

Scale shape: position arrays are computed JVM-side (xxhash64 is a
codegen'd expression); per-partition bitmaps are built in one
``mapInPandas`` pass (numpy bit-ors, Arrow batches); partial bitmaps are
OR-combined through a tree (fan-in 16) so the driver never sees more
than 16 × m/8 bytes regardless of executor count; the probe broadcasts
the bits once and is a pure map stage — no exchange, pinned in
test_bloom_index.py.
"""

from __future__ import annotations

import math
import os
import threading

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

from serverless_etl_bi_on_aws_spark.util import (
    commit_file,
    read_marker,
    write_marker,
    writer_lease,
)

#: tree fan-in for combining per-partition bitmaps
_COMBINE_FANIN = 16

#: probe-side broadcast cache:
#: index_path -> ((mtime_ns, size, applicationId), broadcast).
#: probe_bloom is called once per micro-batch in the streaming loop;
#: without the cache every batch re-broadcasts the full bit array and the
#: old broadcasts accumulate unbounded (material at GiB filter sizes).
#: The (mtime_ns, size) stamp invalidates on every update_bloom_index
#: (os.replace installs a NEW file), so a cached probe never reads stale
#: bits; the superseded broadcast is unpersisted (re-fetchable by stale
#: plans) on replacement. _BITS_BC_LOCK serializes get/unpersist/put so
#: concurrent streams on one driver cannot race the cache.
_BITS_BC_CACHE: dict[str, tuple[tuple[int, int, str], object]] = {}
_BITS_BC_LOCK = threading.Lock()


def bits_for(expected_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """(num_bits, num_hashes) sized for ``expected_items`` at ``fpp``,
    the standard optimum m = -n ln p / ln^2 2, k = (m/n) ln 2; num_bits
    is rounded up to a byte boundary."""
    if expected_items < 1:
        raise ValueError(f"expected_items must be >= 1, got {expected_items}")
    if not 0 < fpp < 1:
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    m = int(math.ceil(-expected_items * math.log(fpp) / (math.log(2) ** 2)))
    m = (m + 7) // 8 * 8
    k = max(1, round(m / expected_items * math.log(2)))
    return m, k


def bloom_positions(key_col: str | Column, num_bits: int, num_hashes: int) -> Column:
    """``array<bigint>`` of the key's bit positions — JVM-side
    (codegen'd xxhash64 per seed), shared verbatim by build and probe so
    the no-false-negative contract holds by construction."""
    col = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.array(
        *[
            F.pmod(F.xxhash64(col, F.lit(i)), F.lit(num_bits))
            for i in range(num_hashes)
        ]
    )


def _or_stage(bitmaps: DataFrame, nbytes: int, n_parts: int) -> DataFrame:
    def _combine(it):
        acc = np.zeros(nbytes, dtype=np.uint8)
        for pdf in it:
            for b in pdf["bits"]:
                acc |= np.frombuffer(b, dtype=np.uint8)
        yield pd.DataFrame({"bits": [acc.tobytes()]})

    return bitmaps.repartition(n_parts).mapInPandas(_combine, "bits binary")


def _build_bits(df: DataFrame, key_col: str, num_bits: int, num_hashes: int) -> bytes:
    nbytes = (num_bits + 7) // 8
    pos = bloom_positions(key_col, num_bits, num_hashes).alias("_pos")

    def _bitmap(it):
        acc = np.zeros(nbytes, dtype=np.uint8)
        for pdf in it:
            for arr in pdf["_pos"]:
                a = np.asarray(arr, dtype=np.int64)
                np.bitwise_or.at(acc, a >> 3, (1 << (a & 7)).astype(np.uint8))
        yield pd.DataFrame({"bits": [acc.tobytes()]})

    bitmaps = df.select(pos).mapInPandas(_bitmap, "bits binary")
    # tree-combine: the driver never collects more than _COMBINE_FANIN rows
    n = df.rdd.getNumPartitions()
    while n > _COMBINE_FANIN:
        n = (n + _COMBINE_FANIN - 1) // _COMBINE_FANIN
        bitmaps = _or_stage(bitmaps, nbytes, n)
    acc = np.zeros(nbytes, dtype=np.uint8)
    for row in bitmaps.collect():
        acc |= np.frombuffer(row.bits, dtype=np.uint8)
    return acc.tobytes()


def _bits_path(index_path: str) -> str:
    return os.path.join(index_path, "bits.bin")


def _meta_path(index_path: str) -> str:
    return os.path.join(index_path, "_meta.json")


def read_bloom_meta(index_path: str) -> dict:
    meta = read_marker(_meta_path(index_path))
    if meta is None:
        raise FileNotFoundError(f"no bloom index meta at {index_path}")
    return meta


def build_bloom_index(
    df: DataFrame,
    key_col: str,
    index_path: str,
    num_bits: int | None = None,
    num_hashes: int | None = None,
    expected_items: int | None = None,
    fpp: float = 0.01,
) -> dict:
    """Build and persist the filter over ``df[key_col]``. Size it either
    explicitly (``num_bits``/``num_hashes``) or via ``expected_items`` +
    ``fpp``. Returns the meta dict. Write is atomic (tmp + rename on the
    bits file, meta last) so a crashed build never half-exists."""
    if num_bits is None or num_hashes is None:
        if expected_items is None:
            raise ValueError("pass num_bits+num_hashes or expected_items")
        num_bits, num_hashes = bits_for(expected_items, fpp)
    if num_bits % 8 or num_bits < 8:
        raise ValueError(f"num_bits must be a positive multiple of 8, got {num_bits}")
    if not 1 <= num_hashes <= 32:
        raise ValueError(f"num_hashes must be in [1, 32], got {num_hashes}")
    os.makedirs(index_path, exist_ok=True)
    bits = _build_bits(df, key_col, num_bits, num_hashes)
    commit_file(_bits_path(index_path), bits)
    meta = {"num_bits": num_bits, "num_hashes": num_hashes, "key_col": key_col}
    write_marker(_meta_path(index_path), meta)
    return meta


def _or_bits_into_index(df: DataFrame, key_col: str, index_path: str) -> None:
    """The unguarded read-modify-write core of :func:`update_bloom_index`
    — callers MUST hold ``writer_lease(index_path)`` (the RMW on bits.bin
    is exactly the lost-update race the lease exists for: two concurrent
    updaters each OR into the same base and the second rename drops the
    first's bits, breaking the no-false-negative contract)."""
    meta = read_bloom_meta(index_path)
    new = np.frombuffer(
        _build_bits(df, key_col, meta["num_bits"], meta["num_hashes"]),
        dtype=np.uint8,
    )
    with open(_bits_path(index_path), "rb") as fh:
        acc = np.frombuffer(fh.read(), dtype=np.uint8) | new
    commit_file(_bits_path(index_path), acc.tobytes())


def update_bloom_index(df: DataFrame, key_col: str, index_path: str) -> None:
    """OR a new batch's bits into an existing index — idempotent (a
    replayed batch sets the same bits), atomic via tmp + rename, and
    SERIALIZED by the index's single-writer lease (util.writer_lease,
    same as dedup_index.update_index / similarity.update_ivf_index): the
    read-modify-write on bits.bin would otherwise let two concurrent
    updaters silently lose each other's OR'd bits. A second writer fails
    loudly with LeaseHeldError. The filter only ever GROWS toward its
    sized capacity; rebuild when the admitted corpus outgrows
    ``expected_items`` (monitor saturation via :func:`bloom_saturation`)."""
    with writer_lease(index_path, owner="update_bloom_index"):
        _or_bits_into_index(df, key_col, index_path)


def bloom_saturation(index_path: str) -> float:
    """Fraction of bits set — the rebuild signal (fpp ~= saturation^k)."""
    meta = read_bloom_meta(index_path)
    with open(_bits_path(index_path), "rb") as fh:
        bits = np.frombuffer(fh.read(), dtype=np.uint8)
    return float(np.unpackbits(bits).sum()) / meta["num_bits"]


def _bits_broadcast(df: DataFrame, index_path: str):
    """The cached-per-path bits broadcast for :func:`probe_bloom` —
    stamped by the bits file's (mtime_ns, size) so an updated filter is
    re-read, while repeated probes of an unchanged filter (the streaming
    per-micro-batch path) reuse one broadcast. A superseded broadcast is
    ``unpersist``-ed (NOT destroyed): a lazily-held DataFrame built from
    an earlier probe_bloom and executed after an update must still be
    able to re-fetch the old value from the driver — destroy() would
    fail that plan at runtime with 'Broadcast used after destroy'. The
    get/unpersist/put sequence runs under a lock so two concurrent
    streams on one driver cannot race it."""
    path = _bits_path(index_path)
    st = os.stat(path)
    sc = df.sparkSession.sparkContext
    # the SparkContext's applicationId is part of the stamp: a NEW
    # session in the same Python process must not reuse a broadcast
    # created by a stopped context (it would be a dead JVM handle)
    stamp = (st.st_mtime_ns, st.st_size, sc.applicationId)
    key = os.path.normpath(index_path)
    with _BITS_BC_LOCK:
        hit = _BITS_BC_CACHE.get(key)
        if hit is not None and hit[0] == stamp:
            return hit[1]
        if hit is not None:
            try:
                hit[1].unpersist(blocking=False)
            except Exception:
                pass  # a dead SparkContext just means nothing left to free
        with open(path, "rb") as fh:
            bc = df.sparkSession.sparkContext.broadcast(fh.read())
        _BITS_BC_CACHE[key] = (stamp, bc)
        return bc


def probe_bloom(
    df: DataFrame, key_col: str, index_path: str, out_col: str = "maybe_seen"
) -> DataFrame:
    """Adds boolean ``out_col``: true iff the key MAY have been indexed
    (false is definitive: never indexed). Map-only — the bits broadcast
    once per executor, positions computed JVM-side, the bit test one
    vectorized numpy gather per Arrow batch. The broadcast is CACHED per
    index path (``_BITS_BC_CACHE``) so the per-micro-batch probe of the
    streaming loop reuses one broadcast instead of accumulating a new
    GiB-scale one per batch; the cache invalidates on the bits file's
    (mtime_ns, size) — which every update replaces via os.replace — and
    unpersists the superseded broadcast (executors drop their copies;
    a not-yet-executed plan holding it can still re-fetch from the
    driver)."""
    meta = read_bloom_meta(index_path)
    num_bits, num_hashes = meta["num_bits"], meta["num_hashes"]
    bc = _bits_broadcast(df, index_path)

    @F.pandas_udf("boolean")
    def _probe(p: pd.Series) -> pd.Series:
        bs = np.frombuffer(bc.value, dtype=np.uint8)
        a = np.array(p.tolist(), dtype=np.int64).reshape(-1, num_hashes)
        if a.shape[0] == 0:
            return pd.Series([], dtype=bool)
        hit = (bs[a >> 3] >> (a & 7)) & 1
        return pd.Series(hit.all(axis=1))

    return df.withColumn(
        out_col, _probe(bloom_positions(key_col, num_bits, num_hashes))
    )


def dedup_against_bloom(
    df: DataFrame, key_col: str, index_path: str, keep_flagged: bool = False
) -> DataFrame:
    """The drop-on-flag dedup: rows whose key the filter has definitely
    never seen. ``keep_flagged=True`` inverts — the candidate set to
    hand to an EXACT index probe (hash_index/dedup_index) when a ~fpp
    loss of new documents is not acceptable."""
    flagged = probe_bloom(df, key_col, index_path, out_col="__bloom_seen")
    cond = F.col("__bloom_seen") if keep_flagged else ~F.col("__bloom_seen")
    return flagged.filter(cond).drop("__bloom_seen")
