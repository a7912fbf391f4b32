"""Image near-duplicate detection via perceptual hashing (north-star X4 x
X2: the multimodal column meets the dedup family).

Text had four near-dup families (Jaccard, MinHash-LSH, SimHash, embedding
cosine); images had none. This module closes that gap with dHash — the
difference hash: decode (REAL codecs: functions/{png,jpeg,gif}.py),
nearest-resample to a 9x8 grayscale thumbnail, emit one bit per adjacent-
pixel comparison (is the right neighbor brighter?) -> a 64-bit fingerprint
that is invariant to scale (any render of the same image resamples to the
same thumbnail) and robust to re-encoding (lossless codecs: identical
bits; JPEG: a few flipped bits, caught by the hamming radius).

Pairing reuses the text-SimHash machinery verbatim:
operators/dedup.hamming_pairs_blocked — pigeonhole block split, self-join
on block collisions only, bit_count(xor) verify. Nothing is all-pairs.

100 TB shape: decode is isolated to ONE mapInPandas stage per corpus scan
(Arrow batches; peak memory = one batch per core) and the only thing that
ever reaches an exchange is (id, 64-bit hash) — 16 bytes/image, never a
payload. The blocked self-join shuffles on (block, key), a uniform key by
construction (hash bits). For incremental corpora the persisted-index
half lives below (:func:`build_dhash_index` / :func:`dedup_images_
against_index` / :func:`update_dhash_index` / :func:`compact_dhash_
index`), probing exactly like operators/dedup_index.py probes MinHash
bands.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StructField, StructType

from serverless_etl_bi_on_aws_spark.operators.dedup import hamming_pairs_blocked

#: dHash thumbnail geometry: 9 columns x 8 rows -> 8 comparisons x 8 rows
#: = 64 bits, the standard dHash parameterization.
_W, _H = 9, 8


def dhash_bits(pixels: bytes) -> int:
    """64-bit difference hash of a 9x8 row-major grayscale thumbnail.
    Bit (y*8 + x) is set iff pixel (x+1, y) > pixel (x, y)."""
    h = 0
    for y in range(_H):
        row = pixels[y * _W : (y + 1) * _W]
        for x in range(_W - 1):
            if row[x + 1] > row[x]:
                h |= 1 << (y * 8 + x)
    # interpret as signed 64-bit for Spark's LongType (bit 63 is the sign)
    return h - (1 << 64) if h >= (1 << 63) else h


def with_dhash(
    df: DataFrame, media_col: str = "media", out_col: str = "dhash"
) -> DataFrame:
    """Append a 64-bit dHash column computed through the REAL decode path
    (PNG/JPEG/GIF -> grayscale -> nearest-resample 9x8 -> dHash). Media
    that is NULL, has no real decoder, or fails to decode (corrupt or
    truncated payload — routine in crawl corpora) hashes to NULL — loud
    absence, not a fake fingerprint, and never a failed task: one bad
    image must not kill a corpus-wide stage."""
    from serverless_etl_bi_on_aws_spark.functions.png import resize_nearest
    from serverless_etl_bi_on_aws_spark.sources.multimodal import IMAGE_DECODERS

    out_schema = StructType(df.schema.fields + [StructField(out_col, LongType(), True)])
    # registry snapshot (round 12): same builtin membership as the old
    # frozen REAL_DECODER_MIMES gate, but a registered plugin decoder
    # (register_image_decoder) now feeds the dHash pipeline too, and the
    # snapshot ships driver-side registrations to the executors
    img_dec = dict(IMAGE_DECODERS)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hashes = []
            for m in pdf[media_col]:
                fn = img_dec.get(m["mime"]) if m is not None else None
                if m is None or m["payload"] is None or fn is None:
                    hashes.append(None)
                    continue
                try:
                    w, h, px = fn(bytes(m["payload"]))
                    hashes.append(dhash_bits(resize_nearest(px, w, h, _W, _H)))
                except Exception:
                    hashes.append(None)  # corrupt payload with a real mime
            pdf = pdf.copy()
            pdf[out_col] = pd.array(hashes, dtype="Int64")
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)


def image_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    radius: int = 8,
    n_blocks: int = 16,
) -> DataFrame:
    """Near-duplicate image pairs: dHash + pigeonhole-blocked hamming
    self-join. Returns (id_1, id_2, hamming) with id_1 < id_2 and
    hamming <= ``radius``.

    Radius guidance (measured on the planted fixture generator): a
    re-render at a different scale or a lossless re-encode is hamming 0;
    JPEG q~50 re-encodes land within ~6; unrelated images sit >= 16.
    ``n_blocks=16`` (4-bit blocks) keeps the pigeonhole guarantee up to
    radius 15 while keeping block-collision candidates rare."""
    hashed = with_dhash(df, media_col=media_col).filter(f"dhash IS NOT NULL")
    return hamming_pairs_blocked(
        hashed.select(id_col, "dhash"), id_col, "dhash", radius, n_blocks
    )


# ---------------------------------------------------------------------------
# Incremental image dedup against a PERSISTED dHash index — thin wrappers
# over the modality-agnostic operators/hash_index.py core (round-9
# consolidation: text SimHash / image dHash / audio envelope share one
# build/probe/append/compact implementation; this module contributes the
# decode+hash stage). Indexed images are NEVER re-decoded: the probe's
# only decode stage runs on the new batch (pytest-trapped). NULL-hash
# media (undecodable) survive by definition and are not indexed.
# ---------------------------------------------------------------------------

import os as _os

from pyspark.sql import SparkSession, functions as F

from serverless_etl_bi_on_aws_spark.operators.hash_index import (
    build_hash_index,
    compact_hash_index,
    dropped_ids_against_index,
    init_hash_index,
    read_hash_meta,
    update_hash_index,
)


def _hashed(df: DataFrame, id_col: str, media_col: str) -> DataFrame:
    return (
        with_dhash(df, media_col=media_col)
        .filter(F.col("dhash").isNotNull())
        .select(id_col, "dhash")
    )


def init_dhash_index(
    index_path: str, id_col: str = "doc_id", n_blocks: int = 16
) -> None:
    """Create an EMPTY image index (meta only) — the streaming image
    ingest loop starts here; see hash_index.init_hash_index."""
    init_hash_index(index_path, id_col=id_col, hash_col="dhash", n_blocks=n_blocks)


def build_dhash_index(
    df: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    media_col: str = "media",
    n_blocks: int = 16,
) -> None:
    """One-time build: decode + hash the starting corpus once, persist
    (id, dhash) and the block table. Refuses to clobber an existing
    index (appends belong to :func:`update_dhash_index`)."""
    build_hash_index(
        _hashed(df, id_col, media_col),
        index_path,
        id_col=id_col,
        hash_col="dhash",
        n_blocks=n_blocks,
    )


def dedup_images_against_index(
    spark: SparkSession,
    new_df: DataFrame,
    index_path: str,
    radius: int = 8,
    media_col: str = "media",
) -> DataFrame:
    """Survivors of ``new_df`` under the online rule: drop a new image iff
    its dHash is within hamming ``radius`` of ANY indexed image or a
    smaller-id image of the same batch. NULL-hash (undecodable) media
    always survive. Composes with :func:`update_dhash_index`.

    Plan shape: ``with_dhash`` (the only decode stage) runs exactly once,
    on the new batch; the corpus side is two parquet scans (the block-
    partitioned candidate join, then a hash fetch for candidates only);
    the final anti-join broadcasts dropped ids, so payloads never cross
    an exchange."""
    id_col = read_hash_meta(index_path)["id_col"]
    new_hashed = _hashed(new_df, id_col, media_col).localCheckpoint(eager=True)
    dropped = dropped_ids_against_index(spark, new_hashed, index_path, radius)
    return new_df.join(dropped.select(F.col("_id").alias(id_col)), id_col, "left_anti")


def update_dhash_index(
    new_df: DataFrame,
    index_path: str,
    batch_id: str,
    media_col: str = "media",
) -> bool:
    """Append one batch's hashes — ALL decodable images, duplicates
    included (chain equivalence). Idempotent per ``batch_id``; NULL-hash
    rows are skipped. compact via :func:`compact_dhash_index`."""
    id_col = read_hash_meta(index_path)["id_col"]
    return update_hash_index(_hashed(new_df, id_col, media_col), index_path, batch_id)


def compact_dhash_index(
    spark: SparkSession, index_path: str, target_file_bytes: int = 128 << 20
) -> dict[str, int]:
    """Maintenance: see hash_index.compact_hash_index (per-block rewrite,
    replay-duplicate purge, markers untouched, probe results pinned)."""
    return compact_hash_index(spark, index_path, target_file_bytes)
