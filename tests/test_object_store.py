"""Round 16 (verdict r15 ask #5): the object-store commit seam gets a
test DOUBLE — the SURVEY §7.1 matrix names ``util.commit_file``
(overwrite PUT, last-wins) and ``util.create_exclusive_marker``
(conditional PUT, exactly-once) as the two single-object choke points an
S3/GCS port swaps, but until now every crash suite exercised them over
POSIX rename/O_EXCL. ``FakeObjectStoreBackend`` implements ONLY the
operations an object store has (unconditional PUT; existence-gated PUT
under a store-side mutex; no rename, no O_EXCL), and this module re-runs
the existing crash/replay suites over it, so the design note is a
verified contract: the protocols' ordering/idempotence/lease invariants
hold with object-store primitives alone.

Out of scope, stated plainly: the in-place parquet directory swaps
(streaming/cells.py, streaming/incremental.py, operators/maintenance.py
— the POSIX fallback path) rely on rename by design; their object-store
answer is the snapshot/manifest generation family (operators/snapshot.py,
whose pointer commits DO route through this seam and ARE re-run here).
"""

from __future__ import annotations

import os

import pytest

from serverless_etl_bi_on_aws_spark import util



# Round-19 test tiering (r18 verdict ask #2): this module is a multi-minute
# crash/stream/snapshot integration suite — slow tier, excluded from the
# driver-gated default run (pytest.ini). Run with -m "" for the full suite.
pytestmark = pytest.mark.slow

@pytest.fixture
def fake_store():
    """Install the rename-free backend for the test, restore after."""
    b = util.FakeObjectStoreBackend()
    prev = util.set_object_store_backend(b)
    try:
        yield b
    finally:
        util.set_object_store_backend(prev)


def test_fake_backend_semantics(tmp_path, fake_store):
    """The double's own contract: PUT is last-wins overwrite,
    conditional PUT creates exactly once, DELETE reopens it."""
    p = str(tmp_path / "obj" / "a.json")
    util.commit_file(p, b"one")
    util.commit_file(p, b"two")
    assert open(p, "rb").read() == b"two"
    assert fake_store.puts == 2
    # no temp files left behind — PUT has no rename step to clean up
    assert os.listdir(os.path.dirname(p)) == ["a.json"]

    m = str(tmp_path / "obj" / "m.json")
    assert util.create_exclusive_marker(m, {"i": 1}) is True
    assert util.create_exclusive_marker(m, {"i": 2}) is False
    assert util.read_marker(m) == {"i": 1}
    assert (fake_store.cas_puts, fake_store.cas_conflicts) == (1, 1)
    os.remove(m)  # DELETE
    assert util.create_exclusive_marker(m, {"i": 3}) is True
    assert util.read_marker(m) == {"i": 3}


def test_writer_lease_over_conditional_put(tmp_path, fake_store):
    """The single-writer lease is pure conditional-PUT + DELETE — the
    exact S3/GCS recipe — so it must hold verbatim over the double,
    including the stale-break path."""
    root = str(tmp_path / "idx")
    with util.writer_lease(root, owner="a"):
        with pytest.raises(util.LeaseHeldError):
            with util.writer_lease(root, owner="b"):
                pass
    # released -> reacquirable
    with util.writer_lease(root, owner="c"):
        pass
    # stale break: plant an old lock, then acquire with stale_after_s=0
    lock = util.lease_lock_path(root)
    assert util.create_exclusive_marker(lock, {"owner": "dead"})
    os.utime(lock, (1, 1))
    with util.writer_lease(root, owner="breaker", stale_after_s=1):
        assert util.read_marker(lock)["owner"] == "breaker"
    assert fake_store.cas_puts >= 4


# ---------------------------------------------------------------------------
# the existing crash suites, re-run verbatim over the rename-free backend
# ---------------------------------------------------------------------------


def test_bloom_crash_suite_over_object_store(spark, tmp_path, fake_store):
    """bits.bin RMW under the lease + broadcast-cache invalidation: the
    bloom index's whole mutation protocol is commit_file + the lease
    CAS, so all three r14/r15 hardening suites must hold over PUTs."""
    from tests import test_bloom_index as t

    t.test_update_serialized_by_writer_lease(spark, tmp_path / "a")
    t.test_probe_broadcast_cached_and_invalidated_on_update(spark, tmp_path / "b")
    t.test_stale_plan_survives_index_update(spark, tmp_path / "c")
    assert fake_store.puts > 0 and fake_store.cas_puts > 0


def test_dedup_index_crash_suite_over_object_store(spark, tmp_path, fake_store):
    """Marker-gated appends: idempotent replay + compaction purging
    replay duplicates, over conditional-PUT markers."""
    from tests import test_dedup_index as t

    t.test_update_index_idempotent_per_batch(spark, tmp_path / "a")
    t.test_compact_index_bounds_files_and_purges_replay_duplicates(
        spark, tmp_path / "b"
    )
    assert fake_store.puts > 0


def test_ingest_dedup_replay_points_over_object_store(spark, tmp_path, fake_store):
    """The streaming loop's crash trio (_SUCCESS-gated survivors,
    marker-gated index appends) — the protocol the §7.1 matrix was
    written for."""
    from tests import test_ingest_dedup as t

    t.test_apply_dedup_batch_replay_points(spark, tmp_path / "a")
    assert fake_store.puts > 0


def test_snapshot_crash_suite_over_object_store(spark, tmp_path, fake_store):
    """Generation-store pointer swaps (write_marker = overwrite PUT) and
    versioned-manifest CAS (create_exclusive_marker = conditional PUT):
    readers see before-or-after, never a torn family."""
    from tests import test_snapshot as t

    t.test_snapshot_family_reader_sees_before_or_after(spark, tmp_path / "a")
    t.test_orphaned_lock_files_swept(tmp_path / "b")
    assert fake_store.puts > 0 and fake_store.cas_puts > 0


def test_merge_streaming_epoch_replay_over_object_store(spark, tmp_path, fake_store):
    """The additive cell fold's per-(checkpoint, epoch) idempotence mark
    commits through the seam; replay-is-noop must hold over PUTs."""
    from tests import test_merge_streaming as t

    t.test_cell_merge_epoch_replay_is_noop(spark, tmp_path / "a")
    assert fake_store.puts > 0


def test_generation_merge_over_object_store(spark, tmp_path, fake_store):
    """The round-16 swap-merge convergence runs rename-free END TO END
    at the commit layer: the staging-merge's only publish is the
    generation POINTER marker (overwrite PUT) — content, pre-merge
    reader retention, and replay idempotence all hold over the
    double."""
    from tests import test_merge_streaming as t

    t.test_generation_merge_matches_swap_merge(spark, tmp_path / "a")
    assert fake_store.puts > 0


def test_generation_cell_fold_over_object_store(spark, tmp_path, fake_store):
    """The cells fold's generation twin (round 16) is rename-free at
    the commit layer: epoch mark + pointer are PUTs, idempotence
    holds over the double."""
    from tests import test_merge_streaming as t

    t.test_generation_cell_fold_matches_swap_fold(spark, tmp_path / "a")
    assert fake_store.puts > 0


def test_concurrent_mutator_crash_over_object_store(spark, tmp_path, fake_store):
    """The hardest snapshot suite — a mutator crash concurrent with a
    LIVE takedown stream — over object-store primitives only: neither
    crashed transition commits, the manifest stays consistent, the
    stream keeps draining, the replay converges."""
    from tests import test_snapshot as t

    t.test_mutator_crash_concurrent_with_live_takedown_stream(
        spark, tmp_path / "a"
    )
    assert fake_store.puts > 0 and fake_store.cas_puts > 0


def test_compaction_snapshot_over_object_store(spark, tmp_path, fake_store):
    """Round 17 (verdict ask #4): compact_parquet's rewrite, hosted in a
    mutate_snapshot staged clone, is committed by pointer PUTs alone
    over the double — the in-flight-reader / crash-commits-nothing
    suite re-runs green with object-store primitives at every commit
    point (the rewrite's own renames touch only never-referenced stage
    siblings; see the rename-free staging test above)."""
    from tests import test_snapshot as t

    t.test_compaction_composes_with_snapshot(spark, tmp_path / "a")
    assert fake_store.puts > 0


def test_ivf_retrain_snapshot_over_object_store(spark, tmp_path, fake_store):
    """Round 17 (verdict ask #4): the IVF retrain's two-rename swap,
    hosted in a mutate_snapshot staged clone, commits via pointer PUTs
    over the double — including the test's own pin that the LIVE
    generation is never a rename source."""
    from tests import test_snapshot as t

    t.test_ivf_retrain_composes_with_snapshot(spark, tmp_path / "a")
    assert fake_store.puts > 0


def test_generation_staging_rename_free_over_object_store(
    tmp_path, fake_store, monkeypatch
):
    """Round 17 (ADVICE): with a backend installed, begin_generation
    stages DIRECTLY under the final generation name and commit is the
    pointer PUT alone — zero os.rename anywhere in the protocol (the
    POSIX .__stage__+rename path is now strictly a local fast path).
    Pre-commit invisibility, supersession, and orphan sweep of a
    crashed direct-name stage all hold."""
    from serverless_etl_bi_on_aws_spark.operators import snapshot as sn

    calls = []
    real_rename = os.rename
    monkeypatch.setattr(
        os, "rename", lambda *a: (calls.append(a), real_rename(*a))[1]
    )
    root = str(tmp_path / "store")
    os.makedirs(root)
    gen, stage = sn.begin_generation(root)
    assert os.path.normpath(stage) == os.path.normpath(
        os.path.join(root, gen)
    )
    assert sn.resolve_generation(root) is None  # invisible pre-pointer
    with open(os.path.join(stage, "data.txt"), "w") as f:
        f.write("v1")
    sn.commit_generation(root, gen, stage)
    assert calls == []  # the commit was the pointer PUT, nothing moved
    live = sn.resolve_generation(root)
    with open(os.path.join(live, "data.txt")) as f:
        assert f.read() == "v1"
    g2, s2 = sn.begin_generation(root)
    with open(os.path.join(s2, "data.txt"), "w") as f:
        f.write("v2")
    g3, s3 = sn.begin_generation(root)  # crashed sibling attempt
    with open(os.path.join(s3, "junk"), "w") as f:
        f.write("x")
    sn.commit_generation(root, g2, s2, keep_n=1)
    assert calls == []
    with open(
        os.path.join(sn.resolve_generation(root), "data.txt")
    ) as f:
        assert f.read() == "v2"
    assert not os.path.exists(s3)  # never-referenced orphan swept
    assert fake_store.puts >= 2


def test_scd2_generation_fold_over_object_store(spark, tmp_path, fake_store):
    """The SCD2 dimension fold's generation twin (round 16) commits
    through pointer PUTs only; batch equality, reader retention, and
    wave idempotence hold over the double."""
    from tests import test_scd as t

    t.test_scd2_generation_fold_matches_swap_fold(spark, tmp_path / "a")
    assert fake_store.puts > 0


def test_null_hash_only_batch_is_vacuously_applied(spark, tmp_path):
    """r17 ADVICE hardening: a batch whose every row has a NULL hash
    (undecodable media / unparseable urls) is marker-only applied — NULL
    keys can never match a probe, so appending them only accumulates
    junk block rows."""
    from serverless_etl_bi_on_aws_spark.operators.hash_index import (
        init_hash_index,
        update_hash_index,
    )

    idx = str(tmp_path / "hidx")
    init_hash_index(idx, id_col="doc_id", hash_col="h", n_blocks=4)
    nulls = spark.createDataFrame([(1, None), (2, None)], "doc_id bigint, h bigint")
    assert update_hash_index(nulls, idx, "b0") is True
    assert update_hash_index(nulls, idx, "b0") is False
    import os

    assert not os.path.exists(os.path.join(idx, "blocks"))
