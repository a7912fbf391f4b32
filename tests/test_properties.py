"""Property-based tests (hypothesis) for the invariants that matter most:
merge idempotence and split stability. Small generated batches, few
examples — each example pays a Spark job, so the generators aim at edge
shapes (empty staging, all-overlap, no-overlap, duplicate keys) rather
than volume."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from serverless_etl_bi_on_aws_spark.operators.merge import merge_upsert
from serverless_etl_bi_on_aws_spark.operators.sampling import deterministic_split

KV = st.dictionaries(
    keys=st.integers(min_value=0, max_value=30),
    values=st.integers(min_value=-1000, max_value=1000),
    min_size=0,
    max_size=12,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(final=KV, staging=KV)
@pytest.mark.slow  # round-19 tiering: >=10 s integration test
def test_merge_upsert_is_idempotent_upsert(spark, final, staging):
    fdf = spark.createDataFrame(
        [(k, v) for k, v in final.items()] or [(None, None)], "k int, v int"
    ).filter(F.col("k").isNotNull())
    sdf = spark.createDataFrame(
        [(k, v) for k, v in staging.items()] or [(None, None)], "k int, v int"
    ).filter(F.col("k").isNotNull())

    once = merge_upsert(fdf, sdf, ["k"])
    twice = merge_upsert(once, sdf, ["k"])
    got_once = {(r.k, r.v) for r in once.collect()}
    got_twice = {(r.k, r.v) for r in twice.collect()}

    # Staging wins on overlap; non-overlapping final survives; idempotent.
    expected = {(k, v) for k, v in final.items() if k not in staging} | set(
        staging.items()
    )
    assert got_once == expected
    assert got_twice == got_once


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ids=st.sets(st.integers(min_value=0, max_value=10**9), max_size=40))
def test_deterministic_split_total_and_stable(spark, ids):
    df = spark.createDataFrame([(i,) for i in ids] or [(None,)], "doc_id long").filter(
        F.col("doc_id").isNotNull()
    )
    out = {
        (r.doc_id, r.split)
        for r in deterministic_split(df, "doc_id").collect()
    }
    # Total: every id assigned exactly one split, names from the contract.
    assert {i for i, _ in out} == ids
    assert {s for _, s in out} <= {"train", "val", "test"}
    # Stable under recomputation.
    again = {
        (r.doc_id, r.split)
        for r in deterministic_split(df, "doc_id").collect()
    }
    assert out == again


@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10_000_000),   # price cents
            st.integers(min_value=0, max_value=99),           # discount %
        ),
        min_size=1,
        max_size=200,
    ),
    perm_seed=st.integers(min_value=0, max_value=2**31),
)
def test_scaled_long_cents_rounding_matches_exact_decimal(vals, perm_seed):
    """Pure-Python pin of the q1/q3/q46 money-sum scheme: for any list of
    2dp prices x 2dp discount factors, floor(p*(1-d)*10000 + 0.5) recovers
    the EXACT 4dp product from the float64 computation, the long sum is
    order-independent, and (s+50)//100/100 equals decimal round-half-up of
    the exact sum at 2dp — the property that kills the knife-edge flips."""
    import math
    import random
    from decimal import ROUND_HALF_UP, Decimal

    scaled = []
    exact = Decimal(0)
    for cents, disc in vals:
        p = cents / 100.0                      # 2dp price as float64
        d = disc / 100.0                       # 2dp discount as float64
        s = math.floor(p * (1 - d) * 10000 + 0.5)
        e = (Decimal(cents) * (100 - disc))    # exact product * 10^4
        assert s == int(e), f"float path lost the exact 4dp product: {s} != {e}"
        scaled.append(s)
        exact += e
    rng = random.Random(perm_seed)
    rng.shuffle(scaled)                        # summation order must not matter
    total = sum(scaled)
    assert total == int(exact)
    got = (total + 50) // 100 / 100.0
    want = float(
        (exact / Decimal(10000)).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
    )
    assert got == want


@given(
    samples=st.lists(st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=300),
    rate=st.sampled_from([8000, 16000, 44100]),
    channels=st.integers(min_value=1, max_value=4),
)
@settings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_wav_roundtrip_property(samples, rate, channels):
    """Any int16 sample array (padded to a channel multiple) must survive
    encode->decode bit-exactly, at any rate/channel count."""
    import numpy as np

    from serverless_etl_bi_on_aws_spark.functions.wav import (
        decode_wav_pcm,
        encode_wav_pcm16,
    )

    arr = samples + [0] * ((-len(samples)) % channels)
    data = encode_wav_pcm16(arr, sample_rate=rate, channels=channels)
    dec, r, ch = decode_wav_pcm(data)
    assert (r, ch) == (rate, channels)
    assert dec.tolist() == arr


def test_riff_parsers_never_accept_truncation():
    """Every strict prefix of a valid WAV/AVI either raises ValueError or
    (for WAV cut inside the sample payload) returns only whole frames —
    never garbage, never a hang. Codec robustness for foreign bytes."""
    import numpy as np
    import pytest as _pytest

    from serverless_etl_bi_on_aws_spark.functions.avi import (
        decode_avi_frames,
        encode_avi_frames,
    )
    from serverless_etl_bi_on_aws_spark.functions.png import encode_png
    from serverless_etl_bi_on_aws_spark.functions.wav import (
        decode_wav_pcm,
        encode_wav_pcm16,
    )

    wav = encode_wav_pcm16(np.arange(-50, 50, dtype=np.int16), 8000)
    for cut in range(len(wav)):
        try:
            dec, _, _ = decode_wav_pcm(wav[:cut])
            assert len(dec) <= 100  # whole frames only, no over-read
        except ValueError:
            pass

    frames = [encode_png(bytes(range(64)), 8, 8)]
    avi = encode_avi_frames(frames, 8, 8)
    for cut in range(len(avi)):
        try:
            out, *_ = decode_avi_frames(avi[:cut])
            for fr in out:
                assert fr == frames[0]  # any returned frame is intact
        except ValueError:
            pass


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-4.0, max_value=4.0, allow_nan=False, allow_infinity=False
            ),
            min_size=4,
            max_size=4,
        ),
        min_size=0,
        max_size=24,
    ),
    n_clusters=st.integers(min_value=1, max_value=4),
)
@pytest.mark.slow  # round-19 tiering: >=10 s integration test
def test_semantic_dedup_invariants(spark, vecs, n_clusters):
    """On ANY corpus: clustered pairs ⊆ exact pairs, survivors + dropped
    repartition the corpus, and no surviving pair within one cluster is
    over-threshold (the dominance rule's guarantee)."""
    from serverless_etl_bi_on_aws_spark.operators.semantic_dedup import (
        cluster_assignments,
        semantic_dedup,
        semantic_neardup_pairs,
    )
    from serverless_etl_bi_on_aws_spark.operators.similarity import (
        neardup_cosine_pairs,
    )

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(
        rows or [(None, None)], "vec_id bigint, embedding array<float>"
    ).filter(F.col("vec_id").isNotNull())
    n = df.count()
    if n == 0:
        return
    k = min(n_clusters, n)
    asg = cluster_assignments(df, n_clusters=k, seed=11).localCheckpoint(eager=True)
    clustered = semantic_neardup_pairs(df, 0.8, assignments=asg).localCheckpoint(
        eager=True
    )
    exact = neardup_cosine_pairs(df, 0.8)
    assert (
        clustered.join(
            exact.select("id_1", "id_2"), ["id_1", "id_2"], "left_anti"
        ).count()
        == 0
    )
    dropped = clustered.select("id_2").distinct().count()
    survivors = semantic_dedup(df, 0.8, assignments=asg).count()
    assert survivors + dropped == n
    # dominance guarantee: re-probing the survivor set within the same
    # assignment finds pairs only where BOTH ends were id_1 survivors of
    # chains — i.e. no pair may involve a dropped id... every surviving
    # same-cluster pair's id_2 would have been dropped, so there are none
    surv_df = semantic_dedup(df, 0.8, assignments=asg)
    re_pairs = semantic_neardup_pairs(surv_df, 0.8, assignments=asg)
    assert re_pairs.count() == 0


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1),  # source bucket
            st.integers(min_value=0, max_value=3),  # text template id
        ),
        min_size=0,
        max_size=12,
    )
)
@pytest.mark.slow  # round-19 tiering: >=10 s integration test
def test_curation_funnel_monotone_and_conserving(spark, docs):
    """On ANY corpus: per-group stage counts are monotone non-increasing
    (n_raw >= n_quality >= n_unique >= n_final) and n_raw sums to the
    corpus size."""
    from serverless_etl_bi_on_aws_spark.operators.curation import curation_report

    templates = [
        "b b b b",  # low quality (degenerate repetition, short tokens)
        (
            "the quick brown fox jumps over the lazy dog while seventeen "
            "astronomers catalogue distant variable stars using automated "
            "telescopes during long winter observation campaigns"
        ),
        (
            "market analysts reviewed quarterly earnings reports from twelve "
            "industrial manufacturers before revising their annual growth "
            "projections downward amid persistent supply disruptions"
        ),
        (
            "the quick brown fox jumps over the lazy dog while seventeen "
            "astronomers catalogue distant variable stars using automated "
            "telescopes during long winter observation campaigns appended"
        ),  # near-dup of template 1
    ]
    rows = [
        (i, f"s{srcb}", templates[t]) for i, (srcb, t) in enumerate(docs)
    ]
    df = spark.createDataFrame(
        rows or [(None, None, None)], "doc_id bigint, source string, text string"
    ).filter(F.col("doc_id").isNotNull())
    n = df.count()
    rep = curation_report(df).collect()
    assert sum(r["n_raw"] for r in rep) == n
    for r in rep:
        assert r["n_raw"] >= r["n_quality"] >= r["n_unique"] >= r["n_final"] >= 0
        assert (r["n_final"] == 0) == (r["tokens_final"] == 0)


# ---------------------------------------------------------------- ppm codec


@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    data=st.data(),
)
@settings(max_examples=60, deadline=None)
def test_ppm_roundtrip_exact(w, h, data):
    """plugins/ppm_codec: encode -> decode is the identity on 8-bit
    grayscale for ANY dimensions and pixel content (the plugin is a
    real codec, so it gets codec-grade properties, like png/jpeg)."""
    from serverless_etl_bi_on_aws_spark.plugins.ppm_codec import (
        decode_ppm,
        encode_ppm,
    )

    px = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h, max_size=w * h
            )
        )
    )
    dw, dh, out = decode_ppm(encode_ppm(px, w, h))
    assert (dw, dh) == (w, h)
    assert out == px


@given(
    w=st.integers(min_value=1, max_value=8),
    h=st.integers(min_value=1, max_value=8),
    maxval=st.integers(min_value=256, max_value=65535),
    data=st.data(),
)
@settings(max_examples=30, deadline=None)
def test_ppm_16bit_rescales_within_one(w, h, maxval, data):
    """16-bit rasters (maxval > 255, big-endian per the netpbm spec)
    rescale to 8-bit within +/-1 of the exact ratio."""
    from serverless_etl_bi_on_aws_spark.plugins.ppm_codec import (
        decode_ppm,
        encode_ppm,
    )

    px = bytes(
        data.draw(
            st.lists(st.integers(0, 255), min_size=w * h, max_size=w * h)
        )
    )
    dw, dh, out = decode_ppm(encode_ppm(px, w, h, maxval=maxval))
    assert (dw, dh) == (w, h)
    assert all(abs(a - b) <= 1 for a, b in zip(out, px))


@given(junk=st.binary(max_size=64))
@settings(max_examples=60, deadline=None)
def test_ppm_garbage_refuses_loudly(junk):
    """Arbitrary bytes (and truncated headers/rasters) raise ValueError
    — never return wrong-sized pixels and never crash with anything a
    per-item null convention upstream can't catch."""
    import pytest as _pytest

    from serverless_etl_bi_on_aws_spark.plugins.ppm_codec import decode_ppm

    if junk[:2] in (b"P6", b"P5"):
        # a random blob that happens to start with the magic must still
        # either decode consistently or refuse with ValueError
        try:
            w, h, out = decode_ppm(junk)
            assert len(out) == w * h
        except ValueError:
            pass
    else:
        with _pytest.raises(ValueError):
            decode_ppm(junk)


# ------------------------------------------------ compressed audio (r13)


def test_g711_decode_matches_independent_reference():
    """Every one of the 256 mu-law and A-law codes expands to EXACTLY
    the value an independent G.711 implementation (CPython's audioop)
    produces — the decode tables are spec-exact, not approximate."""
    import warnings

    import numpy as np

    from serverless_etl_bi_on_aws_spark.functions.wav import (
        _ALAW_LUT,
        _ULAW_LUT,
    )

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

        ref_u = np.frombuffer(
            audioop.ulaw2lin(bytes(range(256)), 2), "<i2"
        ).astype(np.int64)
        ref_a = np.frombuffer(
            audioop.alaw2lin(bytes(range(256)), 2), "<i2"
        ).astype(np.int64)
    assert (ref_u == _ULAW_LUT).all()
    assert (ref_a == _ALAW_LUT).all()


@given(
    law=st.sampled_from(["ulaw", "alaw"]),
    data=st.data(),
)
@settings(max_examples=40, deadline=None)
def test_g711_roundtrip_within_segment_quantization(law, data):
    """decode(encode(x)) is the nearest-code quantization of x: the
    error is bounded by half the widest G.711 segment step (<= 512 for
    mu-law, <= 128 for A-law at these amplitudes is not guaranteed, so
    the bound used is the global half-step of each law)."""
    import numpy as np

    from serverless_etl_bi_on_aws_spark.functions.wav import (
        _ALAW_LUT,
        _ULAW_LUT,
        decode_wav_pcm,
        encode_wav_g711,
    )

    n = data.draw(st.integers(1, 200))
    x = np.asarray(
        data.draw(st.lists(st.integers(-32000, 32000), min_size=n, max_size=n)),
        dtype=np.int64,
    )
    dec, rate, ch = decode_wav_pcm(encode_wav_g711(x, 8000, 1, law=law))
    assert (rate, ch) == (8000, 1) and len(dec) == n
    lut = _ULAW_LUT if law == "ulaw" else _ALAW_LUT
    # nearest-code contract: no other code is strictly closer
    vals = np.sort(lut)
    for xi, di in zip(x, dec):
        best = vals[np.argmin(np.abs(vals - xi))]
        assert abs(di - xi) <= abs(best - xi) or di == best


def test_ima_adpcm_recurrence_matches_independent_reference():
    """The block decoder's nibble recurrence is bit-exact against
    CPython audioop's Intel/DVI ADPCM for a random nibble stream and a
    nonzero initial (predictor, index) state — audioop packs HIGH
    nibble first while IMA-WAV packs LOW first, so the stream is
    re-packed for the reference."""
    import struct
    import warnings

    import numpy as np

    from serverless_etl_bi_on_aws_spark.functions.wav import _decode_ima_adpcm

    rng = np.random.default_rng(7)
    nibs = rng.integers(0, 16, 200).tolist()
    pred0, idx0 = -4321, 33
    body = bytearray()
    for i in range(0, 200, 2):
        body.append(nibs[i] | (nibs[i + 1] << 4))
    while len(body) % 4:
        body.append(0)
    block = struct.pack("<hBB", pred0, idx0, 0) + bytes(body)
    mine = _decode_ima_adpcm(bytes(block), 1, len(block))
    packed = bytearray()
    for i in range(0, 200, 2):
        packed.append((nibs[i] << 4) | nibs[i + 1])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

        ref = np.frombuffer(
            audioop.adpcm2lin(bytes(packed), 2, (pred0, idx0))[0], "<i2"
        ).astype(np.int64)
    assert mine[0] == pred0  # the header predictor IS the first sample
    assert (mine[1:201] == ref[:200]).all()


@given(
    channels=st.integers(1, 2),
    block_align=st.sampled_from([32, 128, 256, 1024]),
    freq=st.integers(100, 900),
)
@settings(max_examples=20, deadline=None)
def test_ima_adpcm_roundtrip_tracks_signal(channels, block_align, freq):
    """Lossy-codec contract on a band-limited signal: decode(encode(x))
    tracks x within a small multiple of the adapted step size (SNR
    > 20 dB on a 12k-amplitude sine; exactness is pinned by the
    recurrence test above). Covers mono and the stereo 4-byte-group
    interleave, several block sizes, and the padded final block."""
    import numpy as np

    from serverless_etl_bi_on_aws_spark.functions.wav import (
        decode_wav_pcm,
        encode_wav_ima_adpcm,
    )

    t = np.arange(997)  # deliberately not a multiple of any block size
    sine = (12000 * np.sin(2 * np.pi * freq * t / 8000)).astype(np.int64)
    if channels == 2:
        x = np.empty(2 * sine.size, dtype=np.int64)
        x[0::2], x[1::2] = sine, -sine
    else:
        x = sine
    dec, rate, ch = decode_wav_pcm(
        encode_wav_ima_adpcm(x, 8000, channels, block_align=block_align)
    )
    assert (rate, ch) == (8000, channels)
    n = x.size
    assert len(dec) >= n
    err = dec[:n] - x[:n]
    snr = 10 * np.log10(float((x[:n] ** 2).mean()) / max(float((err**2).mean()), 1.0))
    assert snr > 20.0, f"SNR {snr:.1f} dB"


def test_wav_unsupported_formats_still_refuse():
    """MS-ADPCM (2), IEEE float (3), extensible (0xFFFE) keep the loud
    ValueError contract — only formats decoded EXACTLY per spec pass."""
    import struct

    import pytest as _pytest

    from serverless_etl_bi_on_aws_spark.functions.wav import decode_wav_pcm

    for tag in (2, 3, 0xFFFE):
        fmt = struct.pack("<HHIIHH", tag, 1, 8000, 8000, 2, 16)
        chunks = b"".join(
            [b"fmt ", struct.pack("<I", len(fmt)), fmt,
             b"data", struct.pack("<I", 4), b"\x00\x00\x00\x00"]
        )
        wav = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
        with _pytest.raises(ValueError):
            decode_wav_pcm(wav)


def test_ima_adpcm_block_align_and_truncated_header_guards():
    """Round-13 ADVICE (low): (a) a block_align whose data region does
    not split into whole 4-byte-per-channel groups (e.g. 12 with 2
    channels passes % 4) must raise the codec's own diagnostic, not an
    opaque numpy reshape error; (b) a final block truncated INSIDE its
    per-channel header must be dropped, not fabricate one sample per
    channel from zero padding."""
    import struct

    import numpy as np
    import pytest as _pytest

    from serverless_etl_bi_on_aws_spark.functions.wav import _decode_ima_adpcm

    # (a) stereo block_align=12: hdr=8, data region 4 not a multiple of 8
    with _pytest.raises(ValueError, match="block align"):
        _decode_ima_adpcm(b"\x00" * 24, 2, 12)
    # mono block_align must still work at any multiple of 4 above hdr
    blk = struct.pack("<hBB", 100, 0, 0) + b"\x00" * 8
    assert _decode_ima_adpcm(blk, 1, 12).size == 17

    # (b) two mono blocks, the second truncated to 2 bytes (< 4-byte hdr)
    full = struct.pack("<hBB", 500, 10, 0) + bytes(range(8))
    truncated = full + b"\x01\x02"
    whole = _decode_ima_adpcm(full, 1, 12)
    got = _decode_ima_adpcm(truncated, 1, 12)
    assert np.array_equal(got, whole), (
        "a tail shorter than the header must contribute zero samples"
    )
    # a tail with a COMPLETE header still yields its predictor sample
    with_hdr = full + struct.pack("<hBB", -7, 0, 0)
    got2 = _decode_ima_adpcm(with_hdr, 1, 12)
    assert got2.size == whole.size + 1 and got2[-1] == -7


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ids=st.sets(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=24),
    edge_seed=st.integers(min_value=0, max_value=2**31),
    n_edges=st.integers(min_value=0, max_value=20),
)
@pytest.mark.slow  # round-19 tiering: >=10 s integration test
def test_cluster_safe_split_no_straddle_property(spark, ids, edge_seed, n_edges):
    """q91's invariant over RANDOM pair graphs: no connected component
    ever straddles splits; every row keeps exactly one assignment; rows
    in no pair match deterministic_split exactly."""
    import random

    from serverless_etl_bi_on_aws_spark.operators.sampling import (
        cluster_safe_split,
    )

    rng = random.Random(edge_seed)
    id_list = sorted(ids)
    edges = [
        (rng.choice(id_list), rng.choice(id_list)) for _ in range(n_edges)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame([(i,) for i in id_list], "doc_id long")
    pairs = spark.createDataFrame(
        edges or [(-1, -2)], "id_1 long, id_2 long"
    )
    rows = cluster_safe_split(df, "doc_id", pairs).collect()
    assert {r.doc_id for r in rows} == ids  # total, exactly once
    by_id = {r.doc_id: r for r in rows}

    # local union-find ground truth for components over the planted edges
    parent = {i: i for i in id_list}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a in parent and b in parent:
            parent[find(a)] = find(b)
    comps = {}
    for i in id_list:
        comps.setdefault(find(i), []).append(i)
    for members in comps.values():
        splits = {by_id[i].split for i in members}
        keys = {by_id[i].split_key for i in members}
        assert len(splits) == 1 and len(keys) == 1, (members, splits)
        if len(members) == 1:
            # singleton: identical to the plain id-hash assignment
            i = members[0]
            want = deterministic_split(df, "doc_id").filter(
                F.col("doc_id") == i
            ).head().split
            assert by_id[i].split == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ids=st.sets(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=30),
    r_a=st.integers(min_value=0, max_value=40000),
    r_b=st.integers(min_value=0, max_value=40000),
)
def test_epoch_mix_repeat_conserves_exact_counts(spark, ids, r_a, r_b):
    """q97's invariant over random factors: every row materializes
    EXACTLY r//10000 (+1 iff bucket < r%10000) copies with contiguous
    copy_idx — total output size is the closed-form sum, never a
    statistical approximation."""
    from serverless_etl_bi_on_aws_spark.operators.sampling import (
        epoch_mix_repeat,
    )

    id_list = sorted(ids)
    rows = [(i, "a" if i % 2 == 0 else "b") for i in id_list]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = epoch_mix_repeat(
        df, "lang", {"a": r_a / 10000, "b": r_b / 10000}, id_col="doc_id"
    ).collect()

    per = {}
    for r in out:
        per.setdefault(r.doc_id, []).append(r.copy_idx)
    for i, lang in rows:
        r_ten = r_a if lang == "a" else r_b
        want = r_ten // 10000 + (
            1 if (i * 2654435761) % 10000 < r_ten % 10000 else 0
        )
        assert sorted(per.get(i, [])) == list(range(want)), (i, want)


# ---------------------------------------------------------------------------
# select_token_budget (round 14): strict-prefix selection vs a plain
# reference, mid-group boundary, edge budgets, determinism, guards.
# ---------------------------------------------------------------------------

def _budget_reference(rows, budget):
    """rows: (id, score, tok). Strict prefix over (score desc, id asc)."""
    out, cum = [], 0
    for i, s, t in sorted(rows, key=lambda r: (-r[1], r[0])):
        if cum + t > budget:
            break
        cum += t
        out.append(i)
    return sorted(out)


def test_token_budget_strict_prefix(spark):
    from serverless_etl_bi_on_aws_spark.operators.sampling import (
        select_token_budget,
    )

    rows = [(i, i % 5, (i * 7) % 13 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id bigint, score bigint, tok bigint")
    for budget in (0, 37, 250, 10_000, 10**9):
        got = sorted(
            r.doc_id
            for r in select_token_budget(
                df, budget, "score", "tok", "doc_id"
            ).collect()
        )
        assert got == _budget_reference(rows, budget), budget
    # determinism across partitionings at a mid-group boundary
    a = sorted(r.doc_id for r in select_token_budget(
        df.repartition(16), 250, "score", "tok", "doc_id").collect())
    assert a == _budget_reference(rows, 250)


def test_token_budget_guards(spark):
    import pytest

    from pyspark.sql import functions as F

    from serverless_etl_bi_on_aws_spark.operators.sampling import (
        select_token_budget,
    )

    df = spark.createDataFrame([(1, 1, 1)], "doc_id bigint, score bigint, tok bigint")
    with pytest.raises(ValueError, match="budget"):
        select_token_budget(df, -1, "score", "tok", "doc_id")
    wide = spark.range(100_001).select(
        F.col("id").alias("doc_id"), F.col("id").alias("score"),
        F.lit(1).alias("tok"),
    )
    with pytest.raises(ValueError, match="distinct scores"):
        select_token_budget(wide, 10, "score", "tok", "doc_id")


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=30),
    budget=st.integers(min_value=1, max_value=800),
)
def test_pack_examples_conserves_and_orders(spark, sizes, budget):
    """For ANY sizes/budget: every input row lands in exactly one packed
    example, totals are conserved, shard ids are a dense 0..n prefix in
    order, and each example's member list replays a greedy sequential
    packing (cumulative-before div budget)."""
    from serverless_etl_bi_on_aws_spark.operators.packing import pack_examples

    rows = [(i, s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id int, tok int")
    got = sorted(
        (r["shard_id"], r["n_docs"], r["total_tokens"], r["doc_ids"])
        for r in pack_examples(df, "doc_id", "tok", budget=budget).collect()
    )
    # independent greedy reference
    want: dict[int, list[int]] = {}
    cum = 0
    for i, s in rows:
        want.setdefault(cum // budget, []).append(i)
        cum += s
    assert [g[0] for g in got] == sorted(want)  # dense prefix of shard ids
    assert sum(g[1] for g in got) == len(sizes)
    assert sum(g[2] for g in got) == sum(sizes)
    for sid, n, tot, csv in got:
        assert csv == ",".join(str(i) for i in want[sid])
        assert n == len(want[sid])
        assert tot == sum(sizes[i] for i in want[sid])


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from(
                "abXY 123!«»" "мир" "αβγ" "世界" "かなカナ" "한국" "سلم" "नमस"
            ),
            max_size=24,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_dominant_script_matches_python_reference(spark, texts):
    """dominant_script agrees with an independent pure-Python evaluation
    of the SAME closed-form ranges (count desc, name asc tie-break,
    'none' when no script chars) on arbitrary mixed-script strings."""
    from serverless_etl_bi_on_aws_spark.functions.text import (
        SCRIPT_RANGES,
        dominant_script,
    )

    bounds = {
        name: (rng[1], rng[3]) if name != "latin" else None
        for name, rng in SCRIPT_RANGES.items()
    }

    def ref(t: str) -> str:
        counts = {}
        for name, b in bounds.items():
            if b is None:
                counts[name] = sum("A" <= c <= "Z" or "a" <= c <= "z" for c in t)
            else:
                lo, hi = b
                counts[name] = sum(lo <= c <= hi for c in t)
        top = max(counts.values())
        best = min(n for n in counts if counts[n] == top)  # alpha-first tie
        return best if top > 0 else "none"

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    got = {r["i"]: r["script"] for r in df.select("i", dominant_script("t")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == ref(t), (t, got[i], ref(t))


def test_token_budget_guard_refuses_before_collecting(spark, monkeypatch):
    """r14 verdict Wrong #2: the >100k-distinct-score refusal must fire
    WITHOUT pulling the per-score frame to the driver. collect is
    poisoned, so the pre-fix order (collect, then guard) fails loudly
    while the fixed order (bounded limit+count probe, then refuse)
    passes."""
    import pytest

    import pyspark.sql

    from serverless_etl_bi_on_aws_spark.operators.sampling import (
        select_token_budget,
    )

    wide = spark.range(100_001).select(
        F.col("id").alias("doc_id"),
        F.col("id").alias("score"),
        F.lit(1).alias("tok"),
    )

    def _boom(self):
        raise AssertionError("collected the per-score frame before the guard")

    monkeypatch.setattr(pyspark.sql.DataFrame, "collect", _boom)
    with pytest.raises(ValueError, match="distinct scores"):
        select_token_budget(wide, 10, "score", "tok", "doc_id")


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    words=st.lists(
        st.text(
            alphabet="abcdefghijklmnopqrstuvwxyz0123456789 ",
            min_size=0,
            max_size=40,
        ),
        min_size=0,
        max_size=4,
    ),
    digits=st.lists(st.integers(min_value=0, max_value=9), min_size=0, max_size=22),
)
@pytest.mark.slow  # round-19 tiering: >=10 s integration test
def test_masking_never_touches_checksum_free_text(spark, words, digits):
    """Round-16 property: over arbitrary text containing an arbitrary
    digit run, the card/IBAN redaction chain either replaces a
    checksum-VALID candidate with its token or returns the text
    byte-identical — it never mangles non-candidate content (the
    false-positive direction destroys training data)."""
    from serverless_etl_bi_on_aws_spark.functions.text import (
        iban_valid,
        luhn_valid,
        mask_valid_cards,
        mask_valid_ibans,
    )

    run = "".join(str(d) for d in digits)
    text = (" ".join(words) + " " + run).strip()
    df = spark.createDataFrame([(0, text)], "i bigint, text string")
    r = df.select(
        mask_valid_cards("text").alias("mc"),
        mask_valid_ibans("text").alias("mi"),
    ).head()
    # every change is an exact token substitution: undoing the token
    # leaves only strings that were real substrings of the input
    assert "<CARD>" in r.mc or r.mc == text
    assert "<IBAN>" in r.mi or r.mi == text
    for masked, token in ((r.mc, "<CARD>"), (r.mi, "<IBAN>")):
        for piece in masked.split(token):
            assert piece in text


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ids=st.sets(st.integers(min_value=0, max_value=10**6), max_size=30),
    k=st.integers(min_value=0, max_value=8),
)
def test_stratified_sample_exact_properties(spark, ids, k):
    """Quotas are exactly min(k, |stratum|); membership is a pure
    function of (id, stratum) — stable under re-partitioning; the
    sample is always a subset of the input."""
    from serverless_etl_bi_on_aws_spark.operators.sampling import (
        stratified_sample_exact,
    )

    rows = [(i, "g" + str(i % 3)) for i in ids]
    df = spark.createDataFrame(rows or [(None, None)], "doc_id long, grp string").filter(
        F.col("doc_id").isNotNull()
    )
    out = stratified_sample_exact(df, "grp", k=k)
    got = {}
    for r in out.collect():
        got.setdefault(r.grp, set()).add(r.doc_id)
    sizes = {g: len(v) for g, v in got.items()}
    want_sizes = {}
    for i in ids:
        g = "g" + str(i % 3)
        want_sizes[g] = want_sizes.get(g, 0) + 1
    for g, n in sizes.items():
        assert n == min(k, want_sizes[g])
    assert all(v <= ids for v in got.values())
    again = {}
    for r in stratified_sample_exact(df.repartition(5), "grp", k=k).collect():
        again.setdefault(r.grp, set()).add(r.doc_id)
    assert got == again
