"""Streaming pipeline + multimodal plumbing tests."""

import hashlib
import math

import pytest

from pyspark.sql import functions as F

from swissgeol_ocr_spark.functions.multimodal import (
    TEN_MB,
    downscale_oversized,
    extract_media_features,
    normalize_media,
    sample_frames,
)
from swissgeol_ocr_spark.plans.pipeline import extract_pipeline
from swissgeol_ocr_spark.sources.corpus import (
    documents_to_spans,
    media_table_from_documents,
)


@pytest.fixture(scope="module")
def media_df(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    return media_table_from_documents(docs).cache()


class TestMultimodal:
    def test_schema(self, media_df):
        fields = {f.name for f in media_df.schema.fields}
        assert fields == {"media_ref", "doc_id", "kind", "payload", "meta"}
        assert dict(media_df.dtypes)["payload"] == "binary"

    def test_normalize_media_jpx_to_jpg(self, media_df):
        out = normalize_media(media_df)
        assert out.filter(F.col("meta.format").isin("jpx", "jp2")).count() == 0
        # non-jpx formats untouched
        before = media_df.filter(~F.col("meta.format").isin("jpx", "jp2")).count()
        after = out.filter(F.col("meta.format").isin("jpg", "png", "mp4")).count()
        assert after >= before

    def test_downscale_budget_semantics(self, media_df):
        out = downscale_oversized(media_df)
        rows = out.select("meta.n_bytes", "downscale_iters", "skip_oversized").collect()
        for r in rows:
            k = r.downscale_iters
            assert 0 <= k <= 10
            fits = r.n_bytes / (4.0**k) < TEN_MB
            assert fits == (not r.skip_oversized)
            if k > 0:  # minimality: k-1 halvings would not have fit
                assert r.n_bytes / (4.0 ** (k - 1)) >= TEN_MB

    def test_feature_extraction_batched_and_deterministic(self, media_df):
        import math

        import numpy as np

        out = extract_media_features(media_df)
        rows = {r.media_ref: r for r in out.collect()}
        assert len(rows) == media_df.count()
        src = {
            r.media_ref: (r.kind, bytes(r.payload)) for r in media_df.collect()
        }
        n_raster = n_stub = 0
        for ref, r in rows.items():
            kind, payload = src[ref]
            if kind == "image":
                # REAL decode: payload is a Netpbm raster; recompute the
                # statistics from the bytes independently
                n_raster += 1
                assert r.decoded
                magic, dims, maxval, raw = payload.split(b"\n", 3)
                w, h = (int(t) for t in dims.split())
                depth = 3 if magic == b"P6" else 1
                px = np.frombuffer(raw[: w * h * depth], dtype=np.uint8)
                assert r.is_stencil == (magic == b"P5")
                if r.is_stencil:
                    px = 255 - px.astype(np.int64)
                assert (r.px_w, r.px_h) == (w, h)
                assert r.n_samples == w * h * depth
                assert r.sum_px == int(px.sum())
                assert r.min_px == int(px.min()) and r.max_px == int(px.max())
                assert r.n_dark == int(np.count_nonzero(px < 64))
                assert r.mean_px == math.floor(px.sum() * 1e6 / px.size) / 1e6
            else:
                # codec formats: the declared digest stub
                n_stub += 1
                assert not r.decoded
                digest = hashlib.sha256(payload).digest()
                block = np.frombuffer((digest * 2)[:64], dtype=np.uint8).reshape(8, 8)
                assert r.sum_px == int(block.sum())
                assert r.feature_hash == hashlib.md5(block.tobytes()).hexdigest()
        assert n_raster >= 10 and n_stub >= 10

    def test_stencil_invert_real_pixels(self):
        """P8 on a hand-built PGM stencil: decode + invert must reproduce
        the exact inverted byte values (reference crop.py:187-190)."""
        import numpy as np

        from swissgeol_ocr_spark.functions.multimodal import (
            decode_raster,
            invert_stencil,
        )

        px = np.arange(12, dtype=np.uint8).reshape(3, 4)
        payload = b"P5\n4 3\n255\n" + px.tobytes()
        decoded, is_stencil = decode_raster(payload)
        assert is_stencil and decoded.shape == (3, 4)
        inv = invert_stencil(decoded)
        assert inv.tolist() == (255 - px.astype(int)).tolist()
        # RGB raster: not a stencil, shape (h, w, 3)
        rgb = b"P6\n2 2\n255\n" + bytes(range(12))
        decoded, is_stencil = decode_raster(rgb)
        assert not is_stencil and decoded.shape == (2, 2, 3)
        assert decode_raster(b"\x89PNG...") is None

    def test_sample_frames_plan(self, media_df):
        frames = sample_frames(media_df, every_ms=1000)
        per = frames.groupBy("media_ref").count().collect()
        durations = {
            r.media_ref: r.duration_ms
            for r in media_df.filter(F.col("kind") == "video")
            .select("media_ref", F.col("meta.duration_ms").alias("duration_ms"))
            .collect()
        }
        assert len(per) == len(durations)
        for r in per:
            expected = math.floor((durations[r.media_ref] - 1) / 1000) + 1
            assert r["count"] == expected


class TestStreaming:
    def test_stream_matches_batch(self, spark, sf_dir, tmp_path):
        """availableNow streaming over the same spans corpus must produce
        exactly the batch pipeline's output (same kernel, two modes)."""
        from swissgeol_ocr_spark.streaming.pipeline import run_stream_to_parquet

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
        spans = documents_to_spans(docs)
        in_dir = str(tmp_path / "in")
        out_dir = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        spans.write.parquet(in_dir)

        q = run_stream_to_parquet(spark, in_dir, out_dir, ckpt)
        q.awaitTermination(120)

        stream_out = {
            r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans_out]
            for r in spark.read.parquet(out_dir).collect()
        }
        batch_out = {
            r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans_out]
            for r in extract_pipeline(spans, repartition=False).collect()
        }
        assert stream_out == batch_out

        # restart with the same checkpoint: no new files → no duplicates
        q2 = run_stream_to_parquet(spark, in_dir, out_dir, ckpt)
        q2.awaitTermination(60)
        assert spark.read.parquet(out_dir).count() == len(batch_out)


def test_streaming_dedup_exact(spark, sf_dir, tmp_path):
    """Streaming exact dedup (dropDuplicatesWithinWatermark on md5(text))
    must emit exactly one row per distinct fingerprint across micro-batch
    files, each kept doc_id belonging to that fingerprint's group —
    keep-first semantics over a feed with duplicates injected both inside
    one file and across files."""
    from pyspark.sql import functions as F

    from swissgeol_ocr_spark.streaming.pipeline import dedup_stream

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30).cache()
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # file 1: originals + an in-file duplicate of each (doc_id suffixed)
    dup1 = docs.select(F.concat(F.col("doc_id").cast("string"), F.lit("-d1")).alias("doc_id"), "text")
    docs.select(F.col("doc_id").cast("string").alias("doc_id"), "text") \
        .unionByName(dup1).repartition(1).write.parquet(in_dir)
    # file 2: a second wave of duplicates arriving in a later micro-batch
    docs.select(F.concat(F.col("doc_id").cast("string"), F.lit("-d2")).alias("doc_id"), "text") \
        .repartition(1).write.mode("append").parquet(in_dir)

    stream = spark.readStream.schema("doc_id string, text string").parquet(in_dir)
    q = (
        dedup_stream(stream).writeStream.format("parquet")
        .option("path", out_dir).option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)

    out = spark.read.parquet(out_dir)
    expected_fps = {r.fp for r in docs.select(F.md5("text").alias("fp")).distinct().collect()}
    got = out.collect()
    assert {r.fp for r in got} == expected_fps
    assert len(got) == len(expected_fps)  # one survivor per fingerprint
    # every kept doc_id really carries its fingerprint's text
    fp_of = {r.doc_id: r.fp for r in got}
    all_rows = {r.doc_id: r.fp for r in spark.read.parquet(in_dir)
                .select("doc_id", F.md5("text").alias("fp")).collect()}
    for doc_id, fp in fp_of.items():
        assert all_rows[doc_id] == fp
    docs.unpersist()


def test_streaming_sessionize_matches_batch(spark, sf_dir, tmp_path):
    """The streaming session_window face must produce exactly the batch
    `sessionize` sessions on the same events: same (user, start) key set,
    same per-session event counts and cent totals, and the stream's
    half-open window end = batch last-event end + gap. The feed is split
    into two micro-batch files by event_id parity, so almost every session
    must be MERGED across micro-batches in the state store — the hard path."""
    import datetime

    from swissgeol_ocr_spark.plans.queries import q_sessionize
    from swissgeol_ocr_spark.streaming.pipeline import sessionize_stream

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    in_dir = str(tmp_path / "in")
    ev.filter(F.col("event_id") % 2 == 0).repartition(1).write.parquet(in_dir)
    ev.filter(F.col("event_id") % 2 == 1).repartition(1).write.mode(
        "append"
    ).parquet(in_dir)

    schema = ("event_id bigint, ts timestamp_ntz, user_id bigint, "
              "event_type string, value double, props string")
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(in_dir)
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("sess_stream_tbl")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.user_id, r.window_start): r
        for r in spark.table("sess_stream_tbl").collect()
    }
    want = {
        (r.user_id, r.session_start): r
        for r in q_sessionize(spark, sf_dir).collect()
    }
    assert set(got) == set(want) and len(want) > 0
    gap = datetime.timedelta(minutes=30)
    for key, b in want.items():
        s = got[key]
        assert s.n_events == b.n_events
        assert s.sum_value_cents == b.sum_value_cents
        assert s.window_end == b.session_end + gap

    # deployment shape: append mode + watermark emits FINALIZED sessions
    # only — every emitted session must be exactly its batch twin (a
    # subset: sessions still open when the last watermark advanced stay
    # in state), and the watermark must have finalized at least one.
    # The append leg gets a TIME-split feed (not the parity split above):
    # parity interleaves halves across the full time range, so most
    # second-batch events sit behind the batch-1 watermark — Spark 4.1.2
    # happens to merge them into existing session state before eviction,
    # but documented semantics allow dropping them; a time split keeps
    # the test pinned to the CONTRACT, not to leniency.
    mid = ev.selectExpr("percentile_approx(ts, 0.5) AS m").first().m
    in_dir2 = str(tmp_path / "in2")
    ev.filter(F.col("ts") <= mid).repartition(1).write.parquet(in_dir2)
    ev.filter(F.col("ts") > mid).repartition(1).write.mode("append").parquet(
        in_dir2
    )
    q2 = (
        sessionize_stream(
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
            .parquet(in_dir2),
            watermark="0 seconds",
        )
        .writeStream.format("memory")
        .queryName("sess_stream_append")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    finalized = spark.table("sess_stream_append").collect()
    assert len(finalized) > 0
    for r in finalized:
        b = want[(r.user_id, r.window_start)]
        assert (r.n_events, r.sum_value_cents) == (b.n_events, b.sum_value_cents)


def test_streaming_asof_matches_batch(spark, sf_dir, tmp_path):
    """The streaming as-of enrichment must produce exactly the batch
    `asof_join` result on an in-order feed: events split at the time
    median into two micro-batch files (per-user event-time order holds
    across batches — the kafka-partition-by-user deployment shape), so
    clicks in the second batch must match views remembered in STATE from
    the first."""
    from swissgeol_ocr_spark.plans.queries import q_asof_join
    from swissgeol_ocr_spark.streaming.pipeline import asof_stream

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").cache()
    mid = ev.selectExpr("percentile_approx(ts, 0.5) AS m").first().m
    in_dir = str(tmp_path / "in")
    ev.filter(F.col("ts") <= mid).repartition(1).write.parquet(in_dir)
    ev.filter(F.col("ts") > mid).repartition(1).write.mode("append").parquet(in_dir)

    schema = ("event_id bigint, ts timestamp_ntz, user_id bigint, "
              "event_type string, value double, props string")
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(in_dir)
    out_dir = str(tmp_path / "out")
    q = (
        asof_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {r.click_id: r for r in spark.read.parquet(out_dir).collect()}
    want = {r.click_id: r for r in q_asof_join(spark, sf_dir).collect()}
    ev.unpersist()
    assert set(got) == set(want) and len(want) > 0
    for cid, w in want.items():
        g = got[cid]
        assert (g.matched_view_id, g.lag_us, g.user_id) == (
            w.matched_view_id, w.lag_us, w.user_id,
        )
    # the hard path really ran: some second-batch click matched a view
    # that only state could remember across the micro-batch boundary
    # (view_ts reconstructed as click_ts - lag)
    import datetime as dt

    assert any(
        g.matched_view_id is not None
        and g.click_ts > mid
        and g.click_ts - dt.timedelta(microseconds=g.lag_us) <= mid
        for g in got.values()
    )


def test_streaming_funnel_matches_batch(spark, sf_dir, tmp_path):
    """The streaming change-data funnel must converge to the batch
    `funnel_stages` result: per user, the LAST emitted row (highest stage)
    carries the batch first-reach triple; users at stage 0 never emit.
    Split at the time median so stage advances span micro-batches."""
    from swissgeol_ocr_spark.plans.queries import q_funnel_stages
    from swissgeol_ocr_spark.streaming.pipeline import funnel_stream

    import datetime as dt

    base = spark.read.parquet(f"{sf_dir}/events.parquet")
    mid = base.selectExpr("percentile_approx(ts, 0.5) AS m").first().m
    # planted user 999999 advances in BOTH halves — view before the split,
    # click+purchase after — so the cross-batch change-data path is
    # deterministic even on a sparse corpus
    schema = ("event_id bigint, ts timestamp_ntz, user_id bigint, "
              "event_type string, value double, props string")
    planted = spark.createDataFrame(
        [
            (90000001, mid - dt.timedelta(hours=1), 999999, "view", 1.0, "{}"),
            (90000002, mid + dt.timedelta(hours=1), 999999, "click", 2.0, "{}"),
            (90000003, mid + dt.timedelta(hours=2), 999999, "purchase", 3.0, "{}"),
        ],
        schema,
    )
    ev = base.unionByName(planted).cache()
    batch_dir = str(tmp_path / "batch")
    ev.write.parquet(f"{batch_dir}/events.parquet")
    in_dir = str(tmp_path / "in")
    ev.filter(F.col("ts") <= mid).repartition(1).write.parquet(in_dir)
    ev.filter(F.col("ts") > mid).repartition(1).write.mode("append").parquet(in_dir)

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(in_dir)
    out_dir = str(tmp_path / "out")
    q = (
        funnel_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    latest: dict[int, object] = {}
    n_emits: dict[int, int] = {}
    for r in spark.read.parquet(out_dir).collect():
        n_emits[r.user_id] = n_emits.get(r.user_id, 0) + 1
        if r.user_id not in latest or r.reached_stage > latest[r.user_id].reached_stage:
            latest[r.user_id] = r
    want = {r.user_id: r for r in q_funnel_stages(spark, batch_dir).collect()}
    ev.unpersist()

    assert set(latest) == {u for u, w in want.items() if w.reached_stage > 0}
    for u, g in latest.items():
        w = want[u]
        assert g.reached_stage == w.reached_stage
        assert g.first_view == w.first_view
        assert (g.first_click_after, g.first_purchase_after) == (
            w.first_click_after, w.first_purchase_after,
        )
    # change-data semantics really engaged: the planted user emitted one
    # row per micro-batch (stage 1 in the first, stage 3 in the second)
    assert n_emits[999999] == 2 and latest[999999].reached_stage == 3


def test_streaming_neardup_matches_batch(spark, tmp_path):
    """Incremental banded near-dup (foreachBatch against the accumulated
    band index) must produce exactly the batch `dedup_minhash_lsh` pair
    set on the same corpus — including a cross-batch near-dup (index-join
    leg), a cross-batch exact duplicate (fingerprint drop leg), and
    in-batch exact duplicates (the collapse leg)."""
    from pyspark.sql import functions as F

    from swissgeol_ocr_spark.plans.queries import q_dedup_minhash_lsh
    from swissgeol_ocr_spark.streaming.pipeline import minhash_neardup_stream

    body = "the quick brown fox jumps over the lazy dog again and again"
    other = "totally different text about mountains and rivers flowing by"
    chunk1 = [(0, body), (1, body),  # in-batch exact dups → one rep (0)
              (2, other)]
    chunk2 = [(3, body),                         # cross-batch exact dup of 0
              (4, body.replace("dog", "cat")),   # cross-batch near-dup of 0
              (5, other + " streams")]           # cross-batch near-dup of 2
    in_dir = str(tmp_path / "in")
    schema = "doc_id long, text string"
    # two writes → two files with distinct mod times → two micro-batches
    # (maxFilesPerTrigger=1; the file source processes oldest-first)
    spark.createDataFrame(chunk1, schema).repartition(1).write.parquet(in_dir)
    spark.createDataFrame(chunk2, schema).repartition(1).write.mode(
        "append"
    ).parquet(in_dir)

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(in_dir)
    q = minhash_neardup_stream(
        stream,
        index_path=str(tmp_path / "bandindex"),
        pairs_path=str(tmp_path / "pairs"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    got = {(r.a_id, r.b_id)
           for r in spark.read.parquet(str(tmp_path / "pairs")).collect()}

    sf = str(tmp_path / "batchsf")
    spark.createDataFrame(chunk1 + chunk2, schema).withColumn(
        "lang", F.lit("en")
    ).withColumn("source", F.lit("s1")).write.parquet(f"{sf}/documents.parquet")
    want = {(r.a_id, r.b_id) for r in q_dedup_minhash_lsh(spark, sf).collect()}

    assert got == want
    assert (0, 4) in got           # the planted near-dup surfaced
    assert not any(b in (1, 3) or a in (1, 3) for a, b in got)  # dups collapsed
    # the index holds exactly one row set per DISTINCT text (4 bands each)
    idx = spark.read.parquet(str(tmp_path / "bandindex"))
    assert idx.count() == 4 * 4
    assert idx.select("fp").distinct().count() == 4


def test_streaming_metrics_windowed(spark, sf_dir, tmp_path):
    """The windowed metrics stream (the /collect polling surface) totals
    must equal the batch counts."""
    from pyspark.sql import functions as F

    from swissgeol_ocr_spark.streaming.pipeline import (
        extract_stream,
        metrics_stream,
        read_spans_stream,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    spans = documents_to_spans(docs)
    in_dir = str(tmp_path / "in")
    spans.write.parquet(in_dir)

    stream = read_spans_stream(spark, in_dir)
    metrics = metrics_stream(extract_stream(stream), window="1 minute")
    # complete mode: processing-time windows never pass the watermark before
    # an availableNow query drains, so append would emit nothing
    q = (
        metrics.writeStream.format("memory")
        .queryName("m_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT sum(n_docs) AS d, sum(n_spans_out) AS s FROM m_stream").first()
    expected = extract_pipeline(spans, repartition=False).agg(
        F.count("*").alias("d"), F.sum("n_spans_out").alias("s")
    ).first()
    assert rows.d == expected.d
    assert rows.s == expected.s


def test_crop_to_visible_cost_rule(spark):
    """P6 (reference crop.py:110-115): accept the crop only when the
    estimated re-encoded size is NOT > 0.8 x the original."""
    from swissgeol_ocr_spark.functions.multimodal import crop_to_visible

    rows = [
        # full-image visible region -> est == n -> rejected
        ("m1", "d1", "image", None, ("jpg", 100, 100, 10000, 0), 0.0, 0.0, 100.0, 100.0),
        # quarter visible -> est = 2500 <= 8000 -> accepted
        ("m2", "d2", "image", None, ("jpg", 100, 100, 10000, 0), 0.0, 0.0, 50.0, 50.0),
        # near-0.8 boundary: sqrt(0.8)*100 rounds OUTWARD to a 90x90 crop
        ("m3", "d3", "image", None, ("jpg", 100, 100, 10000, 0), 0.0, 0.0, 89.4427190999916, 89.4427190999916),
        # degenerate region -> rejected, originals kept
        ("m4", "d4", "image", None, ("jpg", 100, 100, 10000, 0), 60.0, 60.0, 10.0, 10.0),
    ]
    df = spark.createDataFrame(
        rows,
        "media_ref string, doc_id string, kind string, payload binary, "
        "meta struct<format:string,width:int,height:int,n_bytes:bigint,duration_ms:bigint>, "
        "vx0 double, vy0 double, vx1 double, vy1 double",
    )
    out = {r.media_ref: r for r in crop_to_visible(df).collect()}
    assert not out["m1"].crop_accepted and out["m1"].eff_bytes == 10000
    assert out["m2"].crop_accepted and out["m2"].eff_bytes == 2500
    assert out["m2"].eff_width == 50 and out["m2"].eff_height == 50
    # 89.44.. ceils to 90 -> 8100 bytes > 8000 -> rejected; the rule is on
    # the rounded-outward integer crop rect, like the reference's crop.round()
    assert not out["m3"].crop_accepted
    assert not out["m4"].crop_accepted and out["m4"].crop_w == 0


def test_debug_table(spark):
    """E2 (reference ocr/__init__.py:139-141): one visible row per emitted
    ocr-text line, none for base-layer spans."""
    from swissgeol_ocr_spark.plans.pipeline import debug_table

    rows = [
        ("d1", [("media", "", "m", 0), ("ocr-text", "hello", "", 1),
                ("ocr-text", "world", "", 2)]),
        ("d2", [("text", "base", "", 0)]),
        # no media → born-digital passthrough: its preserved hidden overlay
        # is NOT a detected line and must not appear in the debug table
        ("d3", [("text", "base", "", 0), ("ocr-text", "old overlay", "", 1)]),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, spans_out array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    got = [(r.doc_id, r.offset, r.text, r.visible) for r in
           debug_table(df).orderBy("doc_id", "offset").collect()]
    assert got == [("d1", 1, "hello", True), ("d1", 2, "world", True)]
    # aggressive strategy: no passthrough exists, so text-only docs'
    # freshly detected lines must NOT be excluded
    got_aggr = [(r.doc_id, r.text) for r in
                debug_table(df, aggressive=True).orderBy("doc_id", "offset").collect()]
    assert got_aggr == [("d1", "hello"), ("d1", "world"), ("d3", "old overlay")]


def test_stream_matches_batch_word_granularity(spark, sf_dir, tmp_path):
    """Streaming over WORD-granularity input with build_lines_from_words
    must equal the batch pipeline span-for-span — the from-scratch layout
    detection is stateless per document, so it streams unchanged."""
    from swissgeol_ocr_spark.plans.config import ExtractConfig
    from swissgeol_ocr_spark.plans.pipeline import extract_pipeline
    from swissgeol_ocr_spark.sources.corpus import documents_to_word_spans
    from swissgeol_ocr_spark.streaming.pipeline import run_stream_to_parquet

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    spans = documents_to_word_spans(docs).select("doc_id", "spans")
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    spans.write.parquet(in_dir)

    cfg = ExtractConfig(build_lines_from_words=True)
    q = run_stream_to_parquet(spark, in_dir, out_dir, ckpt, cfg)
    q.awaitTermination(120)

    stream_out = {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans_out]
        for r in spark.read.parquet(out_dir).collect()
    }
    batch_out = {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans_out]
        for r in extract_pipeline(spans, cfg, repartition=False).collect()
    }
    assert stream_out == batch_out


def _drain_stateful(q, timeout=150):
    """Drain an availableNow stateful query: with ProcessingTimeTimeout the
    engine keeps running (empty) micro-batches to evaluate state timeouts,
    so the query NEVER self-terminates and processAllAvailable can block —
    instead, watch progress until a data batch committed and the engine has
    gone idle on the source (an empty batch after data), then stop."""
    import time

    t0 = time.time()
    seen_data = False  # sticky: the buffered recentProgress list is capped
    # (default 100 entries) and empty timeout-churn batches can scroll the
    # one data batch out of it, so latch the observation across polls
    while time.time() - t0 < timeout:
        progress = q.recentProgress
        seen_data = seen_data or any(p["numInputRows"] > 0 for p in progress)
        if seen_data and progress and progress[-1]["numInputRows"] == 0:
            break
        time.sleep(0.5)
    else:
        raise AssertionError("stream never drained its data batch")
    q.stop()
    q.awaitTermination(30)


def test_stateful_reassembly_matches_batch(spark, sf_dir, tmp_path):
    """The applyInPandasWithState span-event reassembly must reproduce the
    batch pipeline's output exactly, from shuffled + duplicated events;
    a document missing its tail emits nothing (state held for timeout)."""
    from swissgeol_ocr_spark.streaming.pipeline import (
        reassemble_spans_stream,
        span_event_schema,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    spans = documents_to_spans(docs)

    events = spans.select(
        "doc_id", F.size("spans").alias("n_total"), F.explode("spans").alias("s")
    ).select(
        "doc_id", "s.kind", "s.text", "s.media_ref", "s.offset", "s.page_no",
        "s.x0", "s.y0", "s.x1", "s.y1", "s.confidence", "s.orientation",
        "n_total",
    )
    # drop the LAST event of one document → it must never be emitted
    incomplete_id = str(docs.select("doc_id").orderBy("doc_id").first().doc_id)
    last_off = (
        events.filter(F.col("doc_id") == incomplete_id)
        .agg(F.max("offset"))
        .first()[0]
    )
    events = events.filter(
        ~((F.col("doc_id") == incomplete_id) & (F.col("offset") == last_off))
    )
    # shuffle arrival order + duplicate ~20% (at-least-once redelivery)
    dupes = events.sample(0.2, seed=7)
    scrambled = events.union(dupes).orderBy(F.rand(11))
    in_dir = str(tmp_path / "events")
    scrambled.repartition(6).write.parquet(in_dir)

    stream = spark.readStream.schema(span_event_schema()).parquet(in_dir)
    out = reassemble_spans_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("reassembled")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain_stateful(q)

    got = {}
    for r in spark.sql("SELECT * FROM reassembled").collect():
        assert r.status == "ok"
        got.setdefault(r.doc_id, []).append((r.kind, r.text, r.media_ref, r.offset))
    for doc in got:
        got[doc].sort(key=lambda t: t[3])

    expected = {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans_out]
        for r in extract_pipeline(spans, repartition=False).collect()
        if r.doc_id != incomplete_id
    }
    assert incomplete_id not in got
    assert got == expected


def test_stateful_reassembly_edge_cases(spark, tmp_path):
    """Review regressions: (a) two DISTINCT spans sharing an offset must
    both survive (only byte-identical events are redeliveries), (b) null
    numeric fields get the batch salvage rule instead of crashing the
    query, (c) a redelivery arriving AFTER a document completed is ignored
    (DONE tombstone) — no duplicate output, no spurious quarantine."""
    from swissgeol_ocr_spark.streaming.pipeline import (
        reassemble_spans_stream,
        span_event_schema,
    )

    def ev(doc, kind, text, off, page, n_total, conf=1.0):
        return (doc, kind, text, "", off, page, 10.0, 10.0, 60.0, 22.0, conf, 0.0, n_total)

    rows = [
        # doc a: offsets 0,0,1 — three distinct spans, duplicate offset
        ev("a", "text", "first", 0, 0, 3),
        ev("a", "text", "second", 0, 0, 3),
        ev("a", "text", "third", 1, 0, 3),
        # doc b: null offset/page/conf on one event → salvage (null→0)
        ("b", "text", "nullish", "", None, None, 10.0, 10.0, 60.0, 22.0, None, 0.0, 2),
        ev("b", "text", "solid", 1, 0, 2),
    ]
    in_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(rows, span_event_schema()).repartition(2).write.parquet(in_dir)

    def run_once():
        stream = spark.readStream.schema(span_event_schema()).parquet(in_dir)
        q = (
            reassemble_spans_stream(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _drain_stateful(q)
        return spark.read.parquet(out_dir).collect()

    out1 = run_once()
    by_doc = {}
    for r in out1:
        assert r.status == "ok", r
        by_doc.setdefault(r.doc_id, []).append((r.kind, r.text))
    assert sorted(by_doc["a"]) == [("text", "first"), ("text", "second"), ("text", "third")]
    assert sorted(by_doc["b"]) == [("text", "nullish"), ("text", "solid")]

    # (c) redeliver one event of completed doc a → tombstone ignores it
    spark.createDataFrame([ev("a", "text", "first", 0, 0, 3)], span_event_schema()) \
        .write.mode("append").parquet(in_dir)
    out2 = run_once()
    assert len(out2) == len(out1)  # nothing new emitted, no timeout row


def test_decode_raster_rejects_malformed():
    """Poison payloads must mean 'not a raster' (stub fallback), never an
    exception out of the Spark task."""
    from swissgeol_ocr_spark.functions.multimodal import decode_raster

    bad = [
        b"P6\nfoo bar\n255\ndata",          # non-numeric dims
        b"P6\n12\n255\ndata",               # wrong arity
        b"P6\n-2 3\n255\n" + b"x" * 64,     # negative dims
        b"P6\n0 0\n255\n",                  # zero-area
        b"P6\n2 2\n65535\n" + b"x" * 24,    # 2-byte samples unsupported
        b"P6\n2 2\n0\n" + b"x" * 12,        # nonpositive maxval
        b"P6\n2 2\n255\nxy",                # truncated body
        b"P5",                              # header only
    ]
    for payload in bad:
        assert decode_raster(payload) is None, payload
    ok = decode_raster(b"P6\n2 2\n255\n" + bytes(range(12)))
    assert ok is not None and ok[0].shape == (2, 2, 3)
    # maxval < 255 is legal Netpbm (still 1 byte/sample) and must decode
    low = decode_raster(b"P6\n2 2\n127\n" + bytes(range(12)))
    assert low is not None and low[0].shape == (2, 2, 3)


def test_downscale_raster_x2_exact():
    """Stride-2 halving to exactly (w//2, h//2) — the reference's
    img.resize((w//2, h//2)) analog — with too-small rasters skipped."""
    import numpy as np

    from swissgeol_ocr_spark.functions.multimodal import (
        decode_raster,
        downscale_raster_x2,
    )

    px = np.arange(36, dtype=np.uint8).reshape(3, 4, 3)  # 4x3 RGB
    payload = b"P6\n4 3\n255\n" + px.tobytes()
    half = downscale_raster_x2(payload)
    dec, is_stencil = decode_raster(half)
    assert not is_stencil and dec.shape == (1, 2, 3)
    assert dec.tolist() == px[:2:2, :4:2].tolist()  # rows [0], cols [0, 2]

    g = np.arange(15, dtype=np.uint8).reshape(3, 5)  # 5x3 PGM stencil
    half_g = downscale_raster_x2(b"P5\n5 3\n255\n" + g.tobytes())
    dec_g, st = decode_raster(half_g)
    assert st and dec_g.shape == (1, 2)
    assert dec_g.tolist() == g[:2:2, :4:2].tolist()

    assert downscale_raster_x2(b"P5\n1 1\n255\nx") is None  # 1//2 == 0
    assert downscale_raster_x2(b"not a raster") is None


def test_stateful_reassembly_poison_events(spark, tmp_path):
    """A poison document (non-finite geometry) must be salvaged — never
    crash the streaming query — mirroring the batch Arrow driver's
    salvage-then-quarantine: inf coordinates are clamped/swapped by the
    same salvage_document_inputs, and healthy documents in the same batch
    are untouched."""
    from swissgeol_ocr_spark.streaming.pipeline import (
        reassemble_spans_stream,
        span_event_schema,
    )

    rows = [
        # doc p: a media span forces the per-page path (no-media docs take
        # the geometry-blind passthrough), where ceil(inf) raises →
        # salvage clamps the rect → retried OK with status 'salvaged'
        ("p", "media", "", "img-p", 0, 0, 0.0, 0.0, 600.0, 800.0, 1.0, 0.0, 2),
        ("p", "text", "poisoned", "", 1, 0, 10.0, 10.0, float("inf"), 22.0, 1.0, 0.0, 2),
        # doc h: healthy
        ("h", "text", "healthy", "", 0, 0, 10.0, 10.0, 60.0, 22.0, 1.0, 0.0, 1),
    ]
    in_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "out")
    spark.createDataFrame(rows, span_event_schema()).write.parquet(in_dir)

    stream = spark.readStream.schema(span_event_schema()).parquet(in_dir)
    q = (
        reassemble_spans_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain_stateful(q)
    by_doc = {}
    for r in spark.read.parquet(out_dir).collect():
        by_doc.setdefault(r.doc_id, []).append((r.status, r.kind, r.text))
    assert by_doc["h"] == [("ok", "text", "healthy")]
    assert sorted(by_doc["p"]) == [
        ("salvaged", "media", ""),
        ("salvaged", "text", "poisoned"),
    ]


def test_stream_matches_batch_aggressive(spark, sf_dir, tmp_path):
    """Streaming under the AGGRESSIVE strategy (C3 visibility sweep on
    every page, no passthrough) must equal the batch pipeline bit-for-bit
    — the config plumbs through extract_stream to the same kernel."""
    from swissgeol_ocr_spark.plans.config import ExtractConfig
    from swissgeol_ocr_spark.streaming.pipeline import run_stream_to_parquet

    cfg = ExtractConfig(use_aggressive_strategy=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    spans = documents_to_spans(docs)
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    spans.write.parquet(in_dir)

    q = run_stream_to_parquet(spark, in_dir, out_dir, str(tmp_path / "ckpt"), cfg)
    q.awaitTermination(120)

    stream_out = {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans_out]
        for r in spark.read.parquet(out_dir).collect()
    }
    batch_out = {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans_out]
        for r in extract_pipeline(spans, cfg, repartition=False).collect()
    }
    assert stream_out == batch_out
    # aggressive output must differ somewhere from the default-strategy
    # output (the strip actually did something on this corpus)
    default_out = {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans_out]
        for r in extract_pipeline(spans, repartition=False).collect()
    }
    assert stream_out != default_out


def test_decode_raster_fuzz_never_raises():
    """decode_raster over arbitrary bytes (with and without a forced
    Netpbm magic) must either decode or return None — never raise; and
    decode(encode) round-trips for every valid raster."""
    import random

    import numpy as np

    from swissgeol_ocr_spark.functions.multimodal import (
        decode_raster,
        downscale_raster_x2,
    )

    rng = random.Random(123)
    for trial in range(500):
        n = rng.randint(0, 64)
        blob = bytes(rng.randrange(256) for _ in range(n))
        prefix = rng.choice([b"", b"P5", b"P6", b"P6\n", b"P5\n9 9\n", b"P6\n2 2\n255\n"])
        out = decode_raster(prefix + blob)  # must not raise
        if out is not None:
            px, _ = out
            assert px.dtype == np.uint8

    # round-trip: random valid rasters encode → decode → identical pixels
    for trial in range(50):
        w, h = rng.randint(1, 9), rng.randint(1, 9)
        stencil = rng.random() < 0.5
        depth = 1 if stencil else 3
        body = bytes(rng.randrange(256) for _ in range(w * h * depth))
        payload = (b"P5\n" if stencil else b"P6\n") + f"{w} {h}".encode() + b"\n255\n" + body
        px, st = decode_raster(payload)
        assert st == stencil and px.tobytes() == body
        half = downscale_raster_x2(payload)
        if w >= 2 and h >= 2:
            hpx, hst = decode_raster(half)
            assert hst == stencil and hpx.shape[:2] == (h // 2, w // 2)
        else:
            assert half is None


def test_asof_state_ttl_eviction_and_chunk_order():
    """Drives _asof_enrich directly with a fake GroupState: (1) the TTL
    path re-arms the idle clock on activity and evicts on timeout — the
    evicted user's next click matches NO view (the documented recall
    trade-off); (2) a micro-batch arriving as MULTIPLE unordered Arrow
    chunks is concatenated before the sort, so a click in an early chunk
    still matches a view carried in a later chunk with an earlier
    timestamp (the >1024-rows-per-user case)."""
    import datetime as dt

    import pandas as pd

    from swissgeol_ocr_spark.streaming.pipeline import _asof_enrich

    class FakeState:
        def __init__(self):
            self._v = None
            self.hasTimedOut = False
            self.armed_ms = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            assert self._v is not None
            return self._v

        def update(self, v):
            self._v = tuple(v)

        def remove(self):
            self._v = None

        def setTimeoutDuration(self, ms):
            self.armed_ms = ms

    def pdf(rows):
        return pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "ts": [pd.Timestamp(r[1]) for r in rows],
                "user_id": [7] * len(rows),
                "event_type": [r[2] for r in rows],
                "value": [1.0] * len(rows),
                "props": ["{}"] * len(rows),
            }
        )

    T = lambda m: dt.datetime(2024, 5, 1, 12, m)
    state = FakeState()

    # chunk-order hardening: click (chunk 1) precedes its view (chunk 2)
    # in ARRIVAL order but follows it in event time
    out = list(
        _asof_enrich(
            (7,),
            iter([pdf([(2, T(10), "click")]), pdf([(1, T(5), "view")])]),
            state,
            ttl_ms=60_000,
        )
    )
    assert len(out) == 1
    row = out[0].iloc[0]
    assert row["matched_view_id"] == 1 and row["lag_us"] == 5 * 60 * 1_000_000
    assert state.exists and state.armed_ms == 60_000  # TTL re-armed

    # timeout fires: state evicted, nothing emitted
    state.hasTimedOut = True
    assert list(_asof_enrich((7,), iter([]), state, ttl_ms=60_000)) == []
    assert not state.exists

    # post-eviction click: no remembered view to match
    state.hasTimedOut = False
    out = list(
        _asof_enrich((7,), iter([pdf([(3, T(20), "click")])]), state, ttl_ms=60_000)
    )
    assert out[0].iloc[0]["matched_view_id"] is None or pd.isna(
        out[0].iloc[0]["matched_view_id"]
    )


def test_timeout_quarantine_leaves_tombstone():
    """A straggler span arriving AFTER a timeout quarantine must be ignored
    (timeout-path tombstone, mirroring the ok-path DONE tombstone) — it must
    not resurrect state and emit a second 'timeout' (or a late 'ok') row for
    the same doc_id. Drives the reassembly function directly with a fake
    GroupState so the processing-time clock is fully deterministic."""
    import pandas as pd

    from swissgeol_ocr_spark.streaming.pipeline import _make_reassemble

    class FakeState:
        def __init__(self):
            self._v = None
            self.hasTimedOut = False

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            assert self._v is not None
            return self._v

        def update(self, v):
            self._v = tuple(v)

        def remove(self):
            self._v = None

        def setTimeoutDuration(self, ms):
            pass

    def ev_pdf(text, off, n_total):
        return pd.DataFrame(
            {
                "kind": ["text"], "text": [text], "media_ref": [""],
                "offset": [off], "page_no": [0],
                "x0": [10.0], "y0": [10.0], "x1": [60.0], "y1": [22.0],
                "confidence": [1.0], "orientation": [0.0],
                "n_total": [n_total],
            }
        )

    reassemble = _make_reassemble(None, timeout_ms=1000)
    state = FakeState()

    # 1. partial document (1 of 3 spans): state held, nothing emitted
    out = list(reassemble(("d",), iter([ev_pdf("head", 0, 3)]), state))
    assert out == [] and state.exists and state.get[-1] is False

    # 2. timeout fires: exactly one quarantine row, tombstone LEFT BEHIND
    state.hasTimedOut = True
    out = list(reassemble(("d",), iter([]), state))
    assert len(out) == 1 and list(out[0].status) == ["timeout"]
    assert state.exists and bool(state.get[-1]) is True  # tombstone, not removed

    # 3. late straggler during the tombstone period: ignored, no output
    state.hasTimedOut = False
    out = list(reassemble(("d",), iter([ev_pdf("straggler", 1, 3)]), state))
    assert out == [] and state.exists and bool(state.get[-1]) is True

    # 4. tombstone expiry: silent removal, NO second timeout row
    state.hasTimedOut = True
    out = list(reassemble(("d",), iter([]), state))
    assert out == [] and not state.exists


@pytest.mark.parametrize("repart", [True, False])
def test_stream_full_pipeline_matches_batch_with_mega(
    spark, sf_dir, tmp_path, repart
):
    """The --mode batch deployment face (submit_extract_stream): foreachBatch
    runs the FULL batch pipeline per micro-batch, so above-cutoff documents
    take the page-split/reassemble subtree even when they arrive on a
    stream — the one skew the stateless ``extract_stream`` sink cannot
    break (one mega doc would serialize its whole trigger into one task).
    Stage two files → two micro-batches; pick the cutoff at the median span
    count so BOTH the mega and the small branch carry documents; pin the
    drained sink against the batch pipeline under the same config, and pin
    the clean-restart no-replay contract (at-least-once only loses to a
    crash BETWEEN append and checkpoint commit, never to a clean rerun).
    Parametrized over the repartition lever: both the default per-trigger
    hash(doc_id) exchange and the well-spread-feed skip must be
    bit-identical to the batch comparator (which always uses the
    default)."""
    from swissgeol_ocr_spark.plans.config import ExtractConfig
    from swissgeol_ocr_spark.streaming.pipeline import run_stream_full_pipeline

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    spans = documents_to_spans(docs)
    counts = sorted(
        r.n for r in spans.select(F.size("spans").alias("n")).collect()
    )
    cutoff = counts[len(counts) // 2]
    assert counts[0] <= cutoff < counts[-1], "need docs on both sides"
    cfg = ExtractConfig(mega_doc_span_cutoff=cutoff)

    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    spans.repartition(2).write.parquet(in_dir)

    q = run_stream_full_pipeline(
        spark, in_dir, out_dir, ckpt, cfg, max_files_per_trigger=1,
        repartition=repart,
    )
    if not q.awaitTermination(180):
        q.stop()
        raise RuntimeError("full-pipeline stream did not drain")
    assert len([p for p in q.recentProgress if p["numInputRows"] > 0]) == 2

    stream_out = {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans_out]
        for r in spark.read.parquet(out_dir).collect()
    }
    batch_out = {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans_out]
        for r in extract_pipeline(spans, config=cfg).collect()
    }
    assert stream_out == batch_out

    q2 = run_stream_full_pipeline(
        spark, in_dir, out_dir, ckpt, cfg, max_files_per_trigger=1,
        repartition=repart,
    )
    if not q2.awaitTermination(60):
        q2.stop()
        raise RuntimeError("restart probe did not drain")
    assert spark.read.parquet(out_dir).count() == len(batch_out)


def test_stream_full_pipeline_replay_after_crash(spark, sf_dir, tmp_path):
    """The at-least-once contract of the foreachBatch face, exercised for
    real: deleting the LAST checkpoint commit marker reproduces a crash
    between the micro-batch's parquet append and its commit — on restart
    Spark replays exactly that micro-batch from the recorded offsets,
    duplicating its doc_ids in the sink. The replay is deterministic
    (same kernel, same input files), so the documented downstream dedup
    (one row per doc_id — the skip-existing anti-join shape, reference
    ocr/target.py:29-33) restores the batch-pipeline result exactly."""
    import glob
    import os

    from swissgeol_ocr_spark.streaming.pipeline import run_stream_full_pipeline

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    spans = documents_to_spans(docs)
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    spans.repartition(2).write.parquet(in_dir)

    q = run_stream_full_pipeline(
        spark, in_dir, out_dir, ckpt, max_files_per_trigger=1
    )
    if not q.awaitTermination(180):
        q.stop()
        raise RuntimeError("initial drain did not finish")
    n_docs = spans.count()
    assert spark.read.parquet(out_dir).count() == n_docs

    # crash injection: batch 1 appended its output but never committed
    victims = glob.glob(f"{ckpt}/commits/1") + glob.glob(f"{ckpt}/commits/.1.crc")
    assert any(not v.endswith(".crc") for v in victims), "expected 2 batches"
    for v in victims:
        os.remove(v)

    q2 = run_stream_full_pipeline(
        spark, in_dir, out_dir, ckpt, max_files_per_trigger=1
    )
    if not q2.awaitTermination(180):
        q2.stop()
        raise RuntimeError("recovery drain did not finish")

    sink = spark.read.parquet(out_dir)
    per_doc = {r.doc_id: r.n for r in sink.groupBy("doc_id").count()
               .withColumnRenamed("count", "n").collect()}
    n_replayed = sum(1 for n in per_doc.values() if n == 2)
    assert n_replayed > 0, "replay produced no duplicates — crash not simulated"
    assert set(per_doc.values()) == {1, 2}, "a doc replayed more than once"
    assert sink.count() == n_docs + n_replayed

    deduped = {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans_out]
        for r in sink.dropDuplicates(["doc_id"]).collect()
    }
    batch_out = {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans_out]
        for r in extract_pipeline(spans).collect()
    }
    assert deduped == batch_out


def test_streaming_neardup_cap_prefix_greedy(spark, tmp_path, caplog):
    """Hot-bucket routing on the stream is prefix-greedy and never silent:
    3 colliding docs arrive first (cumulative bucket population == cap →
    their pairs are admitted and STAY emitted), then 7 more collide into
    the same 4 buckets (cumulative 10 > cap → routed out, no quadratic
    blow-up, and the per-trigger skew alarm fires — the streaming half of
    dedup_band_guard). Routing never touches index integrity: all 10
    distinct texts stay indexed for batch re-runs to decide from the full
    population."""
    import logging as _logging

    from test_queries import _minhash_colliding_docs

    from swissgeol_ocr_spark.streaming.pipeline import minhash_neardup_stream

    docs = [(i, text) for i, text, _, _ in _minhash_colliding_docs(10)]
    schema = "doc_id long, text string"
    in_dir = str(tmp_path / "in")
    spark.createDataFrame(docs[:3], schema).repartition(1).write.parquet(in_dir)
    spark.createDataFrame(docs[3:], schema).repartition(1).write.mode(
        "append"
    ).parquet(in_dir)

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(in_dir)
    with caplog.at_level(_logging.WARNING, logger="swissgeol_ocr_spark.dedup"):
        q = minhash_neardup_stream(
            stream,
            index_path=str(tmp_path / "bandindex"),
            pairs_path=str(tmp_path / "pairs"),
            checkpoint_path=str(tmp_path / "ckpt"),
            cap=3,
        )
        if not q.awaitTermination(120):
            q.stop()
            raise RuntimeError("neardup stream did not drain")

    pairs = {(r.a_id, r.b_id)
             for r in spark.read.parquet(str(tmp_path / "pairs")).collect()}
    assert pairs == {(0, 1), (0, 2), (1, 2)}  # the admitted prefix, nothing more
    idx = spark.read.parquet(str(tmp_path / "bandindex"))
    assert idx.count() == 10 * 4
    assert idx.select("fp").distinct().count() == 10
    warns = [r.getMessage() for r in caplog.records
             if "dedup band skew" in r.getMessage()]
    assert warns, "over-cap routing must not be silent"
    assert all("band_bucket_cap=3" in w for w in warns)
    assert any("4 touched bucket(s)" in w for w in warns)  # batch 2: all hot


def test_streaming_neardup_shuffle_fallback_identical(spark, tmp_path, monkeypatch):
    """The backlog guard: with _PROBE_MAX_REPS forced to 0 every trigger
    takes the shuffle-join fallback instead of the broadcast probes — the
    two strategies must be output-identical (pairs AND index), since the
    guard flips on batch size, which correctness must not depend on."""
    from pyspark.sql import functions as F

    from swissgeol_ocr_spark.streaming import pipeline as sp

    body = "the quick brown fox jumps over the lazy dog again and again"
    other = "totally different text about mountains and rivers flowing by"
    chunk1 = [(0, body), (1, body), (2, other)]
    chunk2 = [(3, body), (4, body.replace("dog", "cat")), (5, other + " streams")]
    schema = "doc_id long, text string"

    outs = {}
    for tag, max_reps in (("probe", 10**9), ("shuffle", 0)):
        monkeypatch.setattr(sp, "_PROBE_MAX_REPS", max_reps)
        in_dir = str(tmp_path / f"in_{tag}")
        spark.createDataFrame(chunk1, schema).repartition(1).write.parquet(in_dir)
        spark.createDataFrame(chunk2, schema).repartition(1).write.mode(
            "append"
        ).parquet(in_dir)
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(in_dir)
        q = sp.minhash_neardup_stream(
            stream,
            index_path=str(tmp_path / f"idx_{tag}"),
            pairs_path=str(tmp_path / f"pairs_{tag}"),
            checkpoint_path=str(tmp_path / f"ckpt_{tag}"),
        )
        if not q.awaitTermination(120):
            q.stop()
            raise RuntimeError(f"{tag} leg did not drain")
        outs[tag] = (
            {(r.a_id, r.b_id)
             for r in spark.read.parquet(str(tmp_path / f"pairs_{tag}")).collect()},
            {(r.doc_id, r.fp, r.band_key)
             for r in spark.read.parquet(str(tmp_path / f"idx_{tag}")).collect()},
        )

    assert outs["probe"][0] == outs["shuffle"][0] != set()
    assert outs["probe"][1] == outs["shuffle"][1]


def test_streaming_neardup_index_prunes(spark, tmp_path):
    """Round-5 verdict #2 'done' criterion: the per-trigger index read
    must touch only the probed partitions. Both accumulated indexes are
    written directory-partitioned by a hash prefix of their probe key;
    a prefix-filtered read must (a) prune to a strict subset of the
    index files once the index spans several prefixes, and (b) carry
    the prefix predicate as a PartitionFilter, not a post-scan filter —
    while the drained pair set still equals the batch face."""
    from pyspark.sql import functions as F

    from swissgeol_ocr_spark.plans.queries import q_dedup_minhash_lsh
    from swissgeol_ocr_spark.streaming.pipeline import (
        _INDEX_PARTS,
        _pruned_index_read,
        minhash_neardup_stream,
    )

    # enough distinct texts that their band keys land in several prefixes
    docs = [(i, f"unique body number {i} with shared tail words alpha "
                f"beta gamma delta epsilon zeta") for i in range(24)]
    docs.append((100, docs[0][1] + " extra"))  # one near-dup pair
    schema = "doc_id long, text string"
    in_dir = str(tmp_path / "in")
    spark.createDataFrame(docs[:12], schema).repartition(1).write.parquet(in_dir)
    spark.createDataFrame(docs[12:], schema).repartition(1).write.mode(
        "append"
    ).parquet(in_dir)

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(in_dir)
    index_path = str(tmp_path / "bandindex")
    q = minhash_neardup_stream(
        stream,
        index_path=index_path,
        pairs_path=str(tmp_path / "pairs"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    if not q.awaitTermination(120):
        q.stop()
        raise RuntimeError("neardup stream did not drain")

    # output still equals the batch face on the same corpus
    sf = str(tmp_path / "batchsf")
    spark.createDataFrame(docs, schema).withColumn(
        "lang", F.lit("en")
    ).withColumn("source", F.lit("s1")).write.parquet(f"{sf}/documents.parquet")
    got = {(r.a_id, r.b_id)
           for r in spark.read.parquet(str(tmp_path / "pairs")).collect()}
    want = {(r.a_id, r.b_id) for r in q_dedup_minhash_lsh(spark, sf).collect()}
    assert got == want and (0, 100) in got

    # the index landed partitioned across several bpfx directories
    import os

    full = spark.read.parquet(index_path)
    pfxs = sorted(r[0] for r in full.select("bpfx").distinct().collect())
    assert len(pfxs) > 1
    part_dirs = [d for d in os.listdir(index_path) if d.startswith("bpfx=")]
    assert len(part_dirs) == len(pfxs)

    # a probe-shaped pruned read: the prefix predicate must land as a
    # PartitionFilter on the FileScan (directory-level pruning — Spark
    # then lists/reads only the matching bpfx= dirs), never a post-scan
    # Filter. (inputFiles() reports the pre-pruning listing, so the plan
    # node is the observable contract.)
    probe_pfx = pfxs[:1]
    pruned = _pruned_index_read(spark, index_path, "bpfx", probe_pfx)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "bpfx" in plan.split("PartitionFilters", 1)[1][:250]
    # pruned content == the full read filtered the slow way
    slow = {tuple(r) for r in full.filter(F.col("bpfx").isin(probe_pfx))
            .select("doc_id", "band_key").collect()}
    fast = {tuple(r) for r in pruned.select("doc_id", "band_key").collect()}
    assert fast == slow != set()

    # the exact-dup fp index exists, is partitioned, and holds one row
    # per distinct text
    fp_idx = spark.read.parquet(index_path + "_fp")
    assert fp_idx.select("fp").distinct().count() == 25
    assert fp_idx.select("fpfx").distinct().count() >= 1
    assert _INDEX_PARTS >= 2
