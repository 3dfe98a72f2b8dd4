"""Structured Streaming pipeline tests (availableNow file-stream)."""

import pytest
from pyspark.sql import functions as F

from pcrawler_spark.sources.synthetic import SyntheticCrawlConfig, generate_crawl_corpus
from pcrawler_spark.streaming.pipeline import (
    PAGES_SCHEMA,
    extract_stream,
    fetch_metrics_stream,
    read_pages_stream,
    run_extract_to_parquet,
)

CFG = SyntheticCrawlConfig(n_companies=40, n_industries=4, n_hosts=6)


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("stream_pages")
    corpus = generate_crawl_corpus(CFG)
    df = spark.createDataFrame(corpus["pages"], PAGES_SCHEMA)
    # two drops to exercise multi-file streaming
    df.filter(F.col("url").contains("-tong-quan")).write.parquet(str(tmp / "in" / "d1"))
    df.filter(~F.col("url").contains("-tong-quan")).write.parquet(str(tmp / "in" / "d2"))
    # file streams read a flat dir of parquet parts; re-land as one dir
    merged = spark.read.parquet(str(tmp / "in" / "d1"), str(tmp / "in" / "d2"))
    merged.write.parquet(str(tmp / "pages"))
    return tmp


def test_stream_extract_to_parquet(spark, pages_dir):
    out_dir = str(pages_dir / "out")
    ckpt = str(pages_dir / "ckpt")
    q = run_extract_to_parquet(spark, str(pages_dir / "pages"), out_dir, ckpt)
    q.awaitTermination(120)
    out = spark.read.parquet(out_dir)
    n_batch = out.count()
    # streaming output matches the batch fused pass over the same pages
    batch = extract_stream(spark.read.parquet(str(pages_dir / "pages")))
    assert n_batch == batch.dropDuplicates(["url_hash"]).count()
    details = out.filter(F.col("kind") == "detail")
    assert details.filter(F.col("company_name").isNotNull()).count() == details.count()
    # restart with same checkpoint: no new input → no duplicate rows
    q2 = run_extract_to_parquet(spark, str(pages_dir / "pages"), out_dir, ckpt)
    q2.awaitTermination(60)
    assert spark.read.parquet(out_dir).count() == n_batch


def test_stream_windowed_metrics(spark, pages_dir):
    stream = read_pages_stream(spark, str(pages_dir / "pages"))
    agg = fetch_metrics_stream(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("fetch_metrics")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM fetch_metrics").collect()
    assert len(rows) > 0
    kinds = {r.kind for r in rows}
    assert {"detail", "contact", "listing"} <= kinds
    assert all(r.n_pages > 0 for r in rows)


def test_stateful_host_quota_across_batches(spark, tmp_path):
    """applyInPandasWithState: the per-host admission quota must persist
    across micro-batches AND across stream restarts (state checkpointed) —
    a host delivering candidates in several batches never exceeds quota."""
    from pcrawler_spark.streaming.pipeline import admit_with_host_quota

    in_dir = tmp_path / "urls"
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    in_dir.mkdir()

    def land(batch_id, rows):
        spark.createDataFrame(rows, "host string, canon_url string").write.parquet(
            str(in_dir / f"b{batch_id}"))

    # batch 1: host a gets 4 candidates, host b gets 1
    land(1, [("a.vn", f"https://a.vn/p{i}") for i in range(4)] + [("b.vn", "https://b.vn/p0")])

    def run_once():
        stream = (
            spark.readStream.schema("host string, canon_url string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(in_dir / "*"))
        )
        q = (
            admit_with_host_quota(stream, quota=5)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    # batch 2 (separate stream start -> state restored from checkpoint):
    # host a floods 10 more; only 1 slot remains of its quota of 5
    land(2, [("a.vn", f"https://a.vn/q{i}") for i in range(10)] + [("b.vn", "https://b.vn/p1")])
    run_once()

    out = spark.read.parquet(out_dir)
    per_host = {r["host"]: r["n"] for r in out.groupBy("host").agg(F.count("*").alias("n")).collect()}
    assert per_host["a.vn"] == 5, per_host   # 4 in batch 1 + 1 more ever
    assert per_host["b.vn"] == 2
    seqs = sorted(r["admitted_seq"] for r in out.filter(F.col("host") == "a.vn").collect())
    assert seqs == [1, 2, 3, 4, 5]


def test_stream_neardup_incremental(spark, tmp_path):
    """Incremental MinHash near-dup: a later batch's copy of an earlier doc
    is flagged dup_of=<original>, within-batch dups flag against the
    smaller id, and a checkpoint replay adds nothing."""
    from pcrawler_spark.streaming.pipeline import run_neardup_stream

    in_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "nd_out")
    ckpt = str(tmp_path / "nd_ckpt")

    import glob
    import os
    import shutil

    t_a = "the quick brown fox jumps over the lazy dog again and again today"
    t_b = "một văn bản tiếng việt hoàn toàn khác về chủ đề thời tiết hà nội"
    t_c = "yet another completely different english document about spark engines"

    def land(rows, name):
        stage = str(tmp_path / ("stage_" + name))
        spark.createDataFrame(rows, "doc_id long, text string") \
            .coalesce(1).write.parquet(stage)
        os.makedirs(in_dir, exist_ok=True)
        shutil.copy(glob.glob(stage + "/part-*.parquet")[0],
                    os.path.join(in_dir, name + ".parquet"))

    # batch 1: two distinct originals + an in-batch duplicate of doc 1
    land([(1, t_a), (2, t_b), (3, t_a)], "b1")

    q = run_neardup_stream(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)
    r1 = {r.doc_id: (r.is_dup, r.dup_of) for r in spark.read.parquet(out_dir).collect()}
    assert r1[1] == (False, None) and r1[2] == (False, None)
    assert r1[3] == (True, 1)

    # batch 2 (new file): a copy of doc 1 and a fresh original
    land([(10, t_a), (11, t_c)], "b2")
    q2 = run_neardup_stream(spark, in_dir, out_dir, ckpt)
    q2.awaitTermination(120)
    r2 = {r.doc_id: (r.is_dup, r.dup_of) for r in spark.read.parquet(out_dir).collect()}
    assert r2[10] == (True, 1), r2
    assert r2[11] == (False, None)

    # band store holds only originals
    bands = spark.read.parquet(out_dir + "/_bands")
    assert set(r.doc for r in bands.select("doc").distinct().collect()) == {1, 2, 11}

    # replay with same checkpoint: nothing new
    n = spark.read.parquet(out_dir).count()
    q3 = run_neardup_stream(spark, in_dir, out_dir, ckpt)
    q3.awaitTermination(60)
    assert spark.read.parquet(out_dir).count() == n


def test_seen_backfill_after_upgrade(spark, tmp_path):
    """An output_dir written before the _seen side table existed (committed
    batch partitions, no _seen dir) must not re-emit its url_hashes when a
    later batch replays them: the first PATH_NOT_FOUND triggers a one-time
    backfill of _seen from the committed output (ADVICE r3)."""
    import shutil

    corpus = generate_crawl_corpus(CFG)
    df = spark.createDataFrame(corpus["pages"], PAGES_SCHEMA)
    d1 = df.filter(F.col("url").contains("-tong-quan"))
    d2 = df.filter(~F.col("url").contains("-tong-quan"))
    inp, out_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    d1.write.parquet(inp)
    q = run_extract_to_parquet(spark, inp, out_dir, ckpt)
    q.awaitTermination(120)
    n0 = spark.read.parquet(out_dir).count()
    assert n0 > 0
    # simulate the pre-upgrade layout: committed output, no _seen
    shutil.rmtree(out_dir + "/_seen")
    # the next batch REPLAYS d1's urls (new files, same pages) plus d2's new ones
    d1.unionByName(d2).write.mode("append").parquet(inp)
    q2 = run_extract_to_parquet(spark, inp, out_dir, ckpt)
    q2.awaitTermination(120)
    final = spark.read.parquet(out_dir)
    # backfill held the dedup line: every url_hash lives in exactly one batch
    assert final.groupBy("url_hash").count().filter("count > 1").count() == 0
    expected = (
        extract_stream(spark.read.parquet(inp)).dropDuplicates(["url_hash"]).count()
    )
    assert final.count() == expected


def test_watermark_drops_late_rows_and_closes_windows(spark, tmp_path):
    """Behavioral watermark semantics, not just plan structure: in APPEND
    mode a 1-hour window is emitted once the 2-hour watermark passes its
    end, with ONLY the rows that arrived before the watermark — a row
    arriving in a later run with an event time already behind the
    persisted watermark is dropped, never revising the closed window.
    Three availableNow runs share one checkpoint, so the watermark
    carries across exactly like micro-batches of a live stream."""
    import datetime as dt

    inp = tmp_path / "late_in"
    inp.mkdir()
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)

    def page(url, ts):
        return (url, ts, b"<html><body>x</body></html>", "x", "vi")

    base = "https://w.example.vn/d-tong-quan-"
    batches = {
        # A: 3 on-time rows in the [10:00, 11:00) window
        "a": [page(base + f"a{i}", t0 + dt.timedelta(minutes=i)) for i in range(3)],
        # B: 2 rows 5 h later → advances watermark to ~13:00, closing A's window
        "b": [page(base + f"b{i}", t0 + dt.timedelta(hours=5, minutes=i)) for i in range(2)],
        # C: 1 LATE row at 10:01 — behind the persisted watermark → dropped
        "c": [page(base + "late", t0 + dt.timedelta(minutes=1))],
    }

    def run_once(name):
        got = []
        stream = spark.readStream.schema(PAGES_SCHEMA).parquet(str(inp / "f_*"))
        agg = fetch_metrics_stream(stream, window="1 hour", watermark="2 hours")
        q = (
            # memory sink cannot recover a checkpoint; foreachBatch can, and
            # in append mode each batch carries only newly-FINALIZED windows
            agg.writeStream.foreachBatch(lambda df, bid: got.extend(df.collect()))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return got

    emitted = {}
    for name, rows in batches.items():
        spark.createDataFrame(rows, PAGES_SCHEMA).coalesce(1).write.parquet(
            str(inp / f"f_{name}"))
        emitted[name] = run_once(name)

    # run A: watermark still behind the window end → nothing emitted
    assert emitted["a"] == [], emitted["a"]
    # run B closes the 10:00 window with EXACTLY batch A's 3 rows
    assert sum(r.n_pages for r in emitted["b"] if r.window_start == t0) == 3, emitted["b"]
    # run C: the late row is dropped — no new or revised emission anywhere
    assert emitted["c"] == [], emitted["c"]
    # the 15:00 window never closed (watermark never passed its end)
    t5 = t0 + dt.timedelta(hours=5)
    assert all(r.window_start != t5 for r in emitted["b"]), emitted["b"]
