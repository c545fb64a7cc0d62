"""Structured Streaming parity: streaming output == batch output."""

import os

from wikisource_latin_text_cleaner_spark.operators.pipeline import (
    PipelineConfig,
    QualityFilterPipeline,
)
from wikisource_latin_text_cleaner_spark.sources import synth
from wikisource_latin_text_cleaner_spark.streaming.stream import stream_pages


def test_stream_matches_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    # two separate files -> two micro-batch inputs
    synth.write_pages_parquet(os.path.join(in_dir, "a.parquet"), 80, seed=3)
    synth.write_pages_parquet(os.path.join(in_dir, "b.parquet"), 70, seed=4)

    cfg = PipelineConfig(langid=True, classify=False)
    q = stream_pages(
        spark, in_dir, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        config=cfg, max_files_per_trigger=1,
    )
    q.awaitTermination(120)

    streamed = spark.read.parquet(str(tmp_path / "out"))
    batch = QualityFilterPipeline(cfg).transform(spark.read.parquet(in_dir))
    s = {(r.url, r.keep, r.clean_text) for r in streamed.collect()}
    b = {(r.url, r.keep, r.clean_text) for r in batch.collect()}
    assert s == b
    assert len(s) == 150


def test_windowed_event_counts_stream_matches_batch(spark, tmp_path, sf_dir):
    """Watermarked event-time windowed agg: the same expression tree over a
    readStream drain (complete mode, multiple micro-batches) must equal the
    batch evaluation -- and late data within the watermark is still
    counted because complete mode re-emits finalized windows."""
    import shutil
    import uuid

    from wikisource_latin_text_cleaner_spark.streaming.stream import (
        windowed_event_counts,
    )

    batch_events = spark.read.parquet(f"{sf_dir}/events.parquet")
    in_dir = str(tmp_path / "events_in")
    # several files -> several micro-batches, so the watermark actually
    # advances between triggers
    batch_events.repartition(4).write.parquet(in_dir)

    stream = (
        spark.readStream.schema(batch_events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    table = f"winagg_{uuid.uuid4().hex[:8]}"
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {(r.window_start, r.event_type): r.n_events
           for r in spark.sql(f"SELECT * FROM {table}").collect()}
    want = {(r.window_start, r.event_type): r.n_events
            for r in windowed_event_counts(batch_events).collect()}
    assert got == want and len(want) > 0
    spark.catalog.dropTempView(table)
    shutil.rmtree(in_dir, ignore_errors=True)


def test_stream_resume_is_exactly_once(spark, tmp_path):
    """New files after a drain are processed once; old files never redone."""
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    synth.write_pages_parquet(os.path.join(in_dir, "a.parquet"), 50, seed=5)
    args = (spark, in_dir, str(tmp_path / "out"), str(tmp_path / "ckpt"))

    stream_pages(*args, config=PipelineConfig(langid=False, classify=False)).awaitTermination(120)
    n1 = spark.read.parquet(str(tmp_path / "out")).count()
    assert n1 == 50

    synth.write_pages_parquet(os.path.join(in_dir, "b.parquet"), 30, seed=6)
    stream_pages(*args, config=PipelineConfig(langid=False, classify=False)).awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 80
    assert out.select("url").distinct().count() == 80


def test_streaming_first_seen_dedup_exactly_one_per_hash(spark, tmp_path):
    """Custom stateful op (applyInPandasWithState): across micro-batches
    each distinct text is emitted exactly once; cross-batch duplicates only
    grow the state-side count."""
    import uuid

    import pandas as pd

    from wikisource_latin_text_cleaner_spark.sources import synth
    from wikisource_latin_text_cleaner_spark.streaming.stream import (
        streaming_first_seen_dedup,
    )

    in_dir = str(tmp_path / "dedup_in")
    os.makedirs(in_dir)
    synth.write_pages_parquet(os.path.join(in_dir, "a.parquet"), 60, seed=11)
    # second batch = 40 rows duplicating first-batch texts (fresh urls) + 20 new
    a = spark.read.parquet(os.path.join(in_dir, "a.parquet")).limit(40).toPandas()
    a["url"] = ["dup://" + str(i) for i in range(len(a))]
    synth.write_pages_parquet(os.path.join(in_dir, "b.parquet"), 20, seed=12)
    b = spark.read.parquet(os.path.join(in_dir, "b.parquet")).toPandas()
    spark.createDataFrame(pd.concat([a, b])).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmp_path, "second")
    )
    os.rename(
        [os.path.join(tmp_path, "second", f) for f in os.listdir(tmp_path / "second")
         if f.endswith(".parquet")][0],
        os.path.join(in_dir, "b2.parquet"),
    )
    os.remove(os.path.join(in_dir, "b.parquet"))

    stream = (
        spark.readStream.schema(synth.PAGES_SCHEMA_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    table = f"dedup_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_first_seen_dedup(stream)
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql(f"SELECT * FROM {table}").toPandas()
    batch = spark.read.parquet(in_dir).toPandas()
    import hashlib

    distinct_texts = {hashlib.md5(t.encode()).hexdigest() for t in batch["text"]}
    emitted = [hashlib.md5(t.encode()).hexdigest() for t in got["text"]]
    assert len(emitted) == len(set(emitted)), "a hash was emitted twice"
    assert set(emitted) == distinct_texts
    # within-batch duplicate counting: at least the planted duplicates in
    # batch 1 (synth corpora contain exact dups) are reflected somewhere
    assert (got["n_dups_so_far"] >= 0).all()
    assert len(got) == len(distinct_texts)
