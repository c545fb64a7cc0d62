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
