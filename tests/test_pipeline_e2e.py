"""End-to-end pipeline tests: Spark output == reference labels, resume
idempotence, metrics lineage, skew handling."""

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from wikisource_latin_text_cleaner_spark.functions import rules
from wikisource_latin_text_cleaner_spark.operators import skew
from wikisource_latin_text_cleaner_spark.operators.pipeline import (
    PipelineConfig,
    QualityFilterPipeline,
    drop_reason_histogram,
)
from wikisource_latin_text_cleaner_spark.plans import checkpoints
from wikisource_latin_text_cleaner_spark.sources import synth

HERE = os.path.dirname(os.path.abspath(__file__))


@pytest.fixture(scope="module")
def transformed(spark, pages_df):
    pipe = QualityFilterPipeline(PipelineConfig(langid=False, classify=True))
    return pipe.transform(pages_df).cache()


def test_spark_output_matches_reference_labels(spark, transformed):
    """Per-url keep/drop + byte-identical clean_text vs the labels produced
    by running the actual reference code (tests/gen_goldens.py)."""
    table = pq.read_table(os.path.join(HERE, "data", "page_labels.parquet"))
    labels = {
        url: (keep, clean)
        for url, keep, clean in zip(
            table["url"].to_pylist(), table["keep"].to_pylist(),
            table["clean_text"].to_pylist(),
        )
    }
    got = transformed.select("url", "keep", "clean_text").collect()
    checked = 0
    for row in got:
        if row["url"] not in labels:  # labels cover seeds 7+42; pages_df is seed 7
            continue
        exp_keep, exp_clean = labels[row["url"]]
        assert row["keep"] == exp_keep, row["url"]
        if exp_keep:
            assert row["clean_text"] == exp_clean, row["url"]
        checked += 1
    assert checked == 300


def test_transform_has_no_shuffle(spark):
    df = synth.pages_dataframe(spark, 10, seed=7)  # no repartition in source
    pipe = QualityFilterPipeline(PipelineConfig(langid=False, classify=False))
    plan = pipe.transform(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" in plan  # vectorization constraint (BASELINE.md §2)


def test_metrics_lineage(spark, pages_df, transformed):
    pipe = QualityFilterPipeline(PipelineConfig(langid=False))
    m = pipe.metrics(transformed)
    rows = {(r["partition_id"], r["rule"]): r for r in m.collect()}
    totals = [r for (pid, rule), r in rows.items() if rule == "_partition_total"]
    assert totals
    assert sum(r["docs_in"] for r in totals) == 300
    kept = transformed.filter("keep").count()
    assert sum(r["docs_out"] for r in totals) == kept


def test_rule_metrics_per_pattern_counts(spark):
    """ref A4/step5: per-orthography-rule substitution counts surface in the
    rule_hits column and as variant:<rule> rows in the metrics table, with
    identical counts on the fused and chained UDF paths."""
    filler = ("gallia est omnis divisa in partes tres quarum unam incolunt "
              "belgae aliam aquitani tertiam qui ipsorum lingua celtae. ") * 5
    text = filler + "michi placet et michi manet liber tercius hic."
    pages = spark.createDataFrame(
        [("u-variant", None, None, text, "la")], synth.PAGES_SCHEMA_DDL
    )
    for fused in (True, False):
        pipe = QualityFilterPipeline(PipelineConfig(
            langid=False, classify=False, rule_metrics=True, fused=fused))
        out = pipe.transform(pages)
        row = out.collect()[0]
        assert row.rule_hits["michi"] == 2, (fused, row.rule_hits)
        assert row.rule_hits["tercius"] == 1
        hits = {r.rule: r.rule_hits for r in pipe.metrics(out).collect()
                if r.rule.startswith("variant:")}
        assert hits == {"variant:michi": 2, "variant:tercius": 1}


def test_rule_metrics_off_by_default(spark, transformed):
    """The default transform must not carry (or compute) the map column."""
    assert "rule_hits" not in transformed.columns


def test_drop_reason_histogram(spark, transformed):
    hist = {r["decision"]: r["n_docs"] for r in drop_reason_histogram(transformed).collect()}
    assert hist.get("keep", 0) > 0
    assert sum(hist.values()) == 300
    assert set(hist) <= {"keep", "min_size", "index_toc", "pre_clean_len", "post_clean_len"}


def test_langid_gate(spark, pages_df):
    pipe = QualityFilterPipeline(PipelineConfig(langid=True, classify=False))
    out = pipe.transform(pages_df).cache()
    kept = out.filter("keep")
    # every kept doc must be predicted Latin
    assert kept.filter(~F.col("lang_pred").isin("la")).count() == 0
    dropped_langid = out.filter(F.array_contains("drop_reasons", "langid"))
    assert dropped_langid.count() > 0
    out.unpersist()


def test_resume_idempotent(spark, pages_df, tmp_path):
    out_dir = str(tmp_path / "clean")
    pipe = QualityFilterPipeline(PipelineConfig(langid=False, classify=False))
    n1 = checkpoints.run_resumable(pipe.transform, pages_df, out_dir, n_buckets=8)
    assert n1 == list(range(8))
    full = checkpoints.read_output(spark, out_dir)
    snapshot1 = sorted(
        (r["url"], r["keep"], r["clean_text"]) for r in full.select("url", "keep", "clean_text").collect()
    )

    # simulate a partial run: wipe two buckets' manifest rows and data
    import shutil

    manifest = os.path.join(out_dir, "_checkpoints")
    done = [
        (r["bucket"], 8)
        for r in spark.read.parquet(manifest).filter(F.col("bucket") < 6).collect()
    ]
    shutil.rmtree(manifest)
    spark.createDataFrame(done, "bucket int, n_buckets int").write.parquet(manifest)
    n2 = checkpoints.run_resumable(pipe.transform, pages_df, out_dir, n_buckets=8)
    assert n2 == [6, 7]  # only the two missing buckets re-ran

    snapshot2 = sorted(
        (r["url"], r["keep"], r["clean_text"])
        for r in checkpoints.read_output(spark, out_dir).select("url", "keep", "clean_text").collect()
    )
    assert snapshot1 == snapshot2


def test_salted_repartition_defuses_skew(spark, pages_df):
    spread = skew.partition_size_spread(
        skew.salted_repartition(pages_df, "url", 16)
    ).collect()[0]
    assert spread["n_partitions"] >= 8
    assert spread["max_rows"] <= 3 * spread["mean_rows"]
    top = skew.heavy_hitters(pages_df).collect()
    assert top[0]["n_docs"] > top[-1]["n_docs"]


def test_pii_scrub(spark):
    rows = [("u1", "scribe ad admin@example.com et vide https://ex.org/a 4111111111111111")]
    df = spark.createDataFrame(rows, "url string, text string")
    from wikisource_latin_text_cleaner_spark.functions import udfs

    out = df.select(udfs.pii_udf("text").alias("p")).select("p.*").collect()[0]
    assert "<EMAIL>" in out["text"] and "<URL>" in out["text"] and "<NUMBER>" in out["text"]
    assert out["pii_spans"] == 3


def test_fused_equals_chained(spark, pages_df):
    """The single-pass fused UDF path is row-identical to the composable
    chained-UDF path for the same config."""
    from pyspark.sql import functions as F

    from wikisource_latin_text_cleaner_spark.functions import rules

    kw = dict(extensions=rules.ExtensionConfig(), classify=True, langid=True,
              perplexity_threshold=1e9, pii_scrub=True)
    a = QualityFilterPipeline(PipelineConfig(fused=True, **kw)).transform(pages_df)
    b = QualityFilterPipeline(PipelineConfig(fused=False, **kw)).transform(pages_df)
    assert a.columns == b.columns
    fix = lambda df: df.withColumn("drop_reasons", F.concat_ws("|", "drop_reasons"))  # noqa: E731
    assert fix(a).exceptAll(fix(b)).count() == 0
    assert fix(b).exceptAll(fix(a)).count() == 0


def test_resume_rejects_cross_scheme_manifest(spark, pages_df, tmp_path):
    """Resuming with a different n_buckets must raise, not mix schemes."""
    import pytest

    from wikisource_latin_text_cleaner_spark.plans import checkpoints

    pipe = QualityFilterPipeline(PipelineConfig(langid=False, classify=False))
    out = str(tmp_path / "o")
    checkpoints.run_resumable(pipe.transform, pages_df, out, n_buckets=8)
    with pytest.raises(ValueError, match="n_buckets"):
        checkpoints.run_resumable(pipe.transform, pages_df, out, n_buckets=16)
    # a fresh (non-resume) run under the new scheme replaces everything
    n = checkpoints.run_resumable(pipe.transform, pages_df, out,
                                  n_buckets=16, resume=False)
    assert n == list(range(16))
    assert checkpoints.read_output(spark, out).count() == pages_df.count()
