#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` (default 32) and
prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Beyond the per-query timings it measures the north-rule headline number --
quality-filter pipeline throughput in docs/sec -- over a deterministic
synthetic `pages` corpus (sources/synth.py, seed=42), cached as parquet under
``.bench/`` so repeated runs re-read identical bytes.

Every query is forced with a `noop`-format write so projections and UDFs are
fully evaluated (a bare ``count()`` lets Catalyst prune unreferenced
projections and would under-measure).

Scaling evidence (local[8] vs local[32], north rule) lives in
``bench_scaling.py`` -> ``BENCH/BASELINE.md``; this script stays fast enough
for the per-round driver loop.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from wikisource_latin_text_cleaner_spark.operators.pipeline import (  # noqa: E402
    PipelineConfig,
    QualityFilterPipeline,
)
from wikisource_latin_text_cleaner_spark.functions import rules  # noqa: E402
from wikisource_latin_text_cleaner_spark.sources import synth  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
#: synthetic corpus size for the docs/sec headline (scrub is ~165 docs/s/core)
PAGES_ROWS = int(os.environ.get("BENCH_PAGES_ROWS", "20000"))

#: representative spread: relational aggs/joins, cube, window top-k, text
#: heuristics, dedup (exact + minhash + simhash + jaccard), ANN, and the
#: full-fidelity pipeline decisions over the sf documents table.
HEADLINE = (
    "pricing_summary",
    "revenue_by_nation",
    "orders_by_segment",
    "events_top_users",
    "lang_source_cube",
    "token_counts",
    "stopword_ratio",
    "fingerprints",
    "dedup_exact",
    "minhash_dedup_count",
    "simhash_pairs",
    "ngram_jaccard_near_dups",
    "knn_bruteforce",
    "langid_histogram",
    "pipeline_decisions",
)


def pages_parquet(n_rows: int) -> str:
    path = os.path.join(REPO, ".bench", f"pages_{n_rows}.parquet")
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        synth.write_pages_parquet(path, n_rows)
    return path


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def build_spark(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("wltc-bench")
        .config("spark.sql.shuffle.partitions", str(2 * cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def main() -> None:
    spark = build_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qmap = entrymod.queries()
    timings: dict[str, float] = {}

    # Warmup: spin up the Arrow Python UDF worker pool (one per core -- the
    # first pandas-UDF query otherwise absorbs ~3-4s of fork/import cost) +
    # JIT the scan path, so timed queries measure steady-state work.
    from wikisource_latin_text_cleaner_spark.operators import dedup as _dedup

    warm = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(200)
    force(warm)
    force(warm.repartition(CPUS).select(_dedup.minhash_udf("text")))

    for name in HEADLINE:
        t0 = time.perf_counter()
        force(qmap[name](spark, SF_DIR))
        t1 = time.perf_counter() - t0
        # hypervisor contention swings this box >4x between minutes; a
        # second rep (cheap queries only) and taking the min filters most
        # of that noise out of the recorded figure
        if t1 < 5.0:
            t0 = time.perf_counter()
            force(qmap[name](spark, SF_DIR))
            t1 = min(t1, time.perf_counter() - t0)
        timings[name] = round(t1, 3)

    # North-rule headline: full web-mode pipeline throughput in docs/sec.
    # Tuned for the UDF-chain job (see bench_scaling.py docstring): small
    # Arrow batches overlap JVM<->Python transfer with compute; AQE's
    # stage-wise materialization only adds latency to this shuffle-free job.
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    path = pages_parquet(PAGES_ROWS)
    pages = spark.read.parquet(path).repartition(2 * CPUS)
    pipe = QualityFilterPipeline(
        PipelineConfig(
            extensions=rules.ExtensionConfig(),
            classify=True,
            langid=True,
            perplexity_threshold=1e9,  # compute ppx, gate effectively off
            pii_scrub=True,
        )
    )
    force(pipe.transform(pages).limit(500))  # warm pipeline UDF workers
    t0 = time.perf_counter()
    force(pipe.transform(pages))
    pipeline_sec = time.perf_counter() - t0
    timings["pipeline_full_web_mode"] = round(pipeline_sec, 3)
    docs_per_sec = round(PAGES_ROWS / pipeline_sec, 1)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "total_headline_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "pipeline_docs_per_sec": docs_per_sec,
                "pipeline_corpus_rows": PAGES_ROWS,
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
