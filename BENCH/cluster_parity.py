#!/usr/bin/env python
"""Shuffle-path distributed-correctness parity (spark-submit twin).

Round 4 proved the zero-shuffle pipeline produces byte-identical outputs
under `local[4]` vs separate-executor-JVM `local-cluster[2,2]`. This
script is the SHUFFLE-PATH twin: the full MinHash-LSH dedup job --
signature Arrow UDF -> collapse-identical groupBy -> band explode ->
bucket exchange + sort-merge self-join -> JVM verify -> survivor
anti-join (lean-exchange mode, word-3-gram signatures: the 1M-doc stress
config) -- launched through REAL ``spark-submit --py-files pipeline.zip``
under both masters, exactly as a production cluster launch ships the
package. If the exchange machinery (hash partitioning, sort-merge join,
AQE coalescing) behaved differently across process topologies, the kept
set would differ; parity = identical survivor count AND identical md5
over the sorted survivor id list.

Usage:
    python BENCH/cluster_parity.py            # parent: build zip, submit both, compare
    spark-submit ... BENCH/cluster_parity.py --run <out.json>   # child

The verdict is appended to BENCH/cluster_parity_runs.jsonl and printed.
The driver-side sorted-id collect is bounded by the PARITY corpus size
(40k ids) -- this is a test harness, not a production operator.
"""
from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROWS = int(os.environ.get("PARITY_ROWS", "40000"))
MASTERS = (
    os.environ.get("PARITY_MASTER_A", "local[4]"),
    os.environ.get("PARITY_MASTER_B", "local-cluster[2,2,6144]"),
)
ZIP = os.path.join(REPO, "pipeline.zip")


def corpus_path() -> str:
    path = os.path.join(REPO, ".bench", f"pages_{ROWS}.parquet")
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        from wikisource_latin_text_cleaner_spark.sources import synth

        synth.write_pages_parquet(path, ROWS)
    return path


def build_zip() -> str:
    """(Re)build pipeline.zip from the CURRENT package source so the
    executors run exactly the code under test."""
    pkg = os.path.join(REPO, "wikisource_latin_text_cleaner_spark")
    with zipfile.ZipFile(ZIP, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            for f in sorted(files):
                if f.endswith(".py") or f.endswith(".json"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return ZIP


def child(out_path: str) -> None:
    """Runs inside spark-submit: master comes from the launch command."""
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from wikisource_latin_text_cleaner_spark.operators import dedup

    spark = (
        SparkSession.builder.appName("wltc-cluster-parity")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(corpus_path()).repartition(32)
    base = pages.select(F.xxhash64("url").alias("doc_id"), "text")
    # plant near-dup "re-crawls" for 1 in 8 docs (same text + a short
    # tail -> word-3-gram agreement >= 0.9) so the verify + anti-join
    # actually DROP rows; a topology-dependent exchange would surface as
    # a different survivor set, not just a different order
    variants = (
        pages.where(F.xxhash64("url") % 8 == 0)
        .select(
            F.xxhash64(F.concat(F.col("url"), F.lit("#recrawl"))).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" tail")).alias("text"),
        )
    )
    docs = base.unionByName(variants)
    kept = dedup.minhash_dedup(
        docs,
        threshold=0.9,
        signature_udf=dedup.word_minhash_udf,
        carry_signatures=False,
    )
    ids = sorted(r[0] for r in kept.select("doc_id").collect())
    digest = hashlib.md5(",".join(map(str, ids)).encode()).hexdigest()
    result = {
        "master": spark.sparkContext.master,
        "n_input": docs.count(),
        "n_kept": len(ids),
        "kept_md5": digest,
    }
    with open(out_path, "w") as f:
        json.dump(result, f)
    print(json.dumps(result))
    spark.stop()


def main() -> int:
    if len(sys.argv) > 2 and sys.argv[1] == "--run":
        child(sys.argv[2])
        return 0

    corpus_path()  # generate before submitting (children only read)
    build_zip()
    spark_submit = os.path.join(
        os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit"
    )
    results = []
    for i, master in enumerate(MASTERS):
        out = os.path.join(REPO, ".bench", f"parity_{i}.json")
        if os.path.exists(out):
            os.remove(out)
        cmd = [
            spark_submit,
            "--master", master,
            "--py-files", ZIP,
            "--conf", "spark.driver.memory=4g",
            os.path.abspath(__file__), "--run", out,
        ]
        print(f"submitting: {' '.join(cmd)}", flush=True)
        rc = subprocess.run(cmd, stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL).returncode
        if rc != 0 or not os.path.exists(out):
            print(json.dumps({"master": master, "error": f"rc={rc}"}))
            return 1
        with open(out) as f:
            results.append(json.load(f))
        print(json.dumps(results[-1]), flush=True)

    a, b = results
    parity = (a["n_kept"] == b["n_kept"]) and (a["kept_md5"] == b["kept_md5"])
    record = {"rows": ROWS, "masters": [a["master"], b["master"]],
              "n_kept": [a["n_kept"], b["n_kept"]],
              "kept_md5": [a["kept_md5"], b["kept_md5"]],
              "parity": parity}
    with open(os.path.join(REPO, "BENCH", "cluster_parity_runs.jsonl"), "a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record))
    return 0 if parity else 2


if __name__ == "__main__":
    sys.exit(main())
