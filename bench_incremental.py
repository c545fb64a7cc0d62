"""1M-page stress for incremental (ledger) dedup — BENCH/STRESS.md entry.

Splits the synthetic corpus 60/40 by url md5 bucket into "already-ingested
snapshot" (distilled to a ledger) and "new snapshot", then times
``incremental_exact_dedup`` (content-hash ledger) and
``incremental_minhash_dedup`` (signature ledger, word-3-gram signatures --
char shingles degenerate on this low-entropy corpus, see STRESS.md).
Prints one JSON line per op. Resize with BENCH_INCR_ROWS.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pyspark.sql import SparkSession, functions as F

from wikisource_latin_text_cleaner_spark.operators import dedup, sampling

N = int(os.environ.get("BENCH_INCR_ROWS", "1000000"))
PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    ".bench", f"pages_{N}.parquet")
if not os.path.exists(PATH):
    from wikisource_latin_text_cleaner_spark.sources import synth

    os.makedirs(os.path.dirname(PATH), exist_ok=True)
    synth.write_pages_parquet(PATH, N, seed=42)

spark = (
    SparkSession.builder.master(
        os.environ.get("BENCH_INCR_MASTER", "local[32]"))
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.driver.memory", "32g")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

pages = spark.read.parquet(PATH).select("url", "text")
bucket = sampling.split_bucket_col(F.col("url"))
prior = pages.where(bucket < 6000)
new = pages.where(bucket >= 6000)

# --- exact (content-hash) ledger ---------------------------------------------
t0 = time.time()
seen = prior.select(
    F.md5(F.encode("text", "utf-8")).alias("content_hash")
).distinct().persist()
n_ledger = seen.count()
t1 = time.time()
kept, updated = dedup.incremental_exact_dedup(new, seen, id_col="url")
n_new = new.count()
n_kept = kept.count()
n_updated = updated.count()
t2 = time.time()
print(json.dumps({
    "op": "incremental_exact", "ledger_docs": n_ledger, "new_docs": n_new,
    "kept": n_kept, "updated_ledger": n_updated,
    "ledger_build_sec": round(t1 - t0, 2), "dedup_sec": round(t2 - t1, 2),
    "new_docs_per_sec": round(n_new / (t2 - t1), 1),
}))

# --- minhash (signature) ledger ------------------------------------------------
t0 = time.time()
seen_sigs = prior.select(
    F.col("url").alias("id"), dedup.word_minhash_udf("text").alias("sig")
).persist()
n_sigs = seen_sigs.count()
t1 = time.time()
mkept, mupd = dedup.incremental_minhash_dedup(
    new, seen_sigs, id_col="url", threshold=0.9,
    signature_udf=dedup.word_minhash_udf,
)
m_kept = mkept.count()
m_upd = mupd.count()
t2 = time.time()
print(json.dumps({
    "op": "incremental_minhash_wordgram", "ledger_sigs": n_sigs,
    "new_docs": n_new, "kept": m_kept, "updated_ledger": m_upd,
    "ledger_build_sec": round(t1 - t0, 2), "dedup_sec": round(t2 - t1, 2),
    "new_docs_per_sec": round(n_new / (t2 - t1), 1),
}))
spark.stop()
