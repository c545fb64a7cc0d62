"""BPE tokenizer: training determinism, merge quality, round-trip."""

from pyspark.sql import functions as F

from wikisource_latin_text_cleaner_spark.functions import bpe


def _corpus(spark):
    rows = [(i, "aqua aquila aquaeductus terra terrarum et et et in aqua") for i in range(20)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_learns_frequent_pairs(spark):
    merges = bpe.train_bpe(_corpus(spark), num_merges=30)
    assert len(merges) > 0
    merged_strings = {a + b for a, b in merges}
    # 'aqua' variants dominate -> some aq/qu merge must be learned
    assert any("aq" in s or "qu" in s for s in merged_strings)


def test_train_is_deterministic(spark):
    df = _corpus(spark)
    assert bpe.train_bpe(df, num_merges=25) == bpe.train_bpe(df.repartition(7), num_merges=25)


def test_tokenize_round_trip(spark):
    df = _corpus(spark)
    merges = bpe.train_bpe(df, num_merges=50)
    tokenize_udf, count_udf = bpe.make_bpe_udfs(merges)
    out = df.select("doc_id", tokenize_udf("text").alias("toks"),
                    count_udf("text").alias("n")).collect()
    for r in out:
        # detokenization recovers the lowercased word stream
        words = "".join(r.toks).replace(bpe.EOW, " ").split()
        assert words == "aqua aquila aquaeductus terra terrarum et et et in aqua".split()
        assert r.n == len(r.toks) > 0
    # frequent whole word collapses to a single token
    one = df.limit(1).select(tokenize_udf(F.lit("et")).alias("t")).collect()[0].t
    assert one == ["et" + bpe.EOW]


def test_unknown_chars_fall_back_to_chars(spark):
    merges = bpe.train_bpe(_corpus(spark), num_merges=10)
    tokenize_udf, _ = bpe.make_bpe_udfs(merges)
    df = spark.createDataFrame([(1, "zzyzx")], "doc_id long, text string")
    toks = df.select(tokenize_udf("text").alias("t")).collect()[0].t
    assert "".join(toks).replace(bpe.EOW, "") == "zzyzx"


def test_frozen_merges_match_live_training_on_sf001(spark):
    """bpe_frozen.MERGES is the oracle-side merge table for the driver's
    bpe_token_stats query; it must be exactly what train_bpe produces on
    the sf0.01 documents corpus (num_merges=100, defaults otherwise), or
    the 'trained once, applied everywhere' claim silently drifts."""
    from wikisource_latin_text_cleaner_spark.functions.bpe_frozen import MERGES

    df = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    assert bpe.train_bpe(df, num_merges=100) == MERGES
