"""Distributed corpus-trained char-bigram LM (functions/lm.py)."""

import numpy as np

from wikisource_latin_text_cleaner_spark.functions import lm
from wikisource_latin_text_cleaner_spark.functions.perplexity import V, _ids


TEXTS = [
    "arma virumque cano troiae qui primus ab oris",
    "italiam fato profugus laviniaque venit litora",
    "multum ille et terris iactatus et alto",
    "Vi superum saevae memorem IUNONIS ob iram; 123!",
    "",  # empty: contributes nothing
    None,  # null: contributes nothing
]


def _numpy_reference(texts):
    counts = np.zeros((V, V), dtype=np.int64)
    for t in texts:
        if t and len(t) >= 2:
            ids = _ids(t.lower())
            np.add.at(counts, (ids[:-1], ids[1:]), 1)
    sm = counts.astype(np.float64) + 1.0
    return np.log(sm / sm.sum(axis=1, keepdims=True))


def test_trained_model_matches_numpy_reference(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = lm.train_char_bigram_lm(df)
    np.testing.assert_array_equal(got, _numpy_reference(TEXTS))


def test_training_is_partitioning_invariant(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS * 10], "text string")
    m1 = lm.train_char_bigram_lm(df.coalesce(1))
    m8 = lm.train_char_bigram_lm(df.repartition(8))
    np.testing.assert_array_equal(m1, m8)


def test_rows_are_normalized_distributions(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    model = lm.train_char_bigram_lm(df)
    np.testing.assert_allclose(np.exp(model).sum(axis=1), 1.0, rtol=1e-12)


def test_scorer_separates_in_domain_from_garbage(spark):
    train = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    model = lm.train_char_bigram_lm(train)
    scorer = lm.make_perplexity_udf(model)
    probe = spark.createDataFrame(
        [("in", "arma virumque cano qui venit"),
         ("garbage", "qzx#@ qzx#@ wvvvk ~~|{}^^"),
         ("short", "x")],
        "kind string, text string",
    )
    got = {r["kind"]: r["ppx"]
           for r in probe.select("kind", scorer("text").alias("ppx")).collect()}
    assert got["in"] < got["garbage"]
    assert got["short"] == float("inf")
