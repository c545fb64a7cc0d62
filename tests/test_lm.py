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


# --- per-label NB training + classification --------------------------------

LAT = [
    "arma virumque cano troiae qui primus ab oris",
    "italiam fato profugus laviniaque venit litora",
    "multum ille et terris iactatus et alto",
]
ENG = [
    "the quick brown fox jumps over the lazy dog",
    "a journey of a thousand miles begins with a step",
]


def test_train_by_label_matches_per_label_numpy(spark):
    rows = [("la", t) for t in LAT] + [("en", t) for t in ENG] + [(None, "skip me")]
    df = spark.createDataFrame(rows, "lang string, text string")
    models, priors = lm.train_char_bigram_lm_by(df)
    assert set(models) == {"la", "en"}
    np.testing.assert_allclose(models["la"], _numpy_reference(LAT), rtol=0, atol=0)
    np.testing.assert_allclose(models["en"], _numpy_reference(ENG), rtol=0, atol=0)
    assert priors == {"la": 3 / 5, "en": 2 / 5}


def test_train_by_label_partitioning_invariant(spark):
    rows = [("la", t) for t in LAT] + [("en", t) for t in ENG]
    df = spark.createDataFrame(rows, "lang string, text string")
    m1, p1 = lm.train_char_bigram_lm_by(df)
    m2, p2 = lm.train_char_bigram_lm_by(df.repartition(7))
    assert p1 == p2
    for lab in m1:
        np.testing.assert_array_equal(m1[lab], m2[lab])


def test_nb_classifier_self_consistent_and_tiebreak(spark):
    rows = [("la", t) for t in LAT] + [("en", t) for t in ENG]
    df = spark.createDataFrame(rows, "lang string, text string")
    models, priors = lm.train_char_bigram_lm_by(df)
    pred = lm.make_nb_classifier_udf(models, priors)
    got = {r["text"]: r["p"]
           for r in df.select("text", pred("text").alias("p")).collect()}
    for t in LAT:
        assert got[t] == "la"
    for t in ENG:
        assert got[t] == "en"
    # <2-char text: prior-only scores; la wins on the larger prior
    probe = spark.createDataFrame([("x",)], "text string")
    assert probe.select(pred("text").alias("p")).collect()[0]["p"] == "la"
    # equal priors -> identical scores -> lexicographically smallest label
    eq_models = {"aa": models["la"], "zz": models["la"]}
    eq_pred = lm.make_nb_classifier_udf(eq_models, {"aa": 0.5, "zz": 0.5})
    assert probe.select(eq_pred("text").alias("p")).collect()[0]["p"] == "aa"


def test_train_by_label_rejects_all_null_labels(spark):
    df = spark.createDataFrame([(None, "abc")], "lang string, text string")
    import pytest

    with pytest.raises(ValueError, match="no labeled rows"):
        lm.train_char_bigram_lm_by(df)
