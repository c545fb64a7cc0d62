"""sampling.domain_quality_gate and textstats.tfidf_top_terms."""

import math

import pytest
from pyspark.sql import functions as F

from wikisource_latin_text_cleaner_spark.operators import sampling, textstats


# -- domain quality gate -------------------------------------------------------

def _gate_df(spark):
    rows = [
        # good.com: 3 docs, mean 0.6
        (1, "good.com", 0.5), (2, "good.com", 0.6), (3, "good.com", 0.7),
        # spam.biz: 3 docs, mean 0.1
        (4, "spam.biz", 0.1), (5, "spam.biz", 0.1), (6, "spam.biz", 0.1),
        # tiny.org: 1 doc, high score -- dies to min_docs, not the mean
        (7, "tiny.org", 0.9),
        # unattributable
        (8, None, 0.9),
    ]
    return spark.createDataFrame(rows, "doc_id long, domain string, score double")


def test_domain_gate_min_mean_and_min_docs(spark):
    kept = sampling.domain_quality_gate(
        _gate_df(spark), "score", "domain", min_mean=0.3, min_docs=2
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 2, 3]


def test_domain_gate_max_mean(spark):
    kept = sampling.domain_quality_gate(
        _gate_df(spark), "score", "domain", max_mean=0.3, min_docs=2
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == [4, 5, 6]


def test_domain_gate_min_docs_only(spark):
    kept = sampling.domain_quality_gate(
        _gate_df(spark), "score", "domain", min_docs=3
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 2, 3, 4, 5, 6]


def test_domain_gate_accepts_column_expr(spark):
    kept = sampling.domain_quality_gate(
        _gate_df(spark), F.col("score") * 10, "domain", min_mean=3.0, min_docs=1
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 2, 3, 7]


def test_domain_gate_boundary_is_rounded(spark):
    # three floats averaging to 0.30000000000000004 -- the 6dp rounding
    # must admit the domain at min_mean=0.3 regardless of summation order
    rows = [(1, "x", 0.1), (2, "x", 0.2), (3, "x", 0.6)]
    df = spark.createDataFrame(rows, "doc_id long, domain string, score double")
    kept = sampling.domain_quality_gate(df, "score", "domain", min_mean=0.3)
    assert kept.count() == 3


def test_domain_gate_requires_a_bound(spark):
    with pytest.raises(ValueError):
        sampling.domain_quality_gate(_gate_df(spark), "score", "domain")


# -- tf-idf top terms ----------------------------------------------------------

def test_tfidf_scores_and_ranking(spark):
    rows = [
        (1, "A", "x x shared"),
        (2, "B", "y shared"),
        (3, None, "x y shared ignored"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {
        (r["group"], r["term"]): r
        for r in textstats.tfidf_top_terms(df, "lang", "text", k=10).collect()
    }
    ln2 = round(2 * math.log(2.0), 6)
    assert out[("A", "x")]["score"] == ln2  # tf=2, gf=1
    assert out[("A", "x")]["rank"] == 1
    assert out[("B", "y")]["score"] == round(math.log(2.0), 6)
    # a term in every group scores exactly 0
    assert out[("A", "shared")]["score"] == 0.0
    assert out[("B", "shared")]["score"] == 0.0
    # NULL-group doc contributed nothing: x still has group_freq 1
    assert out[("A", "x")]["group_freq"] == 1


def test_tfidf_k_truncation_and_tiebreak(spark):
    # every term tf=1 gf=1 -> identical scores; rank order must be
    # term-ascending, truncated to k
    rows = [(1, "A", "delta charlie bravo alpha")]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = [
        (r["term"], r["rank"])
        for r in textstats.tfidf_top_terms(df, "lang", "text", k=3)
        .orderBy("rank").collect()
    ]
    assert got == [("alpha", 1), ("bravo", 2), ("charlie", 3)]


# -- snapshot diff ---------------------------------------------------------------

def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [("u1", "same"), ("u2", "before"), ("u3", "gone")], ["url", "text"]
    )
    new = spark.createDataFrame(
        [("u1", "same"), ("u2", "after"), ("u4", "fresh")], ["url", "text"]
    )
    from wikisource_latin_text_cleaner_spark.operators.textstats import snapshot_diff

    got = {r["url"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {"u1": "unchanged", "u2": "changed",
                   "u3": "vanished", "u4": "added"}


def test_snapshot_diff_never_shuffles_text(spark):
    from wikisource_latin_text_cleaner_spark.operators.textstats import snapshot_diff

    old = spark.createDataFrame([("u1", "x" * 10)], ["url", "text"])
    new = spark.createDataFrame([("u1", "y" * 10)], ["url", "text"])
    plan = snapshot_diff(old, new)._jdf.queryExecution().executedPlan().toString()
    # the join operates on (url, md5) projections; no text column survives
    # into any exchange
    for ln in plan.splitlines():
        if "Exchange" in ln:
            assert "text" not in ln
