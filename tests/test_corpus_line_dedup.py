"""Corpus-level duplicate-line removal (dedup.corpus_line_dedup).

Planted-fixture tests against a pure-Python re-implementation of both
published rules (CCNet drop-all, C4 keep-first), plus structural
guarantees: blanks survive, untouched docs are byte-identical, fully
boilerplate docs stay in the corpus with empty text, and the physical
plan broadcasts the heavy set and stays Python-free.
"""

import pytest
from pyspark.sql import functions as F

from wikisource_latin_text_cleaner_spark.operators import dedup


DOCS = [
    # doc 1: unique body + the global footer + a blank line
    (1, "alpha body one\nAll rights reserved.\n\nunique tail 1"),
    # doc 2: footer appears FIRST here by (id,pos)? no -- doc 1 pos 1 wins.
    (2, "All rights reserved.\nbeta body two\nSubscribe now!\nunique tail 2"),
    # doc 3: both boilerplate lines, plus whitespace-only line (structural)
    (3, "Subscribe now!\ngamma body three\n   \nAll rights reserved."),
    # doc 4: 100% boilerplate -> empty text under drop-all, must NOT vanish
    (4, "All rights reserved.\nSubscribe now!"),
    # doc 5: no heavy lines at all -> must pass through byte-identical,
    # including its own internally-repeated line (count 2 corpus-wide? no:
    # "solo line" appears twice IN THIS DOC, so corpus count IS 2)
    (5, "solo line\nsolo line\ndistinct tail 5"),
    # doc 6: completely untouched
    (6, "zeta body six\ndistinct tail 6"),
]


def _py_corpus_line_dedup(rows, min_count, keep_first):
    from collections import Counter

    cnt = Counter()
    for _id, text in rows:
        for ln in text.split("\n"):
            if ln.strip() != "":
                cnt[ln] += 1
    heavy = {ln for ln, c in cnt.items() if c >= min_count}
    first = {}
    for _id, text in sorted(rows):
        for pos, ln in enumerate(text.split("\n")):
            if ln in heavy and ln not in first:
                first[ln] = (_id, pos)
    out = {}
    for _id, text in rows:
        kept = []
        for pos, ln in enumerate(text.split("\n")):
            if ln.strip() != "" and ln in heavy:
                if keep_first and first[ln] == (_id, pos):
                    kept.append(ln)
                continue
            kept.append(ln)
        out[_id] = "\n".join(kept)
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.mark.parametrize("keep_first", [False, True])
@pytest.mark.parametrize("min_count", [2, 3])
def test_matches_python_reference(spark, docs_df, keep_first, min_count):
    got = {
        r["doc_id"]: r["text"]
        for r in dedup.corpus_line_dedup(
            docs_df, min_count=min_count, keep_first=keep_first
        ).collect()
    }
    want = _py_corpus_line_dedup(DOCS, min_count, keep_first)
    assert got == want


def test_drop_all_semantics(spark, docs_df):
    got = {
        r["doc_id"]: r["text"]
        for r in dedup.corpus_line_dedup(docs_df, min_count=2).collect()
    }
    # every occurrence of both boilerplate lines is gone
    for text in got.values():
        assert "All rights reserved." not in text
        assert "Subscribe now!" not in text
    # doc 5's internally-repeated line hits corpus count 2 -> dropped
    assert got[5] == "distinct tail 5"
    # blanks/whitespace-only lines survive in place
    assert got[1] == "alpha body one\n\nunique tail 1"
    assert got[3] == "gamma body three\n   "
    # fully-boilerplate doc keeps its row with empty text
    assert got[4] == ""
    # untouched doc byte-identical
    assert got[6] == DOCS[5][1]
    assert set(got) == {1, 2, 3, 4, 5, 6}


def test_keep_first_keeps_exactly_one(spark, docs_df):
    got = {
        r["doc_id"]: r["text"]
        for r in dedup.corpus_line_dedup(
            docs_df, min_count=2, keep_first=True
        ).collect()
    }
    joined = "\n".join(got[k] for k in sorted(got))
    assert joined.count("All rights reserved.") == 1
    assert joined.count("Subscribe now!") == 1
    # first occurrence by (doc_id, pos): doc 1 pos 1 / doc 2 pos 2
    assert "All rights reserved." in got[1]
    assert "Subscribe now!" in got[2]
    # doc 5: first "solo line" (pos 0) survives, second drops
    assert got[5] == "solo line\ndistinct tail 5"


def test_min_count_above_max_is_noop(spark, docs_df):
    got = {
        r["doc_id"]: r["text"]
        for r in dedup.corpus_line_dedup(docs_df, min_count=10).collect()
    }
    assert got == dict(DOCS)


def test_other_columns_and_schema_preserved(spark):
    df = spark.createDataFrame(
        [(1, "x\nshared", "en", 7), (2, "shared\ny", "la", 8)],
        "doc_id long, text string, lang string, extra long",
    )
    out = dedup.corpus_line_dedup(df, min_count=2)
    assert out.columns == df.columns
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["lang"] == "en" and rows[1]["extra"] == 7
    assert rows[1]["text"] == "x" and rows[2]["text"] == "y"


def test_plan_broadcasts_heavy_set_and_is_python_free(spark, docs_df):
    plan = (
        dedup.corpus_line_dedup(docs_df, min_count=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
