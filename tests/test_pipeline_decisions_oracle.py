"""Pin the pipeline_decisions DuckDB oracle to the engine's decision ladder.

The oracle (``__spark_entry__.oracle_sql()['pipeline_decisions']``) re-derives
``rules.evaluate_document``'s decision in SQL under the documents table's
contract (single-line text over the charset ``[a-z ]``).  These tests compare
the oracle's PER-DOC decision (the inner SELECT, before the histogram
GROUP BY) against the live engine on the shipped corpus, on randomized
in-scope probes, and assert the out-of-scope sentinel fires for inputs that
leave the contract -- so a regenerated corpus fails loudly, never silently.
"""

from __future__ import annotations

import random
import re

import duckdb
import pytest

from wikisource_latin_text_cleaner_spark.functions import rules

import __spark_entry__ as entry


def _decisions(con: duckdb.DuckDBPyConnection) -> list[tuple]:
    """(text, decision) rows: the oracle's inner per-doc SELECT."""
    sql = entry.oracle_sql()["pipeline_decisions"]
    per_doc, n = re.subn(
        r"SELECT decision, count\(\*\) AS n_docs FROM \(",
        "SELECT text, decision FROM (", sql, count=1)
    assert n == 1, "oracle shape changed; update this test's rewrite"
    per_doc, n = re.subn(r"SELECT CASE\b", "SELECT text, CASE", per_doc,
                         count=1)
    assert n == 1, "oracle shape changed; update this test's rewrite"
    per_doc, n = re.subn(r"GROUP BY decision ORDER BY decision\s*$", "",
                         per_doc.rstrip())
    assert n == 1, "oracle shape changed; update this test's rewrite"
    return con.sql(per_doc).fetchall()


def _engine(text):
    v = rules.evaluate_document(text)
    return "keep" if v.keep else v.drop_reasons[0]


def test_oracle_matches_engine_on_shipped_corpus():
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT text FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    rows = _decisions(con)
    assert len(rows) == 500
    for text, dec in rows:
        assert dec == _engine(text), repr(text[:80])


# the corpus vocabulary plus words crafted to exercise every ladder branch:
# roman-char first letters, heading indicators, chapter refs, short lines
_VOCAB = (
    "a agg batch big column customer data dup fast filter group hash join "
    "key line merge order part query row scan slow small sort spark stream "
    "table the value vector window mi xi lid cap pars liber book chapter "
    "sectio title titulus i ii xiv".split()
)


def test_oracle_matches_engine_on_randomized_probes():
    rng = random.Random(20260818)
    cases: list[str | None] = [
        None, "", "   ", "a " * 150, " " * 250, "i " * 120, "mi",
        "liber i " + "a" * 250, "x " + "a" * 30, "cap " * 80,
        "value part " + "query " * 60, "merge " + "row " * 80 + " part",
    ]
    for _ in range(500):
        cases.append(" ".join(rng.choices(_VOCAB, k=rng.randint(1, 90))))
    con = duckdb.connect()
    con.sql("CREATE TABLE documents(text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?)", [(c,) for c in cases])
    n_checked = 0
    for text, dec in _decisions(con):
        assert dec != "oracle_scope_violation", repr(text)
        assert dec == _engine(text), repr((text or "")[:80])
        n_checked += 1
    assert n_checked == len(cases)


@pytest.mark.parametrize(
    "text",
    [
        "Has Capitals " + "a" * 200,      # uppercase leaves the charset
        "digits 123 " + "a" * 200,        # digits do too
        ("line one\nline two " + "a" * 200),  # multi-line
        "punct. " + "a" * 200,            # punctuation
    ],
)
def test_out_of_scope_input_trips_the_sentinel(text):
    con = duckdb.connect()
    con.sql("CREATE TABLE documents(text VARCHAR)")
    con.execute("INSERT INTO documents VALUES (?)", (text,))
    [(_, dec)] = _decisions(con)
    assert dec == "oracle_scope_violation"
