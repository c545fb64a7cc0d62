"""Spark quality Column expressions vs their pure-Python twins in rules.py
on planted inputs (the corpus oracles only exercise the zero case for
duplicate lines -- the synthetic documents have none)."""

from pyspark.sql import functions as F

from wikisource_latin_text_cleaner_spark.functions import quality, rules


def test_dup_line_char_fraction_spark_matches_python(spark):
    a = "duplicated boilerplate16"
    b = "a unique line of thirty chars."
    texts = [
        "\n".join([a, b, a, "", "   ", a]),
        "",
        "one\ntwo\nthree",
        "x y\n\tx y",          # tab-padded: NOT a duplicate under space-trim
        "x y\n   x y",         # space-padded: duplicate
        "\n".join(["nav bar"] * 5 + ["content line here"]),
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    got = {
        r["i"]: r["frac"]
        for r in df.select(
            "i", F.round(quality.dup_line_char_fraction(F.col("text")), 10).alias("frac")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert abs(got[i] - rules.dup_line_char_fraction(t)) < 1e-9, (i, t)


def test_dup_line_char_fraction_outlier_doc_is_fast(spark):
    """A 10k-line outlier doc must be cheap: the sort+fold formulation is
    O(L log L); the previous nested-filter one was O(lines^2) (~10^8
    comparisons inside one task for this doc -- VERDICT r2 item #5). The
    wall bound is a loose tripwire for an accidental regression to the
    quadratic plan; the value assertion pins 3-way parity on a doc with a
    non-trivial duplicate mix."""
    import time

    rng_lines = [
        ("repeated boilerplate line %d" % (i % 997)) for i in range(10_000)
    ]
    text = "\n".join(rng_lines)
    df = spark.createDataFrame([(0, text)], "i long, text string")
    t0 = time.perf_counter()
    got = df.select(
        F.round(quality.dup_line_char_fraction(F.col("text")), 10).alias("frac")
    ).collect()[0]["frac"]
    wall = time.perf_counter() - t0
    assert abs(got - rules.dup_line_char_fraction(text)) < 1e-9
    assert wall < 30.0, f"outlier doc took {wall:.1f}s -- quadratic plan is back?"


def test_top_bigram_ratio_spark_matches_python(spark):
    import re

    def py(t):
        ws = re.findall(r"\w+", t.lower(), re.UNICODE)
        n = len(ws)
        if n < 8:
            return 0.0
        d = {}
        for x, y in zip(ws, ws[1:]):
            d[(x, y)] = d.get((x, y), 0) + 1
        return max(d.values()) / (n - 1)

    texts = [
        ("buy now " * 300).strip(),
        "gallia est omnis divisa in partes tres quarum unam incolunt belgae",
        "a b a b a b c d e f",
        "short text",
        "",
        "Mixed CASE mixed case MIXED case and more words here",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    got = {
        r["i"]: r["r"]
        for r in df.select(
            "i", F.round(quality.top_bigram_ratio(F.col("text")), 8).alias("r")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert abs(got[i] - py(t)) < 1e-7, (i, t, got[i], py(t))


def test_url_canonicalize_cross_engine_randomized(spark):
    """300 seeded randomized URLs (every combination of case, ports,
    tracking params, fragments, trailing slashes, missing schemes) must
    canonicalize byte-identically in Spark (Java regex) and DuckDB (RE2)."""
    import random

    import duckdb
    import pandas as pd

    from wikisource_latin_text_cleaner_spark.functions import urls

    rng = random.Random(424242)
    schemes = ["http", "HTTP", "https", "HTTPS", "ftp", ""]
    hosts = ["Example.COM", "sub.Host.org", "h.io", "MIXED.Case.Net"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/a", "/a/b/", "/Deep/Path//", "/x.html"]
    params = ["", "?q=1", "?utm_source=a", "?utm_a=1&utm_b=2", "?fbclid=zz",
              "?gclid=g&keep=1", "?keep=1&utm_x=2&also=3"]
    frags = ["", "#f", "#Sec/2?x=1"]
    cases = []
    for _ in range(300):
        s = rng.choice(schemes)
        u = (f"{s}://" if s else "") + rng.choice(hosts) + rng.choice(ports) \
            + rng.choice(paths) + rng.choice(params) + rng.choice(frags)
        cases.append(u)
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i long, url string")
    got = {r["i"]: r["c"] for r in
           df.select("i", urls.canonicalize_url(F.col("url")).alias("c")).collect()}
    con = duckdb.connect()
    pdf = pd.DataFrame({"i": range(len(cases)), "url": cases})
    expr = urls.canonicalize_url_sql("url")
    duck = {r[0]: r[1] for r in con.execute(f"SELECT i, {expr} AS c FROM pdf").fetchall()}
    diffs = [(i, cases[i], got[i], duck[i]) for i in range(len(cases)) if got[i] != duck[i]]
    assert not diffs, diffs[:5]


def test_toxicity_lexicon_real_words_whole_word_only():
    """The production lexicon must flag real toxic English, never benign
    words that merely contain a lexicon entry as a substring ([a-z]+
    whole-word tokenization), and every entry must stay inside the [a-z]+
    class the cross-engine oracle depends on."""
    import re

    from wikisource_latin_text_cleaner_spark.functions import pii

    assert len(pii.TOXICITY_LEXICON) >= 100  # a real list, not the demo 5
    assert all(re.fullmatch(r"[a-z]+", w) for w in pii.TOXICITY_LEXICON)
    assert pii.toxicity_score("what utter bullshit, you asshole") > 0
    # substring traps: class/assumption/mass contain 'ass'; scunthorpe etc.
    assert pii.toxicity_score(
        "the class assumption passes mass analysis in scunthorpe"
    ) == 0.0
    assert pii.toxicity_score("") == 0.0


def test_dup_line_char_fraction_randomized_vs_python(spark):
    """300 seeded random docs drawn from a tiny line alphabet (so duplicate
    lines are common) plus whitespace-padding traps must match the Python
    twin exactly -- locks the sort+fold formulation to the naive definition
    across ties, runs, singletons, and pad/trim edge cases."""
    import random

    rng = random.Random(31415)
    line_pool = [
        "alpha beta gamma", "alpha beta gamma ", "  alpha beta gamma",
        "\talpha beta gamma", "nav", "x", "", "   ",
        "footer line with more characters in it",
    ]
    texts = []
    for _ in range(300):
        n = rng.randint(0, 12)
        texts.append("\n".join(rng.choice(line_pool) for _ in range(n)))
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    got = {
        r["i"]: r["frac"]
        for r in df.select(
            "i",
            F.round(quality.dup_line_char_fraction(F.col("text")), 10).alias("frac"),
        ).collect()
    }
    for i, t in enumerate(texts):
        assert abs(got[i] - rules.dup_line_char_fraction(t)) < 1e-9, (i, repr(t))


# --- CCNet perplexity bucketing --------------------------------------------

def test_ccnet_buckets_match_python_ntile(spark):
    """Equal-tile assignment per lang, ordered by 6dp-rounded ppx with
    doc_id tiebreak, vs a from-scratch python ntile."""
    from wikisource_latin_text_cleaner_spark.operators import textstats

    rows = [
        # lang a: 7 docs incl. a tie at ppx=5.0 broken by doc_id
        (0, "a", 5.0), (1, "a", 3.0), (2, "a", 5.0), (3, "a", 1.0),
        (4, "a", 9.0), (5, "a", 2.0), (6, "a", 7.0),
        # lang b: 4 docs
        (7, "b", 2.0), (8, "b", 8.0), (9, "b", 4.0), (10, "b", 6.0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, ppx double")
    got = {r.doc_id: r.ppx_bucket
           for r in textstats.ccnet_ppx_buckets(df).collect()}

    def ntile(items, n):
        # SQL ntile: first (len % n) tiles get the extra row
        out, sz, extra, i = {}, len(items) // n, len(items) % n, 0
        for tile in range(1, n + 1):
            take = sz + (1 if tile <= extra else 0)
            for _ in range(take):
                if i < len(items):
                    out[items[i]] = tile
                    i += 1
        return out

    want = {}
    for lang in ("a", "b"):
        ids = [i for i, lg, _ in rows if lg == lang]
        ppx = {i: p for i, lg, p in rows if lg == lang}
        ordered = sorted(ids, key=lambda i: (round(ppx[i], 6), i))
        want.update(ntile(ordered, 3))
    assert got == want
    # the tie at ppx=5.0: doc 0 must land in an earlier-or-equal tile
    assert got[0] <= got[2]
