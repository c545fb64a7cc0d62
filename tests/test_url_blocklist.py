"""URL blocklist + keyword scoring (functions/urls.py:flag_blocked_urls)."""

from pyspark.sql import functions as F

from wikisource_latin_text_cleaner_spark.functions import urls


def test_flag_blocked_urls(spark):
    rows = [
        (1, "https://news.example.com/a"),          # subdomain of blocked
        (2, "HTTPS://EXAMPLE.COM:443/b"),           # case + port stripped
        (3, "https://safe.org/article"),            # clean
        (4, "https://safe.org/casino-royale"),      # keyword hit
        (5, "https://other.net/xXx/Porn"),          # two keyword hits
        (6, "not-a-url"),                           # no authority -> dom ''
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    bl = spark.createDataFrame([("EXAMPLE.com",)], "domain string")
    got = {r["doc_id"]: r for r in urls.flag_blocked_urls(df, bl).collect()}

    assert got[1]["url_domain"] == "example.com" and got[1]["url_blocked"]
    assert got[2]["url_domain"] == "example.com" and got[2]["url_blocked"]
    assert got[3]["url_blocked"] is False and got[3]["url_kw_hits"] == 0
    assert got[4]["url_blocked"] and got[4]["url_kw_hits"] == 1
    assert got[5]["url_blocked"] and got[5]["url_kw_hits"] == 2
    assert got[6]["url_domain"] == "" and got[6]["url_blocked"] is False


def test_max_keyword_hits_threshold(spark):
    df = spark.createDataFrame(
        [(1, "https://x.org/casino")], "doc_id long, url string"
    )
    bl = spark.createDataFrame([], "domain string")
    out = urls.flag_blocked_urls(df, bl, max_keyword_hits=1).collect()[0]
    assert out["url_kw_hits"] == 1 and out["url_blocked"] is False


def test_plan_broadcasts_blocklist_and_is_python_free(spark):
    df = spark.createDataFrame(
        [(1, "https://x.org/a")], "doc_id long, url string"
    )
    bl = spark.createDataFrame([("x.org",)], "domain string")
    plan = (
        urls.flag_blocked_urls(df, bl)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_rows_flagged_never_dropped(spark):
    df = spark.createDataFrame(
        [(i, f"https://blocked.com/{i}") for i in range(10)],
        "doc_id long, url string",
    )
    bl = spark.createDataFrame([("blocked.com",)], "domain string")
    out = urls.flag_blocked_urls(df, bl)
    assert out.count() == 10
    assert out.where(F.col("url_blocked")).count() == 10


def test_extract_outlinks_order_case_and_quoting_forms(spark):
    from wikisource_latin_text_cleaner_spark.functions import urls as U

    html = (
        '<p>x</p><A HREF="https://a.example.com/1">one</A>'
        '<a class="y" href="http://b.example.org/2?q=3">two</a>'
        "<a href='https://single.quoted/now-in-policy'>three</a>"
        "<a href=https://unquoted.example/4?q=5 rel=nofollow>four</a>"
        '<a href = "https://spaced.example/5">five</a>'
        '<a href="">empty kept</a><a name="anchor-no-href">six</a>'
    )
    df = spark.createDataFrame([(html,)], "page string")
    got = df.select(U.extract_outlinks(F.col("page")).alias("links")).first().links
    assert got == [
        "https://a.example.com/1",
        "http://b.example.org/2?q=3",
        "https://single.quoted/now-in-policy",
        "https://unquoted.example/4?q=5",
        "https://spaced.example/5",
        "",
    ]


def test_extract_outlinks_quote_boundaries(spark):
    # A double-quoted value may contain a single quote (and vice versa);
    # only the SURROUNDING pair is stripped. An unquoted value terminates
    # at whitespace or '>' and never swallows a following attribute.
    from wikisource_latin_text_cleaner_spark.functions import urls as U

    html = (
        '<a href="https://d.example/it\'s-here">a</a>'
        "<a href='https://s.example/say-\"hi\"'>b</a>"
        "<a href=https://u.example/x class=z>c</a>"
        "<a href=''>empty single</a>"
    )
    df = spark.createDataFrame([(html,)], "page string")
    got = df.select(U.extract_outlinks(F.col("page")).alias("links")).first().links
    assert got == [
        "https://d.example/it's-here",
        'https://s.example/say-"hi"',
        "https://u.example/x",
        "",
    ]


def test_extract_outlinks_ignores_suffix_attributes(spark):
    # `data-href` must not match (attribute name needs a preceding
    # delimiter), and a real href beside a decoy data-href must win.
    from wikisource_latin_text_cleaner_spark.functions import urls as U

    html = (
        '<a data-href="https://decoy.example/x">no real href</a>'
        '<a href="https://real.example/1" data-href="https://decoy.example/2">ok</a>'
    )
    df = spark.createDataFrame([(html,)], "page string")
    got = df.select(U.extract_outlinks(F.col("page")).alias("links")).first().links
    assert got == ["https://real.example/1"]
