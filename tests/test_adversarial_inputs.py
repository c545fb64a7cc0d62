"""Degenerate / adversarial inputs must flow through the whole pipeline
without throwing: empty, null, whitespace-only, pathological repetition,
a 200k-char single word, embedded NULs."""

from wikisource_latin_text_cleaner_spark.functions import rules

ADVERSARIAL = [
    None,
    "",
    " " * 300,
    "\n" * 500,
    "[" * 5000,
    "x" * 200_000,                      # one 200k-char word
    ("\t\r " * 100) + "\x0b\x0c",
    "a\x00b " * 100,                    # embedded NULs
]


def test_adversarial_inputs_never_throw_python_path():
    cfg = rules.ExtensionConfig()
    for t in ADVERSARIAL:
        v = rules.evaluate_document(t, extensions=cfg)
        assert isinstance(v.keep, bool)
        if not v.keep:
            assert v.drop_reasons, repr(t)[:40]


def test_adversarial_inputs_never_throw_spark_pipeline(spark):
    from wikisource_latin_text_cleaner_spark.operators.pipeline import (
        PipelineConfig,
        QualityFilterPipeline,
    )

    rows = [(f"adv://{i}", None, t, "la") for i, t in enumerate(ADVERSARIAL)]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string, lang string"
    )
    # web mode (extensions on), mirroring the Python-path test: reference-
    # fidelity mode correctly KEEPS e.g. NUL-laced prose-length text
    cfg = PipelineConfig(
        langid=True, classify=True, extensions=rules.ExtensionConfig()
    )
    out = QualityFilterPipeline(cfg).transform(df)
    got = out.select("url", "keep", "drop_reasons").collect()
    assert len(got) == len(ADVERSARIAL)
    for r in got:
        assert r["keep"] is False, r["url"]  # none of these are keepable web text
        assert r["drop_reasons"], r["url"]
