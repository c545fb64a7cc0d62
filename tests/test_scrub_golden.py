"""Byte-identical scrub parity tests against reference-generated goldens.

Goldens in tests/golden/ were produced by running the ACTUAL reference code
(see tests/gen_goldens.py); these tests require byte equality per stage and
for the full composition, plus keep/drop + clean-text agreement over the
800-document differential corpus in tests/data/page_labels.parquet.
"""

import os

import pyarrow.parquet as pq
import pytest

from wikisource_latin_text_cleaner_spark.functions import rules, scrub
from wikisource_latin_text_cleaner_spark.sources import synth

HERE = os.path.dirname(os.path.abspath(__file__))
GOLD = os.path.join(HERE, "golden")
STAGES = {
    "content": scrub.stage_content,
    "headings": lambda t: scrub.stage_headings(scrub.stage_content(t)),
    "orthography": lambda t: scrub.stage_orthography(
        scrub.stage_headings(scrub.stage_content(t))
    ),
    "final": scrub.scrub_document,
}

FIXTURES = sorted(
    name[: -len(".in.txt")] for name in os.listdir(GOLD) if name.endswith(".in.txt")
)


def _read(path):
    with open(path, encoding="utf-8") as f:
        return f.read()


@pytest.mark.parametrize("name", FIXTURES)
@pytest.mark.parametrize("stage", list(STAGES))
def test_stage_golden(name, stage):
    doc = _read(os.path.join(GOLD, f"{name}.in.txt"))
    expected = _read(os.path.join(GOLD, f"{name}.{stage}.out.txt"))
    assert STAGES[stage](doc) == expected


def test_corpus_labels_byte_identical():
    """Full keep/drop + clean-text agreement over the differential corpus."""
    table = pq.read_table(os.path.join(HERE, "data", "page_labels.parquet"))
    labels = {
        url: (keep, list(reasons), clean)
        for url, keep, reasons, clean in zip(
            table["url"].to_pylist(),
            table["keep"].to_pylist(),
            table["drop_reasons"].to_pylist(),
            table["clean_text"].to_pylist(),
        )
    }
    rows = synth.generate_pages(600, seed=7) + synth.generate_pages(200, seed=42)
    assert len(rows) == len(labels)
    agree = 0
    for row in rows:
        v = rules.evaluate_document(row.text)
        exp_keep, exp_reasons, exp_clean = labels[row.url]
        assert v.keep == exp_keep, row.url
        assert v.drop_reasons == exp_reasons, row.url
        if exp_keep:
            assert v.clean_text == exp_clean, row.url
        agree += 1
    assert agree == len(rows)


def test_keep_drop_f1_against_reference_labels():
    """F1 >= 0.99 vs reference labels (BASELINE.json target; exact match here)."""
    table = pq.read_table(os.path.join(HERE, "data", "page_labels.parquet"))
    labels = dict(zip(table["url"].to_pylist(), table["keep"].to_pylist()))
    rows = synth.generate_pages(600, seed=7) + synth.generate_pages(200, seed=42)
    tp = fp = fn = 0
    for row in rows:
        pred = rules.evaluate_document(row.text).keep
        exp = labels[row.url]
        tp += pred and exp
        fp += pred and not exp
        fn += exp and not pred
    precision = tp / max(1, tp + fp)
    recall = tp / max(1, tp + fn)
    f1 = 2 * precision * recall / max(1e-9, precision + recall)
    assert f1 >= 0.99, f"F1={f1}"


def test_min_size_gate():
    assert rules.evaluate_document("x" * 199).drop_reasons == ["min_size"]
    long_doc = ("verba multa sunt in hoc libro et etiam plura. " * 20).strip()
    assert rules.evaluate_document(long_doc).keep


def test_index_gate_thresholds():
    toc = "\n".join(f"Liber {r}." for r in ["I", "II", "III", "IV", "V", "VI", "VII"])
    toc += "\n* a\n* b\n12\n"
    assert rules.looks_like_index(toc)
    prose = "\n".join(
        "gallia est omnis divisa in partes tres quarum unam incolunt belgae."
        for _ in range(40)
    )
    assert not rules.looks_like_index(prose)


def test_extension_rules():
    cfg = rules.ExtensionConfig()
    spam = ("buy now " * 300).strip()
    assert "repetition" in rules.extension_reasons(spam, cfg)
    ok = (
        "gallia est omnis divisa in partes tres quarum unam incolunt belgae "
        "aquitani tertiam qui ipsorum lingua celtae nostra galli appellantur et "
        "hi omnes lingua institutis legibus inter se differunt multum bonum "
    ) * 3
    assert rules.extension_reasons(ok, cfg) == []


def test_dup_line_char_fraction_python_twin():
    # planted: line A x3 (24 chars each), line B x1 (30 chars)
    a = "duplicated boilerplate16"
    b = "a unique line of thirty chars."
    assert len(a) == 24 and len(b) == 30
    text = "\n".join([a, b, a, "", "   ", a])
    frac = rules.dup_line_char_fraction(text)
    assert abs(frac - (3 * 24) / (3 * 24 + 30)) < 1e-12
    assert rules.dup_line_char_fraction("") == 0.0
    assert rules.dup_line_char_fraction("one\ntwo\nthree") == 0.0
    # space-trim only: tab-padded lines are NOT equal to their stripped twin
    assert rules.dup_line_char_fraction("x y\n\tx y") == 0.0
    # ...but space-padded ones are
    assert rules.dup_line_char_fraction("x y\n   x y") == 1.0


def test_dup_line_cap_rule_off_by_default():
    boiler = "the same navigation bar line repeated here"
    doc = "\n".join([boiler] * 30 + ["unique closing sentence for the page"])
    pad = (
        " gallia est omnis divisa in partes tres quarum unam incolunt belgae"
        * 3
    )
    doc = doc + "\n" + pad  # keep word_count/stopword gates quiet
    assert "dup_lines" not in rules.extension_reasons(doc, rules.ExtensionConfig())
    cfg = rules.ExtensionConfig(max_dup_line_frac=0.3)
    assert "dup_lines" in rules.extension_reasons(doc, cfg)


def test_toxicity_gate_off_by_default_and_c4_mode():
    """max_toxicity=None keeps decisions byte-stable; 0.0 reproduces C4's
    any-badword-drops-the-page rule over the lexicon (whole-word [a-z]+)."""
    base = (
        "gallia est omnis divisa in partes tres quarum unam incolunt belgae "
        "aquitani tertiam qui ipsorum lingua celtae nostra galli appellantur "
        "et hi omnes lingua institutis legibus inter se differunt multum "
    ) * 3
    toxic = base + " what total bullshit"
    assert "toxicity" not in rules.extension_reasons(toxic, rules.ExtensionConfig())
    cfg = rules.ExtensionConfig(max_toxicity=0.0)
    assert "toxicity" in rules.extension_reasons(toxic, cfg)
    assert "toxicity" not in rules.extension_reasons(base, cfg)
    # substring never trips the whole-word gate
    benign = base + " the class assumption passes mass analysis"
    assert "toxicity" not in rules.extension_reasons(benign, cfg)
