#!/usr/bin/env python3
"""Golden/label generator: runs the ACTUAL reference code over the synthetic
corpus and records its outputs as test fixtures.

This script is the only place that imports /root/reference (read-only); the
committed artifacts it produces (tests/golden/*, tests/data/page_labels.parquet)
let the test suite verify byte-identical scrub parity WITHOUT the reference
being present. Run manually:

    python tests/gen_goldens.py [--diff-only]

--diff-only: just report divergence between the engine and the reference
(used while iterating on functions/scrub.py).
"""

from __future__ import annotations

import logging
import os
import sys
import tempfile

logging.disable(logging.CRITICAL)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFDIR = "/root/reference/Text Cleaner"
sys.path.insert(0, REPO)
sys.path.insert(0, REFDIR)

import step1_remove_short_files as r1  # noqa: E402
import step3_clean_content as r3  # noqa: E402
import step4_remove_headings as r4  # noqa: E402
import step5_standardize_orthography as r5  # noqa: E402
import step6_final_cleanup as r6  # noqa: E402

from wikisource_latin_text_cleaner_spark.functions import rules, scrub  # noqa: E402
from wikisource_latin_text_cleaner_spark.sources import synth  # noqa: E402


def ref_is_index(text: str) -> bool:
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False, encoding="utf-8") as f:
        f.write(text)
        path = f.name
    try:
        is_index, _ = r1.detect_index_content(path)
        return bool(is_index)
    finally:
        os.unlink(path)


def ref_verdict(text: str):
    """(keep, drop_reasons, clean_text) per the reference pipeline."""
    if len(text.encode("utf-8")) < 200:
        return False, ["min_size"], ""
    if ref_is_index(text):
        return False, ["index_toc"], ""
    t = r3.clean_text_content(text)
    t = r4.process_file_headings(t)
    t, _stats = r5.standardize_orthography(t)
    if len(t.strip()) < 50:
        return False, ["pre_clean_len"], ""
    t6 = r6.final_cleanup_optimized(t)
    if len(t6.strip()) < 50:
        return False, ["post_clean_len"], ""
    return True, [], t6


def ref_stages(text: str):
    t3 = r3.clean_text_content(text)
    t4 = r4.process_file_headings(t3)
    t5, _ = r5.standardize_orthography(t4)
    t6 = r6.final_cleanup_optimized(t5)
    return t3, t4, t5, t6


def my_stages(text: str):
    t3 = scrub.stage_content(text)
    t4 = scrub.stage_headings(t3)
    t5 = scrub.stage_orthography(t4)
    t6 = scrub.stage_final(t5)
    return t3, t4, t5, t6


def first_diff(a: str, b: str) -> str:
    for i, (x, y) in enumerate(zip(a, b)):
        if x != y:
            return f"@{i}: {a[max(0,i-40):i+40]!r} vs {b[max(0,i-40):i+40]!r}"
    return f"len {len(a)} vs {len(b)}: tail {a[len(b):][:80]!r} / {b[len(a):][:80]!r}"


GOLDEN_FIXTURES = {
    "ligature": "Ætas ﬁdes quæ œconomia & deus est in œuvre ﬂumen ĳdem\n"
                "aequum et bonum semper quaerimus in omnibus rebus nostris",
    "footnote-strip": "verbum[12] aliud(3) [sic] [lacuna] [ed. note] bonum est\n"
                      "in tempore magno scribitur liber quod populus legit [gap]",
    "header-footer": "Title: De bello gallico\nSource: https://la.wikisource.org/wiki/x\n"
                     "Category: Latinitas_Romana\nText Type: prose\n"
                     + "-" * 50 + "\n"
                     "gallia est omnis diuisa in partes tres quarum unam incolunt belgae\n"
                     "aquitani tertiam qui ipsorum lingua celtae nostra galli appellantur\n\n"
                     "About this digital edition\nThis text was produced by OCR.\n"
                     "Categoria: Latinitas_Romana",
    "orthography": "Michi nichil Vrbs Jam DAMPNUM tercius ā é ç dedit quod\n"
                   "sepulcrum pulcer onor abere omines negocium precium spacium",
    "abbrev": "Q. Fabius Maximus pater familias erat consul et P. Cornelius Scipio vir\n"
              "magnus A. D. tempore antiquo scriptum est exemplum bonum",
    "hyphen-rejoin": "verba inter-\nrupta sunt in textu – antiquo — saepe\n\n\n\n"
                     "et multa alia exempla habemus in libris ueteribus semper",
    "wiki-markup": "'''fortis''' miles ''celeriter'' venit [[Roma|ad urbem]] {{templum}} __TOC__\n"
                   "== Sectio prima ==\nquod populus romanus semper memoria tenebat firmiter",
    "pii-url": "vide https://example.com/x pro fonte et scribe ad admin@example.com\n"
               "numerus 4111111111111111 est in documento quod legimus hodie",
    "repetition": ("lorem ipsum dolor " * 20) + "\n....,,,,;;;;!!!!????\n"
                  "sed finis adest rebus omnibus quas novimus in hac vita",
    "index-toc": "Title: Index librorum\n" + "-" * 50 + "\n"
                 + "\n".join(f"Liber {r}." for r in
                             ("I", "II", "III", "IV", "V", "VI", "VII", "VIII"))
                 + "\n* prooemium\n* argumentum\n12\n34",
    "too-short": "breve verbum.",
}


def main() -> int:
    diff_only = "--diff-only" in sys.argv
    rows = synth.generate_pages(600, seed=7) + synth.generate_pages(200, seed=42)
    stage_names = ("content", "headings", "orthography", "final")

    mismatch = 0
    labels = []
    for row in rows:
        rk, rr, rc = ref_verdict(row.text)
        mine = rules.evaluate_document(row.text)
        m_idx = rules.looks_like_index(row.text)
        r_idx = ref_is_index(row.text)
        if m_idx != r_idx:
            mismatch += 1
            print(f"INDEX MISMATCH {row.url}: mine={m_idx} ref={r_idx}")
            continue
        if (rk, rr, rc) != (mine.keep, mine.drop_reasons, mine.clean_text):
            mismatch += 1
            print(f"MISMATCH {row.url}: ref=({rk},{rr}) mine=({mine.keep},{mine.drop_reasons})")
            if rk and mine.keep and rc != mine.clean_text:
                for nm, a, b in zip(stage_names, ref_stages(row.text), my_stages(row.text)):
                    if a != b:
                        print(f"  stage {nm} diverges: {first_diff(a, b)}")
                        break
            if mismatch > 10:
                print("too many mismatches; stopping")
                return 1
        labels.append((row.url, rk, rr, rc, row.lang))

    print(f"corpus diff: {mismatch} mismatches over {len(rows)} docs")
    if mismatch or diff_only:
        return 1 if mismatch else 0

    # per-stage goldens for the named fixture docs
    gold_dir = os.path.join(REPO, "tests", "golden")
    os.makedirs(gold_dir, exist_ok=True)
    for name, doc in GOLDEN_FIXTURES.items():
        with open(os.path.join(gold_dir, f"{name}.in.txt"), "w", encoding="utf-8") as f:
            f.write(doc)
        for stage, out in zip(stage_names, ref_stages(doc)):
            with open(os.path.join(gold_dir, f"{name}.{stage}.out.txt"), "w", encoding="utf-8") as f:
                f.write(out)

    # page_labels parquet (FIXTURES.md §2)
    import pyarrow as pa
    import pyarrow.parquet as pq

    data_dir = os.path.join(REPO, "tests", "data")
    os.makedirs(data_dir, exist_ok=True)
    table = pa.table({
        "url": [u for u, *_ in labels],
        "keep": [k for _, k, *_ in labels],
        "drop_reasons": pa.array([r for _, _, r, *_ in labels], type=pa.list_(pa.string())),
        "clean_text": [c for _, _, _, c, _ in labels],
        "lang": [lg for *_, lg in labels],
    })
    pq.write_table(table, os.path.join(data_dir, "page_labels.parquet"))
    print(f"wrote {len(labels)} labels + {len(GOLDEN_FIXTURES)} golden fixtures")
    return 0


if __name__ == "__main__":
    sys.exit(main())
