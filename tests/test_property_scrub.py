"""Property-based guarantees for the scrub fast paths.

The guard-literal and memoized-translate optimizations claim EXACT
behavioral equality with the naive implementations; hypothesis hunts for
counterexamples across adversarial unicode/whitespace/trigger-literal mixes.
"""

import re
import unicodedata

from hypothesis import given, settings, strategies as st

from wikisource_latin_text_cleaner_spark.functions import scrub

#: alphabet biased toward guard literals and rule triggers
_TRIGGERS = (
    "michi", "Categoria:", "http://x", "[sic]", "[12]", "==", "__TOC__",
    "M. Marcus", "q.", "A.D.", "æ", "ﬁ", "&", "á", "ora", "ün", "á",
    "Exported from Wikisource", "About this digital edition", "..", ",,",
    "\n\n\n", "\t", "''it''", "{{t}}", "[[l]]", "ed.", "(3)", "…", "–",
)
_text = st.lists(
    st.one_of(
        st.sampled_from(_TRIGGERS),
        st.text(max_size=12),
        st.sampled_from([" ", "\n", ". ", "word ", "et in de "]),
    ),
    max_size=30,
).map("".join)


def _sub_all_unguarded(text, battery):
    for pat, repl, _guards in battery:
        text = pat.sub(repl, text)
    return text


_ALL_BATTERIES = (
    scrub.ABBREVIATION_RULES,
    scrub.VARIANT_RULES,
    scrub._ATTRIBUTION_BATTERY,
    scrub._TOC_BATTERY,
    scrub._PUNCT_COLLAPSE,
    scrub._FINAL_WS,
    scrub._SPACING_BATTERY,
    scrub._INLINE_MARKUP,
    scrub._EDITORIAL_BATTERY,
    scrub._PUNCT_RUNS,
)


@settings(max_examples=300, deadline=None)
@given(_text)
def test_guarded_sub_all_equals_unguarded(text):
    for battery in _ALL_BATTERIES:
        assert scrub._sub_all(text, battery) == _sub_all_unguarded(text, battery)


@settings(max_examples=300, deadline=None)
@given(_text)
def test_whitelist_table_equals_char_loop(text):
    buf = []
    for ch in text:
        if ch.isalpha() or ch.isspace() or ch in scrub._ALLOWED_PUNCT or ch.isdigit():
            buf.append(ch)
        elif ch in "–—":
            buf.append("-")
    assert text.translate(scrub._WHITELIST_TABLE) == "".join(buf)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=60))
def test_nfd_table_equals_full_normalize(text):
    naive = "".join(
        ch for ch in unicodedata.normalize("NFD", text)
        if unicodedata.category(ch) != "Mn"
    )
    assert text.translate(scrub._NFD_STRIP_TABLE) == naive


@settings(max_examples=150, deadline=None)
@given(_text)
def test_scrub_output_invariants(text):
    out = scrub.scrub_document(text)
    # no URLs survive
    assert not re.search(r"https?://", out)
    # whitespace normalized: no tabs, no triple newlines, no double spaces
    assert "\t" not in out and "\n\n\n" not in out and "  " not in out
    # uppercase is gone (step5 lowercases)
    assert out == out.lower()
    # scrub is deterministic
    assert scrub.scrub_document(text) == out
