"""HTML -> text extraction for the ``html: binary`` pages column.

The reference's only markup->text precedent is the wiki inline-formatting
strip (Text Cleaner/step4_remove_headings.py:161-171); real Common-Crawl
rows carry raw HTML, so the web generalization needs a full (if simple)
extractor. Deterministic pure Python + stdlib ``html.unescape`` -- no
parsing libraries -- run as an Arrow pandas UDF.

Extraction policy (deliberately simple and exactly specified, so tests and
the DuckDB oracle can replicate it):

  1. decode UTF-8 (errors="replace");
  2. drop <script>/<style> elements and <!-- comments --> wholesale;
  3. block-level closers/openers (p, div, h1-6, li, tr, br, table, section,
     article) become a newline; every other tag becomes the empty string;
  4. unescape HTML entities;
  5. per line: collapse runs of ASCII horizontal whitespace ([ \\t\\r\\f\\v])
     to one space, strip leading/trailing spaces; drop now-empty lines;
     join with a single newline.

The step-5 character class is deliberately ASCII-only (no unicode-aware
``str.strip()``): the policy must be replicable exactly in ANSI SQL for the
oracle harness, and ``&nbsp;``-style unescaped spacing is real content.
"""

from __future__ import annotations

import html as _htmlmod
import re

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_SCRIPT_STYLE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_BLOCK_TAG = re.compile(
    r"</?(?:p|div|h[1-6]|li|ul|ol|tr|table|thead|tbody|section|article|"
    r"header|footer|blockquote)\b[^>]*>|<br\s*/?>",
    re.IGNORECASE,
)
_ANY_TAG = re.compile(r"<[^>]+>")
_SPACE_RUN = re.compile(r"[ \t\r\f\v]+")


def html_to_text(payload: bytes | None) -> str:
    if not payload:
        return ""
    raw = payload.decode("utf-8", errors="replace")
    raw = _SCRIPT_STYLE.sub("", raw)
    raw = _COMMENT.sub("", raw)
    raw = _BLOCK_TAG.sub("\n", raw)
    raw = _ANY_TAG.sub("", raw)
    raw = _htmlmod.unescape(raw)
    lines = [_SPACE_RUN.sub(" ", ln).strip(" ") for ln in raw.split("\n")]
    return "\n".join(ln for ln in lines if ln)


@pandas_udf(StringType())
def html_to_text_udf(payloads: pd.Series) -> pd.Series:
    return payloads.map(html_to_text)


def escape_text_as_html(text: str) -> str:
    """Inverse test helper: minimal escaping whose round trip through
    html_to_text recovers the whitespace-normalized original."""
    return (
        "<html><body><p>"
        + text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        + "</p></body></html>"
    )
