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


# -- robots meta directives (publisher opt-out) -------------------------------

#: RE2-compatible (no lookaround, works verbatim in Java regex and DuckDB):
#: the whole first <meta ... name=robots ...> tag, any attribute order.
ROBOTS_META_RE = r"""(?i)<meta\b[^>]*\bname\s*=\s*['"]?robots['"]?[^>]*>"""


def meta_robots_flags(html_col):
    """(noindex, nofollow) flags from the first ``<meta name=robots>`` tag
    of the raw capture (binary column). Pure Catalyst -- decode +
    regexp_extract + contains, zero Python, zero shuffle; the projection
    prunes the scan to the html column. Attribute order does not matter
    because the whole tag is captured and then scanned for the directives;
    a 'noindex' appearing in body text never matches (it is not inside a
    robots meta tag). Pages without the tag, or with NULL html, get
    (false, false). Directives are matched literally ('none' is not
    expanded); malformed non-UTF-8 captures decode with replacement chars,
    which cannot fabricate an ASCII meta tag.

    No reference precedent (the reference corpus is not crawled); a
    Common-Crawl-style pipeline honors noindex as a publisher opt-out
    BEFORE any content processing.
    """
    from pyspark.sql import functions as F

    tag = F.lower(
        F.regexp_extract(F.decode(html_col, "UTF-8"), ROBOTS_META_RE, 0)
    )
    return F.struct(
        F.coalesce(tag.contains("noindex"), F.lit(False)).alias("noindex"),
        F.coalesce(tag.contains("nofollow"), F.lit(False)).alias("nofollow"),
    )


def drop_meta_noindex(pages, html_col: str = "html"):
    """Opt-out pre-gate: remove pages whose robots meta declares noindex.
    Apply BEFORE the quality pipeline -- a publisher opt-out is not a
    quality verdict (it must not appear in drop_reasons statistics), and
    dropping early keeps the html column out of every later stage's scan.
    """
    from pyspark.sql import functions as F

    return pages.where(~meta_robots_flags(F.col(html_col))["noindex"])
