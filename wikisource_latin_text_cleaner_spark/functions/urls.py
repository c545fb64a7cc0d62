"""URL canonicalization as pure Catalyst expressions -- the standard
pre-dedup normalization for Common-Crawl-style page tables (no reference
precedent; task-brief scope: url is the table's primary key, and exact-dedup
by URL is only sound after canonicalization).

Every rule is a regex Spark's Java engine and DuckDB's RE2 evaluate
identically (anchored captures, no lookaround -- RE2 has none), so the
driver oracle re-derives the whole transform in SQL.

Canonical form:
  - fragment dropped
  - scheme and host lowercased (path/query case preserved)
  - default ports stripped (http:80, https:443)
  - tracking params removed (utm_*, fbclid, gclid), '?'/'&' reflowed
  - trailing slashes collapsed off a non-root path
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tracking-parameter pattern: one key=value unit, bounded by [^&]* so a
#: global replace eats each param independently
_TRACK = r"(utm_[^&=]*=[^&]*|fbclid=[^&]*|gclid=[^&]*)"


def canonicalize_url(col) -> Column:
    u = F.regexp_replace(col, r"#.*$", "")                       # fragment
    head = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*)", 1))
    tail = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*", "")
    u = F.concat(head, tail)
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80([/?].*)?$", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443([/?].*)?$", r"$1$2")
    u = F.regexp_replace(u, r"&" + _TRACK, "")                   # mid/cleanup
    u = F.regexp_replace(u, r"\?" + _TRACK + r"&", "?")          # first-of-many
    u = F.regexp_replace(u, r"\?" + _TRACK + r"$", "")           # only param
    u = F.regexp_replace(u, r"([^/])/+$", r"$1")                 # trailing /
    return u


def canonicalize_url_sql(col_sql: str) -> str:
    """The identical transform as a DuckDB SQL expression string (regexes
    shared with the Catalyst version above; '\\0'-style backrefs differ:
    DuckDB uses \\1, Spark uses $1)."""
    u = f"regexp_replace({col_sql}, '#.*$', '')"
    head = (
        f"lower(regexp_extract({u}, '^([a-zA-Z][a-zA-Z0-9+.\\-]*://[^/?#]*)', 1))"
    )
    tail = f"regexp_replace({u}, '^[a-zA-Z][a-zA-Z0-9+.\\-]*://[^/?#]*', '')"
    u = f"({head} || {tail})"
    u = f"regexp_replace({u}, '^(http://[^/:?#]+):80([/?].*)?$', '\\1\\2')"
    u = f"regexp_replace({u}, '^(https://[^/:?#]+):443([/?].*)?$', '\\1\\2')"
    u = f"regexp_replace({u}, '&{_TRACK}', '', 'g')"
    u = f"regexp_replace({u}, '\\?{_TRACK}&', '?', 'g')"
    u = f"regexp_replace({u}, '\\?{_TRACK}$', '')"
    u = f"regexp_replace({u}, '([^/])/+$', '\\1')"
    return u
