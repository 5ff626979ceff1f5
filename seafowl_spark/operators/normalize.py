"""Text normalization and URL parsing — the row-local cleanup columns a
corpus build applies before any hashing/dedup/tokenization stage.

Everything here is a pure JVM column expression (regexp_replace /
translate / parse_url chains inside whole-stage codegen — no Python, no
shuffle): normalizing 100 TB costs exactly the scan that reads it, and
because dedup keys (exact hash, shingles, minhash) are computed FROM the
normalized text, normalization choices are part of the dedup contract —
they must be deterministic and versioned, which column expressions are.

* :func:`normalize_text` — the C4/CCNet-style canonical form: unicode
  whitespace (incl. NBSP/ideographic space) to ASCII space, control and
  zero-width characters stripped, runs collapsed, trimmed, optionally
  lowercased. NOT full NFKC (Spark has no JVM NFKC expression; a Python
  UDF would put per-row Python in the hottest path — documented
  non-goal, the ligature/fullwidth tail is left as-is).
* :func:`extract_domain` / :func:`extract_registrable_domain` — host and
  eTLD+1-ish grouping keys for per-domain caps (operators/sampling.py
  cap_per_group) and domain blocklists. Registrable-domain uses a
  last-two-labels heuristic with a small built-in multi-label-suffix
  list (co.uk, com.au, ...) — a full Public Suffix List lookup is a
  broadcast-join against the PSL table when exactness matters; the
  heuristic is the zero-dependency default and says so.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# unicode spaces Spark's \s does not cover reliably across engines:
# NBSP, NNBSP, ogham, en/em/thin spaces, line/para separators,
# ideographic space
_UNICODE_SPACES = "                 　"
# zero-width + BOM + soft hyphen: stripped entirely
_ZERO_WIDTH = "​‌‍⁠﻿­"
# C0/C1 control chars except \t \n \r (which normalize as whitespace)
_CONTROLS = "".join(
    chr(c) for c in list(range(0x00, 0x20)) + list(range(0x7F, 0xA0))
    if chr(c) not in "\t\n\r"
)


def normalize_text(col: Column, lowercase: bool = False) -> Column:
    """Canonical whitespace/control normal form, one codegen chain."""
    out = F.translate(col, _UNICODE_SPACES, " " * len(_UNICODE_SPACES))
    out = F.translate(out, _ZERO_WIDTH + _CONTROLS, "")
    out = F.regexp_replace(out, r"\s+", " ")
    out = F.trim(out)
    if lowercase:
        out = F.lower(out)
    return out


# multi-label public suffixes the last-two-labels heuristic would get
# wrong; the common tail, not the full PSL (documented above)
_MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "co.nz", "co.in", "com.br", "com.cn",
    "com.mx", "co.za", "com.sg", "com.tr", "co.kr",
)


def extract_domain(url_col: Column) -> Column:
    """Lowercased host of a URL (empty/invalid -> NULL). JVM parse_url;
    scheme-less inputs get a ``//`` prefix so bare hosts still parse."""
    fixed = F.when(
        url_col.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://"), url_col
    ).otherwise(F.concat(F.lit("http://"), url_col))
    host = F.lower(F.parse_url(fixed, F.lit("HOST")))
    return F.when(host == "", None).otherwise(host)


def extract_registrable_domain(url_col: Column) -> Column:
    """eTLD+1-ish grouping key: the last two host labels, or three when
    the last two are a known multi-label suffix (co.uk, com.au, ...)."""
    host = extract_domain(url_col)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(
        ".", F.element_at(parts, -2), F.element_at(parts, -1)
    )
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2),
        F.element_at(parts, -1),
    )
    return F.when(host.isNull() | (n <= 2), host).otherwise(
        F.when(last2.isin(*_MULTI_SUFFIXES), last3).otherwise(last2)
    )


# utm_*/fbclid/gclid-style tracking parameters every URL-dedup pipeline
# strips before hashing (the crawl world's biggest source of spurious
# near-duplicate URLs)
_TRACKING_PARAM = (
    r"(?:utm_[a-z]+|fbclid|gclid|msclkid|mc_cid|mc_eid|ref|ref_src|igshid)"
)


def canonicalize_url(url_col: Column) -> Column:
    """Canonical URL for dedup keys: lowercase scheme+host, default ports
    dropped, tracking query parameters removed, empty query and fragment
    stripped, trailing slash on a bare path dropped. One codegen regex
    chain — row-local, no UDF, safe in a 100 TB dedup shuffle key."""
    u = F.trim(url_col)
    # fragment never reaches the server: drop it first
    u = F.regexp_replace(u, r"#.*$", "")
    # lowercase ONLY the scheme://host[:port] prefix
    u = F.concat(
        F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?]*)", 1)),
        F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*", ""),
    )
    # default ports
    u = F.regexp_replace(u, r"^(https://[^/:?]+):443(?=[/?]|$)", r"$1")
    u = F.regexp_replace(u, r"^(http://[^/:?]+):80(?=[/?]|$)", r"$1")
    # tracking params, wherever they sit in the query string
    u = F.regexp_replace(u, rf"([?&]){_TRACKING_PARAM}=[^&#]*", r"$1")
    u = F.regexp_replace(u, r"\?&+", "?")   # leading stripped params
    u = F.regexp_replace(u, r"&&+", "&")    # interior runs
    u = F.regexp_replace(u, r"[?&]$", "")   # empty trailing query
    # bare-path trailing slash (never after ? and not the root-only "/")
    u = F.regexp_replace(
        u, r"^([a-z][a-z0-9+.-]*://[^/?]+/[^?]*[^/?])/$", r"$1"
    )
    return F.when(u == "", None).otherwise(u)


def canonicalize_url_oracle_sql(expr: str) -> str:
    """DuckDB mirror of :func:`canonicalize_url` for graded oracles.

    Dialect deltas handled here: RE2 has no lookahead, so the
    default-port rules consume the following char and re-emit it as a
    capture; DuckDB regexp_replace is first-match-only without the 'g'
    flag (Spark's is always global), so the multi-occurrence steps pass
    'g'; replacement backrefs are \\1, not $1. RE2's NFA alternation
    still matches `ref_src` over the `ref` prefix (simultaneous-branch
    simulation), so the tracking alternation transfers verbatim."""
    track = "utm_[a-z]+|fbclid|gclid|msclkid|mc_cid|mc_eid|ref|ref_src|igshid"
    u = f"trim({expr})"
    u = f"regexp_replace({u}, '#.*$', '')"
    prefix = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*"
    u = (
        f"(lower(regexp_extract({u}, '({prefix})', 1))"
        f" || regexp_replace({u}, '{prefix}', ''))"
    )
    u = (
        f"regexp_replace({u}, '^(https://[^/:?]+):443([/?]|$)', "
        r"'\1\2')"
    )
    u = (
        f"regexp_replace({u}, '^(http://[^/:?]+):80([/?]|$)', "
        r"'\1\2')"
    )
    u = (
        f"regexp_replace({u}, '([?&])({track})=[^&#]*', "
        r"'\1', 'g')"
    )
    u = f"regexp_replace({u}, '\\?&+', '?')"
    u = f"regexp_replace({u}, '&&+', '&', 'g')"
    u = f"regexp_replace({u}, '[?&]$', '')"
    u = (
        f"regexp_replace({u}, "
        r"'^([a-z][a-z0-9+.-]*://[^/?]+/[^?]*[^/?])/$', '\1')"
    )
    return f"NULLIF({u}, '')"
