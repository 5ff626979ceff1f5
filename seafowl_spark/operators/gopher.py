"""Gopher quality-rule filtering (Rae et al. 2021, "Scaling Language
Models: Methods, Analysis & Insights from Training Gopher", §A1.1 —
public paper) — the rule set most production pre-training pipelines run
before any model-based quality scoring.

Rules (document kept only if ALL hold):

* word count within [MIN_WORDS, MAX_WORDS];
* mean word length within [MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN];
* symbol-to-word ratio (``#`` characters plus ``...``/``…`` ellipses)
  at most MAX_SYMBOL_WORD_RATIO;
* fewer than MAX_BULLET_LINE_FRAC of lines start with a bullet marker;
* fewer than MAX_ELLIPSIS_LINE_FRAC of lines end with an ellipsis;
* at least MIN_ALPHA_WORD_FRAC of words contain an alphabetic char;
* at least MIN_REQUIRED_STOPWORDS of the eight Gopher stop words
  appear in the document.

Everything is pure `pyspark.sql.functions` column expressions — no
Python touches corpus rows, so the whole rule set runs JVM-side inside
whole-stage codegen and scales linearly with input splits. Heavy arrays
(line list, lowercased token list) are staged as columns BEFORE any
lambda references them: lambda bodies are not common-subexpression
eliminated, so an unstaged split() would re-evaluate per element.

Cross-engine parity (the DuckDB oracle in queries/text.py): every ratio
is a single int/int division (exact in IEEE double on both engines) and
every rule is a comparison against a literal, so the boolean gate
hash-matches bit for bit.

Reference parity note: the reference engine (seafowl) has no corpus
operators at all — this module is beyond-reference surface, same as the
rest of the LLM-pipeline family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the eight required stop words from the paper
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

MIN_WORDS = 50
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MAX_SYMBOL_WORD_RATIO = 0.1
MAX_BULLET_LINE_FRAC = 0.9
MAX_ELLIPSIS_LINE_FRAC = 0.3
MIN_ALPHA_WORD_FRAC = 0.8
MIN_REQUIRED_STOPWORDS = 2

_BULLET_RE = r"^[-*•]"


def add_gopher_quality(
    df: DataFrame, text_col: str = "text", toks_col: str | None = None
) -> DataFrame:
    """Append the Gopher rule metrics and the combined ``gopher_pass``
    gate to ``df``.

    ``toks_col`` may name an existing whitespace-token array column to
    reuse (the graded t_langid_quality row shares one tokenization
    across all its branches); otherwise tokens are derived from
    ``text_col`` by single-space split with empty tokens dropped.

    Added columns: ``mean_word_len``, ``sym_word_ratio``,
    ``bullet_line_frac``, ``ellipsis_line_frac``, ``alpha_word_frac``,
    ``n_req_stop``, ``gopher_pass``. Zero-token / zero-line documents
    get 0.0 metrics and fail the gate (never a divide-by-zero under
    ANSI mode).
    """
    text = F.col(text_col)
    if toks_col is None:
        toks_expr: Column = F.filter(F.split(text, " "), lambda t: t != "")
    else:
        toks_expr = F.col(toks_col)
    staged = df.withColumns(
        {
            "__g_toks": toks_expr,
            "__g_lines": F.filter(
                F.split(text, "\n"), lambda l: F.trim(l) != ""
            ),
        }
    )
    toks = F.col("__g_toks")
    lines = F.col("__g_lines")
    n_words = F.size(toks).cast("long")
    n_lines = F.size(lines).cast("long")

    def _ratio(num: Column, den: Column) -> Column:
        return F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))

    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    n_sym = (
        F.size(F.regexp_extract_all(text, F.lit("#"), 0))
        + F.size(F.regexp_extract_all(text, F.lit(r"\.\.\."), 0))
        + F.size(F.regexp_extract_all(text, F.lit("…"), 0))
    ).cast("long")
    n_bullet = F.size(
        F.filter(lines, lambda l: F.ltrim(l).rlike(_BULLET_RE))
    ).cast("long")
    n_ellipsis = F.size(
        F.filter(
            lines,
            lambda l: F.endswith(F.rtrim(l), F.lit("..."))
            | F.endswith(F.rtrim(l), F.lit("…")),
        )
    ).cast("long")
    n_alpha = F.size(
        F.filter(toks, lambda t: t.rlike("[A-Za-z]"))
    ).cast("long")
    n_req_stop = F.size(
        F.array_intersect(
            F.transform(toks, F.lower),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    ).cast("long")

    out = staged.withColumns(
        {
            "mean_word_len": _ratio(sum_len, n_words),
            "sym_word_ratio": _ratio(n_sym, n_words),
            "bullet_line_frac": _ratio(n_bullet, n_lines),
            "ellipsis_line_frac": _ratio(n_ellipsis, n_lines),
            "alpha_word_frac": _ratio(n_alpha, n_words),
            "n_req_stop": n_req_stop,
        }
    )
    # per-rule failure bitmask (production pipelines log WHICH rule
    # dropped a doc, not just that one did) — bit order mirrors the
    # docstring's rule list
    rules = [
        (n_words >= MIN_WORDS) & (n_words <= MAX_WORDS),
        (F.col("mean_word_len") >= MIN_MEAN_WORD_LEN)
        & (F.col("mean_word_len") <= MAX_MEAN_WORD_LEN),
        F.col("sym_word_ratio") <= MAX_SYMBOL_WORD_RATIO,
        F.col("bullet_line_frac") < MAX_BULLET_LINE_FRAC,
        F.col("ellipsis_line_frac") < MAX_ELLIPSIS_LINE_FRAC,
        F.col("alpha_word_frac") >= MIN_ALPHA_WORD_FRAC,
        F.col("n_req_stop") >= MIN_REQUIRED_STOPWORDS,
    ]
    mask = F.lit(0).cast("long")
    for i, ok in enumerate(rules):
        mask = mask + F.when(ok, F.lit(0)).otherwise(F.lit(1 << i)).cast("long")
    gate = rules[0]
    for ok in rules[1:]:
        gate = gate & ok
    return (
        out.withColumn("gopher_fail_mask", mask)
        .withColumn("gopher_pass", gate)
        .drop("__g_toks", "__g_lines")
    )


def gopher_oracle_exprs(text_expr: str, toks_expr: str) -> dict[str, str]:
    """DuckDB SQL mirrors of add_gopher_quality's columns, for embedding
    in a graded row's oracle. ``toks_expr`` must be the same token-array
    expression the Spark side reuses."""
    n_words = f"len({toks_expr})"
    n_lines = (
        f"len(list_filter(string_split({text_expr}, chr(10)),"
        " l -> trim(l) <> ''))"
    )
    lines = (
        f"list_filter(string_split({text_expr}, chr(10)),"
        " l -> trim(l) <> '')"
    )

    def ratio(num: str, den: str) -> str:
        return (
            f"CASE WHEN {den} > 0 THEN CAST({num} AS DOUBLE) / {den}"
            " ELSE 0.0 END"
        )

    sum_len = f"list_sum(list_transform({toks_expr}, t -> len(t)))"
    n_sym = (
        f"len(regexp_extract_all({text_expr}, '#'))"
        f" + len(regexp_extract_all({text_expr}, '\\.\\.\\.'))"
        f" + len(regexp_extract_all({text_expr}, '…'))"
    )
    n_bullet = (
        f"len(list_filter({lines},"
        f" l -> regexp_matches(ltrim(l), '{_BULLET_RE}')))"
    )
    n_ellipsis = (
        f"len(list_filter({lines}, l -> ends_with(rtrim(l), '...')"
        " OR ends_with(rtrim(l), '…')))"
    )
    n_alpha = (
        f"len(list_filter({toks_expr}, t -> regexp_matches(t, '[A-Za-z]')))"
    )
    stop_list = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    n_req_stop = (
        f"len(list_intersect(list_transform({toks_expr}, t -> lower(t)),"
        f" [{stop_list}]))"
    )
    return {
        "mean_word_len": ratio(f"COALESCE({sum_len}, 0)", n_words),
        "sym_word_ratio": ratio(n_sym, n_words),
        "bullet_line_frac": ratio(n_bullet, n_lines),
        "ellipsis_line_frac": ratio(n_ellipsis, n_lines),
        "alpha_word_frac": ratio(n_alpha, n_words),
        "n_req_stop": n_req_stop,
    }


def _oracle_rules(n_words_col: str = "n_tokens") -> list[str]:
    """Per-rule SQL booleans over the column NAMES emitted by
    gopher_oracle_exprs, in bitmask order."""
    return [
        f"({n_words_col} >= {MIN_WORDS} AND {n_words_col} <= {MAX_WORDS})",
        f"(mean_word_len >= {MIN_MEAN_WORD_LEN}"
        f" AND mean_word_len <= {MAX_MEAN_WORD_LEN})",
        f"(sym_word_ratio <= {MAX_SYMBOL_WORD_RATIO})",
        f"(bullet_line_frac < {MAX_BULLET_LINE_FRAC})",
        f"(ellipsis_line_frac < {MAX_ELLIPSIS_LINE_FRAC})",
        f"(alpha_word_frac >= {MIN_ALPHA_WORD_FRAC})",
        f"(n_req_stop >= {MIN_REQUIRED_STOPWORDS})",
    ]


def gopher_oracle_gate(n_words_col: str = "n_tokens") -> str:
    """The SQL boolean combining the rule thresholds (evaluate in an
    outer select over gopher_oracle_exprs' names)."""
    return "(" + " AND ".join(_oracle_rules(n_words_col)) + ")"


def gopher_oracle_mask(n_words_col: str = "n_tokens") -> str:
    """The SQL failure bitmask matching add_gopher_quality's
    gopher_fail_mask (bit i set = rule i failed)."""
    terms = [
        f"CASE WHEN {rule} THEN 0 ELSE {1 << i} END"
        for i, rule in enumerate(_oracle_rules(n_words_col))
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"
