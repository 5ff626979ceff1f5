"""Text analysis + deduplication operators over the `documents` table.

These are the training-data-pipeline operators (language ID, quality scoring,
token stats, fingerprinting, exact + n-gram dedup). All of them are pure
`pyspark.sql.functions` column expressions — no Python UDFs — so they run
JVM-side inside whole-stage codegen and scale linearly with input splits.

Cross-engine hashing uses md5-derived integers (see functions.md5_int); all
ratios divide integers (exact in both engines) and only multiply/compare
doubles with identical expression trees, so results hash-match DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import local_df
from ..io import table, widen
from . import register

# language marker words for the n-gram/stopword language-ID heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "und", "ist", "das"),
    "es": ("el", "la", "y", "es", "los"),
    "fr": ("le", "la", "et", "est", "les"),
}
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for")


def _tokens(col):
    return F.filter(F.split(col, " "), lambda t: t != "")


def _sql_tokens(expr: str) -> str:
    return f"list_filter(string_split({expr}, ' '), t -> t <> '')"


# --------------------------------------------------------------------------

@register(
    "t_token_stats",
    oracle=rf"""
    SELECT doc_id,
           len({_sql_tokens('text')}) AS n_tokens,
           len(list_distinct({_sql_tokens('text')})) AS n_distinct,
           len(list_distinct({_sql_tokens('text')})) / len({_sql_tokens('text')}) AS type_token_ratio,
           length(text) AS n_chars_measured,
           n_chars,
           len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS n_bpe_tokens,
           len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS n_word_tokens,
           len(regexp_extract_all(text, '[^A-Za-z0-9_\s]')) AS n_punct_tokens
    FROM documents
    """,
)
def t_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, distinct tokens, type/token ratio,
    plus BPE-ish regex tokenization (word pieces + standalone punctuation)
    — the pre-tokenizer counts used for corpus sizing."""
    # r13: three regexp_extract_all passes + two tokenizations per document
    # ran as one task on the single-row-group local file (profiled: 0.41 s
    # of a 0.61 s wall in one task); spread on doc_id first — no-op at
    # scale, where the scan is already parallel.
    d = widen(
        table(spark, sf_dir, "documents").select("doc_id", "n_chars", "text"),
        "doc_id",
    ).select("doc_id", "n_chars", "text", _tokens(F.col("text")).alias("toks"))
    toks = F.col("toks")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        (
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
        ).alias("type_token_ratio"),
        F.length("text").cast("long").alias("n_chars_measured"),
        "n_chars",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"), 0))
        .cast("long")
        .alias("n_bpe_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[A-Za-z0-9_]+"), 0))
        .cast("long")
        .alias("n_word_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[^A-Za-z0-9_\s]"), 0))
        .cast("long")
        .alias("n_punct_tokens"),
    )


def _lang_score_sql(lang: str) -> str:
    markers = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return f"len(list_filter({_sql_tokens('text')}, t -> t IN ({markers})))"


def _gopher_oracle_cols() -> str:
    from ..operators.gopher import gopher_oracle_exprs

    exprs = gopher_oracle_exprs("text", _sql_tokens("text"))
    return ",\n             ".join(f"{sql} AS {name}" for name, sql in exprs.items())


def _gopher_oracle_gate() -> str:
    from ..operators.gopher import gopher_oracle_gate, gopher_oracle_mask

    return (
        f"{gopher_oracle_mask()} AS gopher_fail_mask,\n           "
        f"{gopher_oracle_gate()} AS gopher_pass"
    )


@register(
    "t_langid_quality",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang, n_chars,
             {_lang_score_sql('en')} AS s_en,
             {_lang_score_sql('de')} AS s_de,
             {_lang_score_sql('es')} AS s_es,
             {_lang_score_sql('fr')} AS s_fr,
             len({_sql_tokens('text')}) AS n_tokens,
             len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
             len(regexp_extract_all(text, '[A-Z]')) AS n_upper,
             len(list_filter({_sql_tokens('text')},
                 t -> t IN ({', '.join(f"'{w}'" for w in STOPWORDS)}))) AS n_stop,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS content_fp,
             md5(array_to_string(list_sort(list_distinct({_sql_tokens('lower(text)')})), ' ')) AS bag_fp,
             CAST(('0x' || substr(md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))), 1, 15)) AS BIGINT) AS fp_int,
             {_gopher_oracle_cols()}
      FROM documents)
    SELECT doc_id, lang AS labeled_lang, s_en, s_de, s_es, s_fr,
           CASE WHEN s_en = 0 AND s_de = 0 AND s_es = 0 AND s_fr = 0 THEN 'und'
                WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
                WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
                WHEN s_es >= s_fr THEN 'es'
                ELSE 'fr' END AS predicted_lang,
           n_tokens, n_punct, n_upper, n_stop,
           n_stop / n_tokens AS stopword_ratio,
           n_punct / n_chars AS punct_ratio,
           (n_tokens >= 20 AND n_tokens <= 1000 AND n_stop / n_tokens >= 0.01) AS passes_filter,
           content_fp, bag_fp, fp_int,
           mean_word_len, sym_word_ratio, bullet_line_frac,
           ellipsis_line_frac, alpha_word_frac, n_req_stop,
           {_gopher_oracle_gate()}
    FROM scored
    """,
)
def t_langid_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID (marker-word / stopword n-gram scoring with a
    deterministic argmax precedence en > de > es > fr) plus quality
    scoring (length, punctuation density, stopword ratio and a boolean
    keep/drop gate — the standard pre-training corpus filter shape), in a
    single pass over the token array. Since r8 session D the row also
    carries the full Gopher rule set (operators/gopher.py — Rae et al.
    2021 §A1.1: mean word length, symbol-to-word ratio, bullet/ellipsis
    line fractions, alphabetic-word fraction, required-stopword count,
    and the combined gopher_pass gate), each metric and the gate
    hash-matched against the oracle."""
    from ..operators.gopher import add_gopher_quality

    d = add_gopher_quality(
        table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars", "text",
            _tokens(F.col("text")).alias("toks"),
        ),
        text_col="text",
        toks_col="toks",
    )
    toks = F.col("toks")

    def score(lang: str):
        markers = list(LANG_MARKERS[lang])
        return F.size(F.filter(toks, lambda t: t.isin(markers))).cast("long")

    scored = d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        score("en").alias("s_en"),
        score("de").alias("s_de"),
        score("es").alias("s_es"),
        score("fr").alias("s_fr"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.,!?;:]"))).cast("long").alias("n_punct"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[A-Z]"))).cast("long").alias("n_upper"),
        F.size(F.filter(toks, lambda t: t.isin(list(STOPWORDS)))).cast("long").alias("n_stop"),
        "n_chars",
        # fingerprints (absorbed from the former t_fingerprint registry row
        # in r5): normalized-content md5, order-insensitive bag-of-words
        # md5, 60-bit integer fingerprint for compact joins
        F.md5(_fp_norm_col()).alias("content_fp"),
        F.md5(
            F.concat_ws(
                " ", F.array_sort(F.array_distinct(_tokens(F.lower(F.col("text")))))
            )
        ).alias("bag_fp"),
        F.conv(F.substring(F.md5(_fp_norm_col()), 1, 15), 16, 10)
        .cast("long")
        .alias("fp_int"),
        "mean_word_len",
        "sym_word_ratio",
        "bullet_line_frac",
        "ellipsis_line_frac",
        "alpha_word_frac",
        "n_req_stop",
        "gopher_fail_mask",
        "gopher_pass",
    )
    s = {k: F.col(f"s_{k}") for k in ("en", "de", "es", "fr")}
    predicted = (
        F.when((s["en"] == 0) & (s["de"] == 0) & (s["es"] == 0) & (s["fr"] == 0), "und")
        .when((s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] >= s["fr"]), "en")
        .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]), "de")
        .when(s["es"] >= s["fr"], "es")
        .otherwise("fr")
    )
    stop_ratio = F.col("n_stop") / F.col("n_tokens")
    return scored.select(
        "doc_id",
        "labeled_lang",
        "s_en",
        "s_de",
        "s_es",
        "s_fr",
        predicted.alias("predicted_lang"),
        "n_tokens",
        "n_punct",
        "n_upper",
        "n_stop",
        stop_ratio.alias("stopword_ratio"),
        (F.col("n_punct") / F.col("n_chars")).alias("punct_ratio"),
        (
            (F.col("n_tokens") >= 20)
            & (F.col("n_tokens") <= 1000)
            & (stop_ratio >= 0.01)
        ).alias("passes_filter"),
        "content_fp",
        "bag_fp",
        "fp_int",
        "mean_word_len",
        "sym_word_ratio",
        "bullet_line_frac",
        "ellipsis_line_frac",
        "alpha_word_frac",
        "n_req_stop",
        "gopher_fail_mask",
        "gopher_pass",
    )


# t_fingerprint's expressions were absorbed into t_langid_quality in r5 to
# free a graded-window slot for p_chunk_documents; the helper below keeps
# the normalization shared.
def _fp_norm_col():
    from pyspark.sql import functions as F

    return F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))


@register(
    "t_exact_dedup",
    oracle="""
    SELECT doc_id,
           MIN(doc_id) OVER w AS canonical_id,
           COUNT(*) OVER w AS group_size,
           (doc_id = MIN(doc_id) OVER w) AS is_canonical
    FROM documents
    WINDOW w AS (PARTITION BY md5(text))
    """,
)
def t_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: canonical row = min doc_id per md5 group.

    Scale: this is a single hash shuffle on a 128-bit key; at 100 TB the key
    is the md5 (never the text itself), so shuffle volume is rows x ~40 bytes.
    """
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text"))
    return d.select(
        "doc_id",
        F.min("doc_id").over(w).alias("canonical_id"),
        F.count(F.lit(1)).over(w).alias("group_size"),
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("is_canonical"),
    )


NGRAM_MAX_BLOCK_ROWS = 256  # hard per-block cap (inert at graded SFs)


@register(
    "t_ngram_jaccard",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, {_sql_tokens('text')} AS toks
      FROM documents WHERE doc_id % 20 = 0),
    sh0 AS (
      SELECT doc_id, lang,
             CASE WHEN len(toks) >= 3 THEN
               list_distinct(list_transform(range(1, len(toks) - 1),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
             ELSE [] END AS shingles
      FROM tok),
    sh AS (
      SELECT doc_id, lang, shingles FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS brn
        FROM sh0) WHERE brn <= 256),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_filter(a.shingles, s -> list_contains(b.shingles, s))) AS n_inter,
             len(a.shingles) AS n_a, len(b.shingles) AS n_b
      FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, n_inter,
           n_inter / (n_a + n_b - n_inter) AS jaccard
    FROM pairs WHERE n_inter > 0
    """,
)
def t_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram (word-shingle) Jaccard near-dup scoring over blocked pairs.

    Blocking on `lang` (plus the doc_id sample gate) narrows the pair
    space, and a ROW_NUMBER cap bounds every block at NGRAM_MAX_BLOCK_ROWS
    (tools/scale_stress.py measured 49x growth at a 10x corpus without it
    — lang blocks alone grow quadratically). The full-scale variant swaps
    the block key for an LSH band (see s_minhash_lsh) so candidate
    generation is O(n) not O(n^2) — this query is the verify stage of that
    pipeline. The cap window partitions on the join key, so Spark reuses
    one exchange for both.

    The per-pair intersection is ``array_intersect`` (codegen'd hash-set
    build, O(|A|+|B|) per pair) rather than a ``filter(a, s ->
    array_contains(b, s))`` higher-order function — HOF lambdas execute
    interpreted per element, making the verify stage O(|A|*|B|)
    interpreted string compares per candidate pair. Shingle arrays are
    array_distinct'd, so the intersection size equals the filter count
    exactly; the intersection is projected once and reused for both
    n_inter and the jaccard denominator.
    """
    wb = Window.partitionBy("lang").orderBy("doc_id")
    d = (
        table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 20 == 0)
        .select("doc_id", "lang", _tokens(F.col("text")).alias("toks"))
        .withColumn("brn", F.row_number().over(wb))
        .where(F.col("brn") <= NGRAM_MAX_BLOCK_ROWS)
        .drop("brn")
    )
    toks = F.col("toks")
    n = F.size(toks)
    shingles = F.when(
        n >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), n - 3),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(toks, i + 1),
                    F.element_at(toks, i + 2),
                    F.element_at(toks, i + 3),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = d.select("doc_id", "lang", shingles.alias("shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = F.size(
        F.array_intersect(F.col("a.shingles"), F.col("b.shingles"))
    ).cast("long")
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            inter.alias("n_inter"),
            (F.size(F.col("a.shingles")) + F.size(F.col("b.shingles"))).alias("__sz"),
        )
        .where(F.col("n_inter") > 0)
        .select(
            "doc_a",
            "doc_b",
            "n_inter",
            (F.col("n_inter") / (F.col("__sz") - F.col("n_inter"))).alias("jaccard"),
        )
    )


@register(
    "t_repetition",
    oracle="""
    WITH base AS (
      SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
      FROM documents),
    tok AS (
      SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS i
      FROM base),
    runs AS (
      SELECT doc_id, COUNT(*) AS rl
      FROM (SELECT doc_id, tok,
                   i - ROW_NUMBER() OVER (PARTITION BY doc_id, tok ORDER BY i) AS grp
            FROM tok)
      GROUP BY doc_id, tok, grp),
    mr AS (SELECT doc_id, MAX(rl) AS max_run FROM runs GROUP BY doc_id),
    met AS (
      SELECT doc_id, toks,
             CASE WHEN len(toks) >= 3 THEN
               list_transform(generate_series(1, len(toks) - 2),
                              i -> array_to_string(list_slice(toks, i, i + 2), ' '))
             ELSE [] END AS ng
      FROM base)
    SELECT m.doc_id,
           CASE WHEN len(toks) > 0
                THEN CAST(len(toks) - len(list_distinct(toks)) AS DOUBLE) / len(toks)
                ELSE 0.0 END AS dup_token_frac,
           CASE WHEN len(ng) > 0
                THEN CAST(len(ng) - len(list_distinct(ng)) AS DOUBLE) / len(ng)
                ELSE 0.0 END AS dup_ngram_frac,
           CASE WHEN len(ng) > 0
                THEN CAST(list_max(list_transform(list_distinct(ng),
                       g -> len(list_filter(ng, x -> x = g)))) AS DOUBLE) / len(ng)
                ELSE 0.0 END AS top_ngram_frac,
           COALESCE(mr.max_run, 0) AS max_run_len
    FROM met m LEFT JOIN mr ON m.doc_id = mr.doc_id
    """,
)
def t_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition metrics (duplicate token /
    n-gram fractions, top-n-gram boilerplate mass, longest same-token run)
    — the round-4 operators/repetition.py graduated into the graded window.

    Scale: one shuffle-free projection over the token array; every metric
    is a JVM column expression, so this composes with the other per-doc
    text operators at scan cost. The oracle mirrors the array math with
    DuckDB list lambdas and computes max-run via gaps-and-islands.
    """
    from ..operators.repetition import repetition_metrics

    # local-mode accommodation (no-op on a real cluster where the scan
    # has many splits): the per-doc metric pass is the cost, so spread
    # the tiny local parquet across the session's parallelism. widen()
    # hashes on doc_id — keyless round-robin would pay the
    # sortBeforeRepartition local sort (r14).
    d = widen(
        table(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )
    return repetition_metrics(d, "text", ngram_n=3).select(
        "doc_id", "dup_token_frac", "dup_ngram_frac", "top_ngram_frac", "max_run_len"
    )


# --------------------------------------------------------------------------
# C4-style corpus cleaning (operators/cleaning.py) — graded in r6
# --------------------------------------------------------------------------

def _sql_line_ok(ln: str) -> str:
    """DuckDB mirror of operators/cleaning._line_ok with the default
    thresholds (terminal punctuation, >= 3 words, marker blocklist)."""
    ends = " OR ".join(
        f"ends_with(lower({ln}), '{p}')" for p in (".", "!", "?", '"')
    ) + f" OR ends_with(lower({ln}), chr(39))"
    blocked = " OR ".join(
        f"contains(lower({ln}), '{b}')"
        for b in ("javascript", "cookie policy", "terms of use", "privacy policy")
    )
    n_words = (
        f"len(list_filter(regexp_split_to_array(trim({ln}), '\\s+'),"
        " x -> x <> ''))"
    )
    return f"(({ends}) AND NOT ({blocked}) AND {n_words} >= 3)"


_SQL_CLEAN_STAGED = """
    staged0 AS (
      SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
      FROM documents),
    staged1 AS (
      SELECT doc_id, toks, len(toks) AS n,
             GREATEST(CAST(ceil(len(toks) / 3.0) AS INT), 1) AS L
      FROM staged0),
    staged AS (
      SELECT doc_id,
             concat_ws(chr(10),
               array_to_string(list_slice(toks, 1, L), ' ') || '.',
               array_to_string(list_slice(toks, L + 1, 2 * L), ' '),
               array_to_string(list_slice(toks, 2 * L + 1, n), ' ')
                 || ' javascript.',
               'all rights reserved.')
             || CASE WHEN doc_id % 7 = 0 THEN chr(10) || '{code}'
                     ELSE '' END AS staged
      FROM staged1)
"""


@register(
    "t_clean_lines",
    oracle=f"""
    WITH {_SQL_CLEAN_STAGED},
    cleaned AS (
      SELECT doc_id, staged, string_split(staged, chr(10)) AS ls
      FROM staged),
    kept AS (
      SELECT doc_id, staged, ls,
             list_filter(ls, ln -> {_sql_line_ok('ln')}) AS keep
      FROM cleaned),
    freq AS (
      SELECT line FROM (
        SELECT unnest(list_distinct(string_split(staged, chr(10)))) AS line
        FROM staged)
      WHERE trim(line) <> ''
        AND len(list_filter(regexp_split_to_array(trim(line), '\\s+'),
                            x -> x <> '')) >= 1
      GROUP BY line
      HAVING COUNT(*) > GREATEST(
        CAST(FLOOR(0.01 * (SELECT COUNT(*) FROM documents)) AS BIGINT), 1)),
    fl AS (SELECT COALESCE(list(line), []) AS fl FROM freq)
    SELECT k.doc_id,
           len(k.ls) AS n_lines,
           len(k.keep) AS n_kept_lines,
           array_to_string(k.keep, chr(10)) AS clean_text,
           (contains(lower(k.staged), '{{')
             OR contains(lower(k.staged), '}}')
             OR contains(lower(k.staged), 'lorem ipsum')) AS doc_blocked,
           array_to_string(
             list_filter(k.ls, ln -> NOT list_contains(fl.fl, ln)),
             chr(10)) AS stripped_text,
           len(k.ls) - len(list_filter(k.ls, ln -> NOT list_contains(fl.fl, ln)))
             AS n_boilerplate_removed
    FROM kept k CROSS JOIN fl
    """,
)
def t_clean_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/RefinedWeb corpus cleaning, graded end-to-end: per-line rules
    (terminal punctuation, >= 3 words, marker blocklist, curly-brace /
    lorem-ipsum document kill) via operators/cleaning.clean_lines, then
    cross-document boilerplate-line removal via strip_boilerplate_lines.

    The testdata documents are single-line word streams, so the query
    first STAGES a deterministic multi-line corpus from each document:
    three token-range lines (first third + '.', bare middle third,
    last third + ' javascript.'), a shared footer line every document
    repeats (the boilerplate the stripper must find and remove), and a
    '{{code}}' line on every 7th document (tripping the brace kill rule).
    The oracle rebuilds the identical staging in SQL, so every rule —
    keep, drop, block, frequent-line strip — is value-compared.

    Scale: the line rules are row-local JVM array lambdas (one scan). The
    boilerplate finder runs the APPROXIMATE Misra-Gries path (r7, the r6
    verdict's task #5): per-partition summaries cap the shuffle at
    capacity x partitions rows instead of shuffling every distinct line,
    and with capacity=4096 >= (distinct lines per doc ~5)/0.01 the MG
    survival guarantee makes the frequent set EXACTLY equal to the exact
    finder's — which is what the oracle computes, so the graded hash
    match proves the bounded-shuffle path's equivalence every round. The
    frequent set then broadcasts back as one array — corpus text never
    shuffles (plan-gated in test_plans.py).
    """
    from ..operators.cleaning import clean_lines, strip_boilerplate_lines
    from ..io import widen

    # r14 (guide §2.5): the staging expressions, the per-line rule
    # lambdas and the Misra-Gries per-partition summary are all map-side
    # work above the first exchange, and the single-row-group local file
    # collapsed that whole span to ONE task (profiled: a 0.7 s one-task
    # stage dominating a 2.5 s wall). widen() hashes on doc_id and is a
    # no-op on any multi-split layout, i.e. at scale. The MG frequent set
    # is partitioning-independent (survivors are exact-recounted before
    # thresholding), so the result is unchanged.
    d = widen(
        table(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )
    toks = _tokens(F.col("text"))
    n = F.size(toks)
    L = F.greatest(F.ceil(n / F.lit(3.0)).cast("int"), F.lit(1))
    staged = F.concat_ws(
        "\n",
        F.concat(F.array_join(F.slice(toks, F.lit(1), L), " "), F.lit(".")),
        F.array_join(F.slice(toks, L + F.lit(1), L), " "),
        F.concat(
            F.array_join(F.slice(toks, L + L + F.lit(1), n), " "),
            F.lit(" javascript."),
        ),
        F.lit("all rights reserved."),
    )
    staged = F.when(
        F.col("doc_id") % 7 == 0, F.concat(staged, F.lit("\n{code}"))
    ).otherwise(staged)
    staged_df = d.select("doc_id", staged.alias("staged"))
    cleaned = clean_lines(staged_df, text_col="staged")
    stripped = strip_boilerplate_lines(
        cleaned, text_col="staged", approx_capacity=4096
    )
    return stripped.select(
        "doc_id",
        "n_lines",
        "n_kept_lines",
        "clean_text",
        "doc_blocked",
        "stripped_text",
        "n_boilerplate_removed",
    )


# --------------------------------------------------------------------------
# Vocabulary + unigram-LM scoring (operators/vocab.py) — graded in r6
# --------------------------------------------------------------------------

_LM_LAM = 0.8


@register(
    "t_vocab_unigram",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             lower(unnest(list_filter(regexp_split_to_array(text, '\s+'),
                                      t -> t <> ''))) AS token
      FROM documents),
    vocab AS (
      SELECT token, n FROM (
        SELECT token, COUNT(*) AS n FROM toks GROUP BY token
        HAVING COUNT(*) >= 2
        ORDER BY n DESC, token LIMIT 512)),
    tot AS (SELECT SUM(n) AS total, COUNT(*) AS vsz FROM vocab),
    scored AS (
      SELECT t.doc_id,
             -ln(COALESCE(CAST(v.n AS DOUBLE), 1.0) / (tot.total + 1)) AS nlp
      FROM toks t LEFT JOIN vocab v USING (token) CROSS JOIN tot),
    uni AS (
      SELECT doc_id, COUNT(*) AS n_scored,
             CAST(SUM(CAST(nlp AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)
               AS avg_neg_logprob
      FROM scored GROUP BY doc_id),
    tl AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\s+'),
                         t -> t <> '') AS l
      FROM documents),
    pidx AS (
      SELECT doc_id, l, unnest(range(0, len(l))) AS j
      FROM tl WHERE len(l) > 0),
    praw AS (
      SELECT doc_id,
             CASE WHEN j = 0 THEN '<s>' ELSE l[j] END AS prev_raw,
             l[j + 1] AS cur_raw
      FROM pidx),
    pm AS (
      SELECT doc_id,
             CASE WHEN prev_raw = '<s>' OR vp.token IS NOT NULL
                  THEN prev_raw ELSE '<unk>' END AS prev,
             CASE WHEN vc.token IS NOT NULL
                  THEN cur_raw ELSE '<unk>' END AS cur
      FROM praw
      LEFT JOIN vocab vp ON vp.token = praw.prev_raw
      LEFT JOIN vocab vc ON vc.token = praw.cur_raw),
    big AS (SELECT prev, cur, COUNT(*) AS c FROM pm GROUP BY prev, cur),
    ctx AS (SELECT prev, SUM(c) AS c_ctx FROM big GROUP BY prev),
    bscored AS (
      SELECT pm.doc_id,
             -ln(0.8 * COALESCE(CAST(b.c AS DOUBLE) / x.c_ctx, 0.0)
                 + 0.19999999999999996
                   * ((COALESCE(v.n, 0) + 1)
                      / (tot.total + tot.vsz + 1))) AS nlp
      FROM pm
      LEFT JOIN big b ON b.prev = pm.prev AND b.cur = pm.cur
      LEFT JOIN ctx x ON x.prev = b.prev
      LEFT JOIN vocab v ON v.token = pm.cur
      CROSS JOIN tot),
    bi AS (
      SELECT doc_id, COUNT(*) AS n_pairs,
             CAST(SUM(CAST(nlp AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)
               AS avg_neg_logprob_bigram
      FROM bscored GROUP BY doc_id)
    SELECT uni.doc_id, uni.n_scored, uni.avg_neg_logprob,
           bi.n_pairs, bi.avg_neg_logprob_bigram
    FROM uni JOIN bi USING (doc_id)
    """,
)
def t_vocab_unigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary + LM quality scoring, graded end-to-end — since
    r7 BOTH language models score in one row: a top-512 / min-count-2
    vocabulary (operators/vocab.build_vocab — deterministic
    (n DESC, token) truncation), every document scored by mean
    -ln p(token) under the unigram model with the add-one OOV floor
    (unigram_logprob), AND by mean -ln p(cur|prev) under the interpolated
    bigram model (fit_bigram_lm/bigram_logprob — the CCNet-style
    perplexity gate; lam=0.8, UNK-mapped pairs with a <s> start symbol,
    p = lam*c(prev,cur)/c(prev) + (1-lam)*add-one-unigram). The per-term
    DECIMAL(25,6) quantization of each -ln p makes both means
    order-independent and engine-exact, so all four score columns
    hash-match the oracle — the FULL bigram training pipeline (pair
    generation, UNK mapping, counts, context totals, interpolation) is
    value-verified, not rows-only.

    Scale: token/bigram counts partial-aggregate map-side (shuffles carry
    (key, partial_count), never instances); pair formation is row-local;
    the capped vocabulary and model tables broadcast into scoring
    (plan-gated in test_plans.py); scoring is one scan + one per-doc
    aggregate per model.
    """
    from ..functions import local_df
    from ..operators.vocab import (
        bigram_logprob,
        build_vocab,
        fit_bigram_lm,
        unigram_logprob,
    )

    d = table(spark, sf_dir, "documents")
    # The capped vocabulary is referenced ~8 times downstream (the total
    # aggregate, the unigram scoring join, two UNK-map joins in bigram
    # fitting, two in bigram scoring, the unigram-smoothing join, the
    # stats aggregate). Each reference re-executes the full corpus
    # tokenize+count+sort subtree when vocab stays a lazy plan — the r13
    # "before" capture shows 22 parquet scans of documents with zero
    # exchange reuse. Collecting the <=512 (token, n) rows once and
    # rebinding them as a LocalRelation (guide §5: the vocabulary IS
    # driver-bounded by the top_k cap) leaves one corpus pass per model
    # stage. Values are exact: strings and int64 counts round-trip
    # bit-identically, and every float is still computed by the same JVM
    # expressions downstream.
    #
    # r14 (the r13 verdict's task #6, guide §4.2/§8): the remaining four
    # model stages each re-tokenized the corpus from parquet (vocab
    # count, unigram scoring, bigram fit, bigram scoring — two regex
    # splits per document per stage). ONE materialized pass now computes
    # both token forms per document — `__toks_u` = split-then-lower
    # (what vocab/unigram computed) and `__toks_p` = lower-then-split
    # (what pair formation computed); both forms are kept so each stage
    # consumes the byte-identical array it used to derive itself — and
    # every stage reads the localCheckpoint instead of re-scanning
    # parquet. Per-invocation by construction: a fresh fn() call
    # materializes a fresh checkpoint, nothing survives across runs.
    toks_u = F.transform(
        F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != ""),
        F.lower,
    )
    toks_p = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != ""
    )
    tok_tbl = d.select(
        "doc_id", toks_u.alias("__toks_u"), toks_p.alias("__toks_p")
    ).localCheckpoint()
    vocab_rows = build_vocab(
        tok_tbl, tokens_col="__toks_u", top_k=512, min_count=2
    ).collect()
    vocab = local_df(
        spark, [(r.token, r.n) for r in vocab_rows], "token string, n bigint"
    )
    uni = unigram_logprob(tok_tbl, vocab, tokens_col="__toks_u")
    _v, bigrams = fit_bigram_lm(tok_tbl, vocab=vocab, tokens_col="__toks_p")
    bi = bigram_logprob(
        tok_tbl, vocab, bigrams, lam=_LM_LAM, tokens_col="__toks_p"
    ).select(
        "doc_id",
        F.col("n_scored").alias("n_pairs"),
        F.col("avg_neg_logprob").alias("avg_neg_logprob_bigram"),
    )
    return uni.join(bi, "doc_id")


# --------------------------------------------------------------------------
# BM25 full-text retrieval (operators/bm25.py) — graded in r6
# --------------------------------------------------------------------------

_BM25_QUERIES = [
    (1, "spark merge join window"),
    (2, "batch stream filter"),
    (3, "table scan vector dup"),
]
_BM25_K1, _BM25_B, _BM25_K = 1.2, 0.75, 10
_RRF_K = 60  # the Cormack et al. constant
# hard-negative mining (r9 graduation): the "labeled positives" are a
# deterministic SCATTERED subset of the retrieval list (top-5 hits with
# even doc_id), so the anti-join genuinely removes interior ranks and the
# survivor re-ranking is non-trivial
_HN_POS_DEPTH = 5
# fielded (BM25F-style) branch: a derived 'title' (the document's first
# {_BM25F_TITLE_LEN} whitespace tokens) boosted over the full text as
# 'body'. INTEGER-VALUED weights keep every weighted tf/dl sum exactly
# representable (integer-valued doubles < 2^53 add exactly in any
# order), so avgdl is bit-identical across engines with no decimal
# scaffolding.
_BM25F_TITLE_LEN = 5
_BM25F_W_TITLE, _BM25F_W_BODY = 2.0, 1.0


@register(
    "q_bm25_search",
    oracle=rf"""
    WITH q(query_id, query_text) AS (VALUES
      {", ".join(f"({i}, '{t}')" for i, t in _BM25_QUERIES)}),
    toks AS (
      SELECT doc_id,
             lower(unnest(list_filter(regexp_split_to_array(text, '\s+'),
                                      t -> t <> ''))) AS term
      FROM documents),
    dls AS (
      SELECT doc_id,
             len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                             t -> t <> '')) AS dl
      FROM documents),
    postings AS (
      SELECT term, t.doc_id, COUNT(*) AS tf, ANY_VALUE(d.dl) AS dl
      FROM toks t JOIN dls d USING (doc_id) GROUP BY term, t.doc_id),
    stats AS (
      SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dls),
    qterms AS (
      SELECT DISTINCT query_id,
             lower(unnest(list_filter(regexp_split_to_array(query_text, '\s+'),
                                      t -> t <> ''))) AS term
      FROM q),
    dfreq AS (
      SELECT term, COUNT(*) AS df FROM postings
      WHERE term IN (SELECT term FROM qterms) GROUP BY term),
    scored AS (
      SELECT qt.query_id, p.doc_id,
             ln(1.0 + (CAST(s.n_docs - f.df AS DOUBLE) + 0.5) / (CAST(f.df AS DOUBLE) + 0.5))
               * (CAST(p.tf AS DOUBLE) * ({_BM25_K1} + 1.0))
               / (CAST(p.tf AS DOUBLE)
                  + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * CAST(p.dl AS DOUBLE) / s.avgdl))
               AS term_score
      FROM postings p
      JOIN qterms qt USING (term)
      JOIN dfreq f USING (term)
      CROSS JOIN stats s),
    per_doc AS (
      SELECT query_id, doc_id,
             CAST(SUM(CAST(term_score AS DECIMAL(25,6))) AS DOUBLE) AS score
      FROM scored GROUP BY query_id, doc_id),
    bmtop AS (
      SELECT query_id, doc_id, score, rank FROM (
        SELECT query_id, doc_id, score,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, doc_id) AS rank
        FROM per_doc)
      WHERE rank <= {_BM25_K}),
    ovl AS (
      SELECT qt.query_id, p.doc_id,
             CAST(COUNT(DISTINCT p.term) AS DOUBLE) AS score
      FROM postings p JOIN qterms qt USING (term)
      GROUP BY qt.query_id, p.doc_id),
    ovltop AS (
      SELECT query_id, doc_id, score, rank FROM (
        SELECT query_id, doc_id, score,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, doc_id) AS rank
        FROM ovl)
      WHERE rank <= {_BM25_K}),
    contrib AS (
      SELECT query_id, doc_id,
             CAST(CAST(1 AS DOUBLE) / ({_RRF_K} + rank) AS DECIMAL(25,6)) AS c
      FROM bmtop
      UNION ALL
      SELECT query_id, doc_id,
             CAST(CAST(1 AS DOUBLE) / ({_RRF_K} + rank) AS DECIMAL(25,6)) AS c
      FROM ovltop),
    fused AS (
      SELECT query_id, doc_id, CAST(SUM(c) AS DOUBLE) AS score
      FROM contrib GROUP BY query_id, doc_id),
    ftop AS (
      SELECT query_id, doc_id, score, rank FROM (
        SELECT query_id, doc_id, score,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, doc_id) AS rank
        FROM fused)
      WHERE rank <= {_BM25_K}),
    pos AS MATERIALIZED (
      SELECT query_id, doc_id FROM bmtop
      WHERE rank <= {_HN_POS_DEPTH} AND doc_id % 2 = 0),
    posmax AS (
      SELECT COALESCE(MAX(n), 0) AS m FROM (
        SELECT query_id, COUNT(*) AS n FROM pos GROUP BY query_id)),
    nhits AS (
      SELECT query_id, doc_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id) AS rank
      FROM per_doc),
    nover AS (
      SELECT h.query_id, h.doc_id, h.score
      FROM nhits h CROSS JOIN posmax
      WHERE h.rank <= {_BM25_K} + posmax.m),
    nneg AS (
      SELECT query_id, doc_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id) AS rank
      FROM nover o
      WHERE NOT EXISTS (
        SELECT 1 FROM pos p
        WHERE p.query_id = o.query_id AND p.doc_id = o.doc_id)),
    qn AS (SELECT query_id, COUNT(*) AS n FROM qterms GROUP BY query_id),
    pmatched AS (
      SELECT qt.query_id, p.doc_id, COUNT(*) AS nterms
      FROM postings p JOIN qterms qt USING (term)
      WHERE p.term IN (SELECT term FROM qterms)
      GROUP BY qt.query_id, p.doc_id),
    alltop AS (
      SELECT query_id, doc_id, score, rank FROM (
        SELECT d.query_id, d.doc_id, d.score,
               ROW_NUMBER() OVER (PARTITION BY d.query_id
                                  ORDER BY d.score DESC, d.doc_id) AS rank
        FROM per_doc d
        JOIN pmatched m ON m.query_id = d.query_id AND m.doc_id = d.doc_id
        JOIN qn ON qn.query_id = d.query_id
        WHERE m.nterms = qn.n)
      WHERE rank <= {_BM25_K}),
    fdocs AS MATERIALIZED (
      SELECT doc_id,
             array_to_string(
               list_filter(regexp_split_to_array(text, '\s+'),
                           t -> t <> '')[1:{_BM25F_TITLE_LEN}],
               ' ') AS title,
             text AS body
      FROM documents),
    ftf_t AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM (
        SELECT doc_id,
               lower(unnest(list_filter(regexp_split_to_array(title, '\s+'),
                                        t -> t <> ''))) AS term
        FROM fdocs) GROUP BY doc_id, term),
    ftf_b AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM (
        SELECT doc_id,
               lower(unnest(list_filter(regexp_split_to_array(body, '\s+'),
                                        t -> t <> ''))) AS term
        FROM fdocs) GROUP BY doc_id, term),
    fpost AS MATERIALIZED (
      SELECT COALESCE(t.doc_id, b.doc_id) AS doc_id,
             COALESCE(t.term, b.term) AS term,
             {_BM25F_W_TITLE} * COALESCE(t.tf, 0)
               + {_BM25F_W_BODY} * COALESCE(b.tf, 0) AS tf
      FROM ftf_t t FULL JOIN ftf_b b USING (doc_id, term)),
    fdls AS (
      SELECT doc_id,
             {_BM25F_W_TITLE} * len(list_filter(
               regexp_split_to_array(lower(title), '\s+'), t -> t <> ''))
             + {_BM25F_W_BODY} * len(list_filter(
               regexp_split_to_array(lower(body), '\s+'), t -> t <> ''))
               AS dl
      FROM fdocs),
    fstats AS (
      SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM fdls),
    fdfreq AS (
      SELECT term, COUNT(*) AS df FROM fpost
      WHERE term IN (SELECT term FROM qterms) GROUP BY term),
    fscored AS (
      SELECT qt.query_id, p.doc_id,
             ln(1.0 + (CAST(s.n_docs - f.df AS DOUBLE) + 0.5) / (CAST(f.df AS DOUBLE) + 0.5))
               * (CAST(p.tf AS DOUBLE) * ({_BM25_K1} + 1.0))
               / (CAST(p.tf AS DOUBLE)
                  + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * CAST(d.dl AS DOUBLE) / s.avgdl))
               AS term_score
      FROM fpost p
      JOIN fdls d USING (doc_id)
      JOIN qterms qt USING (term)
      JOIN fdfreq f USING (term)
      CROSS JOIN fstats s),
    fper_doc AS (
      SELECT query_id, doc_id,
             CAST(SUM(CAST(term_score AS DECIMAL(25,6))) AS DOUBLE) AS score
      FROM fscored GROUP BY query_id, doc_id),
    bmftop AS (
      SELECT query_id, doc_id, score, rank FROM (
        SELECT query_id, doc_id, score,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, doc_id) AS rank
        FROM fper_doc)
      WHERE rank <= {_BM25_K})
    SELECT 'bm25' AS branch, query_id, doc_id, score, rank FROM bmtop
    UNION ALL
    SELECT 'rrf' AS branch, query_id, doc_id, score, rank FROM ftop
    UNION ALL
    SELECT 'hardneg' AS branch, query_id, doc_id, score, rank FROM nneg
    WHERE rank <= {_BM25_K}
    UNION ALL
    SELECT 'bm25_all' AS branch, query_id, doc_id, score, rank FROM alltop
    UNION ALL
    SELECT 'bm25f' AS branch, query_id, doc_id, score, rank FROM bmftop
    """,
)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval, TWO families in one graded row since r7, both
    value-hash-checked:

    * ``branch='bm25'`` — BM25 top-k over the documents corpus for a
      fixed three-query batch (operators/bm25.bm25_topk): row-local
      postings, query-term pruning, broadcast-only joins, decimal
      per-term score quantization, deterministic (score DESC, doc_id)
      rank. The oracle recomputes the identical pipeline in SQL — same
      tokenization, same idf/tf shape with the same expression
      association, same DECIMAL(25,6) sum, so scores hash-match.
    * ``branch='rrf'`` — reciprocal-rank fusion (operators/fusion.py,
      Cormack et al. 2009): the BM25 list fused with a distinct-term-
      overlap list (deliberately uncalibrated scales — fusing them IS
      the point) via 1/({_RRF_K}+rank) contributions quantized at
      DECIMAL(25,6); the hybrid-serving combiner, graded with fused
      scores AND ranks value-checked.

    r10 adds the retrieval surface's two mode axes, value-graded:

    * ``branch='bm25_all'`` — AND semantics (``match_all=True``): only
      documents containing EVERY distinct query term rank; survivors
      keep their OR-mode scores (the filter is a per-(query, doc)
      matched-term count against the query's term count — broadcast,
      |queries| rows).
    * ``branch='bm25f'`` — weighted multi-field scoring
      (operators/bm25.bm25f_topk, the simple-BM25F title/body boost):
      a derived title (first {_BM25F_TITLE_LEN} tokens, {_BM25F_W_TITLE}x)
      over the full text as body ({_BM25F_W_BODY}x). Weighted tf and dl
      stay integer-valued doubles, so the cross-engine sums are exact
      without decimal scaffolding; the per-term scores quantize at
      DECIMAL(25,6) as everywhere else.

    Since r9 a third family graduates in the same row:

    * ``branch='hardneg'`` — hard-negative mining
      (operators/negatives.mine_hard_negatives, the DPR/contrastive
      training-data step): "labeled positives" are the top-{_HN_POS_DEPTH}
      BM25 hits with even doc_id (a deterministic scattered subset, so the
      anti-join removes INTERIOR ranks), retrieval over-fetches by the
      largest per-query positive count, positives drop via LEFT ANTI, and
      the survivors re-rank per query — negatives' scores AND ranks
      hash-match the oracle's NOT EXISTS mirror.

    Scale: see operators/bm25.py — the corpus never shuffles for a join
    (plan-gated in test_plans.py); the only hash exchanges carry pruned
    or aggregated data. Fusion runs over the retrieved lists only
    (queries x top-k rows), never the corpus; mining adds one
    broadcast-small anti-join and one window over <= k + positives rows
    per query.
    """
    from ..operators.bm25 import (
        _tokens,
        bm25f_topk,
        build_postings,
        rank_and_cut,
        score_per_doc,
    )
    from ..operators.fusion import rank_topk, rrf_fuse
    from ..operators.negatives import rerank_negatives

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    queries = local_df(spark, _BM25_QUERIES, "query_id bigint, query_text string")
    # r13 (guide §1.2 "don't compute things twice"): the bm25, bm25_all,
    # rrf-overlap and hardneg branches all rank THE SAME per-(query,doc)
    # score table — before, each branch re-derived it from the corpus
    # (bm25_topk x3 + term_overlap_scores: the formatted plan carried 13
    # `Scan parquet documents` nodes, i.e. 13 full corpus passes at
    # 100 TB). Compute it once via the same operator pieces
    # (score_per_doc == bm25_topk's scoring half, so values are
    # bit-identical) and materialize WITHIN this invocation
    # (localCheckpoint, the house idiom from d_dedup/q_pagerank —
    # recomputed from parquet on every run, nothing persists across
    # runs). per_doc is query-batch-bounded: |queries| x docs-matching-
    # any-query-term rows of 4 scalar columns, the same data the rank
    # windows must hold anyway.
    postings, _dfreq, stats = build_postings(d)
    qterms = queries.select(
        "query_id", F.explode(_tokens(F.col("query_text"))).alias("term")
    ).distinct()
    per_doc = score_per_doc(
        postings, qterms, stats, k1=_BM25_K1, b=_BM25_B
    ).localCheckpoint()
    bm = rank_and_cut(per_doc, _BM25_K).withColumn(
        "rank", F.col("rank").cast("long")
    )
    # r10 'bm25_all': AND semantics — only documents containing every
    # distinct query term rank; survivors keep their OR-mode scores
    bm_all = rank_and_cut(per_doc, _BM25_K, match_all=True, qterms=qterms)
    # r10 'bm25f': weighted multi-field scoring over a derived title
    # (first {_BM25F_TITLE_LEN} tokens) boosted {_BM25F_W_TITLE}x over
    # the full text as body — integer-valued weights keep the weighted
    # sums exact across engines (see the constant's comment)
    fdocs = d.select(
        "doc_id",
        F.array_join(
            F.slice(
                F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != ""),
                1,
                _BM25F_TITLE_LEN,
            ),
            " ",
        ).alias("title"),
        F.col("text").alias("body"),
    )
    bmf = bm25f_topk(
        fdocs,
        queries,
        [("title", _BM25F_W_TITLE), ("body", _BM25F_W_BODY)],
        k=_BM25_K,
        k1=_BM25_K1,
        b=_BM25_B,
    )
    # the overlap list's score IS per_doc's matched-term count:
    # term_overlap_scores' COUNT(DISTINCT term) over query-pruned token
    # instances equals __nterms (postings carry one row per (term, doc))
    # cast to double — same candidate set, same tie-break, zero extra
    # corpus passes (the operator twin is equality-tested in
    # test_fusion.py)
    ovl = rank_topk(
        per_doc.select(
            "query_id", "doc_id", F.col("__nterms").cast("double").alias("score")
        ),
        top_k=_BM25_K,
    )
    fused = rrf_fuse([bm, ovl], topn=_BM25_K, rrf_k=_RRF_K)
    positives = bm.where(
        (F.col("rank") <= _HN_POS_DEPTH) & (F.col("doc_id") % 2 == 0)
    ).select("query_id", "doc_id")
    # hard negatives from the SAME per_doc: over-fetch by the largest
    # per-query positive count (mine_hard_negatives' default, computed
    # identically), rank via the same rank_and_cut, then the operator's
    # own anti-join/re-rank tail
    _pn = positives.groupBy("query_id").agg(F.count(F.lit(1)).alias("n"))
    _pmax = _pn.agg(F.max("n")).collect()[0][0]  # 1-row scalar
    neg = rerank_negatives(
        rank_and_cut(per_doc, _BM25_K + int(_pmax or 0)),
        positives,
        k=_BM25_K,
    )
    cols = ["query_id", "doc_id", "score", "rank"]
    out_bm = bm.select(F.lit("bm25").alias("branch"), *cols)
    out_rrf = fused.select(
        F.lit("rrf").alias("branch"),
        "query_id",
        "doc_id",
        "score",
        F.col("rank").cast("long").alias("rank"),
    )
    out_neg = neg.select(
        F.lit("hardneg").alias("branch"),
        "query_id",
        "doc_id",
        "score",
        F.col("rank").cast("long").alias("rank"),
    )
    out_all = bm_all.select(
        F.lit("bm25_all").alias("branch"),
        "query_id",
        "doc_id",
        "score",
        F.col("rank").cast("long").alias("rank"),
    )
    out_f = bmf.select(
        F.lit("bm25f").alias("branch"),
        "query_id",
        "doc_id",
        "score",
        F.col("rank").cast("long").alias("rank"),
    )
    return (
        out_bm.unionByName(out_rrf)
        .unionByName(out_neg)
        .unionByName(out_all)
        .unionByName(out_f)
    )


# --------------------------------------------------------------------------
# Exact substring dedup (operators/substring_dedup.py) — graded in r6
# --------------------------------------------------------------------------

_SPAN = 4


_PD_WM = "all rights reserved watermark"
_PD_PROMO = "subscribe to our newsletter today"


@register(
    "t_substring_dedup",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')
               AS tk
      FROM documents),
    occ AS (
      SELECT doc_id, u.pos,
             CAST(('0x' || substr(md5(
               array_to_string(list_slice(tk, u.pos + 1, u.pos + {_SPAN}), ' ')
             ), 1, 15)) AS BIGINT) AS h
      FROM toks, UNNEST(range(0, len(tk) - {_SPAN} + 1)) AS u(pos)
      WHERE len(tk) >= {_SPAN}),
    marked AS (
      SELECT doc_id, pos,
             COUNT(*) OVER (PARTITION BY h) AS cnt,
             ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
      FROM occ),
    covered AS (
      SELECT DISTINCT doc_id, c.idx
      FROM (SELECT doc_id, pos FROM marked WHERE cnt >= 2 AND rn > 1),
           UNNEST(range(pos, pos + {_SPAN})) AS c(idx)),
    cov AS (
      SELECT doc_id, list_sort(list(idx)) AS cov
      FROM covered GROUP BY doc_id),
    span_out AS (
      SELECT 'span' AS branch, t.doc_id,
             CAST(len(t.tk) AS BIGINT) AS n_units,
             CAST(COALESCE(len(c.cov), 0) AS BIGINT) AS n_removed,
             COALESCE(array_to_string(
               list_transform(
                 list_filter(range(0, len(t.tk)),
                             i -> NOT list_contains(COALESCE(c.cov, []), i)),
                 i -> t.tk[i + 1]),
               ' '), '') AS clean_text
      FROM toks t LEFT JOIN cov c USING (doc_id)),
    stagedP AS (
      SELECT doc_id, tk, len(tk) AS n,
             GREATEST(CAST(CEIL(len(tk) / 3.0) AS INT), 1) AS L
      FROM toks),
    parasRaw AS (
      SELECT doc_id,
             [array_to_string(list_slice(tk, 1, L), ' '),
              array_to_string(list_slice(tk, L + 1, 2 * L), ' '),
              array_to_string(list_slice(tk, 2 * L + 1, n), ' '),
              '{_PD_WM}']
             || CASE WHEN doc_id % 5 = 0 THEN ['{_PD_PROMO}']
                ELSE [] END AS ps
      FROM stagedP),
    pe AS (
      SELECT doc_id, u.i AS pos, ps[u.i + 1] AS para,
             regexp_replace(lower(trim(ps[u.i + 1])), '\s+', ' ', 'g')
               AS nrm
      FROM parasRaw, UNNEST(range(0, len(ps))) AS u(i)),
    ph AS (
      SELECT doc_id, pos, para, nrm,
             CAST(('0x' || substr(md5(nrm), 1, 15)) AS BIGINT) AS h
      FROM pe),
    pk AS (
      SELECT doc_id, pos, para,
             (nrm = '' OR ROW_NUMBER() OVER (
                PARTITION BY h ORDER BY doc_id, pos) = 1) AS keep
      FROM ph),
    para_out AS (
      SELECT 'para' AS branch, doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_units,
             CAST(COUNT(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_removed,
             array_to_string(
               list_transform(
                 list_sort(COALESCE(
                   list([lpad(pos::VARCHAR, 4, '0'), para])
                     FILTER (WHERE keep), [])),
                 x -> x[2]),
               chr(10) || chr(10)) AS clean_text
      FROM pk GROUP BY doc_id)
    SELECT * FROM span_out UNION ALL SELECT * FROM para_out
    """,
)
def t_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring deduplication (Lee et al. repeated-span removal),
    graded end-to-end over the documents table: every {span}-token window
    hashes row-local, spans occurring twice corpus-wide keep only their
    first (doc_id, pos) occurrence, and every other occurrence's tokens
    are removed (operators/substring_dedup.remove_repeated_spans — the
    4-token span makes the synthetic corpus's shared phrases genuinely
    exercise the keep-first + interval-merge machinery: ~2.8k tokens
    removed at sf0.001). The oracle rebuilds the pipeline in SQL: same
    60-bit md5 span hashes, the same (doc_id, pos) keep-first window,
    and covered-index removal via UNNEST(range)/DISTINCT — value- and
    hash-comparable including the rebuilt clean_text.

    Scale: span hashing is row-local; the ONE corpus-sized shuffle
    carries (hash, doc, pos) triples (linear, span-length independent);
    removal is a doc-keyed join + row-local interval merge. stride
    trades recall for shuffle size at 100 TB (see the operator module).
    """
    from ..operators.paragraph_dedup import dedup_paragraphs
    from ..operators.substring_dedup import remove_repeated_spans

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    span = remove_repeated_spans(d, span_tokens=_SPAN).select(
        F.lit("span").alias("branch"),
        "doc_id",
        F.col("n_tokens").alias("n_units"),
        F.col("n_removed_tokens").alias("n_removed"),
        "clean_text",
    )
    # paragraph branch: stage deterministic multi-paragraph documents
    # (token thirds + a watermark every doc repeats + a promo paragraph
    # on every 5th doc — the cross-document duplicates the dedup must
    # collapse to their first occurrence), then CCNet-style dedup
    toks = _tokens(F.col("text"))
    n = F.size(toks)
    L = F.greatest(F.ceil(n / F.lit(3.0)).cast("int"), F.lit(1))
    paras = F.concat(
        F.array(
            F.array_join(F.slice(toks, F.lit(1), L), " "),
            F.array_join(F.slice(toks, L + F.lit(1), L), " "),
            F.array_join(F.slice(toks, L + L + F.lit(1), n), " "),
            F.lit(_PD_WM),
        ),
        F.when(
            F.col("doc_id") % 5 == 0, F.array(F.lit(_PD_PROMO))
        ).otherwise(F.array().cast("array<string>")),
    )
    staged = d.select(
        "doc_id", F.array_join(paras, "\n\n").alias("staged")
    )
    para = dedup_paragraphs(staged, text_col="staged").select(
        F.lit("para").alias("branch"),
        "doc_id",
        F.col("n_paragraphs").alias("n_units"),
        F.col("n_removed_paragraphs").alias("n_removed"),
        "clean_text",
    )
    return span.unionAll(para)


# --------------------------------------------------------------------------
# BPE tokenizer training (graded r7 — the r6 verdict's task #2; r8
# session D upgraded it from rows-only to a FULL value oracle)
# --------------------------------------------------------------------------

_BPE_MERGES = 40


def _bpe_oracle(n_merges: int) -> str:
    r"""Unrolled BPE training in ANSI SQL — the q_pagerank/_logreg_oracle
    discipline applied to the merge loop. Words live as space-padded,
    DOUBLE-space-joined symbol strings (' h  e  l  l  o</w> '): symbols
    never contain spaces, and replace(s, ' a  b ', ' ab ') then has
    exactly the training fold's greedy left-to-right non-overlapping
    semantics — a match consumes its trailing space, so the NEXT
    adjacent occurrence still has its own leading space and matches,
    while an overlapping one (the middle 'a' of 'a a a') does not.
    Each round is one pair-count aggregate, one deterministic argmax
    (count DESC, then lexicographic pair — byte order, identical in
    Python/Spark/DuckDB for UTF-8), and one replace; an exhausted round
    (no pairs left) replaces a chr(1) sentinel, i.e. is a no-op, and
    emits no merge row — the operator's early-break."""
    parts = [r"""
    WITH w0 AS MATERIALIZED (
      SELECT s, CAST(SUM(cnt) AS BIGINT) AS weight FROM (
        SELECT ' ' || array_to_string(
                 list_concat(chars[1:len(chars)-1],
                             [chars[len(chars)] || '</w>']), '  ') || ' ' AS s,
               cnt
        FROM (
          SELECT string_split(word, '') AS chars, COUNT(*) AS cnt
          FROM (
            SELECT unnest(list_filter(regexp_split_to_array(lower(text),
                                                            '\s+'),
                                      t -> t <> '')) AS word
            FROM documents)
          GROUP BY word))
      GROUP BY s)"""]
    for i in range(1, n_merges + 1):
        p = i - 1
        parts.append(f""",
    p{i} AS MATERIALIZED (
      SELECT a, b, SUM(weight) AS c FROM (
        SELECT l[j] AS a, l[j + 1] AS b, weight FROM (
          SELECT string_split(trim(s), '  ') AS l, weight,
                 unnest(range(1, len(string_split(trim(s), '  ')))) AS j
          FROM w{p}))
      GROUP BY a, b),
    win{i} AS MATERIALIZED (
      SELECT a, b, ' ' || a || '  ' || b || ' ' AS pat,
             ' ' || a || b || ' ' AS rep
      FROM p{i} ORDER BY c DESC, a, b LIMIT 1),
    w{i} AS MATERIALIZED (
      SELECT replace(s, COALESCE((SELECT pat FROM win{i}), chr(1)),
                        COALESCE((SELECT rep FROM win{i}), chr(1))) AS s,
             weight
      FROM w{p})""")
    merge_rows = "\n    UNION ALL\n".join(
        f"    SELECT 'merge' AS kind, CAST({i - 1} AS BIGINT) AS rank,"
        f" a AS \"left\", b AS \"right\", CAST(NULL AS BIGINT) AS n"
        f" FROM win{i}"
        for i in range(1, n_merges + 1)
    )
    parts.append(f""",
    toks AS (
      SELECT string_split(trim(s), '  ') AS l, weight FROM w{n_merges})
{merge_rows}
    UNION ALL
    SELECT 'total_tokens', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(NULL AS VARCHAR), CAST(SUM(weight * len(l)) AS BIGINT)
    FROM toks
    UNION ALL
    SELECT 'distinct_tokens', NULL, NULL, NULL, COUNT(DISTINCT tok)
    FROM (SELECT unnest(l) AS tok FROM toks)
    UNION ALL
    SELECT 'n_docs', NULL, NULL, NULL, COUNT(*) FROM documents
    """)
    return "".join(parts)


@register("q_bpe_train", oracle=_bpe_oracle(_BPE_MERGES))
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE training + encoding, graded end-to-end — since r8
    session D with a FULL value oracle: the merge loop is unrolled into
    CTE SQL (_bpe_oracle — rounds as materialized CTEs, merges applied
    via double-space-joined symbol strings whose replace() semantics
    equal the training fold's greedy left-to-right pass), so the learned
    merge list AND the encoding stats hash-match DuckDB every round, on
    top of the Sennrich-reference pins in tests/test_bpe.py. Took the
    former q_approx_distinct slot per COVERAGE.md's graduation plan
    (approx_count_distinct stays verified in
    tests/test_operators.py::TestApproxDistinct).

    Output: the learned 40-merge list (kind='merge', ordered by rank — the
    values themselves, so a training regression changes the output) plus
    corpus encoding stats (total subword tokens, distinct subwords, doc
    count) from applying those merges back to the corpus.

    Scale: one corpus-sized (word, count) aggregate; training then runs
    driver-side over the vocabulary-sized table (auto route,
    operators/bpe.learn_bpe — no per-merge Spark jobs); encoding is one
    Arrow-batched pass whose plan is O(1) in the merge count.
    """
    from ..operators.bpe import bpe_encode, learn_bpe

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    merges = learn_bpe(docs, n_merges=_BPE_MERGES)
    merge_rows = local_df(
        spark,
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank bigint, left string, right string",
    ).select(F.lit("merge").alias("kind"), "rank", "left", "right",
             F.lit(None).cast("bigint").alias("n"))
    enc = bpe_encode(docs, merges)
    stats = enc.select(
        F.explode("bpe_tokens").alias("tok")
    ).agg(
        F.count(F.lit(1)).alias("total"),
        F.count_distinct(F.col("tok")).alias("distinct_toks"),
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    stat_rows = (
        stats.crossJoin(n_docs)
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("total_tokens").alias("kind"),
                        F.lit(None).cast("bigint").alias("rank"),
                        F.lit(None).cast("string").alias("left"),
                        F.lit(None).cast("string").alias("right"),
                        F.col("total").alias("n"),
                    ),
                    F.struct(
                        F.lit("distinct_tokens").alias("kind"),
                        F.lit(None).cast("bigint").alias("rank"),
                        F.lit(None).cast("string").alias("left"),
                        F.lit(None).cast("string").alias("right"),
                        F.col("distinct_toks").alias("n"),
                    ),
                    F.struct(
                        F.lit("n_docs").alias("kind"),
                        F.lit(None).cast("bigint").alias("rank"),
                        F.lit(None).cast("string").alias("left"),
                        F.lit(None).cast("string").alias("right"),
                        F.col("n_docs").alias("n"),
                    ),
                )
            ).alias("s")
        )
        .select("s.kind", "s.rank", "s.left", "s.right", "s.n")
    )
    return merge_rows.unionAll(stat_rows)


# --------------------------------------------------------------------------
# Count-Min sketch (operators/countmin.py) — graded r7 with a full oracle
# --------------------------------------------------------------------------

_CM_W, _CM_D = 256, 4
_CM_PROBES = ["the", "data", "spark", "join", "zz_never_in_corpus"]


def _cm_oracle() -> str:
    dd = ", ".join(f"({d})" for d in range(_CM_D))
    probes = ", ".join(f"('{t}')" for t in _CM_PROBES)
    from ..functions import oracle_md5_int

    cell = oracle_md5_int("('' || d || '|' || token)", 15)
    return rf"""
    WITH toks AS (
      SELECT lower(unnest(list_filter(regexp_split_to_array(text, '\s+'),
                                      t -> t <> ''))) AS token
      FROM documents),
    dd(d) AS (VALUES {dd}),
    cells AS (
      SELECT d, {cell} % {_CM_W} AS col FROM toks CROSS JOIN dd),
    sketch AS (SELECT d, col, COUNT(*) AS cnt FROM cells GROUP BY d, col),
    probes(token) AS (VALUES {probes}),
    pcells AS (
      SELECT token, d, {cell} % {_CM_W} AS col FROM probes CROSS JOIN dd),
    est AS (
      SELECT p.token, MIN(COALESCE(s.cnt, 0)) AS cnt
      FROM pcells p LEFT JOIN sketch s ON s.d = p.d AND s.col = p.col
      GROUP BY p.token)
    SELECT 'cell' AS kind, CAST(d AS INTEGER) AS d, col,
           CAST(NULL AS VARCHAR) AS token, cnt
    FROM sketch
    UNION ALL
    SELECT 'est' AS kind, CAST(NULL AS INTEGER) AS d,
           CAST(NULL AS BIGINT) AS col, token, cnt
    FROM est
    """


@register("t_count_min", oracle=_cm_oracle())
def t_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch over the corpus token stream, graded with a FULL
    value oracle (r7; took the former s_embedding_stats slot — that row
    now rides s_quantize_int8's 'norm_stats' branch): the entire
    {depth} x {width} counter table AND the min-over-cells estimates for
    a fixed probe list hash-match DuckDB, because the cell hash is the
    engine-portable md5_int and the build is pure integer counting. The
    unseen-probe row pins the collision floor.

    Scale: the cell mapping is a row-local JVM expression and the groupBy
    key space IS the sketch, so map-side combine bounds the shuffle at
    depth x width x partitions regardless of token cardinality (the same
    bounded-shuffle contract as Misra-Gries; plan-gated in
    test_countmin.py). Estimates broadcast-join the sketch.
    """
    from ..operators.countmin import count_min_build, count_min_estimate

    toks = table(spark, sf_dir, "documents").select(
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
        ).alias("token")
    )
    sketch = count_min_build(toks, "token", width=_CM_W, depth=_CM_D)
    cells = sketch.select(
        F.lit("cell").alias("kind"),
        F.col("d").cast("int").alias("d"),
        F.col("col").cast("long").alias("col"),
        F.lit(None).cast("string").alias("token"),
        F.col("cnt").cast("long").alias("cnt"),
    )
    q = local_df(spark, [(t,) for t in _CM_PROBES], "token string")
    est = count_min_estimate(sketch, q, "token", width=_CM_W, depth=_CM_D).select(
        F.lit("est").alias("kind"),
        F.lit(None).cast("int").alias("d"),
        F.lit(None).cast("long").alias("col"),
        "token",
        F.col("est_count").cast("long").alias("cnt"),
    )
    return cells.unionAll(est)
