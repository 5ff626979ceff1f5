"""Engine x pipeline integration: the corpus LIVES in engine-managed
(deltalite) tables and the LLM-pipeline operators run over DataFrames the
engine serves — the workflow a reference user actually runs after
switching (ingest -> SQL curation -> operator passes -> versioned
results -> time travel back). No stage is new; the point is that the SQL
plane (DDL/DML/time travel/system tables) and the operator plane
(dedup/quality/sampling) compose on the same tables.

Flow under test:
    CREATE EXTERNAL TABLE (staging, testdata parquet)
      -> CTAS into a versioned corpus table
      -> operator pass over ctx-served frame (exact dedup + quality)
      -> results registered as a view, CTAS into a curated table
      -> engine DML cleanup (DELETE short docs) on the curated table
      -> time travel reads the pre-DELETE corpus for an A/B count
      -> MinHash near-dup pairs over the ENGINE table == over raw parquet
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="class")
def corpus_ctx(spark, tmp_path_factory):
    from seafowl_spark.engine.context import SeafowlContext

    ctx = SeafowlContext(
        spark, str(tmp_path_factory.mktemp("engine_pipe") / "data")
    )
    ctx.execute(
        "CREATE EXTERNAL TABLE raw_docs STORED AS PARQUET "
        f"LOCATION '{SF_DIR}/documents.parquet'"
    )
    ctx.execute(
        "CREATE TABLE corpus AS "
        "SELECT doc_id, lang, source, n_chars, text FROM staging.raw_docs"
    )
    return ctx


class TestEnginePipelineIntegration:
    def test_ingest_matches_source(self, corpus_ctx, spark):
        n_src = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
        n = corpus_ctx.execute("SELECT count(*) AS n FROM corpus").collect()[0]["n"]
        assert n == n_src > 0

    def test_operator_pass_over_engine_table(self, corpus_ctx):
        """Exact dedup + quality scoring run on the frame the ENGINE
        serves, and the curated result lands back as an engine table via
        CTAS over a registered view."""
        from seafowl_spark.functions import md5_int

        docs = corpus_ctx.execute("SELECT * FROM corpus")
        # exact dedup: normalized-text hash, keep lowest doc_id
        fp = md5_int(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))), 15)
        w = F.min("doc_id").over
        from pyspark.sql.window import Window

        keep = (
            docs.withColumn("__fp", fp)
            .withColumn("__keep", F.min("doc_id").over(Window.partitionBy("__fp")))
            .where(F.col("doc_id") == F.col("__keep"))
            .drop("__fp", "__keep")
        )
        # quality gate: token count in a sane band
        toks = F.size(F.filter(F.split("text", r"\s+"), lambda t: t != ""))
        curated = keep.where((toks >= 5) & (toks <= 5000))
        curated.createOrReplaceTempView("__curated_docs")
        corpus_ctx.execute(
            "CREATE TABLE curated AS SELECT * FROM __curated_docs"
        )
        n_corpus = corpus_ctx.execute(
            "SELECT count(*) AS n FROM corpus"
        ).collect()[0]["n"]
        n_cur = corpus_ctx.execute(
            "SELECT count(*) AS n FROM curated"
        ).collect()[0]["n"]
        assert 0 < n_cur <= n_corpus
        # curation only shrinks and only keeps corpus ids
        extra = corpus_ctx.execute(
            "SELECT count(*) AS n FROM curated "
            "WHERE doc_id NOT IN (SELECT doc_id FROM corpus)"
        ).collect()[0]["n"]
        assert extra == 0

    def test_dml_cleanup_and_time_travel(self, corpus_ctx):
        """Engine DML curates further (DELETE short docs), the pre-DELETE
        corpus stays reachable by version time travel, and the system
        table records both versions."""
        before = corpus_ctx.execute(
            "SELECT count(*) AS n FROM curated"
        ).collect()[0]["n"]
        v_before = corpus_ctx.delta_table("curated").latest_version()
        corpus_ctx.execute("DELETE FROM curated WHERE n_chars < 100")
        after = corpus_ctx.execute(
            "SELECT count(*) AS n FROM curated"
        ).collect()[0]["n"]
        assert after < before
        # the pre-DELETE version still serves the full curated corpus
        n_tt = corpus_ctx.execute(
            f"SELECT count(*) AS n FROM curated FOR VERSION AS OF {v_before}"
        ).collect()[0]["n"]
        assert n_tt == before
        versions = [
            r["version"]
            for r in corpus_ctx.execute(
                "SELECT version FROM system.table_versions "
                "WHERE table_name = 'curated' ORDER BY version"
            ).collect()
        ]
        assert versions == list(range(v_before + 2))

    def test_lsh_index_from_engine_table_matches_parquet(
        self, corpus_ctx, spark, tmp_path
    ):
        """The persisted LSH dedup index built from the ENGINE-served
        frame answers lookups for the raw-parquet frame with perfect
        self-matches — the engine's serving plane is transparent to the
        operator suite (same minhash signatures either way)."""
        from seafowl_spark.operators.lsh_index import (
            neardup_lookup,
            write_lsh_index,
        )

        eng = corpus_ctx.execute("SELECT doc_id, text FROM corpus")
        idx = str(tmp_path / "lsh_engine")
        write_lsh_index(eng, idx, n_buckets=16)

        # id-offset probe batch: same texts, "new" ids — every probe must
        # hit its engine-indexed twin at est_jaccard 1.0 (same-id pairs
        # are excluded by the lookup's contract, so the offset makes the
        # equivalence observable)
        raw = (
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select(
                (F.col("doc_id") + 10_000).alias("doc_id"), "text"
            )
            .limit(50)
        )
        hits = neardup_lookup(spark, idx, raw, threshold=0.99)
        twins = {
            r["new_id"]
            for r in hits.where(
                (F.col("new_id") - 10_000 == F.col("index_id"))
                & (F.col("est_jaccard") == 1.0)
            ).collect()
        }
        assert twins == {r["doc_id"] for r in raw.collect()}
