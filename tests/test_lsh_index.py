"""Persisted MinHash-LSH near-dup index (operators/lsh_index.py):
lookup parity with the ad-hoc cross-corpus checker, bucket partition
pruning, append == rebuild, and the streaming ingest-with-dedup stage."""

import pytest
from pyspark.sql import functions as F

from seafowl_spark.operators.cross_contamination import cross_contamination
from seafowl_spark.operators.lsh_index import (
    append_lsh_index,
    ingest_with_dedup,
    neardup_lookup,
    write_lsh_index,
)

BASE = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "a completely different document about spark shuffle partitions and joins"),
    (3, "the quick brown fox jumps over the lazy dog near the river bend"),
    (4, "numerical linear algebra routines decompose matrices into simpler factors"),
    (5, "streaming state stores checkpoint their changelog to remote storage"),
]
# 10 is a near-dup of 1/3; 11 is novel
NEW = [
    (10, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (11, "wholly novel content mentioning nothing seen before in this corpus"),
]


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(BASE, ["doc_id", "text"])


@pytest.fixture()
def newdocs(spark):
    return spark.createDataFrame(NEW, ["doc_id", "text"])


class TestLshIndex:
    def test_lookup_matches_adhoc_cross_check(self, spark, tmp_path, corpus, newdocs):
        idx = str(tmp_path / "lsh")
        write_lsh_index(corpus, idx, n_buckets=16)
        got = {
            (r["new_id"], r["index_id"]): r["est_jaccard"]
            for r in neardup_lookup(spark, idx, newdocs, threshold=0.5).collect()
        }
        want = {
            (r["eval_id"], r["train_id"]): r["est_jaccard"]
            for r in cross_contamination(
                corpus, newdocs, threshold=0.5
            ).collect()
        }
        assert got == want
        assert any(k[0] == 10 for k in got)  # the near-dup is found
        assert not any(k[0] == 11 for k in got)  # the novel doc is clean

    def test_probe_prunes_partitions(self, spark, tmp_path, corpus, newdocs):
        import glob
        import re

        idx = str(tmp_path / "lsh")
        write_lsh_index(corpus, idx, n_buckets=16)
        n_parts = len(glob.glob(f"{idx}/bands/bucket=*"))
        one = newdocs.where(F.col("doc_id") == 11)
        out = neardup_lookup(spark, idx, one, threshold=0.0)
        formatted = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        # the bands scan carries an explicit bucket partition filter
        # bounded by the probe's band keys (<= 4 for one doc), while the
        # index holds strictly more partitions (the serving contract —
        # same gate shape as TestIndexServing's bm25 check)
        m = re.search(
            r"bucket#\d+ (?:IN \(([^)]*)\)|INSET ([0-9, ]+))", formatted
        )
        assert m, formatted
        n_probed = len((m.group(1) or m.group(2)).split(","))
        assert n_probed <= 4 < n_parts

    def test_append_equals_rebuild(self, spark, tmp_path, corpus, newdocs):
        a = str(tmp_path / "appended")
        b = str(tmp_path / "rebuilt")
        write_lsh_index(corpus, a, n_buckets=16)
        append_lsh_index(newdocs, a)
        write_lsh_index(corpus.unionByName(newdocs), b, n_buckets=16)
        rows_a = sorted(
            map(tuple, spark.read.parquet(f"{a}/bands").collect())
        )
        rows_b = sorted(
            map(tuple, spark.read.parquet(f"{b}/bands").collect())
        )
        assert rows_a == rows_b

    def test_ingest_gate_rejects_dups_accepts_novel(
        self, spark, tmp_path, corpus, newdocs
    ):
        idx = str(tmp_path / "lsh")
        write_lsh_index(corpus, idx, n_buckets=16)
        accepted, dups = ingest_with_dedup(spark, idx, newdocs, threshold=0.5)
        assert [r["doc_id"] for r in accepted.collect()] == [11]
        assert {r["new_id"] for r in dups.collect()} == {10}
        # the accepted doc is now part of the index: re-ingesting it dedups
        again = spark.createDataFrame(
            [(20, NEW[1][1] + " extra")], ["doc_id", "text"]
        )
        _acc2, dups2 = ingest_with_dedup(spark, idx, again, threshold=0.5)
        assert {r["index_id"] for r in dups2.collect()} == {11}

    def test_streaming_ingest_with_dedup(self, spark, tmp_path, corpus):
        """The stream-ingest gate: each micro-batch looks up near-dups
        against the PERSISTED index and appends only clean docs — the
        index itself is the cross-batch dedup state (no unbounded
        streaming state), same shape as the BM25/IVF-PQ stream-to-index
        tests."""
        import json

        idx = str(tmp_path / "lsh")
        write_lsh_index(corpus, idx, n_buckets=16)
        src = tmp_path / "src"
        src.mkdir()
        (src / "b0.json").write_text(
            json.dumps({"doc_id": 10, "text": NEW[0][1]}) + "\n"
            + json.dumps({"doc_id": 11, "text": NEW[1][1]}) + "\n"
        )
        accepted_ids = []

        def gate(batch_df, _bid):
            acc, _d = ingest_with_dedup(
                spark, idx, batch_df.localCheckpoint(), threshold=0.5
            )
            accepted_ids.extend(r["doc_id"] for r in acc.collect())

        stream = spark.readStream.schema("doc_id long, text string").json(
            str(src)
        )
        q = (
            stream.writeStream.foreachBatch(gate)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert accepted_ids == [11]
        # second batch: a near-dup of the doc batch 1 ingested is caught
        (src / "b1.json").write_text(
            json.dumps({"doc_id": 12, "text": NEW[1][1] + " and more"}) + "\n"
        )
        q2 = (
            stream.writeStream.foreachBatch(gate)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(120)
        assert accepted_ids == [11]  # 12 rejected as dup of 11

    def test_local_probe_list_matches_dataframe_path(
        self, spark, tmp_path, corpus
    ):
        """The serving fast path (r13: probe passed as a driver-local
        [(id, text)] list — signatures via the SAME python the Arrow UDF
        runs, band/bucket via the SAME JVM expressions over a
        LocalRelation) must return exactly what the DataFrame path
        returns, including for a probe with < 3 tokens (no shingles)."""
        idx = str(tmp_path / "lsh")
        write_lsh_index(corpus, idx, n_buckets=16)
        probes = NEW + [(12, "too short")]
        df_probe = spark.createDataFrame(probes, ["doc_id", "text"])
        via_df = sorted(
            tuple(r) for r in neardup_lookup(
                spark, idx, df_probe, threshold=0.0
            ).collect()
        )
        via_list = sorted(
            tuple(r) for r in neardup_lookup(
                spark, idx, list(probes), threshold=0.0
            ).collect()
        )
        assert via_list == via_df
        assert via_list  # non-degenerate: the near-dup pair is present

    def test_local_probe_list_string_ids(self, spark, tmp_path):
        sbase = [(f"d{i}", t) for i, t in BASE]
        snew = [(f"n{i}", t) for i, t in NEW]
        corpus = spark.createDataFrame(sbase, ["doc_id", "text"])
        idx = str(tmp_path / "lsh_s")
        write_lsh_index(corpus, idx, n_buckets=16)
        via_df = sorted(
            tuple(r) for r in neardup_lookup(
                spark, idx, spark.createDataFrame(snew, ["doc_id", "text"]),
                threshold=0.5,
            ).collect()
        )
        via_list = sorted(
            tuple(r) for r in neardup_lookup(
                spark, idx, snew, threshold=0.5
            ).collect()
        )
        assert via_list == via_df

    def test_local_probe_empty_and_shingleless(self, spark, tmp_path, corpus):
        idx = str(tmp_path / "lsh")
        write_lsh_index(corpus, idx, n_buckets=16)
        # every probe shingle-less -> empty frame with the right schema
        out = neardup_lookup(spark, idx, [(7, "one two")], threshold=0.0)
        assert out.count() == 0
        assert [f.name for f in out.schema.fields] == [
            "new_id", "index_id", "n_equal_sigs", "est_jaccard",
        ]


# slow tier (r14): multi-minute stress/matrix class, excluded
# from the default gate (opt in with --runslow / -m slow)
@pytest.mark.slow
class TestCompaction:
    def test_compact_preserves_rows_and_prunes_files(
        self, spark, tmp_path, corpus, newdocs
    ):
        import glob

        from seafowl_spark.operators.lsh_index import compact_lsh_index

        idx = str(tmp_path / "lsh")
        write_lsh_index(corpus, idx, n_buckets=8)
        for i in range(3):  # several ingest batches -> small files pile up
            batch = newdocs.withColumn(
                "doc_id", F.col("doc_id") + F.lit(i * 100)
            )
            append_lsh_index(batch, idx)
        before_rows = sorted(
            map(tuple, spark.read.parquet(f"{idx}/bands").collect())
        )
        n_files_before = len(glob.glob(f"{idx}/bands/bucket=*/*.parquet"))
        compact_lsh_index(spark, idx)
        after_rows = sorted(
            map(tuple, spark.read.parquet(f"{idx}/bands").collect())
        )
        n_files_after = len(glob.glob(f"{idx}/bands/bucket=*/*.parquet"))
        assert after_rows == before_rows
        assert n_files_after < n_files_before
        n_buckets = len(glob.glob(f"{idx}/bands/bucket=*"))
        assert n_files_after == n_buckets  # one file per bucket
        # lookups still work and still prune
        hits = neardup_lookup(spark, idx, newdocs, threshold=0.5).count()
        assert hits > 0


# slow tier (r14): multi-minute stress/matrix class, excluded
# from the default gate (opt in with --runslow / -m slow)
@pytest.mark.slow
class TestIntraBatchDedup:
    def test_batch_internal_neardups_gated(self, spark, tmp_path, corpus):
        """Two near-identical docs in ONE batch, neither matching the
        index: only the lower id may enter (review finding: the gate
        previously only checked index-vs-batch)."""
        idx = str(tmp_path / "lsh")
        write_lsh_index(corpus, idx, n_buckets=16)
        base = (
            "completely novel sentence about gradient descent on curved "
            "manifolds with momentum and adaptive learning rates in very "
            "large models"
        )
        twins = spark.createDataFrame(
            [(30, base + " today"), (31, base + " tonight")],
            ["doc_id", "text"],
        )
        accepted, dups = ingest_with_dedup(spark, idx, twins, threshold=0.5)
        assert [r["doc_id"] for r in accepted.collect()] == [30]
        pairs = {(r["new_id"], r["index_id"]) for r in dups.collect()}
        assert (31, 30) in pairs


class TestIngestSurvivorRule:
    """Greedy min-id survivor selection must be INDEX-AWARE: a batch doc
    rejected by the index suppresses nobody, and dup_pairs never reports
    an index_id that did not actually enter (or already live in) the
    index."""

    @staticmethod
    def _triangle():
        # deterministic under the module's fixed md5/affine permutations:
        # sig agreement X-B = 8/16 (band-collides), B-C = 7/16
        # (band-collides), X-C = 0/16 (no collision) — verified offline
        m = [f"m2x{i}" for i in range(24)]
        a = [f"a2x{i}" for i in range(4)]
        z = [f"z2x{i}" for i in range(24)]
        q = [f"q2x{i}" for i in range(4)]
        return " ".join(m + a), " ".join(m + z), " ".join(z + q)

    def test_index_rejected_doc_suppresses_nobody(self, spark, tmp_path):
        X, B, C = self._triangle()
        path = str(tmp_path / "tri_idx")
        write_lsh_index(
            spark.createDataFrame([(1, X)], "doc_id bigint, text string"), path
        )
        batch = spark.createDataFrame(
            [(100, B), (200, C)], "doc_id bigint, text string"
        )
        accepted, dups = ingest_with_dedup(spark, path, batch, threshold=0.3)
        # B (100) is a near-dup of index doc 1 -> rejected. C (200) is a
        # near-dup ONLY of B; B never entered the index, so C survives.
        assert sorted(r["doc_id"] for r in accepted.collect()) == [200]
        pairs = {(r["new_id"], r["index_id"]) for r in dups.collect()}
        assert (100, 1) in pairs
        # no pair may cite the rejected doc 100 as a surviving index_id
        assert all(ix != 100 for _, ix in pairs)
        # and C's later lookups hit the index through C itself
        again = neardup_lookup(
            spark,
            path,
            spark.createDataFrame([(300, C)], "doc_id bigint, text string"),
            threshold=0.3,
        )
        assert {(r["new_id"], r["index_id"]) for r in again.collect()} == {(300, 200)}

    def test_intra_batch_chain_reports_only_survivors(self, spark, tmp_path):
        path = str(tmp_path / "chain_idx")
        write_lsh_index(
            spark.createDataFrame(
                [(1, "wholly unrelated seed document about storage engines")],
                "doc_id bigint, text string",
            ),
            path,
        )
        d = "the quick brown fox jumps over the lazy dog near the river bank"
        batch = spark.createDataFrame(
            [(10, d), (20, d), (30, d)], "doc_id bigint, text string"
        )
        accepted, dups = ingest_with_dedup(spark, path, batch, threshold=0.5)
        assert sorted(r["doc_id"] for r in accepted.collect()) == [10]
        pairs = {(r["new_id"], r["index_id"]) for r in dups.collect()}
        # 20 and 30 are dups OF THE SURVIVOR 10 — never of each other
        # (20 is not entering the index, so (30, 20) must not appear)
        assert pairs == {(20, 10), (30, 10)}


class TestStringIdTombstones:
    def test_delete_masks_string_id_docs(self, spark, tmp_path):
        """Tombstones store ids as STRING: a long-cast mask would turn
        string ids into NULLs and silently serve deleted documents."""
        from seafowl_spark.operators.lsh_index import (
            delete_from_lsh_index,
            neardup_lookup,
            write_lsh_index,
        )

        base = "the quick brown fox jumps over the lazy dog again and again"
        docs = spark.createDataFrame(
            [("alpha", base), ("beta", base + " tail"),
             ("gamma", "entirely different words about other things here")],
            ["doc_id", "text"],
        )
        idx = str(tmp_path / "sid_idx")
        write_lsh_index(docs, idx, n_buckets=8)
        probe = spark.createDataFrame(
            [("probe", base + " extra")], ["doc_id", "text"]
        )
        before = {
            r.index_id
            for r in neardup_lookup(
                spark, idx, probe, threshold=0.2, exclude_self=False
            ).collect()
        }
        assert "alpha" in before
        delete_from_lsh_index(
            docs.where("doc_id = 'alpha'"), idx
        )
        after = {
            r.index_id
            for r in neardup_lookup(
                spark, idx, probe, threshold=0.2, exclude_self=False
            ).collect()
        }
        assert "alpha" not in after and "beta" in after
