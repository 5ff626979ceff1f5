"""Stage-2 training-data pipeline operators (queries/pipeline.py):
connected-components dedup, PII scan/redaction, contamination check,
stratified sampling. The DuckDB oracle gate re-proves exact values at
sf0.01; these tests assert the structural invariants at sf0.001."""

from pyspark.sql import functions as F

from seafowl_spark.queries import load_all

SF_DIR = "/root/testdata/sf0.001"

REG = load_all()


def _q(name, spark, sf_dir=SF_DIR):
    return REG[name].fn(spark, sf_dir)


class TestDedupComponents:
    def test_partition_invariants(self, spark):
        out = _q("d_dedup_components", spark).collect()
        n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
        assert len(out) == n_docs  # every doc labeled exactly once
        by_comp = {}
        for r in out:
            by_comp.setdefault(r.component_id, []).append(r)
        for comp, members in by_comp.items():
            # component id is the min member; exactly one canonical row
            assert comp == min(m.doc_id for m in members)
            assert sum(m.is_canonical for m in members) == 1
            assert all(m.component_size == len(members) for m in members)

    def test_propagation_at_int64_extremes(self, spark):
        """r4 verdict: the old convergence detector summed int64 labels,
        which wraps at extreme id ranges. The changed-label-count detector
        must converge correctly on a graph whose label sums overflow
        int64 (ids near 2^62: any two sum past 2^63-1)."""
        from seafowl_spark.queries.pipeline import propagate_min_labels

        big = 1 << 62
        # path graph big+0 - big+1 - big+2 plus an isolated edge pair:
        # diameter 2 forces multiple rounds; every round's label sum wraps
        pairs = [(big, big + 1), (big + 1, big + 2), (big + 10, big + 11)]
        edges = spark.createDataFrame(
            pairs + [(b, a) for a, b in pairs], "src long, dst long"
        )
        labels = {r.doc_id: r.comp for r in propagate_min_labels(spark, edges).collect()}
        assert labels == {
            big: big, big + 1: big, big + 2: big,
            big + 10: big + 10, big + 11: big + 10,
        }

    def test_reliable_checkpoint_dir(self, spark, tmp_path, monkeypatch):
        import os

        from seafowl_spark.queries.pipeline import propagate_min_labels

        ckpt = str(tmp_path / "ckpt")
        monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", ckpt)
        edges = spark.createDataFrame(
            [(1, 2), (2, 1)], "src long, dst long"
        )
        labels = {r.doc_id: r.comp for r in propagate_min_labels(spark, edges).collect()}
        assert labels == {1: 1, 2: 1}
        # reliable checkpoints actually landed in the directory
        assert any(files for _r, _d, files in os.walk(ckpt))

    def test_pairs_land_in_same_component(self, spark):
        from seafowl_spark.queries.pipeline import COMPONENT_MIN_EQUAL_SIGS
        from seafowl_spark.queries.similarity import s_minhash_lsh_pairs

        pairs = (
            s_minhash_lsh_pairs(spark, SF_DIR)
            .where(F.col("n_equal_sigs") >= COMPONENT_MIN_EQUAL_SIGS)
            .collect()
        )
        comp = {
            r.doc_id: r.component_id
            for r in _q("d_dedup_components", spark).collect()
        }
        for p in pairs:
            assert comp[p.doc_a] == comp[p.doc_b]


class TestPiiScan:
    def test_seeded_pii_found_and_redacted(self, spark):
        out = {r.doc_id: r for r in _q("t_pii_scan", spark).collect()}
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
        for d in docs:
            r = out[d.doc_id]
            if d.doc_id % 7 == 0:
                assert r.n_emails >= 1
            elif d.doc_id % 7 == 1:
                assert r.n_phones >= 1
            elif d.doc_id % 7 == 2:
                assert r.n_ips >= 1

    def test_redaction_changes_only_pii_docs(self, spark):
        # docs seeded with PII get a redacted text that differs from the
        # augmented text; a doc with no PII hits redacts to itself
        out = _q("t_pii_scan", spark)
        clean = out.where(
            (F.col("n_emails") == 0) & (F.col("n_phones") == 0) & (F.col("n_ips") == 0)
        ).count()
        assert clean > 0  # doc_id % 7 in {3..6} with no accidental matches


class TestContamination:
    def test_only_train_docs_reported(self, spark):
        from seafowl_spark.queries.pipeline import _EVAL_MOD
        from seafowl_spark.functions import md5_int

        out = _q("t_contamination", spark)
        evals = out.where(
            md5_int(F.col("doc_id").cast("string")) % _EVAL_MOD == 0
        ).count()
        assert evals == 0
        assert out.where(F.col("n_shared_shingles") < 1).count() == 0


class TestStratifiedSample:
    def test_deterministic_and_rate_bounded(self, spark):
        a = sorted(
            (r.branch, r.doc_id)
            for r in _q("t_sample_stratified", spark).collect()
        )
        b = sorted(
            (r.branch, r.doc_id)
            for r in _q("t_sample_stratified", spark).collect()
        )
        assert a == b  # re-run == same sample (both branches)
        out = _q("t_sample_stratified", spark).collect()
        assert all(
            r.bucket < r.rate_pct for r in out if r.branch == "rate"
        )
        assert all(r.sel_key is not None for r in out if r.branch == "dsir")

    def test_en_downsampled_hardest(self, spark):
        from seafowl_spark.queries.pipeline import _SAMPLE_RATES

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        totals = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        kept = {
            r.lang: r.n
            for r in _q("t_sample_stratified", spark)
            .where(F.col("branch") == "rate")  # dsir branch picks en docs
            .groupBy("lang")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        # kept fraction can never exceed ~rate + hash noise; with 100
        # buckets the binomial bound is loose, so just assert ordering:
        # en keeps a smaller fraction than the most-kept tail language
        if "en" in kept and totals.get("en", 0) >= 20:
            en_frac = kept["en"] / totals["en"]
            tail = [
                kept.get(lang, 0) / totals[lang]
                for lang in totals
                if lang != "en" and totals[lang] >= 10
            ]
            if tail:
                assert en_frac <= max(tail) + 0.25
        assert _SAMPLE_RATES["en"] < min(
            v for k, v in _SAMPLE_RATES.items() if k != "en"
        )


class TestMinhashSignatureValues:
    def test_minhash_signature_values(self, spark):
        """Per-row signature parity vs a pure-Python reference — kept as a
        pytest since the s_minhash_signatures registry row was absorbed
        into s_minhash_lsh_pairs (r6): a uniform signature distortion that
        preserves equality structure would survive the pairs oracle, so
        exact values are pinned here."""
        import hashlib

        from seafowl_spark.queries.similarity import (
            MINHASH_A,
            MINHASH_B,
            MINHASH_P,
            _minhash_sigs_df,
        )

        def ref_sig(text):
            toks = [t for t in text.split(" ") if t]
            if len(toks) < 3:
                return None
            seen, sh = set(), []
            for i in range(len(toks) - 2):
                s = " ".join(toks[i : i + 3])
                if s not in seen:
                    seen.add(s)
                    sh.append(s)
            hh = [int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in sh]
            return [
                min((a * h + b) % MINHASH_P for h in hh)
                for a, b in zip(MINHASH_A, MINHASH_B)
            ]

        docs = {
            r.doc_id: r.text
            for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .orderBy("doc_id")
            .limit(5)
            .collect()
        }
        got = {
            r.doc_id: list(r.sigs)
            for r in _minhash_sigs_df(spark, SF_DIR)
            .where(F.col("doc_id").isin(list(docs)))
            .collect()
        }
        checked = 0
        for doc_id, text in docs.items():
            expect = ref_sig(text)
            if expect is None:
                continue
            assert got[doc_id] == expect, doc_id
            checked += 1
        assert checked >= 3
