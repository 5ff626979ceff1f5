"""Deterministic data mixing (operators/mixture.py): rate computation,
no-upsampling property, realized mixture, determinism, exclusion, and the
pure-filter plan gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seafowl_spark.operators.mixture import (
    mixture_rates,
    mixture_sample,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang"
    )


class TestRates:
    def test_binding_category_keeps_all(self, docs):
        counts = {
            r["lang"]: r["n"]
            for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        # make the rarest category the binding one with a huge target
        rare = min(counts, key=lambda c: counts[c])
        targets = {c: (0.9 if c == rare else 0.1 / (len(counts) - 1)) for c in counts}
        rates = mixture_rates(docs, targets)
        assert rates[rare] == pytest.approx(1.0)
        assert all(0 <= r <= 1.0 + 1e-12 for r in rates.values())

    def test_rates_hit_target_proportions(self, docs):
        targets = {"en": 0.5, "de": 0.25, "es": 0.25}
        rates = mixture_rates(docs, targets)
        counts = {
            r["lang"]: r["n"]
            for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        out = {c: counts[c] * r for c, r in rates.items() if r > 0}
        total = sum(out.values())
        assert out["en"] / total == pytest.approx(0.5, abs=1e-9)
        assert out["de"] / total == pytest.approx(0.25, abs=1e-9)
        # untargeted categories are excluded
        assert rates.get("zh", 0.0) == 0.0 and rates.get("fr", 0.0) == 0.0

    def test_invalid_targets_rejected(self, docs):
        with pytest.raises(ValueError):
            mixture_rates(docs, {})
        with pytest.raises(ValueError):
            mixture_rates(docs, {"en": -0.1})

    def test_absent_category_in_targets_ignored(self, docs):
        rates = mixture_rates(docs, {"en": 0.5, "klingon": 0.5})
        assert "klingon" not in rates  # only observed categories come back
        assert rates["en"] == pytest.approx(1.0)  # en binds: all targets on it


class TestSample:
    def test_realized_mixture_close_to_target(self, docs):
        out = mixture_sample(docs, {"en": 0.5, "de": 0.25, "es": 0.25})
        got = {
            r["lang"]: r["n"]
            for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        total = sum(got.values())
        assert set(got) == {"en", "de", "es"}
        # hash-bucket granularity on a 500-doc corpus: coarse tolerance
        assert got["en"] / total == pytest.approx(0.5, abs=0.1)
        assert got["de"] / total == pytest.approx(0.25, abs=0.1)

    def test_deterministic_rerun(self, docs):
        a = sorted(r.doc_id for r in mixture_sample(docs, {"en": 0.6, "zh": 0.4}).collect())
        b = sorted(r.doc_id for r in mixture_sample(docs, {"en": 0.6, "zh": 0.4}).collect())
        assert a == b and a

    def test_excluded_categories_dropped(self, docs):
        out = mixture_sample(docs, {"en": 1.0})
        assert {r.lang for r in out.collect()} == {"en"}

    def test_plan_is_pure_filter(self, docs, spark):
        out = mixture_sample(docs, {"en": 0.5, "de": 0.5})
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Python" not in plan
        assert "Filter" in plan


class TestWeightedMixture:
    def test_token_weighted_rates(self, docs, spark):
        """Mix by token mass: categories with longer docs need lower doc
        rates for the same token share."""
        from seafowl_spark.operators.mixture import mixture_rates

        d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id",
            "lang",
            F.size(F.filter(F.split("text", r"\s+"), lambda t: t != "")).alias(
                "n_tok"
            ),
        )
        targets = {"en": 0.5, "de": 0.5}
        rates = mixture_rates(d, targets, weight_col="n_tok")
        masses = {
            r["lang"]: r["m"]
            for r in d.groupBy("lang").agg(F.sum("n_tok").alias("m")).collect()
        }
        out = {c: masses[c] * r for c, r in rates.items() if r > 0}
        total = sum(out.values())
        assert out["en"] / total == pytest.approx(0.5, abs=1e-9)
        assert out["de"] / total == pytest.approx(0.5, abs=1e-9)
        # the binding category keeps everything
        assert max(rates.values()) == pytest.approx(1.0)

    def test_weighted_sample_token_share(self, spark):
        from seafowl_spark.operators.mixture import mixture_sample

        d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id",
            "lang",
            F.size(F.filter(F.split("text", r"\s+"), lambda t: t != "")).alias(
                "n_tok"
            ),
        )
        out = mixture_sample(d, {"en": 0.5, "zh": 0.5}, weight_col="n_tok")
        got = {
            r["lang"]: r["m"]
            for r in out.groupBy("lang").agg(F.sum("n_tok").alias("m")).collect()
        }
        total = sum(got.values())
        assert set(got) == {"en", "zh"}
        # per-doc hash granularity over a 500-doc corpus: coarse tolerance
        assert got["en"] / total == pytest.approx(0.5, abs=0.15)


class TestTemperatureTargets:
    """temperature_targets (r8 session D): n^alpha shares, ordered-fold
    normalizer, 1/4096 quantization for cross-engine-exact downstream
    rate arithmetic."""

    def _df(self, spark, counts):
        rows_ = [
            (f"{c}_{i}", c) for c, n in counts.items() for i in range(n)
        ]
        return spark.createDataFrame(rows_, "doc_id string, lang string")

    def test_alpha_one_is_natural_distribution(self, spark):
        from seafowl_spark.operators.mixture import temperature_targets

        df = self._df(spark, {"en": 30, "de": 10})
        t = temperature_targets(df, alpha=1.0)
        assert t["en"] == pytest.approx(0.75, abs=1 / 4096)
        assert t["de"] == pytest.approx(0.25, abs=1 / 4096)

    def test_alpha_zero_is_uniform(self, spark):
        from seafowl_spark.operators.mixture import temperature_targets

        df = self._df(spark, {"en": 30, "de": 10, "fr": 1})
        t = temperature_targets(df, alpha=0.0)
        assert all(w == pytest.approx(1 / 3, abs=1 / 4096) for w in t.values())

    def test_sqrt_upweights_tail(self, spark):
        from seafowl_spark.operators.mixture import temperature_targets

        df = self._df(spark, {"en": 90, "de": 10})
        t = temperature_targets(df, alpha=0.5)
        assert 0.10 < t["de"] < 0.5  # above natural 0.1, below uniform 0.5
        assert t["en"] > t["de"]

    def test_quantized_shares_are_binary_rationals(self, spark):
        from seafowl_spark.operators.mixture import temperature_targets

        df = self._df(spark, {"en": 7, "de": 13, "fr": 29})
        for w in temperature_targets(df, alpha=0.5).values():
            assert (w * 4096) == int(w * 4096)  # exact multiple of 2^-12

    def test_composes_with_mixture_sample_deterministically(self, spark):
        from seafowl_spark.operators.mixture import (
            mixture_sample,
            temperature_targets,
        )

        df = self._df(spark, {"en": 60, "de": 20, "fr": 5})
        t = temperature_targets(df, alpha=0.5)
        a = sorted(r["doc_id"] for r in mixture_sample(df, t).collect())
        b = sorted(r["doc_id"] for r in mixture_sample(df, t).collect())
        assert a == b and len(a) > 0
