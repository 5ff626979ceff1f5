"""Text normalization + URL parsing (operators/normalize.py): pinned
normal forms, JVM-only plan, and domain grouping keys."""

import pyspark.sql.functions as F

from seafowl_spark.operators.normalize import (
    extract_domain,
    extract_registrable_domain,
    normalize_text,
)


class TestNormalizeText:
    def test_pinned_forms(self, spark):
        cases = [
            ("  hello   world  ", "hello world"),
            ("tab\tand\nnewline\r\nmix", "tab and newline mix"),
            ("nbsp and em-space", "nbsp and em-space"),
            ("zero​width﻿gone", "zerowidthgone"),
            ("ctrl\x00\x1fchars\x7f", "ctrlchars"),
            ("ideographic　space", "ideographic space"),
            ("", ""),
        ]
        df = spark.createDataFrame(cases, ["raw", "want"])
        got = df.select("want", normalize_text(F.col("raw")).alias("got")).collect()
        for r in got:
            assert r["got"] == r["want"]

    def test_lowercase_flag_and_jvm_only(self, spark):
        df = spark.createDataFrame([("MiXeD  Case",)], ["raw"])
        out = df.select(normalize_text(F.col("raw"), lowercase=True).alias("t"))
        assert out.collect()[0]["t"] == "mixed case"
        p = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in p and "Exchange" not in p

    def test_normalization_stabilizes_dedup_keys(self, spark):
        # the point: visually-identical docs hash identically post-normalize
        df = spark.createDataFrame(
            [(1, "the  cat\tsat"), (2, "the cat sat")], ["id", "t"]
        )
        got = df.select(
            F.md5(normalize_text(F.col("t"))).alias("h")
        ).distinct().count()
        assert got == 1


class TestDomains:
    def test_hosts_and_registrable(self, spark):
        cases = [
            ("https://WWW.Example.COM/path?q=1", "www.example.com", "example.com"),
            ("http://news.bbc.co.uk/x", "news.bbc.co.uk", "bbc.co.uk"),
            ("sub.a.com.au", "sub.a.com.au", "a.com.au"),
            ("example.org", "example.org", "example.org"),
            ("ftp://files.example.net:21/a", "files.example.net", "example.net"),
            ("localhost", "localhost", "localhost"),
        ]
        df = spark.createDataFrame(cases, ["url", "want_host", "want_reg"])
        got = df.select(
            "want_host",
            "want_reg",
            extract_domain(F.col("url")).alias("host"),
            extract_registrable_domain(F.col("url")).alias("reg"),
        ).collect()
        for r in got:
            assert r["host"] == r["want_host"], r
            assert r["reg"] == r["want_reg"], r

    def test_domain_caps_compose(self, spark):
        from seafowl_spark.operators.sampling import cap_per_group

        rows = [(i, f"https://site{i % 2}.com/p{i}") for i in range(20)]
        df = spark.createDataFrame(rows, ["doc_id", "url"]).withColumn(
            "domain", extract_registrable_domain(F.col("url"))
        )
        out = cap_per_group(df, "domain", 3)
        counts = {
            r["domain"]: r["n"]
            for r in out.groupBy("domain").agg(F.count("*").alias("n")).collect()
        }
        assert counts == {"site0.com": 3, "site1.com": 3}
