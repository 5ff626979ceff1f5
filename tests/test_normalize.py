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


class TestCanonicalizeUrl:
    def test_canonical_forms(self, spark):
        from pyspark.sql import functions as F

        from seafowl_spark.operators.normalize import canonicalize_url

        cases = [
            ("HTTPS://Example.COM:443/Path/?utm_source=x&q=1#frag",
             "https://example.com/Path/?q=1"),
            ("http://Example.com:80/a/", "http://example.com/a"),
            ("https://example.com/a?utm_campaign=c&utm_medium=m",
             "https://example.com/a"),
            ("https://example.com/a?x=1&fbclid=abc&y=2",
             "https://example.com/a?x=1&y=2"),
            ("https://example.com/", "https://example.com/"),
            ("https://example.com/a", "https://example.com/a"),
            ("https://example.com/a?gclid=1&ref=tw",
             "https://example.com/a"),
        ]
        df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)], "i int, u string")
        got = {
            r["i"]: r["c"]
            for r in df.select("i", canonicalize_url(F.col("u")).alias("c")).collect()
        }
        for i, (_, want) in enumerate(cases):
            assert got[i] == want, (cases[i][0], got[i])

    def test_dedup_key_collapses_tracking_variants(self, spark):
        from pyspark.sql import functions as F

        from seafowl_spark.operators.normalize import canonicalize_url

        urls = [
            "https://a.com/x?utm_source=tw",
            "HTTPS://A.com/x",
            "https://a.com:443/x#top",
            "https://b.com/y",
        ]
        df = spark.createDataFrame([(u,) for u in urls], "u string")
        n = (
            df.select(canonicalize_url(F.col("u")).alias("c"))
            .distinct()
            .count()
        )
        assert n == 2

    def test_oracle_mirror_matches_spark(self, spark):
        """canonicalize_url_oracle_sql (the RE2-safe DuckDB mirror that
        grades the t_pii_scan canon_url column) must agree with the
        Spark operator on every rule and on non-URL/empty inputs."""
        import duckdb

        from seafowl_spark.operators.normalize import (
            canonicalize_url,
            canonicalize_url_oracle_sql,
        )

        urls = [
            "HTTPS://WWW.Ex0.COM:443/Path/1/?utm_source=f&q=1&utm_campaign=a#z",
            "https://Example.com:443/Path/3/",
            "http://a.b.C.com:80?fbclid=abc",
            "https://x.com/p?q=17&ref=x&y=2",
            "https://x.com:443",
            "http://x.com:8080/keep:80/",
            "  https://Y.com/a/b/  ",
            "ftp://Host.Com/File",
            "https://x.com/?utm_id=1",
            "https://x.com/p/?ref_src=tw&q=2",
            "not a url",
            "",
        ]
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        got = [r[0] for r in df.select(canonicalize_url(F.col("url"))).collect()]
        con = duckdb.connect()
        sql = canonicalize_url_oracle_sql("url")
        want = [
            con.execute(f"SELECT {sql} FROM (SELECT ? AS url)", [u]).fetchone()[0]
            for u in urls
        ]
        assert got == want
