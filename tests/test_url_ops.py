"""URL canonicalization batteries (functions/url_ops.py)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _canon(spark, urls):
    from spark_binlog_spark.functions.url_ops import canonicalize_urls

    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "id long, url string")
    return {
        r["id"]: r.asDict() for r in canonicalize_urls(df).orderBy("id").collect()
    }


class TestCanonicalize:
    def test_case_ports_params_fragment(self, spark):
        got = _canon(
            spark,
            [
                "HTTP://WWW.Example.COM:80/A/b?utm_source=x&b=2&a=1#frag",
                "http://www.example.com/A/b?a=1&b=2",
                "https://example.com:443/x",
                "https://example.com:80/x",  # NON-default for https: kept
                "http://example.com:8080/x",
            ],
        )
        # messy variant 0 collapses onto clean variant 1
        assert got[0]["canonical"] == got[1]["canonical"] == "http://www.example.com/A/b?a=1&b=2"
        assert got[2]["canonical"] == "https://example.com/x"
        assert got[3]["canonical"] == "https://example.com:80/x"
        assert got[4]["canonical"] == "http://example.com:8080/x"

    def test_tracking_only_query_and_no_query(self, spark):
        got = _canon(
            spark,
            [
                "http://h.io/p?utm_source=a&utm_medium=b&gclid=1&fbclid=2",
                "http://h.io/p",
                "http://h.io",  # no path at all: no spurious '/'
            ],
        )
        assert got[0]["canonical"] == "http://h.io/p"
        assert got[1]["canonical"] == "http://h.io/p"
        assert got[2]["canonical"] == "http://h.io"

    def test_path_case_and_param_values_preserved(self, spark):
        got = _canon(spark, ["https://H.io/CaseSensitive/Path?Z=UPPER&a=MiXeD"])
        assert got[0]["canonical"] == "https://h.io/CaseSensitive/Path?Z=UPPER&a=MiXeD"
        assert got[0]["path_norm"] == "/CaseSensitive/Path"

    def test_schemeless_garbage_degrades_to_empty_parts(self, spark):
        got = _canon(spark, ["not a url at all", ""])
        assert got[0]["scheme"] == "" and got[0]["host"] == ""
        assert got[1]["canonical"] == "://"  # degenerate but deterministic

    def test_whole_stage_codegen_no_python(self, spark):
        """The canonicalizer is pure Catalyst expressions: the plan
        must contain no Python evals (BatchEvalPython / ArrowEval)."""
        from spark_binlog_spark.functions.url_ops import canonicalize_urls

        df = spark.createDataFrame([(1, "http://x.io/a?b=1")], "id long, url string")
        plan = canonicalize_urls(df)._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan

    def test_host_stats_counts_collapsed_dups(self, spark):
        from spark_binlog_spark.functions.url_ops import url_host_stats

        urls = [
            "HTTP://A.io:80/x?utm_source=1&k=1",
            "http://a.io/x?k=1",  # same canonical as above
            "http://a.io/y",
            "https://b.io/z",
        ]
        df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "id long, url string")
        got = {r["host"]: r.asDict() for r in url_host_stats(df).collect()}
        assert got["a.io"]["n_urls"] == 3
        assert got["a.io"]["n_canonical"] == 2
        assert got["a.io"]["url_dups"] == 1
        assert got["b.io"]["url_dups"] == 0


    def test_fragment_query_does_not_leak(self, spark):
        """ADVICE r11: a '?' whose first appearance is AFTER '#' is
        fragment content (SPA route URLs) and must not leak into
        query_norm/canonical — the module's own drop-the-fragment rule."""
        got = _canon(
            spark,
            [
                "http://h.io/#/route?utm_source=a&k=1",  # '?' inside fragment
                "http://h.io/p?k=1#frag?x=2",  # real query, '?' also in fragment
                "http://h.io/#frag",
            ],
        )
        assert got[0]["query_norm"] == "" and got[0]["canonical"] == "http://h.io/"
        assert got[1]["query_norm"] == "k=1" and got[1]["canonical"] == "http://h.io/p?k=1"
        assert got[2]["canonical"] == "http://h.io/"
