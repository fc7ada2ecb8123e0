"""URL curation operators (operators/web.py): canonicalization rule
table, registered-domain heuristic cases, and the per-domain cap's
determinism + skew bound."""

from __future__ import annotations

from pyspark.sql import functions as F

from es_ch_sync_spark.operators.web import (
    cap_per_domain,
    domain_of_url,
    normalize_url,
    registered_domain,
)

# (raw, canonical) — one row per normalization rule
_CANON_TABLE = [
    ("https://Example.COM/a", "https://example.com/a"),
    ("HTTPS://example.com:443/a", "https://example.com/a"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("https://www.example.com/a/", "https://example.com/a"),
    ("https://example.com/a#frag", "https://example.com/a"),
    ("https://user:pw@example.com/a", "https://example.com/a"),
    ("https://example.com/a?utm_source=x&gclid=1", "https://example.com/a"),
    ("https://example.com/a?b=2&a=1", "https://example.com/a?a=1&b=2"),
    ("https://example.com/a?b=2&utm_medium=m&a=1", "https://example.com/a?a=1&b=2"),
    ("https://example.com/", "https://example.com"),
    ("https://example.com", "https://example.com"),
    # a param whose NAME merely contains a tracking name survives
    ("https://example.com/a?refresh=1", "https://example.com/a?refresh=1"),
]

_DOMAIN_TABLE = [
    ("a.b.example.com", "example.com"),
    ("example.com", "example.com"),
    ("news.bbc.co.uk", "bbc.co.uk"),
    ("bbc.co.uk", "bbc.co.uk"),
    ("shop.foo.com.au", "foo.com.au"),
    ("localhost", "localhost"),
]


def test_normalize_url_rule_table(spark):
    df = spark.createDataFrame([(r,) for r, _ in _CANON_TABLE], "url string")
    got = [r["c"] for r in df.select(normalize_url(F.col("url")).alias("c")).collect()]
    assert got == [c for _, c in _CANON_TABLE]


def test_registered_domain_cases(spark):
    df = spark.createDataFrame([(h,) for h, _ in _DOMAIN_TABLE], "host string")
    got = [
        r["d"] for r in df.select(registered_domain(F.col("host")).alias("d")).collect()
    ]
    assert got == [d for _, d in _DOMAIN_TABLE]


def test_cap_per_domain_bounds_and_determinism(spark):
    rows = [(i, f"https://sub{i % 7}.mega.com/p/{i}") for i in range(200)] + [
        (1000 + i, f"https://tiny{i}.org/x") for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    capped = cap_per_domain(df, cap=3)
    per = {
        r["domain"]: r["n"]
        for r in capped.groupBy("domain").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per["mega.com"] == 3  # 200-row skew bounded at the cap
    assert all(v <= 3 for v in per.values())
    assert sum(per.values()) == 3 + 5  # tiny domains keep their single doc
    # deterministic: the same kept set on a re-run
    a = sorted(r["doc_id"] for r in capped.collect())
    b = sorted(r["doc_id"] for r in cap_per_domain(df, cap=3).collect())
    assert a == b


def test_domain_of_url_strips_www_and_userinfo(spark):
    df = spark.createDataFrame(
        [("https://crawler@www.news.bbc.co.uk:8443/x?a=1#f",)], "url string"
    )
    assert df.select(domain_of_url(F.col("url")).alias("d")).collect()[0]["d"] == "bbc.co.uk"


def test_registered_domain_psl_suffix_table(spark):
    """A user-supplied suffix table overrides the two-level heuristic:
    the LONGEST matching suffix wins (3-level city.kawasaki.jp — a case
    the heuristic gets wrong), unmatched hosts fall back to the implicit
    '*' rule, and the plan is broadcast joins only (no shuffle)."""
    from es_ch_sync_spark.operators.web import registered_domain_psl

    suffixes = spark.createDataFrame(
        [("jp",), ("kawasaki.jp",), ("city.kawasaki.jp",), ("co.uk",), ("com",)],
        "suffix string",
    )
    hosts = spark.createDataFrame(
        [
            ("foo.city.kawasaki.jp",),   # 3-level suffix + 1
            ("bar.kawasaki.jp",),        # 2-level suffix + 1
            ("shop.example.co.uk",),     # classic 2-level
            ("a.b.example.com",),        # 1-level suffix, deep host
            ("weird.zz",),               # no match -> implicit '*' rule
        ],
        "host string",
    )
    out = registered_domain_psl(hosts, "host", suffixes)
    got = {r["host"]: r["domain"] for r in out.collect()}
    assert got["foo.city.kawasaki.jp"] == "foo.city.kawasaki.jp"
    assert got["bar.kawasaki.jp"] == "bar.kawasaki.jp"
    assert got["shop.example.co.uk"] == "example.co.uk"
    assert got["a.b.example.com"] == "example.com"
    assert got["weird.zz"] == "weird.zz"
    # the heuristic DOES get the planted case wrong (motivates the table)
    from es_ch_sync_spark.operators.web import registered_domain

    heur = hosts.select(registered_domain(F.col("host")).alias("d")).collect()
    assert "kawasaki.jp" in {r["d"] for r in heur}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_registered_domain_psl_wildcard_and_exception(spark):
    """Full PSL rule semantics (publicsuffix.org algorithm): '*.ck'
    makes every <label>.ck a public suffix, '!www.ck' overrides it so
    www.ck is a registrable domain — the real ck/kawasaki.jp shape the
    plain-suffix path can't express."""
    from es_ch_sync_spark.operators.web import registered_domain_psl

    suffixes = spark.createDataFrame(
        [
            ("ck",), ("*.ck",), ("!www.ck",),
            ("jp",), ("*.kawasaki.jp",), ("!city.kawasaki.jp",),
            ("com",),
            ("// comment line",), ("",),  # raw-PSL-file noise is ignored
        ],
        "suffix string",
    )
    hosts = spark.createDataFrame(
        [
            ("foo.bar.ck",),          # *.ck: suffix bar.ck -> foo.bar.ck
            ("baz.foo.bar.ck",),      # deeper host, same suffix -> foo.bar.ck
            ("www.ck",),              # !www.ck wins over *.ck -> www.ck
            ("foo.www.ck",),          # exception tail match -> www.ck
            ("x.sub.kawasaki.jp",),   # *.kawasaki.jp -> x.sub.kawasaki.jp
            ("a.city.kawasaki.jp",),  # !city.kawasaki.jp -> city.kawasaki.jp
            ("a.b.example.com",),     # plain rule unchanged
        ],
        "host string",
    )
    out = registered_domain_psl(hosts, "host", suffixes)
    got = {r["host"]: r["domain"] for r in out.collect()}
    assert got["foo.bar.ck"] == "foo.bar.ck"
    assert got["baz.foo.bar.ck"] == "foo.bar.ck"
    assert got["www.ck"] == "www.ck"
    assert got["foo.www.ck"] == "www.ck"
    assert got["x.sub.kawasaki.jp"] == "x.sub.kawasaki.jp"
    assert got["a.city.kawasaki.jp"] == "city.kawasaki.jp"
    assert got["a.b.example.com"] == "example.com"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_registered_domain_psl_raw_file_noise_and_suffix_hosts(spark):
    """r9 ADVICE #2/#4: rule KEYS are normalized (CRLF tails, trailing
    whitespace, inline '// note' comments all match like a clean file),
    and a host that IS a wildcard public suffix emits ITSELF — so the
    strict-null workaround `host != domain` identifies suffix-hosts
    uniformly (plain-suffix hosts already self-emit via their parent
    rule)."""
    from es_ch_sync_spark.operators.web import registered_domain_psl

    suffixes = spark.createDataFrame(
        [
            ("jp\r",),                       # CRLF line ending
            ("co.uk  // UK SLD",),           # inline comment
            ("  com  ",),                    # stray whitespace
            ("*.kawasaki.jp\r",),            # wildcard with CRLF
            ("// pure comment",), ("   ",),  # dropped entirely
        ],
        "suffix string",
    )
    hosts = spark.createDataFrame(
        [
            ("shop.example.co.uk",),  # dirty 'co.uk' rule must still match
            ("a.example.com",),       # dirty 'com' rule must still match
            ("x.sub.kawasaki.jp",),   # wildcard + 1 -> x.sub.kawasaki.jp
            ("sub.kawasaki.jp",),     # host IS the wildcard suffix -> itself
            ("kawasaki.jp",),         # NOT a suffix: plain 'jp' rule + 1
        ],
        "host string",
    )
    out = registered_domain_psl(hosts, "host", suffixes)
    got = {r["host"]: r["domain"] for r in out.collect()}
    assert got["shop.example.co.uk"] == "example.co.uk"
    assert got["a.example.com"] == "example.com"
    assert got["x.sub.kawasaki.jp"] == "x.sub.kawasaki.jp"
    assert got["sub.kawasaki.jp"] == "sub.kawasaki.jp"  # host == domain
    assert got["kawasaki.jp"] == "kawasaki.jp"
    # host == domain is the documented NECESSARY condition for "host is
    # a public suffix" — both suffix-hosts satisfy it (a registrable
    # host with no subdomain, like x.sub.kawasaki.jp here, also does;
    # truly strict callers additionally check the rule table)
    self_emitting = {h for h, d in got.items() if h == d}
    assert {"sub.kawasaki.jp", "kawasaki.jp"} <= self_emitting
