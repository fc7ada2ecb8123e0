"""Round-4 advanced-operator registry: deterministic sketches (KMV, CMS),
graph analytics, and corpus-quality scoring — each with a DuckDB oracle.

Same determinism contract as queries.py: md5-derived hashes (bit-identical
across engines), round(4) on any double surface, explicit tie-breaks on
every top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from es_ch_sync_spark.io.sources import read_parquet_table
from es_ch_sync_spark.operators.sketches import (
    cms_build,
    cms_point_estimates,
    kmv_estimate,
    kmv_set_ops,
    kmv_sketch,
)
from es_ch_sync_spark.queries import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet_table(spark, sf_dir, name)


# DuckDB mirror of operators.sketches.hash56: fold the first 14 hex chars of
# md5 into a 56-bit BIGINT (DuckDB has no conv()).
def _h56(s: str) -> str:
    return (
        "list_reduce(list_prepend(0::BIGINT, "
        "list_transform(range(1, 15), i -> "
        f"(strpos('0123456789abcdef', substr(md5({s}), i, 1)) - 1)::BIGINT)), "
        "(a, b) -> a * 16 + b)"
    )


_SPACE = "72057594037927936.0"  # 2^56 as double

# Shared KMV CTEs over events.user_id grouped by event_type (k = 64).
_KMV_CTE = f"""
    WITH hashed AS (
        SELECT DISTINCT event_type, {_h56("'kmv:' || user_id::VARCHAR")} AS h
        FROM events WHERE user_id IS NOT NULL
    ),
    ranked AS (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
        FROM hashed
    ),
    sk AS (SELECT event_type AS g, h FROM ranked WHERE rk <= 64),
    per AS (SELECT g, count(*) AS n_kept, max(h) AS h_max FROM sk GROUP BY g),
    pest AS (
        SELECT g, n_kept,
               round(CASE WHEN n_kept < 64 THEN n_kept::DOUBLE
                     ELSE 63.0 / (h_max::DOUBLE / {_SPACE}) END, 4) AS est
        FROM per
    )
"""


@register(
    "kmv_distinct_users",
    _KMV_CTE
    + """
    , ex AS (
        SELECT event_type, count(DISTINCT user_id) AS exact_distinct
        FROM events WHERE user_id IS NOT NULL GROUP BY event_type
    )
    SELECT p.g AS event_type, p.n_kept, p.est AS est_distinct, ex.exact_distinct,
           round(abs(p.est - ex.exact_distinct) / ex.exact_distinct, 4) AS rel_err
    FROM pest p JOIN ex ON p.g = ex.event_type
    """,
)
def q_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch per event type, checked
    against the exact distinct count. Deterministic md5 hashing makes the
    sketch — not just its error bound — reproducible in the oracle."""
    ev = _t(spark, sf_dir, "events")
    sk = kmv_sketch(ev, "user_id", ["event_type"], k=64)
    est = kmv_estimate(sk, ["event_type"], k=64)
    exact = (
        ev.where(F.col("user_id").isNotNull())
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_distinct"))
    )
    return est.join(exact, "event_type").select(
        "event_type",
        "n_kept",
        "est_distinct",
        "exact_distinct",
        F.round(
            F.abs(F.col("est_distinct") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            4,
        ).alias("rel_err"),
    )


@register(
    "kmv_set_ops",
    _KMV_CTE
    + f"""
    , pairs AS (
        SELECT a.g AS ga, b.g AS gb
        FROM (SELECT DISTINCT g FROM sk) a JOIN (SELECT DISTINCT g FROM sk) b
          ON a.g < b.g
    ),
    merged AS (
        SELECT DISTINCT ga, gb, h FROM (
            SELECT p.ga, p.gb, s.h FROM pairs p JOIN sk s ON s.g = p.ga
            UNION ALL
            SELECT p.ga, p.gb, s.h FROM pairs p JOIN sk s ON s.g = p.gb
        )
    ),
    mr AS (
        SELECT ga, gb, h,
               row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rk
        FROM merged
    ),
    un AS (
        SELECT ga, gb, count(*) AS nu, max(h) AS hu
        FROM mr WHERE rk <= 64 GROUP BY ga, gb
    ),
    uest AS (
        SELECT ga, gb,
               CASE WHEN nu < 64 THEN nu::DOUBLE
                    ELSE 63.0 / (hu::DOUBLE / {_SPACE}) END AS est_union_raw
        FROM un
    )
    SELECT u.ga, u.gb,
           round(a.est, 4) AS est_a,
           round(b.est, 4) AS est_b,
           round(u.est_union_raw, 4) AS est_union,
           round(greatest(a.est + b.est - u.est_union_raw, 0.0), 4) AS est_intersect,
           round(greatest(a.est + b.est - u.est_union_raw, 0.0) / u.est_union_raw, 4)
               AS est_jaccard
    FROM uest u JOIN pest a ON u.ga = a.g JOIN pest b ON u.gb = b.g
    """,
)
def q_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch set algebra: distinct-union (merge + re-truncate),
    distinct-intersection (inclusion–exclusion), and Jaccard for every pair
    of event types — computed from the sketches alone, never re-scanning
    the fact table (the mergeability property that matters at 100 TB)."""
    ev = _t(spark, sf_dir, "events")
    sk = kmv_sketch(ev, "user_id", ["event_type"], k=64)
    return kmv_set_ops(sk, "event_type", k=64)


@register(
    "cms_frequency",
    f"""
    WITH per_key AS (
        SELECT user_id, count(*) AS cnt
        FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ),
    fanned AS (
        SELECT p.user_id AS key, p.cnt, r.rw
        FROM per_key p, (SELECT unnest(range(0, 4)) AS rw) r
    ),
    grid AS (
        SELECT rw, {_h56("'cms:' || rw::VARCHAR || ':' || key::VARCHAR")} % 64 AS bucket,
               sum(cnt)::BIGINT AS cnt
        FROM fanned GROUP BY 1, 2
    ),
    top AS (
        SELECT user_id, cnt AS exact_cnt FROM per_key
        ORDER BY cnt DESC, user_id LIMIT 20
    ),
    probes AS (
        SELECT t.user_id, r.rw,
               {_h56("'cms:' || r.rw::VARCHAR || ':' || t.user_id::VARCHAR")} % 64 AS bucket
        FROM top t, (SELECT unnest(range(0, 4)) AS rw) r
    ),
    est AS (
        SELECT p.user_id, min(coalesce(g.cnt, 0))::BIGINT AS cms_est
        FROM probes p LEFT JOIN grid g ON g.rw = p.rw AND g.bucket = p.bucket
        GROUP BY p.user_id
    )
    SELECT t.user_id, t.exact_cnt, e.cms_est,
           e.cms_est - t.exact_cnt AS overcount
    FROM top t JOIN est e USING (user_id)
    """,
)
def q_cms_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency sketch (d=4, w=64) of per-user event counts,
    point-queried for the 20 heaviest users vs their exact counts. The CMS
    estimate is provably ≥ exact; `overcount` surfaces the collision
    error. Build pre-aggregates per-key counts so the sketch shuffle moves
    d·|keys| rows, not the fact table."""
    ev = _t(spark, sf_dir, "events")
    exact = (
        ev.where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count("*").alias("exact_cnt"))
    )
    top = exact.orderBy(F.desc("exact_cnt"), F.asc("user_id")).limit(20)
    sketch = cms_build(ev, "user_id", depth=4, width=64)
    est = cms_point_estimates(sketch, top, "user_id", depth=4, width=64)
    return top.join(est, top["user_id"] == est["key"]).select(
        "user_id",
        "exact_cnt",
        F.col("cms_est"),
        (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"),
    )


# ---------------------------------------------------------------------------
# Graph analytics (operators.graph)
# ---------------------------------------------------------------------------

_COACTIVITY_EDGES_CTE = """
    WITH ub AS (
        SELECT DISTINCT user_id, date_trunc('hour', ts) AS b FROM events
    ),
    e AS (
        SELECT a.user_id AS src, b.user_id AS dst, count(*)::BIGINT AS shared
        FROM ub a JOIN ub b ON a.b = b.b AND a.user_id < b.user_id
        GROUP BY 1, 2 HAVING count(*) >= 10
    )
"""


@register(
    "coactivity_edges",
    _COACTIVITY_EDGES_CTE + "SELECT src, dst, shared FROM e",
)
def q_coactivity_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite projection: the user–user co-activity graph (edge iff two
    users were active in ≥ 10 common hour buckets). The equi-join on the
    bucket column is shuffle-partitionable; hot buckets are the documented
    skew risk, guarded by project_bipartite's bucket_cap at scale."""
    from es_ch_sync_spark.operators.graph import project_bipartite

    ev = _t(spark, sf_dir, "events")
    inc = ev.select("user_id", F.date_trunc("hour", F.col("ts")).alias("hb"))
    return project_bipartite(inc, "user_id", "hb", min_shared=10)


@register(
    "triangle_coactivity",
    _COACTIVITY_EDGES_CTE
    + """
    , deg AS (
        SELECT node, count(*)::BIGINT AS deg FROM (
            SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e
        ) GROUP BY 1
    ),
    tri AS (
        SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        FROM e e1
        JOIN e e2 ON e2.src = e1.dst
        JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
    ),
    tn AS (
        SELECT node, count(*)::BIGINT AS tri_cnt FROM (
            SELECT a AS node FROM tri
            UNION ALL SELECT b AS node FROM tri
            UNION ALL SELECT c AS node FROM tri
        ) GROUP BY 1
    )
    SELECT d.node AS user_id, d.deg,
           coalesce(tn.tri_cnt, 0)::BIGINT AS tri_cnt,
           round(CASE WHEN d.deg >= 2
                 THEN 2.0 * coalesce(tn.tri_cnt, 0) / (d.deg * (d.deg - 1))
                 ELSE 0.0 END, 4) AS clustering
    FROM deg d LEFT JOIN tn ON tn.node = d.node
    """,
)
def q_triangle_coactivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counts + local clustering coefficient per user over the
    co-activity graph, via degree-ordered orientation (each triangle
    generated exactly once from its lowest-order vertex; hub wedge
    explosion bounded by arboricity). The oracle uses the naive triple
    join — same set, different algorithm — making this a cross-algorithm
    equivalence check, not a reimplementation echo."""
    from es_ch_sync_spark.operators.graph import clustering_coefficients, project_bipartite

    ev = _t(spark, sf_dir, "events")
    inc = ev.select("user_id", F.date_trunc("hour", F.col("ts")).alias("hb"))
    edges = project_bipartite(inc, "user_id", "hb", min_shared=10)
    return clustering_coefficients(edges).withColumnRenamed("node", "user_id")


# ---------------------------------------------------------------------------
# Corpus-quality scoring / record linkage / robust outliers
# ---------------------------------------------------------------------------

_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


@register(
    "trigram_perplexity",
    f"""
    WITH d AS (SELECT doc_id, {_NORM_SQL} AS nt FROM documents),
    tri AS (
        SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(nt) - 1, 1)),
                                     i -> substr(nt, i, 3))) AS tri
        FROM d WHERE len(nt) >= 3
    ),
    model AS (SELECT tri, count(*) AS cnt FROM tri GROUP BY 1),
    tot AS (SELECT sum(cnt)::BIGINT AS n_total, count(*)::BIGINT AS v_size FROM model)
    SELECT t.doc_id, count(*)::BIGINT AS n_tri,
           round(-avg(ln((m.cnt + 1)::DOUBLE / (tot.n_total + tot.v_size)::DOUBLE)), 4)
               AS xent
    FROM tri t JOIN model m USING (tri), tot
    GROUP BY t.doc_id
    """,
)
def q_trigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained character-trigram LM cross-entropy per document (the
    CCNet-style quality gate, self-trained). Model is bounded by |charset|³
    keys → broadcast scoring join; both aggregates map-side combine."""
    from es_ch_sync_spark.operators.text import trigram_lm_score

    return trigram_lm_score(_t(spark, sf_dir, "documents"))


@register(
    "fuzzy_blocked_join",
    f"""
    WITH d AS (
        SELECT doc_id, lang, {_NORM_SQL} AS nt FROM documents
    ),
    b AS (
        SELECT doc_id, lang, substr(nt, 1, 12) AS pfx, substr(nt, 1, 60) AS head
        FROM d
    )
    SELECT a.doc_id AS id_a, c.doc_id AS id_b,
           levenshtein(a.head, c.head)::INTEGER AS dist
    FROM b a JOIN b c
      ON a.pfx = c.pfx AND a.lang = c.lang AND a.doc_id < c.doc_id
    WHERE levenshtein(a.head, c.head) <= 10
    """,
)
def q_fuzzy_blocked_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-linkage fuzzy self-join on documents: block on (lang,
    12-char normalized prefix), verify with Levenshtein ≤ 10 over the
    60-char head — blocking replaces the all-pairs quadratic; the edit-
    distance DP runs only inside blocks."""
    from es_ch_sync_spark.operators.text import fuzzy_duplicate_pairs

    pairs = fuzzy_duplicate_pairs(_t(spark, sf_dir, "documents"))
    return pairs.select("id_a", "id_b", F.col("dist").cast("int").alias("dist"))


@register(
    "robust_outliers_mad",
    """
    WITH med AS (
        SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
        FROM events GROUP BY 1
    ),
    dev AS (
        SELECT e.event_id, e.event_type, e.value, m.med,
               abs(e.value - m.med) AS adev
        FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type, round(quantile_cont(adev, 0.5), 6) AS mad
        FROM dev GROUP BY 1
    )
    SELECT d.event_id, d.event_type, d.value,
           round(d.adev / (1.4826 * m.mad), 4) AS score
    FROM dev d JOIN mad m USING (event_type)
    WHERE m.mad > 0 AND d.adev > 3.0 * 1.4826 * m.mad
    """,
)
def q_robust_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel filter: per-event-type median/MAD outliers — robust to the
    heavy-tailed value distribution that drags a mean/stddev gate.
    Median and MAD rounded(6) before thresholding on both engines."""
    from es_ch_sync_spark.operators.analytics import mad_outliers

    ev = _t(spark, sf_dir, "events")
    return mad_outliers(ev, "value", ["event_type"], ["event_id"]).select(
        "event_id", "event_type", "value", "score"
    )


from es_ch_sync_spark import oracles as _o  # noqa: E402


@register("decontaminate_fuzzy", _o.decontaminate_fuzzy_sql(threshold=0.3))
def q_decontaminate_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH fuzzy decontamination: train docs near-duplicating any
    holdout doc (Jaccard ≥ 0.3) — catches paraphrased eval leakage the
    exact n-gram pass (`decontaminate`) misses. Holdout bucket table
    broadcasts (~5% of corpus); verify only on cross-split candidates."""
    from es_ch_sync_spark.operators.sampling import decontaminate_fuzzy

    return decontaminate_fuzzy(_t(spark, sf_dir, "documents"), threshold=0.3)


@register("ann_sq8_topk", _o.sq8_topk_sql(query_id=0, k=10, rerank=50, dim=64))
def q_ann_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar-quantized ANN: int8 decode scoring (4× smaller vectors)
    → top-50 candidates → exact-cosine rerank → top-10. Completes the
    quantization ladder (floats → SQ8 → PQ → IVF-PQ)."""
    from es_ch_sync_spark.operators.similarity import sq8_topk
    from es_ch_sync_spark.queries_relational import _ivf_query_vec

    emb = _t(spark, sf_dir, "embeddings")
    return sq8_topk(emb, _ivf_query_vec(sf_dir, 0), k=10, rerank=50, exclude_id=0)


@register(
    "histogram_quantiles",
    """
    WITH s AS (SELECT min(value) AS mn, max(value) AS mx FROM events),
    b AS (
        SELECT event_type,
               least(floor((value - s.mn) / (s.mx - s.mn) * 64.0), 63.0)::BIGINT AS bin
        FROM events, s WHERE value IS NOT NULL
    ),
    grid AS (SELECT event_type, bin, count(*) AS cnt FROM b GROUP BY 1, 2),
    cum AS (
        SELECT event_type, bin, cnt,
               sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum
        FROM grid
    ),
    tot AS (SELECT event_type, sum(cnt)::BIGINT AS n FROM grid GROUP BY 1),
    qs AS (SELECT unnest([0.5::DOUBLE, 0.95::DOUBLE]) AS q),
    hit AS (
        SELECT c.event_type, q.q, c.bin, c.cnt, c.cum - c.cnt AS cum_prev, t.n
        FROM cum c JOIN tot t USING (event_type) CROSS JOIN qs q
        WHERE c.cum::DOUBLE >= q.q * t.n::DOUBLE
          AND (c.cum - c.cnt)::DOUBLE < q.q * t.n::DOUBLE
    ),
    est AS (
        SELECT event_type, q,
               round(s.mn + bin::DOUBLE * ((s.mx - s.mn) / 64.0)
                     + (q * n::DOUBLE - cum_prev::DOUBLE) / cnt::DOUBLE
                       * ((s.mx - s.mn) / 64.0), 6) AS est_q
        FROM hit, s
    ),
    ex AS (
        SELECT event_type,
               unnest([0.5::DOUBLE, 0.95::DOUBLE]) AS q,
               unnest([round(quantile_cont(value, 0.5), 6),
                       round(quantile_cont(value, 0.95), 6)]) AS exact_q
        FROM events GROUP BY event_type
    )
    SELECT e.event_type, e.q, e.est_q, x.exact_q,
           round(abs(e.est_q - x.exact_q), 6) AS abs_err
    FROM est e JOIN ex x ON e.event_type = x.event_type AND e.q = x.q
    """,
)
def q_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable equi-width histogram quantile sketch (the fixed-bin,
    bit-deterministic sibling of a t-digest): per-(group, bin) integer
    counts are the sufficient statistic; p50/p95 estimated by in-bin
    linear interpolation and compared against the exact interpolated
    percentiles. Completes the sketch triad: cardinality (KMV),
    frequency (CMS), quantiles (histogram)."""
    from es_ch_sync_spark.operators.sketches import histogram_quantile_estimates

    ev = _t(spark, sf_dir, "events")
    est = histogram_quantile_estimates(ev, "value", ["event_type"], [0.5, 0.95], bins=64)
    exact = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("e50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("e95"),
    )
    exact_tall = exact.select(
        "event_type",
        F.explode(
            F.array(
                F.struct(F.lit(0.5).alias("q"), F.col("e50").alias("exact_q")),
                F.struct(F.lit(0.95).alias("q"), F.col("e95").alias("exact_q")),
            )
        ).alias("x"),
    ).select("event_type", F.col("x.q").alias("q"), F.col("x.exact_q").alias("exact_q"))
    return est.join(exact_tall, ["event_type", "q"]).select(
        "event_type",
        "q",
        "est_q",
        "exact_q",
        F.round(F.abs(F.col("est_q") - F.col("exact_q")), 6).alias("abs_err"),
    )


@register(
    "streaming_kmv_distinct",
    _KMV_CTE + "SELECT g AS event_type, n_kept, est AS est_distinct FROM pest",
)
def q_streaming_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV cardinality sketch as a STREAMING aggregate: the bottom-k hash
    set per event type maintained across micro-batches (AvailableNow
    drain, complete mode) — order-insensitive by construction, so the
    drained result equals the batch sketch (the oracle). State per group
    is the distinct-hash set; for unbounded key domains the batch
    prefilter tier / a bounded-state applyInPandasWithState variant is
    the scale path (documented trade)."""
    from es_ch_sync_spark.operators.sketches import HASH_SPACE, hash56
    from es_ch_sync_spark.queries_relational import _drain_to_memory, _read_events_stream

    stream = _read_events_stream(spark, sf_dir)
    hashed = stream.where(F.col("user_id").isNotNull()).select(
        "event_type", hash56("user_id", seed="kmv").alias("h")
    )
    agg = hashed.groupBy("event_type").agg(
        F.slice(F.array_sort(F.collect_set("h")), 1, 64).alias("hs")
    )
    n = F.size("hs")
    est = F.when(n < 64, n.cast("double")).otherwise(
        F.lit(63.0) / (F.element_at("hs", 64).cast("double") / F.lit(HASH_SPACE))
    )
    out = agg.select(
        "event_type",
        n.cast("long").alias("n_kept"),
        F.round(est, 4).alias("est_distinct"),
    )
    return _drain_to_memory(out, "complete")


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (operators.sketches)
# ---------------------------------------------------------------------------

# Deterministic skewed key for hot-key detection: 3/4 of the event mass
# lands on the 5 'hot:<type>' keys, the rest spreads over per-event-unique
# 'cold:' keys — vocab >> MG capacity, so the summary actually decrements.
_HH_KEY_SQL = (
    "CASE WHEN event_id % 4 < 3 THEN 'hot:' || event_type "
    "ELSE 'cold:' || user_id::VARCHAR || ':' || event_id::VARCHAR END"
)


@register(
    "heavy_hitters",
    f"""
    WITH keyed AS (
        SELECT {_HH_KEY_SQL} AS key
        FROM events
        WHERE event_id IS NOT NULL AND user_id IS NOT NULL
          AND event_type IS NOT NULL
    ),
    tot AS (SELECT count(*) AS n_total FROM keyed)
    SELECT key, count(*) AS freq, (SELECT n_total FROM tot) AS n_total
    FROM keyed
    GROUP BY key
    HAVING count(*) * 65 > (SELECT n_total FROM tot)
    ORDER BY freq DESC, key
    """,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters {key: freq > N/65} found the 100 TB way: a
    shuffle-free Misra-Gries candidate pass (≤64 rows per partition,
    superset guarantee by pigeonhole over partitions) followed by a
    broadcast-semi-join exact count of candidates only — the full key
    space (here dominated by per-event-unique cold keys) is never
    grouped.  The oracle is the plain exact SQL; the sketch only prunes,
    so the outputs agree bit-for-bit."""
    from es_ch_sync_spark.operators.sketches import heavy_hitters_exact

    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_id").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
    )
    keyed = ev.select(
        F.when(
            F.col("event_id") % 4 < 3,
            F.concat(F.lit("hot:"), F.col("event_type")),
        )
        .otherwise(
            F.concat(
                F.lit("cold:"),
                F.col("user_id").cast("string"),
                F.lit(":"),
                F.col("event_id").cast("string"),
            )
        )
        .alias("key")
    )
    return heavy_hitters_exact(keyed, "key", k=64).orderBy(
        F.desc("freq"), F.asc("key")
    )


# ---------------------------------------------------------------------------
# Geospatial (operators.geo) — the reference's latitude/longitude telemetry
# (status_mapping.json data.latitude/longitude) made queryable
# ---------------------------------------------------------------------------

# Deterministic synthetic pings: md5-derived uniform positions in a
# 1°x1° band (lat 40..41, lon -75..-74) keyed by event_id — bit-identical
# in both engines (same hash, same IEEE division).
_PTS_CTE = f"""
    pts AS (
        SELECT event_id, user_id, ts,
               40.0  + {_h56("'lat:' || event_id::VARCHAR")} / {_SPACE} AS lat,
               -75.0 + {_h56("'lon:' || event_id::VARCHAR")} / {_SPACE} AS lon
        FROM events WHERE event_id IS NOT NULL
    )
"""

_HAV_SQL = (
    "2.0 * 6371.0 * asin(sqrt("
    "sin(radians({lat2} - {lat1}) / 2) * sin(radians({lat2} - {lat1}) / 2)"
    " + cos(radians({lat1})) * cos(radians({lat2}))"
    " * sin(radians({lon2} - {lon1}) / 2) * sin(radians({lon2} - {lon1}) / 2)))"
)

_LANDMARKS = [
    (0, 40.1, -74.9),
    (1, 40.3, -74.5),
    (2, 40.5, -74.2),
    (3, 40.7, -74.7),
    (4, 40.9, -74.1),
]


def _pts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from es_ch_sync_spark.operators.sketches import HASH_SPACE, hash56

    ev = _t(spark, sf_dir, "events").filter(F.col("event_id").isNotNull())
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        (F.lit(40.0) + hash56("event_id", seed="lat") / F.lit(HASH_SPACE)).alias("lat"),
        (F.lit(-75.0) + hash56("event_id", seed="lon") / F.lit(HASH_SPACE)).alias("lon"),
    )


@register(
    "geo_cell_counts",
    f"""
    WITH {_PTS_CTE}
    SELECT floor(lat / 0.01)::BIGINT AS cell_y,
           floor(lon / 0.01)::BIGINT AS cell_x,
           count(*) AS n_points,
           round(sum(lat::DECIMAL(18,9))::DOUBLE / count(*), 6) AS mean_lat,
           round(sum(lon::DECIMAL(18,9))::DOUBLE / count(*), 6) AS mean_lon
    FROM pts
    GROUP BY 1, 2
    HAVING count(*) >= 2
    ORDER BY n_points DESC, cell_y, cell_x
    LIMIT 200
    """,
)
def q_geo_cell_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vehicle-density grid (~1.1 km cells): integer floor-division cell
    ids, one partial-agg shuffle, DECIMAL centroid sums.  The cell id is
    the same key zorder_write would lay files out by, so at 100 TB the
    grid query prunes to the touched cells."""
    from es_ch_sync_spark.operators.geo import grid_aggregate

    return (
        grid_aggregate(_pts(spark, sf_dir), cell_deg=0.01)
        .filter(F.col("n_points") >= 2)
        .orderBy(F.desc("n_points"), "cell_y", "cell_x")
        .limit(200)
    )


@register(
    "geo_radius_join",
    f"""
    WITH {_PTS_CTE},
    landmarks (landmark_id, q_lat, q_lon) AS (
        VALUES {", ".join(f"({i}, {la}, {lo})" for i, la, lo in _LANDMARKS)}
    )
    SELECT landmark_id, event_id,
           round({_HAV_SQL.format(lat1="lat", lon1="lon", lat2="q_lat", lon2="q_lon")}, 4)
               AS dist_km
    FROM pts, landmarks
    WHERE {_HAV_SQL.format(lat1="lat", lon1="lon", lat2="q_lat", lon2="q_lon")} < 10.0
    ORDER BY landmark_id, event_id
    """,
)
def q_geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius search (pings within 10 km of 5 landmarks) the grid-file
    way: points bucket into radius-covering cells, each landmark fans out
    to its 3x3 neighbor block (15-row broadcast), the cell-id hash join
    yields candidates and exact haversine verifies — never a cross join
    against the ping table (the oracle IS the brute-force cross join,
    proving the cover loses nothing)."""
    from es_ch_sync_spark.operators.geo import radius_join

    lm = spark.createDataFrame(
        _LANDMARKS, "landmark_id int, q_lat double, q_lon double"
    )
    return (
        radius_join(_pts(spark, sf_dir), lm, radius_km=10.0)
        .select(
            "landmark_id",
            "event_id",
            F.round("dist_km", 4).alias("dist_km"),
        )
        .orderBy("landmark_id", "event_id")
    )


@register(
    "geo_trajectory",
    f"""
    WITH {_PTS_CTE},
    hops AS (
        SELECT user_id, lat, lon,
               lag(lat) OVER w AS plat, lag(lon) OVER w AS plon
        FROM pts
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    steps AS (
        SELECT user_id,
               {_HAV_SQL.format(lat1="plat", lon1="plon", lat2="lat", lon2="lon")} AS step
        FROM hops
    )
    SELECT user_id, count(*) AS n_pings,
           round(sum(step::DECIMAL(18,9))::DOUBLE, 4) AS path_km,
           round(max(step), 4) AS max_hop_km
    FROM steps
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q_geo_trajectory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vehicle travel summary: window lags on (ts, event_id) give
    consecutive-ping hops (one shuffle on user_id, no self-join); the
    path sum is DECIMAL so hop ordering can't change the double."""
    from es_ch_sync_spark.operators.geo import trajectory_stats

    return trajectory_stats(
        _pts(spark, sf_dir).withColumn(
            "ord", F.struct(F.col("ts"), F.col("event_id"))
        ),
        key_col="user_id",
        ts_col="ord",
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# Multinomial Naive Bayes (round 7)
# ---------------------------------------------------------------------------

@register(
    "nb_lang_confusion",
    f"""
    WITH d AS (SELECT doc_id, lang, {_NORM_SQL} AS nt FROM documents),
    tk AS (
        SELECT doc_id, lang, unnest(string_split(nt, ' ')) AS tok FROM d
    ),
    tk2 AS (SELECT * FROM tk WHERE tok <> ''),
    cnt AS (SELECT lang AS label, tok, count(*) AS cnt FROM tk2 GROUP BY 1, 2),
    v AS (SELECT count(DISTINCT tok) AS v FROM cnt),
    tot AS (SELECT label, sum(cnt)::BIGINT AS t_l FROM cnt GROUP BY 1),
    nd AS (SELECT count(*) AS n FROM d),
    dn AS (SELECT lang AS label, count(*) AS n_l FROM d GROUP BY 1),
    model AS (
        SELECT c.label, c.tok,
               CAST(round(ln((c.cnt + 1)::DOUBLE / (t.t_l + v.v)::DOUBLE) * 1e6)
                    AS BIGINT) AS logp_m
        FROM cnt c JOIN tot t USING (label), v
    ),
    priors AS (
        SELECT t.label,
               CAST(round(ln(dn.n_l::DOUBLE / nd.n::DOUBLE) * 1e6) AS BIGINT)
                   AS logprior_m,
               CAST(round(ln(1.0 / (t.t_l + v.v)::DOUBLE) * 1e6) AS BIGINT)
                   AS unseen_m
        FROM tot t JOIN dn ON t.label = dn.label, nd, v
    ),
    dt AS (SELECT doc_id, tok, count(*) AS n FROM tk2 GROUP BY 1, 2),
    scored AS (
        SELECT dt.doc_id, p.label,
               sum(dt.n * COALESCE(m.logp_m, p.unseen_m))::BIGINT AS s
        FROM dt CROSS JOIN priors p
        LEFT JOIN model m ON m.label = p.label AND m.tok = dt.tok
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT s.doc_id, s.label,
               row_number() OVER (PARTITION BY s.doc_id
                                  ORDER BY s.s + p.logprior_m DESC, s.label)
                   AS rn
        FROM scored s JOIN priors p USING (label)
    )
    SELECT d.lang AS true_lang, r.label AS pred_lang,
           count(*)::BIGINT AS n_docs
    FROM ranked r JOIN d USING (doc_id)
    WHERE r.rn = 1
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q_nb_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes self-train + self-classify on the lang
    label, reported as a confusion matrix.  Model cells carry micro-
    quantized log-probabilities (one ln per cell, summed as BIGINTs), so
    the argmax is exact on both engines — no float-order seam.  The
    oracle mirrors the engine's unseen-token handling exactly (cross join
    labels, LEFT JOIN model, COALESCE to the per-label smoothed unseen_m
    cell — r7 ADVICE), so label-exclusive vocabulary cannot diverge the
    two argmaxes.  Plan: corpus scanned twice (census + classify); the
    census is localCheckpoint-ed inside nb_train so its three consumers
    share one materialization; model/prior joins broadcast; argmax is a
    5-row-per-doc window."""
    from es_ch_sync_spark.operators.text import nb_classify, nb_train

    docs = _t(spark, sf_dir, "documents")
    model, priors = nb_train(docs, label_col="lang")
    pred = nb_classify(docs, model, priors)
    return (
        pred.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy(F.col("lang").alias("true_lang"), F.col("pred_label").alias("pred_lang"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("true_lang", "pred_lang")
    )


@register(
    "burst_days",
    """
    WITH dc AS (
        SELECT user_id, date_trunc('day', ts)::DATE AS day, count(*) AS c
        FROM events GROUP BY 1, 2
    ),
    w AS (
        SELECT user_id, day, c,
               count(*) OVER win AS n,
               sum(c) OVER win AS s,
               sum(c * c) OVER win AS ss
        FROM dc
        WINDOW win AS (PARTITION BY user_id ORDER BY day
                       RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, day, c AS n_events,
           round(s::DOUBLE / n::DOUBLE, 4) AS base_mean,
           CASE WHEN n * ss - s * s > 0
                THEN round((n * c - s)::DOUBLE / sqrt((n * ss - s * s)::DOUBLE), 4)
           END AS z_score
    FROM w
    WHERE n >= 3 AND (n * c - s) >= 2 * n
      AND (n * c - s) * (n * c - s) > 9 * (n * ss - s * s)
    ORDER BY user_id, day
    """,
)
def q_burst_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity-burst days vs the trailing-week baseline — the
    anomaly feed a sync monitor raises alerts from.  The burst flag is
    exact integer arithmetic ((n·c−s)² > 9·(n·ss−s²), lift ≥ 2/day), so
    no float-rounding seam can flip membership; z_score is display-only.
    One shuffle on user_id; the trailing frame is a calendar-day RANGE
    window, robust to gap days."""
    from es_ch_sync_spark.operators.analytics import burst_detection

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return burst_detection(
        daily, key_col="user_id", day_col="day", count_col="n_events"
    ).orderBy("user_id", "day")


@register(
    "phrase_search",
    f"""
    WITH d AS (SELECT doc_id, {_NORM_SQL} AS nt FROM documents),
    w AS (SELECT doc_id, string_split(nt, ' ') AS ws FROM d),
    p AS (
        SELECT doc_id, unnest(range(1, len(ws) + 1)) AS i, ws
        FROM w
    ),
    post AS (
        SELECT doc_id, i - 1 AS pos, ws[i] AS tok FROM p WHERE ws[i] <> ''
    ),
    a AS (SELECT doc_id, pos FROM post WHERE tok = 'table'),
    b AS (SELECT doc_id, pos - 1 AS pos FROM post WHERE tok = 'hash')
    SELECT a.doc_id AS doc_id, count(*)::BIGINT AS n_matches
    FROM a JOIN b ON a.doc_id = b.doc_id AND a.pos = b.pos
    GROUP BY 1
    ORDER BY n_matches DESC, a.doc_id
    LIMIT 25
    """,
)
def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase query ("table hash") over a positional inverted
    index — the retrieval primitive BM25 can't express.  Postings are
    one posexplode of the corpus; the phrase is k−1 equi-joins on
    (doc, pos+i) touching only the phrase terms' positions.  Top-25
    docs by occurrence count, ties by doc_id."""
    from es_ch_sync_spark.operators.text import build_postings, phrase_match

    post = build_postings(_t(spark, sf_dir, "documents"))
    return (
        phrase_match(post, ["table", "hash"])
        .select(F.col("id").alias("doc_id"), "n_matches")
        .orderBy(F.desc("n_matches"), F.asc("doc_id"))
        .limit(25)
    )


@register(
    "cusum_shifts",
    """
    WITH dc AS (
        SELECT user_id, date_trunc('day', ts)::DATE AS day, count(*) AS c
        FROM events GROUP BY 1, 2
    ),
    base AS (SELECT user_id, sum(c)::BIGINT AS s, count(*) AS n FROM dc GROUP BY 1),
    j AS (SELECT dc.user_id, day, c, s, n FROM dc JOIN base USING (user_id)),
    pf AS (
        SELECT user_id, day, c, n,
               sum(n * c - s - n * 1) OVER (PARTITION BY user_id ORDER BY day
                                            ROWS UNBOUNDED PRECEDING) AS p
        FROM j
    ),
    m AS (
        SELECT user_id, day, c, n, p,
               min(p) OVER (PARTITION BY user_id ORDER BY day
                            ROWS UNBOUNDED PRECEDING) AS mn
        FROM pf
    )
    SELECT user_id, day, c AS n_events,
           round((p - least(mn, 0))::DOUBLE / n::DOUBLE, 4) AS cusum
    FROM m
    WHERE p - least(mn, 0) > n * 3
    ORDER BY user_id, day
    """,
)
def q_cusum_shifts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sustained level shifts in per-user daily activity via one-sided
    CUSUM (k=1, h=3) — the slow-drift complement to burst_days' spike
    gate.  Prefix-sum identity turns Page's recursion into two running
    windows; the flag decision is exact BIGINT arithmetic (scaled by the
    per-key day count), so membership can't straddle a rounding seam."""
    from es_ch_sync_spark.operators.analytics import cusum_changepoints

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return cusum_changepoints(
        daily, key_col="user_id", day_col="day", value_col="n_events"
    ).orderBy("user_id", "day")


@register(
    "chi2_lang_digit",
    """
    WITH obs AS (
        SELECT lang AS a, (text ~ '.*[0-9].*') AS b, count(*)::BIGINT AS o
        FROM documents GROUP BY 1, 2
    ),
    cells AS (
        SELECT av.a, bv.b, coalesce(obs.o, 0)::BIGINT AS o
        FROM (SELECT DISTINCT a FROM obs) av
        CROSS JOIN (SELECT DISTINCT b FROM obs) bv
        LEFT JOIN obs ON obs.a = av.a AND obs.b = bv.b
    ),
    rt AS (SELECT a, sum(o)::BIGINT AS ra FROM cells GROUP BY 1),
    ct AS (SELECT b, sum(o)::BIGINT AS cb FROM cells GROUP BY 1),
    nt AS (SELECT sum(o)::BIGINT AS n FROM cells),
    contrib AS (
        SELECT CAST(round(
                   (o::DOUBLE * n::DOUBLE - ra::DOUBLE * cb::DOUBLE)
                   * (o::DOUBLE * n::DOUBLE - ra::DOUBLE * cb::DOUBLE)
                   / (n::DOUBLE * ra::DOUBLE * cb::DOUBLE) * 1000000.0
               ) AS BIGINT) AS m,
               a, b, n
        FROM cells JOIN rt USING (a) JOIN ct USING (b), nt
    )
    SELECT sum(m)::DOUBLE / 1000000.0 AS chi2,
           ((count(DISTINCT a) - 1) * (count(DISTINCT b) - 1))::BIGINT AS dof,
           max(n)::BIGINT AS n,
           round(CASE WHEN least(count(DISTINCT a), count(DISTINCT b)) > 1
                       AND max(n) > 0
                 THEN sqrt((sum(m)::DOUBLE / 1000000.0)
                           / (max(n)::DOUBLE
                              * (least(count(DISTINCT a),
                                       count(DISTINCT b)) - 1)))
                 END, 6) AS cramers_v
    FROM contrib
    """,
)
def q_chi2_lang_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-squared independence test between a document's
    language label and whether its text contains a digit — the
    is-this-feature-label-confounded audit a corpus-balance pass runs.
    One contingency hash-aggregate; each cell's (O·N−R·C)²/(N·R·C)
    contribution is micro-quantized to a long before the final exact
    sum, so the statistic is iteration-order-free on both engines."""
    from es_ch_sync_spark.operators.analytics import chi2_independence

    docs = _t(spark, sf_dir, "documents").select(
        "lang", F.col("text").rlike("[0-9]").alias("has_digit")
    )
    return chi2_independence(docs, "lang", "has_digit")


@register(
    "hll_distinct_users",
    f"""
    WITH hashed AS (
        SELECT DISTINCT event_type, {_h56("'hll:' || user_id::VARCHAR")} AS h
        FROM events WHERE user_id IS NOT NULL
    ),
    regs AS (
        SELECT event_type, h >> 49 AS bucket,
               max(CASE WHEN h % 562949953421312 > 0
                        THEN 50 - length(bin(h % 562949953421312))
                        ELSE 50 END)::BIGINT AS reg
        FROM hashed GROUP BY 1, 2
    ),
    per AS (
        SELECT event_type,
               sum(1::BIGINT << (50 - reg)::INT)::BIGINT AS s_present,
               count(*)::BIGINT AS n_present
        FROM regs GROUP BY 1
    ),
    est AS (
        SELECT event_type,
               round(CASE WHEN 1.319441173271359e+19
                          / (s_present + (128 - n_present) * 1125899906842624)::DOUBLE
                          <= 320.0 AND (128 - n_present) > 0
                     THEN 128.0 * ln(128.0 / (128 - n_present)::DOUBLE)
                     ELSE 1.319441173271359e+19
                          / (s_present + (128 - n_present) * 1125899906842624)::DOUBLE
                     END, 4) AS est_distinct
        FROM per
    ),
    ex AS (
        SELECT event_type, count(DISTINCT user_id)::BIGINT AS exact_distinct
        FROM events WHERE user_id IS NOT NULL GROUP BY 1
    )
    SELECT e.event_type, e.est_distinct, x.exact_distinct,
           round(abs(e.est_distinct - x.exact_distinct)
                 / x.exact_distinct, 4) AS rel_err
    FROM est e JOIN ex x USING (event_type)
    ORDER BY event_type
    """,
)
def q_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct users per event type vs the exact count —
    the fixed-memory (128-register) counterpart to kmv_distinct_users,
    mergeable by register max (shard → merge, never re-scan — the
    100 TB property).  Determinism contract: md5-derived hashes, rho
    from binary string length (never floor(log2)), and the harmonic sum
    carried as exact BIGINT powers of two, so the oracle reproduces the
    ESTIMATE itself, not just its error bound."""
    from es_ch_sync_spark.operators.sketches import hll_estimate, hll_sketch

    ev = _t(spark, sf_dir, "events")
    regs = hll_sketch(ev, "user_id", ["event_type"])
    est = hll_estimate(regs, ["event_type"])
    exact = (
        ev.where(F.col("user_id").isNotNull())
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_distinct"))
    )
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            "est_distinct",
            "exact_distinct",
            F.round(
                F.abs(F.col("est_distinct") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                4,
            ).alias("rel_err"),
        )
        .orderBy("event_type")
    )


@register(
    "event_transition_matrix",
    """
    WITH pairs AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS to_type
        FROM events
    ),
    ct AS (
        SELECT from_type, to_type, count(*)::BIGINT AS n
        FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2
    ),
    tot AS (SELECT from_type, sum(n)::BIGINT AS row_n FROM ct GROUP BY 1)
    SELECT c.from_type, c.to_type, c.n,
           round(c.n::DOUBLE / t.row_n::DOUBLE, 6) AS p
    FROM ct c JOIN tot t USING (from_type)
    ORDER BY from_type, to_type
    """,
)
def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams
    — the behavioral-sequence census next to sessionize/funnel: exact
    (ts, event_id)-ordered lead pairs, one |types|² hash aggregate,
    transition probability one float division of exact BIGINTs."""
    from es_ch_sync_spark.operators.analytics import event_transition_matrix

    return event_transition_matrix(_t(spark, sf_dir, "events"))


_RET_OFFSET = 14


@register(
    "retention_cohorts",
    f"""
    WITH c AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS cd FROM events
        WHERE event_type = 'signup' GROUP BY 1
    ),
    act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    j AS (
        SELECT c.cd, date_diff('day', c.cd, a.d) AS off
        FROM c JOIN act a USING (user_id)
        WHERE date_diff('day', c.cd, a.d) BETWEEN 0 AND {_RET_OFFSET}
    ),
    r AS (SELECT cd, off, count(*)::BIGINT AS n_active FROM j GROUP BY 1, 2),
    sz AS (SELECT cd, count(*)::BIGINT AS cohort_size FROM c GROUP BY 1)
    SELECT r.cd AS cohort_day, sz.cohort_size, r.off::BIGINT AS day_offset,
           r.n_active,
           round(r.n_active::DOUBLE / sz.cohort_size::DOUBLE, 6) AS retention
    FROM r JOIN sz USING (cd) ORDER BY cohort_day, day_offset
    """,
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup-day cohort retention matrix (offsets 0–14): one distinct
    (user, day) activity census — the only event-volume pass — one
    user-bounded cohort table, one user-keyed join; the output is the
    bounded days×offsets matrix with exact counts."""
    from es_ch_sync_spark.operators.analytics import retention_cohorts

    return retention_cohorts(_t(spark, sf_dir, "events"), max_offset=_RET_OFFSET)


@register(
    "winsorized_event_stats",
    """
    WITH base AS (
        SELECT event_type AS k,
               CAST(round(value * 1000000.0, 0) AS BIGINT) AS vm, event_id
        FROM events WHERE value IS NOT NULL
    ),
    ranked AS (
        SELECT k, vm,
               row_number() OVER (PARTITION BY k ORDER BY vm, event_id) AS rk,
               count(*) OVER (PARTITION BY k) AS n
        FROM base
    ),
    flagged AS (
        SELECT k, vm, n, (n * 10) // 100 AS cut, rk
        FROM ranked
    ),
    agg AS (
        SELECT k, max(n)::BIGINT AS n, max(cut)::BIGINT AS n_cut_each,
               sum(CASE WHEN rk > cut AND rk <= n - cut THEN vm END)::BIGINT
                   AS s_kept,
               sum(CASE WHEN rk > cut AND rk <= n - cut THEN 1 ELSE 0 END)
                   ::BIGINT AS n_kept,
               max(CASE WHEN rk = cut + 1 THEN vm END) AS lo_v,
               max(CASE WHEN rk = n - cut THEN vm END) AS hi_v,
               sum(vm)::BIGINT AS s_all
        FROM flagged GROUP BY k
    )
    SELECT k AS event_type, n, n_cut_each,
           round(s_all::DOUBLE / (n::DOUBLE * 1e6), 6) AS mean,
           round(CASE WHEN n > 2 * n_cut_each
                      THEN s_kept::DOUBLE / (n_kept::DOUBLE * 1e6) END, 6)
               AS trimmed_mean,
           round(CASE WHEN n > 2 * n_cut_each
                      THEN (s_kept + n_cut_each * lo_v + n_cut_each * hi_v)
                           ::DOUBLE / (n::DOUBLE * 1e6) END, 6)
               AS winsorized_mean
    FROM agg ORDER BY event_type
    """,
)
def q_winsorized_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% trimmed and winsorized means of event value per event_type —
    the robust-location pair next to mad_outliers' robust scale.
    Micro-quantized BIGINT sums, integer cut counts, exact rank-boundary
    lookups; one keyed window + one keyed aggregate."""
    from es_ch_sync_spark.operators.analytics import winsorized_stats_ranktrim

    return winsorized_stats_ranktrim(
        _t(spark, sf_dir, "events"), "event_type", "value", "event_id"
    )


@register(
    "chi2_lang_source",
    """
    WITH obs AS (
        SELECT lang AS a, source AS b, count(*)::BIGINT AS o
        FROM documents GROUP BY 1, 2
    ),
    cells AS (
        SELECT av.a, bv.b, coalesce(obs.o, 0)::BIGINT AS o
        FROM (SELECT DISTINCT a FROM obs) av
        CROSS JOIN (SELECT DISTINCT b FROM obs) bv
        LEFT JOIN obs ON obs.a = av.a AND obs.b = bv.b
    ),
    rt AS (SELECT a, sum(o)::BIGINT AS ra FROM cells GROUP BY 1),
    ct AS (SELECT b, sum(o)::BIGINT AS cb FROM cells GROUP BY 1),
    nt AS (SELECT sum(o)::BIGINT AS n FROM cells),
    contrib AS (
        SELECT CAST(round(
                   (o::DOUBLE * n::DOUBLE - ra::DOUBLE * cb::DOUBLE)
                   * (o::DOUBLE * n::DOUBLE - ra::DOUBLE * cb::DOUBLE)
                   / (n::DOUBLE * ra::DOUBLE * cb::DOUBLE) * 1000000.0
               ) AS BIGINT) AS m,
               a, b, n
        FROM cells JOIN rt USING (a) JOIN ct USING (b), nt
    )
    SELECT sum(m)::DOUBLE / 1000000.0 AS chi2,
           ((count(DISTINCT a) - 1) * (count(DISTINCT b) - 1))::BIGINT AS dof,
           max(n)::BIGINT AS n,
           round(CASE WHEN least(count(DISTINCT a), count(DISTINCT b)) > 1
                       AND max(n) > 0
                 THEN sqrt((sum(m)::DOUBLE / 1000000.0)
                           / (max(n)::DOUBLE
                              * (least(count(DISTINCT a),
                                       count(DISTINCT b)) - 1)))
                 END, 6) AS cramers_v
    FROM contrib
    """,
)
def q_chi2_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lang × source independence with Cramér's V — the mixture-balance
    audit with an effect size: χ² over 20M rows is always 'significant';
    V says whether language composition actually differs across sources
    enough to matter.  Multi-level × multi-level (min(r,c) > 2), so V
    exercises the non-phi branch."""
    from es_ch_sync_spark.operators.analytics import chi2_independence

    return chi2_independence(
        _t(spark, sf_dir, "documents"), "lang", "source"
    )


@register(
    "nmi_lang_source",
    """
    WITH j AS MATERIALIZED (
        SELECT lang AS label_a, source AS label_b, count(*)::BIGINT AS n
        FROM documents GROUP BY 1, 2
    ),
    ca AS MATERIALIZED (SELECT label_a, sum(n)::BIGINT AS a FROM j GROUP BY 1),
    cb AS MATERIALIZED (SELECT label_b, sum(n)::BIGINT AS b FROM j GROUP BY 1),
    tot AS (SELECT sum(n)::BIGINT AS n_items FROM j),
    mi AS (
        SELECT sum(j.n::HUGEINT
                   * (CAST(round(ln(tot.n_items) * 1000000) AS BIGINT)
                      + CAST(round(ln(j.n) * 1000000) AS BIGINT)
                      - CAST(round(ln(ca.a) * 1000000) AS BIGINT)
                      - CAST(round(ln(cb.b) * 1000000) AS BIGINT))::HUGEINT
               )::HUGEINT AS smi
        FROM j JOIN ca USING (label_a) JOIN cb USING (label_b), tot
    ),
    ha AS (
        SELECT sum(a::HUGEINT
                   * (CAST(round(ln(tot.n_items) * 1000000) AS BIGINT)
                      - CAST(round(ln(a) * 1000000) AS BIGINT))::HUGEINT
               )::HUGEINT AS sha
        FROM ca, tot
    ),
    hb AS (
        SELECT sum(b::HUGEINT
                   * (CAST(round(ln(tot.n_items) * 1000000) AS BIGINT)
                      - CAST(round(ln(b) * 1000000) AS BIGINT))::HUGEINT
               )::HUGEINT AS shb
        FROM cb, tot
    )
    SELECT n_items,
           round(smi::DOUBLE / (n_items::DOUBLE * 1000000.0), 6) AS mi_nats,
           round(sha::DOUBLE / (n_items::DOUBLE * 1000000.0), 6) AS h_a_nats,
           round(shb::DOUBLE / (n_items::DOUBLE * 1000000.0), 6) AS h_b_nats,
           round(CASE WHEN sha > 0 THEN smi::DOUBLE / sha::DOUBLE END, 6)
               AS homogeneity,
           round(CASE WHEN shb > 0 THEN smi::DOUBLE / shb::DOUBLE END, 6)
               AS completeness,
           round(CASE WHEN sha + shb > 0
                 THEN 2.0 * smi::DOUBLE / (sha + shb)::DOUBLE END, 6)
               AS v_measure
    FROM tot, mi, ha, hb
    """,
)
def q_nmi_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information / NMI between document language and source —
    the information-theoretic effect size next to chi2_lang_source's
    significance: how many nats does knowing the source tell you about
    the language (homogeneity = MI/H(lang): are sources language-pure)?
    Same micro-quantized-ln census contract as nmi_exact_vs_lsh; the
    contingency is |langs|×|sources| cells off one hash aggregate."""
    from es_ch_sync_spark.operators.analytics import nmi_vmeasure

    docs = _t(spark, sf_dir, "documents")
    la = docs.select("doc_id", F.col("lang").alias("label_a"))
    lb = docs.select("doc_id", F.col("source").alias("label_b"))
    return nmi_vmeasure(la, lb, "doc_id")


@register(
    "jackknife_source_means",
    """
    WITH per AS (
        SELECT source AS g, count(*)::BIGINT AS n_rows,
               sum(CAST(n_chars::DECIMAL(24,6) * 1000000 AS BIGINT))::BIGINT
                   AS s
        FROM documents
        WHERE source IS NOT NULL AND n_chars IS NOT NULL
        GROUP BY 1
    ),
    tot AS (SELECT sum(n_rows)::BIGINT AS nn, sum(s)::BIGINT AS ss FROM per)
    SELECT g AS source, n_rows,
           round(CASE WHEN nn > n_rows
                 THEN (ss - s)::DOUBLE / (nn - n_rows)::DOUBLE / 1e6
                 END, 6) AS loo_mean,
           round(ss::DOUBLE / nn::DOUBLE / 1e6
                 - CASE WHEN nn > n_rows
                   THEN (ss - s)::DOUBLE / (nn - n_rows)::DOUBLE / 1e6
                   END, 6) AS influence
    FROM per, tot ORDER BY source
    """,
)
def q_jackknife_source_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-source-out means of document length (n_chars) — the
    influence audit behind source capping: which source is pulling the
    corpus mean, and by how much?  Per-source exact integer moments
    off one scan; global totals aggregate FROM the census and
    broadcast back, so each readout is one float expression."""
    from es_ch_sync_spark.operators.analytics import jackknife_group_means

    return jackknife_group_means(
        _t(spark, sf_dir, "documents"), "source", "n_chars"
    )


_HILL_KS = (50, 100, 200)


@register(
    "doc_length_tail_index",
    f"""
    WITH top AS (
        SELECT n_chars::DOUBLE AS v, doc_id
        FROM documents WHERE n_chars > 0
        ORDER BY v DESC, doc_id LIMIT {max(_HILL_KS) + 1}
    ),
    ranked AS (
        SELECT CAST(round(ln(v) * 1000000) AS BIGINT) AS l, v,
               row_number() OVER (ORDER BY v DESC, doc_id) AS r
        FROM top
    ),
    g AS (
        SELECT count(*)::BIGINT AS n,
               {", ".join(
                   f"sum(CASE WHEN r <= {k} THEN l END)::BIGINT AS s{k}, "
                   f"max(CASE WHEN r = {k + 1} THEN l END)::BIGINT AS t{k}, "
                   f"max(CASE WHEN r = {k} THEN v END) AS x{k}"
                   for k in _HILL_KS
               )}
        FROM ranked
    )
    SELECT k::BIGINT AS k, x_k,
           round(CASE WHEN n > k AND (s - k * t) > 0
                 THEN k::DOUBLE * 1000000.0 / (s - k * t)::DOUBLE END, 6)
               AS alpha_hill
    FROM (
        {" UNION ALL ".join(
            f"SELECT {k} AS k, s{k} AS s, t{k} AS t, x{k} AS x_k, n FROM g"
            for k in _HILL_KS
        )}
    ) ORDER BY k
    """,
)
def q_doc_length_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill tail exponent of the document-length distribution at head
    sizes 50/100/200 — is the length tail Pareto (constant α) or not?
    The whale-policy readout next to winsorized/mad robust stats.
    Constant-size TakeOrderedAndProject head; micro-quantized ln; one
    float division per k."""
    from es_ch_sync_spark.operators.analytics import hill_tail_index

    return hill_tail_index(
        _t(spark, sf_dir, "documents"), "n_chars", "doc_id", ks=_HILL_KS
    )
