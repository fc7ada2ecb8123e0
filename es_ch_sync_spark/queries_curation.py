"""Corpus-curation query registrations (round-2 batch 2): PII redaction,
cross-document exact-substring statistics, temperature resampling,
calendar gap-fill + LOCF, and semantic (embedding-cluster) dedup.

Same contract as queries.py: every entry is a (Spark fn, DuckDB oracle)
pair with identical column aliases and engine-stable arithmetic (integer
cutoffs, DECIMAL sums, rounds applied on both sides before comparisons).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from es_ch_sync_spark import oracles
from es_ch_sync_spark.io.sources import read_parquet_table
from es_ch_sync_spark.queries import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_parquet_table(spark, sf_dir, "documents")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_parquet_table(spark, sf_dir, "events")


# ---------------------------------------------------------------------------
# PII redaction.  The synthetic corpus contains no PII, so the query plants
# deterministic synthetic PII as part of the query itself — the SAME
# augmentation expression in Spark and in the oracle — so the redaction
# regexes are genuinely exercised and checked cross-engine (counts vary by
# doc_id residue; the md5 of the redacted text pins the rewrite bytes).
# ---------------------------------------------------------------------------

_PII_AUG_SPARK = (
    "concat(text,"
    " CASE WHEN doc_id % 2 = 0 THEN concat(' contact user', cast(doc_id AS string),"
    "      '@mail.example.com') ELSE '' END,"
    " CASE WHEN doc_id % 3 = 0 THEN concat(' from 192.0.', cast(doc_id % 254 + 1 AS string),"
    "      '.7') ELSE '' END,"
    " ' tel 555-', lpad(cast(doc_id % 1000 AS string), 3, '0'),"
    " '-', lpad(cast(doc_id % 10000 AS string), 4, '0'))"
)

_PII_AUG_SQL = (
    "text"
    " || CASE WHEN doc_id % 2 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)"
    "      || '@mail.example.com' ELSE '' END"
    " || CASE WHEN doc_id % 3 = 0 THEN ' from 192.0.' || CAST(doc_id % 254 + 1 AS VARCHAR)"
    "      || '.7' ELSE '' END"
    " || ' tel 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')"
    " || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)


def _redact_oracle() -> str:
    from es_ch_sync_spark.operators.text import PII_RULES

    redacted = "aug"
    for _name, pat, repl in PII_RULES:
        redacted = f"regexp_replace({redacted}, '{pat}', '{repl}', 'g')"
    counts = ",\n           ".join(
        f"len(regexp_extract_all(aug, '{pat}'))::BIGINT AS n_{name}"
        for name, pat, _repl in PII_RULES
    )
    return f"""
    WITH a AS (SELECT doc_id, {_PII_AUG_SQL} AS aug FROM documents)
    SELECT doc_id,
           {counts},
           md5({redacted}) AS redacted_md5,
           length({redacted})::BIGINT AS redacted_len
    FROM a
    """


@register("redact_pii", _redact_oracle())
def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus PII scrub: email/phone/IPv4 redaction as chained global
    regexp_replace — a narrow map fused into the scan (operators/text.py
    PII_RULES).  Counts audit the unredacted text; md5 pins the rewrite."""
    from es_ch_sync_spark.operators.text import pii_counts, redact_pii

    aug = _docs(spark, sf_dir).select(
        "doc_id", F.expr(_PII_AUG_SPARK).alias("aug")
    )
    red = redact_pii(F.col("aug"))
    cols = [F.col("doc_id")]
    cols += [
        c.cast("long").alias(f"n_{name}") for name, c in pii_counts(F.col("aug")).items()
    ]
    cols += [
        F.md5(red).alias("redacted_md5"),
        F.length(red).cast("long").alias("redacted_len"),
    ]
    return aug.select(*cols)


# ---------------------------------------------------------------------------
# Cross-document duplicate n-grams (Lee et al. 2022 exact-substring signal)
# ---------------------------------------------------------------------------

def _cross_doc_oracle(k: int = 3) -> str:
    return f"""
    {oracles._shingles_cte(k)}
    , grams AS (SELECT doc_id, unnest(shs) AS g FROM sh),
    dfreq AS (SELECT g, count(*) AS ndocs FROM grams GROUP BY g)
    SELECT doc_id,
           count(*) AS n_shingles,
           sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_shared,
           round(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END)::DOUBLE
                 / count(*)::DOUBLE, 6) AS shared_frac,
           max(ndocs) AS max_gram_docs
    FROM grams JOIN dfreq USING (g)
    GROUP BY doc_id
    """


@register("cross_doc_ngrams", _cross_doc_oracle(3))
def q_cross_doc_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc cross-corpus duplicate 3-gram stats — the exact-substring
    dedup signal: explode → doc-frequency agg → gram-key join back."""
    from es_ch_sync_spark.operators.dedup import cross_doc_shingle_stats

    return cross_doc_shingle_stats(_docs(spark, sf_dir), k=3)


# ---------------------------------------------------------------------------
# Temperature resampling by source (alpha = 0.5 over char mass)
# ---------------------------------------------------------------------------

def _temperature_oracle(target_total: int, seed: str) -> str:
    from es_ch_sync_spark.operators.sampling import SPLIT_BUCKETS

    b = oracles._hash_bucket_sql("doc_id", seed)
    return f"""
    WITH per_src AS (
        SELECT source, floor(sqrt(sum(n_chars)::DOUBLE))::BIGINT AS w,
               count(*) AS n_docs
        FROM documents GROUP BY source
    ), tot AS (SELECT sum(w)::BIGINT AS w_total FROM per_src),
    rates AS (
        SELECT source, (({target_total} * w) // w_total * {SPLIT_BUCKETS}) // n_docs AS cutoff
        FROM per_src CROSS JOIN tot
    )
    SELECT d.doc_id, d.source, r.cutoff
    FROM documents d JOIN rates r USING (source)
    WHERE {b} < r.cutoff
    """


@register("temperature_sample", _temperature_oracle(200, "temp"))
def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """alpha=0.5 temperature resampling across sources — integer cutoff
    arithmetic end-to-end, so membership is bit-stable cross-engine."""
    from es_ch_sync_spark.operators.sampling import temperature_resample

    return temperature_resample(
        _docs(spark, sf_dir), target_total=200, seed="temp"
    )


# ---------------------------------------------------------------------------
# Calendar gap-fill + LOCF
# ---------------------------------------------------------------------------

_GAPFILL_ORACLE = """
    WITH daily AS (
        SELECT user_id, date_trunc('day', ts)::TIMESTAMP AS bucket,
               floor(sum(value::DECIMAL(18,2))::DOUBLE / count(value)
                     * 10000 + 0.5) / 10000 AS v_avg
        FROM events GROUP BY user_id, date_trunc('day', ts)
    ), spans AS (
        SELECT user_id, min(bucket) AS d0, max(bucket) AS d1 FROM daily GROUP BY user_id
    ), cal AS (
        SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::TIMESTAMP AS bucket
        FROM spans
    )
    SELECT cal.user_id, cal.bucket, daily.v_avg,
           last_value(daily.v_avg IGNORE NULLS) OVER (
               PARTITION BY cal.user_id ORDER BY cal.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS v_filled,
           CASE WHEN daily.v_avg IS NULL THEN 1 ELSE 0 END AS is_gap
    FROM cal LEFT JOIN daily USING (user_id, bucket)
"""


@register("gapfill_locf", _GAPFILL_ORACLE)
def q_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily calendar densify + last-observation-carried-forward per user —
    sequence/explode calendar, left join, one window pass (analytics.py)."""
    from es_ch_sync_spark.operators.analytics import gapfill_locf

    return gapfill_locf(_events(spark, sf_dir), "user_id", "ts", "value")


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup): k-means cells + in-cell exact cosine pairs
# ---------------------------------------------------------------------------

@register("semantic_dedup", oracles.semantic_near_dup_sql(k=4, iters=2, threshold=0.3))
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cluster-then-pairwise semantic dedup: cosine >= 0.3 pairs
    within k-means cells only (clustering.semantic_near_duplicates)."""
    from es_ch_sync_spark.operators.clustering import semantic_near_duplicates

    emb = read_parquet_table(spark, sf_dir, "embeddings")
    return semantic_near_duplicates(emb, k=4, iters=2, threshold=0.3)


# ---------------------------------------------------------------------------
# Per-group OLS trend from exact sufficient statistics
# ---------------------------------------------------------------------------

_LINREG_ORACLE = """
    WITH pts AS (
        SELECT event_type,
               epoch_us(ts)::BIGINT // 1000000 - 1704067200 AS x,
               value::DECIMAL(18,2) AS y
        FROM events WHERE value IS NOT NULL
    ), s AS (
        SELECT event_type,
               count(*) AS n,
               sum(x)::BIGINT AS sx,
               sum(x * x)::BIGINT AS sxx,
               sum(y) AS sy,
               sum(y * y) AS syy,
               sum(y * x) AS sxy
        FROM pts GROUP BY event_type
    )
    SELECT event_type, n,
        round(CASE WHEN n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE > 0
              THEN (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                   / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
              ELSE 0.0 END, 6) AS slope,
        round((sy::DOUBLE
               - CASE WHEN n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE > 0
                 THEN (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                      / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                 ELSE 0.0 END * sx::DOUBLE) / n::DOUBLE, 6) AS intercept,
        round(CASE WHEN n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE > 0
                    AND n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE > 0
              THEN (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                   * (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                   / ((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                      * (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE))
              ELSE 0.0 END, 6) AS r2
    FROM s
"""


@register("linreg_trend", _LINREG_ORACLE)
def q_linreg_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS value-vs-time trend (regr_slope/intercept/r2)
    from exact integer/DECIMAL sufficient statistics — one aggregate,
    association-order-free, final arithmetic in doubles at 6dp."""
    from es_ch_sync_spark.operators.analytics import linreg_trend

    return linreg_trend(_events(spark, sf_dir), "event_type", "ts", "value")


# ---------------------------------------------------------------------------
# Market-basket co-occurrence of event types per user
# ---------------------------------------------------------------------------

_COOCCUR_ORACLE = """
    WITH base AS (SELECT DISTINCT user_id AS ent, event_type AS it FROM events),
    pair_counts AS (
        SELECT a.it AS it_a, b.it AS it_b, count(*) AS n_both
        FROM base a JOIN base b ON a.ent = b.ent AND a.it < b.it
        GROUP BY a.it, b.it HAVING count(*) >= 2
    ),
    reach AS (SELECT it, count(*) AS n FROM base GROUP BY it),
    tot AS (SELECT count(DISTINCT ent) AS n_entities FROM base)
    SELECT it_a, it_b, n_both, ra.n AS n_a, rb.n AS n_b,
           round(n_both::DOUBLE * n_entities::DOUBLE / (ra.n::DOUBLE * rb.n::DOUBLE), 6) AS lift
    FROM pair_counts
    JOIN reach ra ON pair_counts.it_a = ra.it
    JOIN reach rb ON pair_counts.it_b = rb.it
    CROSS JOIN tot
"""


@register("cooccurrence_pairs", _COOCCUR_ORACLE)
def q_cooccurrence_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type co-occurrence with lift: distinct (user, type) self-join
    on user (a-priori counting shape), reach/total attach by broadcast."""
    from es_ch_sync_spark.operators.analytics import cooccurrence_pairs

    return cooccurrence_pairs(_events(spark, sf_dir), "user_id", "event_type")


# ---------------------------------------------------------------------------
# Statistical outlier gate: |z| > cut from exact group moments
# ---------------------------------------------------------------------------

_ZSCORE_ORACLE = """
    WITH s AS (
        SELECT event_type, count(*) AS n, sum(value::DECIMAL(18,2)) AS sy,
               sum(value::DECIMAL(18,2) * value::DECIMAL(18,2)) AS syy
        FROM events WHERE value IS NOT NULL GROUP BY event_type
    ), m AS (
        SELECT event_type, sy::DOUBLE / n::DOUBLE AS mu,
               sqrt((n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)
                    / (n::DOUBLE * n::DOUBLE)) AS sigma
        FROM s
    )
    SELECT event_id, e.event_type, value,
           round(CASE WHEN sigma > 0 THEN (value - mu) / sigma ELSE 0.0 END, 6) AS zscore
    FROM events e JOIN m ON e.event_type = m.event_type
    WHERE value IS NOT NULL
      AND abs(round(CASE WHEN sigma > 0 THEN (value - mu) / sigma ELSE 0.0 END, 6)) > 3.0
"""


@register("zscore_anomalies", _ZSCORE_ORACLE)
def q_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score outliers (|z| > 3) from exact DECIMAL
    moments; one aggregate broadcast back onto the stream."""
    from es_ch_sync_spark.operators.analytics import zscore_anomalies

    return zscore_anomalies(_events(spark, sf_dir), "event_type", "value", "event_id")


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (A-Res)
# ---------------------------------------------------------------------------

def _weighted_sample_oracle(m: int, seed: str) -> str:
    from es_ch_sync_spark.operators.sampling import SPLIT_BUCKETS

    b = oracles._hash_bucket_sql("doc_id", seed)
    return f"""
    SELECT doc_id, n_chars,
           round(-ln(({b} + 1)::DOUBLE / {float(SPLIT_BUCKETS + 1)})
                 / n_chars::DOUBLE, 9) AS skey
    FROM documents WHERE n_chars > 0
    ORDER BY skey ASC, doc_id ASC
    LIMIT {m}
    """


@register("weighted_sample", _weighted_sample_oracle(100, "wsample"))
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis-Spirakis A-Res weighted sample (m=100, weight=n_chars):
    deterministic hash uniforms, round-before-rank keys, top-m as
    TakeOrderedAndProject."""
    from es_ch_sync_spark.operators.sampling import weighted_sample

    return weighted_sample(_docs(spark, sf_dir), m=100, seed="wsample")


# ---------------------------------------------------------------------------
# Tall -> wide repivot (inverse of the reference's unpivot)
# ---------------------------------------------------------------------------

_REPIVOT_ORACLE = """
    WITH tall AS (
        SELECT user_id AS token_id, ts AS timestamp, 'value' AS name,
               value AS value_number, CAST(NULL AS VARCHAR) AS value_string
        FROM events WHERE value IS NOT NULL
        UNION ALL
        SELECT user_id, ts, 'value_pct', value * 100.0, NULL
        FROM events WHERE value IS NOT NULL
        UNION ALL
        SELECT user_id, ts, 'event_type', NULL, event_type
        FROM events WHERE event_type IS NOT NULL
        UNION ALL
        SELECT user_id, ts, 'props', NULL, props
        FROM events WHERE props IS NOT NULL
    )
    SELECT token_id, timestamp,
           max(CASE WHEN name = 'value' THEN value_number END) AS v_value,
           max(CASE WHEN name = 'value_pct' THEN value_number END) AS v_value_pct,
           max(CASE WHEN name = 'event_type' THEN value_string END) AS s_event_type,
           max(CASE WHEN name = 'props' THEN value_string END) AS s_props
    FROM tall GROUP BY token_id, timestamp
"""


@register("repivot_signals", _REPIVOT_ORACLE)
def q_repivot_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip of the reference's wide→tall unpivot: conditional-agg
    pivot of the tall signal frame back to wide columns per (token, ts) —
    one aggregate, no Spark .pivot() two-pass schema inference."""
    from es_ch_sync_spark.catalog import EVENTS_CATALOG
    from es_ch_sync_spark.operators.transform import unpivot_signals

    df = _events(spark, sf_dir).withColumn("src", F.lit("events"))
    tall = unpivot_signals(
        df, EVENTS_CATALOG, token_col="user_id", ts_col="ts", source_col="src"
    )
    return tall.groupBy("token_id", "timestamp").agg(
        F.max(F.when(F.col("name") == "value", F.col("value_number"))).alias("v_value"),
        F.max(F.when(F.col("name") == "value_pct", F.col("value_number"))).alias(
            "v_value_pct"
        ),
        F.max(F.when(F.col("name") == "event_type", F.col("value_string"))).alias(
            "s_event_type"
        ),
        F.max(F.when(F.col("name") == "props", F.col("value_string"))).alias("s_props"),
    )


# ---------------------------------------------------------------------------
# Incremental semantic dedup: new batch vs frozen base-corpus cells
# ---------------------------------------------------------------------------

@register(
    "semantic_dedup_incremental",
    oracles.semantic_incremental_sql(k=4, iters=2, threshold=0.3, mod=10),
)
def q_semantic_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time semantic dedup: vec_id % 10 == 0 is the arriving batch;
    cells fit on the base split only, new vectors assign to the frozen
    re-centered centroids, and only pairs touching the batch are scored
    (clustering.semantic_near_duplicates_incremental)."""
    from es_ch_sync_spark.operators.clustering import semantic_near_duplicates_incremental

    emb = read_parquet_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.pmod(F.col("vec_id"), F.lit(10)) != 0)
    new = emb.filter(F.pmod(F.col("vec_id"), F.lit(10)) == 0)
    return semantic_near_duplicates_incremental(base, new, k=4, iters=2, threshold=0.3)


# ---------------------------------------------------------------------------
# Grouped k-fold CV + class-balanced oversampling (operators.sampling)
# ---------------------------------------------------------------------------

def _kfold_oracle() -> str:
    b = oracles._hash_bucket_sql("source", "fold")
    return f"""
    SELECT fold, source, count(*) AS n_docs
    FROM (SELECT source, ({b}) % 5 AS fold
          FROM documents WHERE source IS NOT NULL)
    GROUP BY fold, source
    ORDER BY fold, source
    """


@register("kfold_groups", _kfold_oracle())
def q_kfold_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped 5-fold CV assignment: the fold hashes from the GROUP
    (source), so all docs of a source share a fold — the leakage guard
    for correlated groups.  Shuffle-free hash arithmetic; the per-
    (fold, source) census proves no group ever straddles folds (each
    source appears under exactly one fold)."""
    from es_ch_sync_spark.operators.sampling import kfold_assign

    docs = _docs(spark, sf_dir).filter(F.col("source").isNotNull())
    return (
        kfold_assign(docs, k=5, group_col="source")
        .groupBy("fold", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("fold", "source")
    )


def _oversample_oracle(max_factor: int = 20) -> str:
    from es_ch_sync_spark.operators.sampling import SPLIT_BUCKETS

    b = oracles._hash_bucket_sql("doc_id", "bal")
    return f"""
    WITH cnt AS (
        SELECT lang, count(*) AS c FROM documents
        WHERE lang IS NOT NULL GROUP BY lang
    ),
    mx AS (SELECT max(c) AS m FROM cnt),
    stats AS (
        SELECT lang, least(m // c, {max_factor}) AS base,
               -- exact integer division: ::BIGINT on a fractional double
               -- ROUNDS in DuckDB (truncates in Spark), and the rounding
               -- mode itself changed between DuckDB versions.  `//` on
               -- BIGINTs is version-independent and matches Spark's div().
               ((m % c) * {SPLIT_BUCKETS}) // c AS extra_cut
        FROM cnt, mx
    )
    SELECT d.lang,
           sum(CASE WHEN base < {max_factor} AND ({b}) < extra_cut
                    THEN base + 1 ELSE base END)::BIGINT AS n_rows,
           count(*) AS n_unique
    FROM documents d JOIN stats USING (lang)
    WHERE d.lang IS NOT NULL
    GROUP BY d.lang
    ORDER BY d.lang
    """


@register("oversample_balance", _oversample_oracle())
def q_oversample_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced oversampling by language: minority classes
    replicate toward the majority count via a map-side
    explode(sequence()) with a deterministic hash-selected remainder —
    no RNG, no join back to the fact, class stats a broadcast.  The
    census (post-balance rows + distinct docs per class) pins the exact
    replication arithmetic."""
    from es_ch_sync_spark.operators.sampling import oversample_balance

    docs = _docs(spark, sf_dir).filter(F.col("lang").isNotNull())
    return (
        oversample_balance(docs, class_col="lang")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("doc_id").alias("n_unique"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Corpus-frequency boilerplate removal (CCNet-style paragraph dedup at
# token-chunk granularity; dedup.remove_boilerplate_chunks)
# ---------------------------------------------------------------------------

@register("boilerplate_chunks", oracles.boilerplate_chunks_sql(chunk_tokens=4, min_docs=2))
def q_boilerplate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunks whose exact content occurs in >= 2 distinct documents are
    cut from every document carrying them — DF-thresholded boilerplate
    (breadth across docs), distinct from dup-span removal (any repeat)."""
    from es_ch_sync_spark.operators.dedup import remove_boilerplate_chunks

    return remove_boilerplate_chunks(
        _docs(spark, sf_dir), chunk_tokens=4, min_docs=2
    )


@register("language_mixture", oracles.language_mixture_sql())
def q_language_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus language-balance report (argmax-stopword lang id): the
    mixture a multilingual pretraining pipeline monitors."""
    from es_ch_sync_spark.operators.text import language_mixture

    return language_mixture(_docs(spark, sf_dir))


@register(
    "doc_length_histogram",
    f"""
    WITH n AS (
        SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
        FROM documents
    ),
    l AS (SELECT len(string_split(nt, ' ')) AS n_tok FROM n),
    b AS (SELECT CASE WHEN n_tok <= 0 THEN 0
                      ELSE cast(floor(log2(n_tok)) AS int) + 1 END AS bucket,
                 n_tok FROM l)
    SELECT bucket,
           power(2, bucket - 1)::BIGINT AS bucket_lo,
           count(*) AS n_docs,
           sum(n_tok)::BIGINT AS n_tokens
    FROM b GROUP BY bucket
    """,
)
def q_doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length distribution in power-of-two buckets — the diagnostic
    that sizes pack_sequences' budget and flags truncation exposure
    (docs above the training context length).  Pure map + tiny-key
    aggregate; no data-sized shuffle."""
    from es_ch_sync_spark.operators.text import token_count_ws

    n_tok = token_count_ws(F.col("text"))
    bucket = F.when(n_tok <= 0, F.lit(0)).otherwise(
        F.floor(F.log2(n_tok)).cast("int") + 1
    )
    return (
        _docs(spark, sf_dir)
        .select(bucket.alias("bucket"), n_tok.alias("n_tok"))
        .groupBy("bucket")
        .agg(
            F.pow(F.lit(2.0), F.col("bucket") - 1).cast("long").alias("bucket_lo"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
        .select("bucket", "bucket_lo", "n_docs", "n_tokens")
    )


@register(
    "source_overlap_matrix",
    """
    WITH corpus AS (
        SELECT source, text FROM documents
        UNION ALL
        SELECT 'mirror', text FROM documents WHERE doc_id % 40 = 0
    ),
    fp AS (
        SELECT source,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
        FROM corpus
    ),
    sf AS (SELECT DISTINCT source, fp FROM fp)
    SELECT a.source AS source_a, b.source AS source_b,
           count(*) AS shared_docs
    FROM sf a JOIN sf b ON a.fp = b.fp AND a.source < b.source
    GROUP BY a.source, b.source
    """,
)
def q_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source exact-content overlap: for every source pair, how many
    normalized-text fingerprints appear in BOTH — the leakage matrix that
    catches one feed republishing another (and train/eval cross-bleed
    when sources map to splits).  The synthetic corpus has disjoint
    sources, so the query PLANTS a republishing feed deterministically
    (every 40th doc mirrored under source 'mirror' — the same
    planted-fixture pattern redact_pii uses) and the oracle replicates
    the planting.  Fingerprint-keyed self-join on distinct (source, fp):
    shuffles 32-byte hashes, never documents; the pair surface is
    per-fingerprint source lists, bounded by source count."""
    from es_ch_sync_spark.operators.text import fingerprint_md5

    docs = _docs(spark, sf_dir)
    corpus = docs.select("source", "text").unionByName(
        docs.filter(F.col("doc_id") % 40 == 0).select(
            F.lit("mirror").alias("source"), "text"
        )
    )
    sf = corpus.select(
        "source", fingerprint_md5(F.col("text")).alias("fp")
    ).distinct()
    a, b = sf.alias("a"), sf.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared_docs"))
    )


# ---------------------------------------------------------------------------
# DSIR importance resampling (Xie et al., NeurIPS 2023)
# ---------------------------------------------------------------------------

def _dsir_oracle(n_buckets: int = 512, n_select: int = 100) -> str:
    fold = (
        "list_reduce(list_prepend(0::BIGINT, "
        "list_transform(range(1, 15), j -> "
        "(strpos('0123456789abcdef', substr(md5('dsir:' || g), j, 1)) - 1)::BIGINT)), "
        f"(a, b) -> a * 16 + b) % {n_buckets}"
    )
    return f"""
    WITH n AS (
        SELECT doc_id, lang, {oracles.NORM.format(col='text')} AS nt
        FROM documents WHERE text IS NOT NULL
    ),
    w AS (SELECT doc_id, lang, string_split(nt, ' ') AS ws FROM n),
    g AS (
        SELECT doc_id, lang, unnest(ws) AS g FROM w
        UNION ALL
        SELECT doc_id, lang, ws[i] || ' ' || ws[i + 1] AS g
        FROM w, unnest(range(1, len(ws))) AS t(i)
    ),
    gb AS (
        SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS t,
               {fold} AS b
        FROM g
    ),
    census AS (
        SELECT b, sum(t)::BIGINT AS c_t, count(*)::BIGINT AS c_r
        FROM gb GROUP BY b
    ),
    tot AS (SELECT sum(c_t)::BIGINT AS ct, sum(c_r)::BIGINT AS cr FROM census),
    delta AS (
        SELECT b,
               ln((c_t + 1)::DOUBLE / (ct + {n_buckets})::DOUBLE)
             - ln((c_r + 1)::DOUBLE / (cr + {n_buckets})::DOUBLE) AS d
        FROM census, tot
    ),
    db AS (SELECT doc_id, b, count(*)::BIGINT AS c_db FROM gb GROUP BY 1, 2),
    score AS (
        SELECT db.doc_id,
               CAST(sum(floor(c_db::DOUBLE * d * 1e9 + 0.5)::BIGINT)
                    AS BIGINT)::DOUBLE / 1e9 AS dsir_score
        FROM db JOIN delta USING (b)
        GROUP BY db.doc_id
    )
    SELECT doc_id, dsir_score FROM score
    ORDER BY dsir_score DESC, doc_id ASC
    LIMIT {n_select}
    """


@register("dsir_select", _dsir_oracle())
def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection with Importance Resampling: rank the raw corpus by
    log p_target − log p_raw under hashed-ngram bag models fit on the
    'en' subset vs everything, keep the top 100 — the published
    target-matching curation recipe, fully relational (B-row model,
    broadcast log-ratio join, quantized order-independent doc sums)."""
    from es_ch_sync_spark.operators.sampling import dsir_select

    docs = _docs(spark, sf_dir)
    return dsir_select(docs, target=F.col("lang") == "en", n_select=100)


_MIX_WEIGHTS = {"src1": 400, "src2": 300, "src3": 200, "src4": 100}
_MIX_BUDGET = 1_000_000


def _mixture_plan_oracle() -> str:
    cases = " ".join(
        f"WHEN '{s}' THEN {w}" for s, w in _MIX_WEIGHTS.items()
    )
    w_tot = sum(_MIX_WEIGHTS.values())
    b = _MIX_BUDGET
    return f"""
    WITH per_src AS (
        SELECT source, count(*) AS n_docs,
               sum(len(string_split({oracles.NORM.format(col='text')}, ' ')))::BIGINT
                   AS n_tokens,
               CASE source {cases} ELSE NULL END AS w
        FROM documents
        WHERE text IS NOT NULL AND source IS NOT NULL
        GROUP BY source
    )
    SELECT source, n_docs, n_tokens,
           ({b} * w) // {w_tot} AS target_tokens,
           (({b} * w) // {w_tot}) // n_tokens AS full_epochs,
           round(((({b} * w) // {w_tot}) % n_tokens)::DOUBLE
                 / n_tokens::DOUBLE, 6) AS final_pass_frac
    FROM per_src WHERE w IS NOT NULL ORDER BY source
    """


@register(
    "temperature_mixture",
    f"""
    WITH per AS (
        SELECT source, count(*)::BIGINT AS n_docs,
               sum(len(string_split({oracles.NORM.format(col='text')},
                                    ' ')))::BIGINT AS n_tokens
        FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
        GROUP BY 1
    ),
    q AS (
        SELECT *, CAST(floor(exp(0.7 * ln(n_tokens::DOUBLE)) * 1e6 + 0.5)
                       AS BIGINT) AS qa
        FROM per
    ),
    tot AS (SELECT sum(qa)::BIGINT AS qt, sum(n_tokens)::BIGINT AS tt FROM q)
    SELECT source, n_docs, n_tokens,
           round(n_tokens::DOUBLE / tt::DOUBLE, 6) AS natural_share,
           round(qa::DOUBLE / qt::DOUBLE, 6) AS p_temperature,
           round(qa::DOUBLE / qt::DOUBLE * tt::DOUBLE / n_tokens::DOUBLE, 6)
               AS epochs_at_corpus_budget
    FROM q, tot ORDER BY source
    """,
)
def q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based (α = 0.7) mixture weights over the per-source
    token mass — WHERE mixture_plan's weights come from: p_s ∝ c_s^0.7,
    the XLM-R knob that keeps high-resource sources from drowning the
    tail, with the epochs-at-corpus-budget repeat-risk flag.  Each
    c^α micro-quantizes before the source-census normalizing sum."""
    from es_ch_sync_spark.operators.sampling import temperature_mixture

    return temperature_mixture(_docs(spark, sf_dir), alpha=0.7)


@register("mixture_plan", _mixture_plan_oracle())
def q_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budgeted mixture planning: per-source target tokens, full
    epochs, and final-pass sampling fraction from permille weights —
    all-integer arithmetic, bit-identical cross-engine."""
    from es_ch_sync_spark.operators.sampling import mixture_plan

    return mixture_plan(_docs(spark, sf_dir), _MIX_WEIGHTS, _MIX_BUDGET)


def _dsir_apply_oracle(n_buckets: int = 512, n_select: int = 50) -> str:
    fold = (
        "list_reduce(list_prepend(0::BIGINT, "
        "list_transform(range(1, 15), j -> "
        "(strpos('0123456789abcdef', substr(md5('dsir:' || g), j, 1)) - 1)::BIGINT)), "
        f"(a, b) -> a * 16 + b) % {n_buckets}"
    )
    return f"""
    WITH n AS (
        SELECT doc_id, lang, {oracles.NORM.format(col='text')} AS nt
        FROM documents WHERE text IS NOT NULL
    ),
    w AS (SELECT doc_id, lang, string_split(nt, ' ') AS ws FROM n),
    g AS (
        SELECT doc_id, lang, unnest(ws) AS g FROM w
        UNION ALL
        SELECT doc_id, lang, ws[i] || ' ' || ws[i + 1] AS g
        FROM w, unnest(range(1, len(ws))) AS t(i)
    ),
    gb AS (
        SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS t,
               {fold} AS b
        FROM g
    ),
    census AS (
        SELECT b, sum(t)::BIGINT AS c_t, count(*)::BIGINT AS c_r
        FROM gb GROUP BY b
    ),
    tot AS (SELECT sum(c_t)::BIGINT AS ct, sum(c_r)::BIGINT AS cr FROM census),
    delta AS (
        SELECT b,
               ln((c_t + 1)::DOUBLE / (ct + {n_buckets})::DOUBLE)
             - ln((c_r + 1)::DOUBLE / (cr + {n_buckets})::DOUBLE) AS d
        FROM census, tot
    ),
    db AS (
        SELECT doc_id, b, count(*)::BIGINT AS c_db FROM gb
        WHERE doc_id % 3 = 0 GROUP BY 1, 2
    ),
    score AS (
        SELECT db.doc_id,
               CAST(sum(floor(c_db::DOUBLE * coalesce(d, 0.0) * 1e9 + 0.5)::BIGINT)
                    AS BIGINT)::DOUBLE / 1e9 AS dsir_score
        FROM db LEFT JOIN delta USING (b)
        GROUP BY db.doc_id
    )
    SELECT doc_id, dsir_score FROM score
    ORDER BY dsir_score DESC, doc_id ASC
    LIMIT {n_select}
    """


@register("dsir_apply_batch", _dsir_apply_oracle())
def q_dsir_apply_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR in its SERVING shape: the hashed-ngram importance model is
    fit ONCE on the full corpus and persisted (B-row parquet), then an
    incoming batch (doc_id % 3 = 0) is scored against the frozen model —
    scoring cost depends on the batch alone, the fit/apply split every
    persisted index here follows (IVF quantizer, LSH signatures)."""
    import tempfile
    import uuid

    from es_ch_sync_spark.operators.sampling import dsir_apply, dsir_fit

    docs = _docs(spark, sf_dir)
    model = tempfile.mkdtemp(prefix=f"dsir_{uuid.uuid4().hex[:8]}_") + "/model"
    dsir_fit(docs, target=F.col("lang") == "en", path=model)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    return dsir_apply(batch, model, n_select=50)


@register(
    "quantile_normalize_chars",
    """
    WITH d AS (SELECT doc_id, source, n_chars FROM documents),
    ranked AS (
        SELECT doc_id, source, n_chars,
               row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id)
                   AS rk,
               count(*) OVER (PARTITION BY source) AS ng
        FROM d
    ),
    cells AS (
        SELECT doc_id, source, n_chars,
               CASE WHEN ng > 1 THEN (rk - 1) * 1000000 // (ng - 1)
                    ELSE 500000 END AS prm
        FROM ranked
    ),
    cells2 AS (
        SELECT doc_id, source, n_chars,
               (prm * 100 + 500000) // 1000000 AS cell
        FROM cells
    ),
    gstat AS (
        SELECT n_chars AS v, row_number() OVER (ORDER BY n_chars, doc_id) AS rn
        FROM d
    ),
    nt AS (SELECT count(*) AS n FROM d),
    ref AS (
        SELECT g.g AS cell, gl.v AS norm
        FROM (SELECT unnest(range(0, 101)) AS g) g
        CROSS JOIN nt
        JOIN gstat gl ON gl.rn = 1 + (g.g * (nt.n - 1)) // 100
    )
    SELECT c.doc_id, c.source, c.n_chars, r.norm AS norm_n_chars
    FROM cells2 c JOIN ref r ON c.cell = r.cell
    ORDER BY c.doc_id
    """,
)
def q_quantile_normalize_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-normalize per-source document lengths onto the global
    length distribution (Bolstad et al. 2003, 101-point grid form) — the
    cross-source calibration step before a single quality budget is
    applied to heterogeneous sources.  Integer-only arithmetic end to
    end: the normalized value is an actual global order statistic, never
    an interpolated float."""
    from es_ch_sync_spark.operators.sampling import quantile_normalize

    docs = _docs(spark, sf_dir)
    return quantile_normalize(
        docs, group_col="source", score_col="n_chars", id_col="doc_id"
    ).orderBy("doc_id")


@register(
    "k_anonymity_violations",
    """
    SELECT c_nationkey, c_mktsegment, n, l_div,
           (n < 8) AS violates_k, (l_div < 6) AS violates_l
    FROM (
        SELECT c_nationkey, c_mktsegment,
               count(*)::BIGINT AS n,
               count(DISTINCT c_acctbal)::BIGINT AS l_div
        FROM customer GROUP BY 1, 2
    )
    WHERE n < 8 OR l_div < 6
    ORDER BY c_nationkey, c_mktsegment
    """,
)
def q_k_anonymity_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit over the (nation, segment)
    quasi-identifier with account balance as the sensitive attribute:
    equivalence classes smaller than k=8 or with fewer than l=6
    distinct sensitive values are reported — the privacy gate a
    user-derived training table passes before release.  One exact hash
    aggregate; output is O(violations)."""
    from es_ch_sync_spark.operators.sampling import k_anonymity_report

    return k_anonymity_report(
        read_parquet_table(spark, sf_dir, "customer"),
        quasi_cols=["c_nationkey", "c_mktsegment"],
        sensitive_col="c_acctbal",
        k=8,
        l=6,
    ).orderBy("c_nationkey", "c_mktsegment")


@register(
    "t_closeness_audit",
    """
    WITH s AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(floor(c_acctbal / 100) AS BIGINT) AS bin
        FROM customer
    ),
    gdist AS (SELECT bin, count(*)::BIGINT AS cg FROM s GROUP BY 1),
    tot AS (SELECT count(*)::BIGINT AS nn,
                   count(DISTINCT bin)::BIGINT AS m FROM s),
    per AS (
        SELECT c_nationkey, c_mktsegment, bin, count(*)::BIGINT AS cc
        FROM s GROUP BY 1, 2, 3
    ),
    sizes AS (
        SELECT c_nationkey, c_mktsegment, sum(cc)::BIGINT AS nc
        FROM per GROUP BY 1, 2
    ),
    grid AS (
        SELECT z.c_nationkey, z.c_mktsegment, g.bin, z.nc, g.cg,
               coalesce(p.cc, 0)::BIGINT AS cc
        FROM sizes z CROSS JOIN gdist g
        LEFT JOIN per p ON p.c_nationkey = z.c_nationkey
                       AND p.c_mktsegment = z.c_mktsegment
                       AND p.bin = g.bin
    ),
    cum AS (
        SELECT c_nationkey, c_mktsegment, nc, tot.nn, tot.m,
               sum(cc * tot.nn - cg * nc) OVER (
                   PARTITION BY c_nationkey, c_mktsegment ORDER BY bin
               )::BIGINT AS cum
        FROM grid, tot
    ),
    emd AS (
        SELECT c_nationkey, c_mktsegment, nc, nn, m,
               sum(abs(cum))::BIGINT AS emd_num
        FROM cum GROUP BY c_nationkey, c_mktsegment, nc, nn, m
    )
    SELECT c_nationkey, c_mktsegment, nc AS n,
           round(CASE WHEN m > 1
                 THEN emd_num::DOUBLE
                      / (nc::DOUBLE * nn::DOUBLE * (m - 1)::DOUBLE)
                 ELSE 0.0 END, 6) AS t_emd,
           (CASE WHEN m > 1
                 THEN emd_num::DOUBLE
                      / (nc::DOUBLE * nn::DOUBLE * (m - 1)::DOUBLE)
                 ELSE 0.0 END) > 0.2 AS violates_t
    FROM emd
    """,
)
def q_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness over the (nation, segment) quasi-identifier with
    account balance as the ordered sensitive attribute — the third leg
    of the release-privacy triad next to k_anonymity_violations: flags
    classes whose sensitive DISTRIBUTION diverges from the global one
    (ordered EMD > t) even when they are k-large and l-diverse.  EMD
    numerators are exact BIGINTs over the densified class×bin grid."""
    from es_ch_sync_spark.operators.sampling import t_closeness_report

    return t_closeness_report(
        read_parquet_table(spark, sf_dir, "customer"),
        quasi_cols=["c_nationkey", "c_mktsegment"],
        sensitive_col="c_acctbal",
        bin_width=100,
        t_max=0.2,
    ).orderBy("c_nationkey", "c_mktsegment")


# ---------------------------------------------------------------------------
# Label-agreement QA (Cohen's kappa) + Laplace-mechanism count release
# ---------------------------------------------------------------------------

@register(
    "label_agreement_kappa",
    f"""
    WITH ta AS ({oracles.text_analysis_sql()}),
    pairs AS (
        SELECT d.lang AS a, ta.lang_pred AS b
        FROM documents d JOIN ta ON d.doc_id = ta.doc_id
        WHERE d.lang IS NOT NULL AND ta.lang_pred IS NOT NULL
    ),
    ct AS (SELECT a, b, count(*)::BIGINT AS c FROM pairs GROUP BY 1, 2),
    tot AS (
        SELECT sum(c)::HUGEINT AS n,
               sum(CASE WHEN a = b THEN c ELSE 0 END)::HUGEINT AS d
        FROM ct
    ),
    r AS (SELECT a, sum(c)::HUGEINT AS rr FROM ct GROUP BY 1),
    cc AS (SELECT b, sum(c)::HUGEINT AS cv FROM ct GROUP BY 1),
    rc AS (
        SELECT coalesce(sum(rr * cv), 0)::HUGEINT AS rc
        FROM r JOIN cc ON r.a = cc.b
    )
    SELECT n::BIGINT AS n, d::BIGINT AS n_agree,
           round(d::DOUBLE / n::DOUBLE, 6) AS po,
           round(rc::DOUBLE / (n * n)::DOUBLE, 6) AS pe,
           round(CASE WHEN n * n > rc
                      THEN (n * d - rc)::DOUBLE / (n * n - rc)::DOUBLE END, 6)
               AS kappa
    FROM tot CROSS JOIN rc WHERE n > 0
    """,
)
def q_label_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the documents' declared lang label and the
    stopword-heuristic lang_id prediction — the chance-corrected
    label-vs-model agreement QA every labeled corpus gets before the
    labels train anything.  Exact BIGINT contingency, HUGEINT/DECIMAL
    products, three single float divisions."""
    from es_ch_sync_spark.operators.analytics import cohen_kappa
    from es_ch_sync_spark.operators.text import lang_id

    docs = _docs(spark, sf_dir).select(
        "lang", lang_id(F.col("text")).alias("pred")
    )
    return cohen_kappa(docs, "lang", "pred")


_DP_HASH_FOLD = (
    "list_reduce(list_prepend(0::BIGINT, "
    "list_transform(range(1, 15), j -> "
    "(strpos('0123456789abcdef', substr(md5('dp:' || event_type), j, 1)) - 1)"
    "::BIGINT)), (a, b) -> a * 16 + b)"
)


@register(
    "dp_event_counts",
    f"""
    WITH g AS (
        SELECT event_type, count(*)::BIGINT AS true_count
        FROM events GROUP BY 1
    ),
    u AS (
        SELECT event_type, true_count,
               (({_DP_HASH_FOLD}) % 999999 + 1)::DOUBLE / 1000000.0 AS uu
        FROM g
    )
    SELECT event_type, true_count,
           round(true_count
                 + (-1.0) * sign(uu - 0.5) * ln(1.0 - 2.0 * abs(uu - 0.5)),
                 6) AS noisy_count
    FROM u
    """,
)
def q_dp_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism release of per-event-type counts (ε = 1,
    sensitivity-1 COUNT) — the privacy family's release side next to the
    k-anonymity/l-diversity/t-closeness audits.  Noise is seeded
    (md5-uniform inverse CDF) so the mechanism is exactly testable
    cross-engine; production swaps in a true RNG (docstring contract in
    operators.sampling.dp_noisy_counts)."""
    from es_ch_sync_spark.operators.sampling import dp_noisy_counts

    return dp_noisy_counts(_events(spark, sf_dir), "event_type", epsilon=1.0)


def _perplexity_buckets_oracle() -> str:
    norm = oracles.NORM.format(col="text")
    return f"""
    WITH d AS (SELECT doc_id, {norm} AS nt FROM documents),
    tri AS (
        SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(nt) - 1, 1)),
                                     i -> substr(nt, i, 3))) AS tri
        FROM d WHERE len(nt) >= 3
    ),
    model AS (SELECT tri, count(*)::BIGINT AS cnt FROM tri GROUP BY 1),
    tot AS (SELECT sum(cnt)::BIGINT AS n_total, count(*)::BIGINT AS v_size
            FROM model),
    -- micro-quantized ln BEFORE any sum (the char_entropy contract); the
    -- LEFT JOIN + coalesce is the OOV add-one floor (self-trained here,
    -- so it never fires, but the operator contract keeps it)
    lnp AS (
        SELECT t.doc_id,
               CAST(round(ln((coalesce(m.cnt, 0) + 1)::DOUBLE
                             / (tot.n_total + tot.v_size)::DOUBLE)
                          * 1000000.0, 0) AS BIGINT) AS lnm
        FROM tri t LEFT JOIN model m USING (tri), tot
    ),
    sc AS (
        SELECT doc_id, count(*)::BIGINT AS n_tri,
               ((-sum(lnm)) // count(*)) // 100 AS xq
        FROM lnp GROUP BY 1
    ),
    census AS (SELECT xq, count(*)::BIGINT AS c FROM sc GROUP BY 1),
    cum AS (SELECT xq, sum(c) OVER (ORDER BY xq) AS cum,
                   sum(c) OVER () AS n
            FROM census),
    cut AS (SELECT min(CASE WHEN cum * 3 >= n THEN xq END) AS c1,
                   min(CASE WHEN cum * 3 >= 2 * n THEN xq END) AS c2
            FROM cum)
    SELECT doc_id, n_tri, xq / 10000.0 AS xent,
           CASE WHEN xq <= c1 THEN 'head'
                WHEN xq <= c2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM sc, cut
    ORDER BY doc_id
    """


@register("doc_perplexity_buckets", _perplexity_buckets_oracle())
def q_doc_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail LM-quality terciles [Wenzek et al.
    2020] over the self-trained character-trigram LM — the curation gate
    the tokenizer-triad rounds built toward: score each doc's
    cross-entropy (micro-quantized ln, exact integer division), bucket by
    ascending xent with cutoffs from the bounded 1e-4-nat census.  The
    head tier is what CCNet keeps for pretraining."""
    from es_ch_sync_spark.operators.text import doc_perplexity_buckets

    return doc_perplexity_buckets(_docs(spark, sf_dir)).orderBy("doc_id")


@register(
    "lang_classification_report",
    f"""
    WITH ta AS ({oracles.text_analysis_sql()}),
    pairs AS (
        SELECT d.lang AS t, ta.lang_pred AS p
        FROM documents d JOIN ta ON d.doc_id = ta.doc_id
        WHERE d.lang IS NOT NULL AND ta.lang_pred IS NOT NULL
    ),
    ct AS (SELECT t, p, count(*)::BIGINT AS c FROM pairs GROUP BY 1, 2),
    r AS (SELECT t AS label, sum(c)::BIGINT AS n_true FROM ct GROUP BY 1),
    cc AS (SELECT p AS label, sum(c)::BIGINT AS n_pred FROM ct GROUP BY 1),
    dg AS (SELECT t AS label, c AS tp FROM ct WHERE t = p),
    base AS (
        SELECT label, coalesce(n_true, 0) AS n_true,
               coalesce(n_pred, 0) AS n_pred, coalesce(tp, 0) AS tp
        FROM r FULL JOIN cc USING (label) LEFT JOIN dg USING (label)
    )
    SELECT label, n_true, n_pred, tp,
           round(tp::DOUBLE
                 / (CASE WHEN n_pred > 0 THEN n_pred::DOUBLE END), 6)
               AS precision,
           round(tp::DOUBLE
                 / (CASE WHEN n_true > 0 THEN n_true::DOUBLE END), 6)
               AS recall,
           round((2 * tp)::DOUBLE / (n_true + n_pred)::DOUBLE, 6) AS f1
    FROM base ORDER BY label
    """,
)
def q_lang_classification_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language precision / recall / F1 of the stopword-heuristic
    lang_id against the declared labels — the per-class view next to
    label_agreement_kappa's single score: shows WHICH languages the
    router loses.  One bounded label×label contingency aggregate;
    F1 = 2·tp/(n_true + n_pred) — every metric one float division of
    exact BIGINTs."""
    from es_ch_sync_spark.operators.analytics import classification_report
    from es_ch_sync_spark.operators.text import lang_id

    docs = _docs(spark, sf_dir).select(
        "lang", lang_id(F.col("text")).alias("pred")
    )
    return classification_report(docs, "lang", "pred")


@register(
    "gopher_quality_flags",
    f"""
    WITH b AS (
        SELECT doc_id,
               {oracles.NORM.format(col='text')} AS nt,
               string_split({oracles.NORM.format(col='text')}, ' ') AS ws
        FROM documents
    ),
    m AS (
        SELECT doc_id,
               len(ws)::BIGINT AS n_words,
               (length(nt) - (len(ws) - 1))::BIGINT AS total_chars,
               (length(nt) - length(replace(nt, '#', '')))::BIGINT AS n_hash,
               ((length(nt) - length(replace(nt, '...', ''))) // 3)::BIGINT
                   AS n_ellipsis,
               len(list_filter(ws, w -> regexp_matches(w, '[a-z]')))::BIGINT
                   AS n_alpha,
               len(list_filter(['the','be','to','of','and','that','have','with'],
                               s -> list_contains(ws, s)))::BIGINT AS n_stop
        FROM b
    )
    SELECT doc_id, n_words,
           round(total_chars::DOUBLE / n_words::DOUBLE, 6) AS mean_word_len,
           round((n_hash + n_ellipsis)::DOUBLE / n_words::DOUBLE, 6)
               AS symbol_ratio,
           round(n_alpha::DOUBLE / n_words::DOUBLE, 6) AS alpha_word_frac,
           n_stop AS n_stopwords,
           (n_words >= 50 AND n_words <= 100000) AS ok_word_count,
           (total_chars::DOUBLE / n_words::DOUBLE >= 3
            AND total_chars::DOUBLE / n_words::DOUBLE <= 10) AS ok_word_len,
           ((n_hash + n_ellipsis)::DOUBLE / n_words::DOUBLE < 0.1) AS ok_symbols,
           (n_alpha::DOUBLE / n_words::DOUBLE >= 0.8) AS ok_alpha,
           (n_stop >= 2) AS ok_stopwords,
           ((n_words >= 50 AND n_words <= 100000)
            AND (total_chars::DOUBLE / n_words::DOUBLE >= 3
                 AND total_chars::DOUBLE / n_words::DOUBLE <= 10)
            AND ((n_hash + n_ellipsis)::DOUBLE / n_words::DOUBLE < 0.1)
            AND (n_alpha::DOUBLE / n_words::DOUBLE >= 0.8)
            AND (n_stop >= 2)) AS passes
    FROM m ORDER BY doc_id
    """,
)
def q_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-based quality gate [Rae et al. 2021 App. A]: word
    count, mean word length (via the no-explode single-spaced identity),
    #/… symbol ratio, alphabetic-word fraction, ≥2-stop-words probe —
    the heuristic leg next to doc_perplexity_buckets' model-based tiers.
    Map-only, fused into the scan."""
    from es_ch_sync_spark.operators.text import gopher_quality_flags

    return gopher_quality_flags(_docs(spark, sf_dir)).orderBy("doc_id")


@register(
    "c4_line_filters",
    """
    WITH b AS (
        SELECT doc_id, string_split(text, chr(10)) AS lines, lower(text) AS low
        FROM documents
    ),
    m AS (
        SELECT doc_id, len(lines)::BIGINT AS n_lines,
               list_filter(lines, ln ->
                   regexp_matches(lower(trim(ln)), '[.!?"]$')
                   AND len(regexp_split_to_array(trim(ln), '\\s+')) >= 3
                   AND NOT contains(lower(trim(ln)), 'javascript')
               ) AS kept,
               contains(low, 'lorem ipsum') AS has_lorem,
               (contains(low, '{') OR contains(low, '}')) AS has_brace
        FROM b
    )
    SELECT doc_id, n_lines, len(kept)::BIGINT AS n_kept_lines,
           coalesce(array_to_string(kept, chr(10)), '') AS clean_text,
           has_lorem AS has_lorem_ipsum, has_brace,
           (len(kept) >= 3 AND NOT has_lorem AND NOT has_brace) AS keep_page
    FROM m ORDER BY doc_id
    """,
)
def q_c4_line_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line-level cleaning [Raffel et al. 2020 §2.2]: terminal-
    punctuation + ≥3-word + no-javascript line keeps, lorem-ipsum /
    curly-brace / <3-kept-lines page drops — the line-granular companion
    to gopher_quality_flags, map-only, fused into the scan."""
    from es_ch_sync_spark.operators.text import c4_line_filters

    return c4_line_filters(_docs(spark, sf_dir)).orderBy("doc_id")


# Shared doc-level gate CTEs for the paired-gate eval queries: the Gopher
# conjunction and the C4 page keep, restated compactly (same expressions
# as the gopher_quality_flags / c4_line_filters oracles above).
_GATES_CTE = f"""
    b AS (
        SELECT doc_id,
               {oracles.NORM.format(col='text')} AS nt,
               string_split({oracles.NORM.format(col='text')}, ' ') AS ws,
               string_split(text, chr(10)) AS lines,
               lower(text) AS low
        FROM documents
    ),
    m AS (
        SELECT doc_id,
               len(ws)::BIGINT AS n_words,
               (length(nt) - (len(ws) - 1))::BIGINT AS total_chars,
               (length(nt) - length(replace(nt, '#', ''))
                + (length(nt) - length(replace(nt, '...', ''))) // 3)::BIGINT
                   AS n_sym,
               len(list_filter(ws, w -> regexp_matches(w, '[a-z]')))::BIGINT
                   AS n_alpha,
               len(list_filter(['the','be','to','of','and','that','have','with'],
                               s -> list_contains(ws, s)))::BIGINT AS n_stop,
               len(list_filter(lines, ln ->
                   regexp_matches(lower(trim(ln)), '[.!?"]$')
                   AND len(regexp_split_to_array(trim(ln), '\\s+')) >= 3
                   AND NOT contains(lower(trim(ln)), 'javascript')
               ))::BIGINT AS n_kept,
               contains(low, 'lorem ipsum') AS has_lorem,
               (contains(low, '{{') OR contains(low, '}}')) AS has_brace
        FROM b
    ),
    gates AS (
        SELECT doc_id,
               ((n_words >= 50 AND n_words <= 100000)
                AND (total_chars::DOUBLE / n_words::DOUBLE >= 3
                     AND total_chars::DOUBLE / n_words::DOUBLE <= 10)
                AND (n_sym::DOUBLE / n_words::DOUBLE < 0.1)
                AND (n_alpha::DOUBLE / n_words::DOUBLE >= 0.8)
                AND (n_stop >= 2)) AS pa,
               (n_kept >= 3 AND NOT has_lorem AND NOT has_brace) AS pb,
               (n_words >= 50 AND n_words <= 100000) AS r_words,
               (n_sym::DOUBLE / n_words::DOUBLE < 0.1) AS r_sym,
               (n_stop >= 2) AS r_stop
        FROM m
    )
"""


@register(
    "mcnemar_gates",
    f"""
    WITH {_GATES_CTE}
    SELECT count(*)::BIGINT AS n,
           sum(CASE WHEN NOT pa AND NOT pb THEN 1 ELSE 0 END)::BIGINT AS n00,
           sum(CASE WHEN NOT pa AND pb THEN 1 ELSE 0 END)::BIGINT AS n01,
           sum(CASE WHEN pa AND NOT pb THEN 1 ELSE 0 END)::BIGINT AS n10,
           sum(CASE WHEN pa AND pb THEN 1 ELSE 0 END)::BIGINT AS n11,
           round(CASE WHEN sum(CASE WHEN pa != pb THEN 1 ELSE 0 END) > 0
                 THEN ((sum(CASE WHEN pa AND NOT pb THEN 1 ELSE 0 END)
                        - sum(CASE WHEN NOT pa AND pb THEN 1 ELSE 0 END))::DOUBLE
                       * (sum(CASE WHEN pa AND NOT pb THEN 1 ELSE 0 END)
                          - sum(CASE WHEN NOT pa AND pb THEN 1 ELSE 0 END))::DOUBLE)
                      / sum(CASE WHEN pa != pb THEN 1 ELSE 0 END)::DOUBLE
                 END, 6) AS chi2
    FROM gates
    """,
)
def q_mcnemar_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test between the Gopher doc gate and the C4
    page gate on the same corpus — do the two filters disagree
    symmetrically, i.e. could one replace the other without shifting
    the kept set's size?  Both gates are map-only column exprs joined
    on doc_id; the test is one 4-count hash aggregate."""
    from es_ch_sync_spark.operators.analytics import mcnemar_test
    from es_ch_sync_spark.operators.text import (
        c4_line_filters,
        gopher_quality_flags,
    )

    docs = _docs(spark, sf_dir)
    ga = gopher_quality_flags(docs).select("doc_id", F.col("passes").alias("pa"))
    cb = c4_line_filters(docs).select("doc_id", F.col("keep_page").alias("pb"))
    return mcnemar_test(ga.join(cb, "doc_id"), "pa", "pb")


@register(
    "fleiss_kappa_gates",
    f"""
    WITH {_GATES_CTE},
    votes AS (
        SELECT doc_id,
               (CASE WHEN r_words THEN 1 ELSE 0 END
                + CASE WHEN r_sym THEN 1 ELSE 0 END
                + CASE WHEN r_stop THEN 1 ELSE 0 END)::BIGINT AS k
        FROM gates
    ),
    mom AS (
        SELECT count(*)::BIGINT AS n_items,
               sum(k * k + (3 - k) * (3 - k))::HUGEINT AS s2,
               sum(k)::HUGEINT AS t_keep,
               sum(3 - k)::HUGEINT AS t_drop,
               sum(CASE WHEN k > 0 THEN 1 ELSE 0 END)::BIGINT AS any_keep,
               sum(CASE WHEN k < 3 THEN 1 ELSE 0 END)::BIGINT AS any_drop
        FROM votes
    )
    SELECT n_items, 3::BIGINT AS n_raters,
           ((CASE WHEN any_keep > 0 THEN 1 ELSE 0 END)
            + (CASE WHEN any_drop > 0 THEN 1 ELSE 0 END))::BIGINT
               AS n_categories,
           round((s2 - n_items * 3)::DOUBLE
                 / (n_items * 3)::DOUBLE / 2.0, 6) AS p_bar,
           round((t_keep * t_keep + t_drop * t_drop)::DOUBLE
                 / ((n_items * 3)::DOUBLE * (n_items * 3)::DOUBLE), 6) AS p_e,
           round(CASE WHEN 1.0 - (t_keep * t_keep + t_drop * t_drop)::DOUBLE
                           / ((n_items * 3)::DOUBLE * (n_items * 3)::DOUBLE) > 0
                 THEN ((s2 - n_items * 3)::DOUBLE / (n_items * 3)::DOUBLE / 2.0
                       - (t_keep * t_keep + t_drop * t_drop)::DOUBLE
                         / ((n_items * 3)::DOUBLE * (n_items * 3)::DOUBLE))
                      / (1.0 - (t_keep * t_keep + t_drop * t_drop)::DOUBLE
                               / ((n_items * 3)::DOUBLE * (n_items * 3)::DOUBLE))
                 END, 6) AS kappa
    FROM mom
    """,
)
def q_fleiss_kappa_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa among three rule raters (Gopher word-count, symbol
    ratio, stopword subrules voting keep/drop per doc) — chance-
    corrected multi-rater agreement: how coherent is the heuristic gate
    family before their conjunction ships?  One (item, cat) census off
    a map-only vote pass; exact integer moments."""
    from es_ch_sync_spark.operators.analytics import fleiss_kappa
    from es_ch_sync_spark.operators.text import gopher_quality_flags

    gf = gopher_quality_flags(_docs(spark, sf_dir))
    votes = None
    for col in ("ok_word_count", "ok_symbols", "ok_stopwords"):
        v = gf.select(
            "doc_id",
            F.when(F.col(col), F.lit("keep")).otherwise(F.lit("drop")).alias(
                "cat"
            ),
        )
        votes = v if votes is None else votes.unionByName(v)
    return fleiss_kappa(votes, "doc_id", "cat", n_raters=3)


@register(
    "krippendorff_alpha_gates",
    f"""
    WITH {_GATES_CTE},
    votes AS (
        SELECT doc_id,
               (CASE WHEN r_words THEN 1 ELSE 0 END
                + CASE WHEN r_sym THEN 1 ELSE 0 END
                + CASE WHEN r_stop THEN 1 ELSE 0 END)::BIGINT AS k
        FROM gates
    ),
    mom AS (
        SELECT count(*)::BIGINT AS t,
               sum(k * k + (3 - k) * (3 - k))::HUGEINT AS s2,
               sum(k)::HUGEINT AS n1, sum(3 - k)::HUGEINT AS n0,
               sum(CASE WHEN k > 0 THEN 1 ELSE 0 END)::BIGINT AS any_keep,
               sum(CASE WHEN k < 3 THEN 1 ELSE 0 END)::BIGINT AS any_drop
        FROM votes
    )
    SELECT t AS n_items, 3::BIGINT AS n_raters,
           ((CASE WHEN any_keep > 0 THEN 1 ELSE 0 END)
            + (CASE WHEN any_drop > 0 THEN 1 ELSE 0 END))::BIGINT
               AS n_categories,
           round((9 * t::HUGEINT - s2)::DOUBLE
                 / (2.0 * (3 * t)::DOUBLE), 6) AS d_o,
           round(((3 * t)::HUGEINT * (3 * t)::HUGEINT
                  - (n1 * n1 + n0 * n0))::DOUBLE
                 / ((3 * t)::DOUBLE * (3 * t - 1)::DOUBLE), 6) AS d_e,
           round(CASE WHEN ((3 * t)::HUGEINT * (3 * t)::HUGEINT
                            - (n1 * n1 + n0 * n0)) > 0 THEN
               1.0 - ((3 * t - 1)::HUGEINT
                      * (9 * t::HUGEINT - s2))::DOUBLE
                     / (2::HUGEINT
                        * ((3 * t)::HUGEINT * (3 * t)::HUGEINT
                           - (n1 * n1 + n0 * n0)))::DOUBLE
           END, 6) AS alpha
    FROM mom
    """,
)
def q_krippendorff_alpha_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha (nominal) among the three Gopher subrule
    raters — the coincidence-based agreement coefficient next to
    fleiss_kappa_gates (same votes, chance corrected by pairable values
    instead of per-rater marginals, so it stays comparable when one
    category is rare).  Exact integer moments off the same (item, cat)
    census; alpha is one float division of two exact products."""
    from es_ch_sync_spark.operators.analytics import krippendorff_alpha
    from es_ch_sync_spark.operators.text import gopher_quality_flags

    gf = gopher_quality_flags(_docs(spark, sf_dir))
    votes = None
    for col in ("ok_word_count", "ok_symbols", "ok_stopwords"):
        v = gf.select(
            "doc_id",
            F.when(F.col(col), F.lit("keep")).otherwise(F.lit("drop")).alias(
                "cat"
            ),
        )
        votes = v if votes is None else votes.unionByName(v)
    return krippendorff_alpha(votes, "doc_id", "cat", n_raters=3)


@register(
    "cochran_q_gates",
    f"""
    WITH {_GATES_CTE},
    v AS (
        SELECT (CASE WHEN r_words THEN 1 ELSE 0 END)::BIGINT AS x1,
               (CASE WHEN r_sym THEN 1 ELSE 0 END)::BIGINT AS x2,
               (CASE WHEN r_stop THEN 1 ELSE 0 END)::BIGINT AS x3
        FROM gates
    ),
    mom AS (
        SELECT count(*)::BIGINT AS n_items,
               sum(x1 + x2 + x3)::BIGINT AS t,
               sum((x1 + x2 + x3) * (x1 + x2 + x3))::HUGEINT AS sr2,
               sum(x1)::BIGINT AS c1, sum(x2)::BIGINT AS c2,
               sum(x3)::BIGINT AS c3
        FROM v
    )
    SELECT n_items, 3::BIGINT AS n_raters, t AS total_passes,
           round(CASE WHEN 3 * t::HUGEINT - sr2 > 0
                 THEN (2::HUGEINT
                       * (3::HUGEINT * (c1::HUGEINT * c1 + c2::HUGEINT * c2
                                        + c3::HUGEINT * c3)
                          - t::HUGEINT * t))::DOUBLE
                      / (3 * t::HUGEINT - sr2)::DOUBLE
                 END, 6) AS q_stat,
           2::BIGINT AS df_q
    FROM mom
    """,
)
def q_cochran_q_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q among the three Gopher subrule raters (word-count,
    symbol-ratio, stopword gates on the same docs) — the k-sample
    marginal-homogeneity test completing the paired-gate family:
    mcnemar_gates asks whether TWO gates pass at the same rate;
    Q asks it for the whole panel at once (with k=2 it reduces to
    McNemar's χ²).  One map-only flag projection → one exact-integer
    hash aggregate; Q is one float division."""
    from es_ch_sync_spark.operators.analytics import cochran_q
    from es_ch_sync_spark.operators.text import gopher_quality_flags

    gf = gopher_quality_flags(_docs(spark, sf_dir))
    return cochran_q(gf, "ok_word_count", "ok_symbols", "ok_stopwords")


@register(
    "gate_information_gain",
    f"""
    WITH {_GATES_CTE},
    lab AS (SELECT doc_id, (lang = 'en') AS y FROM documents),
    v AS (
        SELECT 'ok_word_count' AS g, r_words AS a, y
        FROM gates JOIN lab USING (doc_id)
        UNION ALL
        SELECT 'ok_symbols', r_sym, y FROM gates JOIN lab USING (doc_id)
        UNION ALL
        SELECT 'ok_stopwords', r_stop, y FROM gates JOIN lab USING (doc_id)
    ),
    nij AS (SELECT g, a, y AS b, count(*)::BIGINT AS n FROM v GROUP BY 1, 2, 3),
    ca AS (SELECT g, a, sum(n)::BIGINT AS cca FROM nij GROUP BY 1, 2),
    cb AS (SELECT g, b, sum(n)::BIGINT AS ccb FROM nij GROUP BY 1, 2),
    tot AS (SELECT g, sum(n)::BIGINT AS t FROM nij GROUP BY 1),
    mi AS (
        SELECT nij.g,
               sum(nij.n::HUGEINT
                   * (CAST(round(ln(tot.t) * 1000000) AS BIGINT)
                      + CAST(round(ln(nij.n) * 1000000) AS BIGINT)
                      - CAST(round(ln(ca.cca) * 1000000) AS BIGINT)
                      - CAST(round(ln(cb.ccb) * 1000000) AS BIGINT))::HUGEINT
               )::HUGEINT AS smi
        FROM nij
        JOIN ca ON nij.g = ca.g AND nij.a = ca.a
        JOIN cb ON nij.g = cb.g AND nij.b = cb.b
        JOIN tot ON nij.g = tot.g
        GROUP BY 1
    ),
    hb AS (
        SELECT cb.g,
               sum(ccb::HUGEINT
                   * (CAST(round(ln(tot.t) * 1000000) AS BIGINT)
                      - CAST(round(ln(ccb) * 1000000) AS BIGINT))::HUGEINT
               )::HUGEINT AS shb
        FROM cb JOIN tot ON cb.g = tot.g GROUP BY 1
    )
    SELECT mi.g AS gate, tot.t AS n_items,
           round(smi::DOUBLE / (tot.t::DOUBLE * 1000000.0), 6) AS mi_nats,
           round(shb::DOUBLE / (tot.t::DOUBLE * 1000000.0), 6)
               AS h_label_nats,
           round(CASE WHEN shb > 0 THEN smi::DOUBLE / shb::DOUBLE END, 6)
               AS ig_ratio
    FROM mi JOIN hb ON mi.g = hb.g JOIN tot ON mi.g = tot.g
    ORDER BY gate
    """,
)
def q_gate_information_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Information gain of each Gopher subrule gate about the English
    label — the feature-selection readout "which gate actually
    separates the language" (a gate with near-zero MI is burning
    compute), one MI per gate in a single grouped census pass.  Same
    micro-quantized-ln contract as nmi_exact_vs_lsh."""
    from es_ch_sync_spark.operators.analytics import grouped_mutual_information
    from es_ch_sync_spark.operators.text import gopher_quality_flags

    docs = _docs(spark, sf_dir)
    lab = docs.select("doc_id", (F.col("lang") == "en").alias("y"))
    gf = gopher_quality_flags(docs).join(lab, "doc_id")
    # ONE long-format projection (stack) instead of a 3-way union over
    # the uncheckpointed gate frame — the union shape executed the
    # map-only gate pass 3x (r12 VERDICT "What's wrong" #4); stack
    # explodes the three flag columns map-side in a single corpus scan
    v = gf.select(
        F.expr(
            "stack(3,"
            " 'ok_word_count', ok_word_count,"
            " 'ok_symbols', ok_symbols,"
            " 'ok_stopwords', ok_stopwords) AS (gate, a)"
        ),
        F.col("y").alias("b"),
    )
    return grouped_mutual_information(v, "gate", "a", "b")


@register(
    "mantel_haenszel_gate",
    f"""
    WITH {_GATES_CTE},
    lab AS (SELECT doc_id, (lang = 'en') AS y FROM documents),
    j AS (
        SELECT d.source AS s, g.r_stop AS e, l.y AS o
        FROM documents d
        JOIN gates g ON d.doc_id = g.doc_id
        JOIN lab l ON d.doc_id = l.doc_id
        WHERE g.r_stop IS NOT NULL AND l.y IS NOT NULL
    ),
    cells AS (
        SELECT s,
               sum(CASE WHEN e AND o THEN 1 ELSE 0 END)::BIGINT AS a,
               sum(CASE WHEN e AND NOT o THEN 1 ELSE 0 END)::BIGINT AS b,
               sum(CASE WHEN NOT e AND o THEN 1 ELSE 0 END)::BIGINT AS c,
               sum(CASE WHEN NOT e AND NOT o THEN 1 ELSE 0 END)::BIGINT AS d
        FROM j GROUP BY 1
    ),
    per AS (
        SELECT a,
               CAST(round(a::DOUBLE * d::DOUBLE
                          / (a::DOUBLE + b::DOUBLE + c::DOUBLE + d::DOUBLE)
                          * 1e6) AS BIGINT) AS tad,
               CAST(round(b::DOUBLE * c::DOUBLE
                          / (a::DOUBLE + b::DOUBLE + c::DOUBLE + d::DOUBLE)
                          * 1e6) AS BIGINT) AS tbc,
               CAST(round((a::DOUBLE + b::DOUBLE) * (a::DOUBLE + c::DOUBLE)
                          / (a::DOUBLE + b::DOUBLE + c::DOUBLE + d::DOUBLE)
                          * 1e6) AS BIGINT) AS te,
               CAST(round((a::DOUBLE + b::DOUBLE) * (c::DOUBLE + d::DOUBLE)
                          * (a::DOUBLE + c::DOUBLE) * (b::DOUBLE + d::DOUBLE)
                          / ((a::DOUBLE + b::DOUBLE + c::DOUBLE + d::DOUBLE)
                             * (a::DOUBLE + b::DOUBLE + c::DOUBLE + d::DOUBLE)
                             * (a::DOUBLE + b::DOUBLE + c::DOUBLE + d::DOUBLE
                                - 1.0))
                          * 1e6) AS BIGINT) AS tv
        FROM cells WHERE a + b + c + d > 1
    ),
    g AS (
        SELECT count(*)::BIGINT AS n_strata, sum(a)::BIGINT AS sum_a,
               sum(tad)::BIGINT AS sad, sum(tbc)::BIGINT AS sbc,
               sum(te)::BIGINT AS se, sum(tv)::BIGINT AS sv
        FROM per
    )
    SELECT n_strata, sum_a,
           round(CASE WHEN sbc > 0 THEN sad::DOUBLE / sbc::DOUBLE END, 6)
               AS or_mh,
           round(CASE WHEN sv > 0
                 THEN (sum_a::DOUBLE - se::DOUBLE / 1e6)
                      * (sum_a::DOUBLE - se::DOUBLE / 1e6)
                      / (sv::DOUBLE / 1e6) END, 6) AS chi2_cmh
    FROM g
    """,
)
def q_mantel_haenszel_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Mantel-Haenszel pooled odds ratio + chi2 of the Gopher
    stopword gate vs the English label ACROSS source strata — the
    confounding-aware companion to gate_information_gain and the
    marginal chi2 family: a gate can look predictive marginally purely
    because both gate and label vary by source (Simpson's pattern);
    CMH pools the per-source 2x2 evidence instead.  One (source, gate,
    label) census; per-stratum rational terms micro-quantize before
    the stratum sum."""
    from es_ch_sync_spark.operators.analytics import mantel_haenszel
    from es_ch_sync_spark.operators.text import gopher_quality_flags

    docs = _docs(spark, sf_dir)
    gf = gopher_quality_flags(docs).select("doc_id", "ok_stopwords")
    j = (
        docs.select("doc_id", "source", (F.col("lang") == "en").alias("y"))
        .join(gf, "doc_id")
    )
    return mantel_haenszel(j, "source", "ok_stopwords", "y")


# Shared Spark-SQL/DuckDB augmented text: the synthetic corpus carries no
# real identifiers, so deterministic doc_id-derived PII is planted on two
# residue classes (the _PSL_HOST precedent) — every pattern class gets
# non-vacuous counts and the census is exact cross-engine.
_PII_TEXT = (
    "text || CASE WHEN doc_id % 7 = 0 THEN"
    " ' reach user' || CAST(doc_id AS STRING) || '@mail.example.org"
    " or at 10.0.' || CAST(doc_id % 250 AS STRING) || '.'"
    " || CAST(doc_id % 100 AS STRING)"
    " WHEN doc_id % 11 = 0 THEN"
    " ' see https://ex.org/d/' || CAST(doc_id AS STRING)"
    " || ' call 555-123-4567'"
    " ELSE '' END"
)


def _pii_census_oracle() -> str:
    from es_ch_sync_spark.operators.text import PII_PATTERNS

    cols = []
    for name, pat in PII_PATTERNS.items():
        n = f"len(regexp_extract_all(t, '{pat}'))"
        cols.append(f"sum({n})::BIGINT AS n_{name}")
        cols.append(
            f"sum(CASE WHEN {n} > 0 THEN 1 ELSE 0 END)::BIGINT"
            f" AS docs_with_{name}"
        )
    return f"""
    WITH aug AS (SELECT source, {_PII_TEXT} AS t FROM documents)
    SELECT source, count(*)::BIGINT AS n_docs, {", ".join(cols)}
    FROM aug GROUP BY source ORDER BY source
    """


@register("pii_pattern_census", _pii_census_oracle())
def q_pii_pattern_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII-pattern prevalence (emails / URLs / IPv4 / phone
    spans and affected-doc counts) — the input-side redaction-budget
    readout next to the output-side privacy gates (k_anonymity,
    dp_event_counts).  Map-only regexp_extract_all counts fused into
    the scan, one source-keyed aggregate, exact cross-engine."""
    from es_ch_sync_spark.operators.text import pii_pattern_census

    aug = _docs(spark, sf_dir).select(
        "source", F.expr(_PII_TEXT).alias("text")
    )
    return pii_pattern_census(aug)


_PAK_N, _PAK_KS = 10, (1, 3, 5)


def _pass_at_k_oracle(n: int = _PAK_N, ks: tuple[int, ...] = _PAK_KS) -> str:
    sums, selects = [], []
    for k in ks:
        num = " * ".join(f"({n - i} - c)" for i in range(k))
        sums.append(f"sum({num})::BIGINT AS s{k}")
        d_k = 1
        for i in range(k):
            d_k *= n - i
        selects.append(
            f"SELECT {k}::BIGINT AS k, n_tasks, "
            f"round(CASE WHEN n_tasks > 0 THEN "
            f"1.0 - s{k}::DOUBLE / (n_tasks::DOUBLE * {float(d_k)}) END, 6) "
            f"AS pass_at_k FROM ag"
        )
    return f"""
    WITH s AS (
        SELECT doc_id // {n} AS task, (length(text) % 3 = 0) AS ok
        FROM documents
    ),
    pt AS (
        SELECT task, count(*)::BIGINT AS nt,
               sum(CASE WHEN ok THEN 1 ELSE 0 END)::BIGINT AS c
        FROM s GROUP BY task
    ),
    ag AS (
        SELECT count(*)::BIGINT AS n_tasks, {", ".join(sums)}
        FROM pt WHERE nt = {n}
    )
    SELECT * FROM ({" UNION ALL ".join(selects)}) ORDER BY k
    """


@register("pass_at_k", _pass_at_k_oracle())
def q_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbiased pass@k [Chen et al. 2021] over a deterministic
    (task = doc_id div 10, correct = length(text) % 3 == 0) sample
    table — the standard sampled-eval metric: per task 1 − C(n−c,k)/
    C(n,k), averaged exactly (fixed n makes the denominator constant,
    so each k is ONE float division of exact BIGINT sums)."""
    from es_ch_sync_spark.operators.analytics import pass_at_k

    d = _docs(spark, sf_dir).select(
        F.expr(f"doc_id div {_PAK_N}").alias("task"),
        (F.length("text") % 3 == 0).alias("ok"),
    )
    return pass_at_k(d, "task", "ok", n=_PAK_N, ks=_PAK_KS)


@register(
    "mattr_diversity",
    f"""
    WITH d AS (
        SELECT doc_id,
               string_split({oracles.NORM.format(col='text')}, ' ') AS ws
        FROM documents
    ),
    m AS (
        SELECT doc_id, len(ws)::BIGINT AS n,
               (ws = ['']) AS empty,
               CASE WHEN len(ws) >= 25 THEN
                   list_sum(list_transform(
                       range(1, len(ws) - 25 + 2),
                       i -> len(list_distinct(ws[i:i+24]))
                   ))::BIGINT
               END AS wsum,
               len(list_distinct(ws))::BIGINT AS ndist
        FROM d
    )
    SELECT doc_id,
           CASE WHEN empty THEN 0 ELSE n END AS n_words,
           CASE WHEN empty OR n < 25 THEN 0 ELSE n - 24 END AS n_windows,
           (NOT empty AND n >= 25) AS windowed,
           round(CASE WHEN empty THEN NULL
                 WHEN n >= 25 THEN wsum::DOUBLE / ((n - 24) * 25)::DOUBLE
                 ELSE ndist::DOUBLE / n::DOUBLE
                 END, 6) AS mattr
    FROM m ORDER BY doc_id
    """,
)
def q_mattr_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-average type-token ratio (window 25) per doc — the
    length-independent lexical-diversity gate next to ngram_diversity's
    per-source distinct ratios.  Map-only: the sliding windows are a
    transform over the per-doc word array inside codegen; short docs
    fall back to plain TTR (windowed = false); empty docs NULL."""
    from es_ch_sync_spark.operators.text import mattr_diversity

    return mattr_diversity(_docs(spark, sf_dir), window=25).orderBy("doc_id")


def _split_drift_oracle() -> str:
    split_case = oracles._split_case_sql()
    return f"""
    WITH d AS (
        SELECT {split_case} AS split,
               len(list_filter(
                   string_split({oracles.NORM.format(col='text')}, ' '),
                   t -> t != ''
               ))::BIGINT AS n_tok
        FROM documents
    ),
    census AS MATERIALIZED (
        SELECT split, length(bin(greatest(n_tok, 1)))::INT AS bucket,
               count(*)::BIGINT AS c
        FROM d GROUP BY 1, 2
    ),
    tot AS (SELECT split, sum(c)::BIGINT AS n FROM census GROUP BY 1),
    p AS (
        SELECT a.split AS g_a, a.n AS na, b.split AS g_b, b.n AS nb
        FROM tot a JOIN tot b ON a.split < b.split
    ),
    grid AS (
        SELECT p.*, u.bucket
        FROM p CROSS JOIN (SELECT DISTINCT bucket FROM census) u
    ),
    j AS (
        SELECT g.g_a, g.g_b, g.na, g.nb, g.bucket,
               coalesce(x.c, 0)::BIGINT AS ca, coalesce(y.c, 0)::BIGINT AS cb
        FROM grid g
        LEFT JOIN census x ON x.split = g.g_a AND x.bucket = g.bucket
        LEFT JOIN census y ON y.split = g.g_b AND y.bucket = g.bucket
        WHERE coalesce(x.c, 0) > 0 OR coalesce(y.c, 0) > 0
    ),
    t AS (
        SELECT g_a, g_b, ca, cb, na, nb,
               CASE WHEN ca > 0 THEN (ca::DOUBLE / na::DOUBLE)
                    * ln((ca::DOUBLE / na::DOUBLE)
                         / (((ca::DOUBLE / na::DOUBLE)
                             + (cb::DOUBLE / nb::DOUBLE)) / 2.0))
                    ELSE 0.0 END AS tp,
               CASE WHEN cb > 0 THEN (cb::DOUBLE / nb::DOUBLE)
                    * ln((cb::DOUBLE / nb::DOUBLE)
                         / (((ca::DOUBLE / na::DOUBLE)
                             + (cb::DOUBLE / nb::DOUBLE)) / 2.0))
                    ELSE 0.0 END AS tq
        FROM j
    )
    SELECT g_a AS split_a, g_b AS split_b,
           count(*)::BIGINT AS n_buckets,
           round((sum(CAST(floor(tp * 1e9 + 0.5) AS BIGINT))
                  + sum(CAST(floor(tq * 1e9 + 0.5) AS BIGINT)))::DOUBLE
                 / 2e9, 6) AS jsd_nats,
           round(sum(abs(ca::HUGEINT * nb::HUGEINT
                         - cb::HUGEINT * na::HUGEINT))::DOUBLE
                 / (2.0 * max(na)::DOUBLE * max(nb)::DOUBLE), 6) AS tvd
    FROM t GROUP BY 1, 2 ORDER BY 1, 2
    """


@register("split_length_drift", _split_drift_oracle())
def q_split_length_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise JSD between the train/valid/test token-length
    distributions (power-of-two buckets via exact binary-digit length —
    no float log2 at bucket edges): the split-health check a leakage
    audit runs next to decontaminate (a hash split should show ~0 drift;
    a time- or source-correlated split shows up immediately).  Bounded
    census in, census-sized everywhere."""
    from es_ch_sync_spark.operators.analytics import pairwise_jsd
    from es_ch_sync_spark.operators.sampling import assign_split
    from es_ch_sync_spark.operators.text import words

    docs = _docs(spark, sf_dir)
    d = assign_split(docs).select(
        "split",
        F.size(F.filter(words(F.col("text")), lambda t: t != F.lit("")))
        .cast("long")
        .alias("n_tok"),
    )
    census = d.select(
        "split",
        F.length(
            F.conv(F.greatest(F.col("n_tok"), F.lit(1)).cast("string"), 10, 2)
        ).cast("int").alias("bucket"),
    ).groupBy("split", "bucket").agg(F.count(F.lit(1)).cast("long").alias("c"))
    return pairwise_jsd(census, "split", "bucket", "c")


@register(
    "source_gini",
    f"""
    WITH census AS (
        SELECT source AS k,
               sum(len(list_filter(
                   string_split({oracles.NORM.format(col='text')}, ' '),
                   t -> t != ''
               )))::BIGINT AS w
        FROM documents GROUP BY 1
    ),
    ranked AS (
        SELECT w, row_number() OVER (ORDER BY w, k) AS i FROM census
    )
    SELECT count(*)::BIGINT AS n_keys, sum(w)::BIGINT AS total_weight,
           round(CASE WHEN count(*) > 0 AND sum(w) > 0
                 THEN (2::HUGEINT * sum(i::HUGEINT * w::HUGEINT)
                       - (count(*) + 1)::HUGEINT * sum(w)::HUGEINT)::DOUBLE
                      / (count(*)::HUGEINT * sum(w)::HUGEINT)::DOUBLE
                 END, 6) AS gini
    FROM ranked
    """,
)
def q_source_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of corpus token mass across sources — the
    scalar mixture-concentration readout next to cap_per_domain /
    temperature_sample (a balanced blend reads ~0; one dominating
    source pushes toward 1).  One token-count pass → source census →
    one census window + one aggregate, exact integer moments."""
    from es_ch_sync_spark.operators.analytics import gini_concentration
    from es_ch_sync_spark.operators.text import words

    census = (
        _docs(spark, sf_dir)
        .select(
            "source",
            F.size(F.filter(words(F.col("text")), lambda t: t != F.lit("")))
            .cast("long")
            .alias("n_tok"),
        )
        .groupBy("source")
        .agg(F.sum("n_tok").cast("long").alias("w"))
    )
    return gini_concentration(census, "source", "w")
