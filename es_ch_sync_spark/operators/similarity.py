"""Similarity search over embedding columns (`array<float>`).

The approximate tiers follow the published formulations: signed random
projections (Charikar, STOC 2002), LSH probing (Indyk/Motwani, STOC 1998;
Gionis/Indyk/Motwani, VLDB 1999), and IVF-style coarse quantization
(the inverted-file half of Jégou et al., "Product quantization for
nearest neighbor search", TPAMI 2011) in queries_relational.q_ann_ivf_topk.

Two tiers, same API:

- **Brute-force cosine top-k** — the exact baseline.  Dot products are pure
  column expressions (`zip_with` + `aggregate`): JVM-side, fused with the
  scan, no Python.  Top-k plans as TakeOrderedAndProject (per-partition
  heap + k-row driver merge) — no global sort.
- **LSH-bucketed ANN (random hyperplanes / SRP)** — the 100 TB path.  Each
  vector maps to a `planes`-bit signature; the search probes only vectors
  whose signature matches the query's in ≥1 band.  Hyperplane components
  are derived deterministically from md5 at *plan-build time* (plain Python
  floats embedded as literals), so the same planes can be embedded in the
  DuckDB oracle and results are exactly reproducible — no RNG state anywhere.
- **Embedding-cosine near-dup** (all-pairs above threshold, LSH-pruned) —
  the dedup-by-embedding entry of the dedup family.

All cosine math is done in float64 after an explicit element cast —
float32 parquet values widen exactly, and both Spark and DuckDB fold the
sum left-to-right over the index order, so scores are bit-identical.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from es_ch_sync_spark.operators.util import spread


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _sql_double_array(xs: list[float]) -> str:
    """Literal array<double> as SQL text.  repr() round-trips doubles
    exactly; the D suffix keeps Spark from parsing them as DECIMAL."""
    return "array(" + ",".join(f"{float(x)!r}D" for x in xs) + ")"


def _sql_dot(vec_sql: str, xs: list[float]) -> str:
    """Left-to-right fold dot(vec, literal) as SQL text — one expr() parse
    instead of ~len(xs) py4j calls, same fold order as dot() below."""
    return (
        f"aggregate(zip_with({vec_sql}, {_sql_double_array(xs)}, (x, y) -> x * y), "
        "cast(0.0 as double), (acc, v) -> acc + v)"
    )


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb)).otherwise(F.lit(0.0))


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Exact top-k by cosine to a literal query vector.

    The query is a broadcast-free literal array folded into the projection;
    the plan is scan → map(score) → TakeOrderedAndProject(k)."""
    q = F.expr(_sql_double_array(query_vec))
    scored = emb.select(
        F.col(id_col),
        cosine(_as_double(F.col(vec_col)), q).alias("cos_sim"),
    )
    if exclude_id is not None:
        scored = scored.filter(F.col(id_col) != exclude_id)
    out = scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)
    return out.select(id_col, F.round("cos_sim", 6).alias("cos_sim"))


def knn_join(
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact k-NN for every vector (self-join + per-id window top-k).

    Quadratic — the correctness baseline ANN variants are judged against.
    At scale, replace the cross join with lsh_knn_join (same output schema)."""
    v = spread(emb).select(F.col(id_col), _as_double(F.col(vec_col)).alias("v")).withColumn(
        "nrm", norm(F.col("v"))
    )
    a, b = v.alias("a"), v.alias("b")
    from pyspark.sql import Window as W

    cos = F.when(
        (F.col("a.nrm") > 0) & (F.col("b.nrm") > 0),
        dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm")),
    ).otherwise(F.lit(0.0))
    scored = a.join(b, F.col(f"a.{id_col}") != F.col(f"b.{id_col}")).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        cos.alias("cos_sim"),
    )
    w = W.partitionBy("id_a").orderBy(F.col("cos_sim").desc(), F.col("id_b").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"), "rn")
    )


def knn_join_blocked(
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact k-NN via blocked matrix multiplication (vectorized Pandas UDF).

    Same output contract as knn_join, ~100× its arithmetic throughput: the
    right-side matrix is broadcast once as a numpy array; each partition of
    the left side computes ``A_block @ B.T`` (BLAS) and per-row top-k by
    argpartition.  This is the right shape for the brute-force tier — the
    expression-fold version exists as the all-JVM baseline; this one is
    the documented "vectorized Pandas UDF where built-ins can't keep up"
    exception (the per-pair fold can't batch across rows).

    Scale bound: B must fit executor memory (n·d·8 bytes — 64-dim float64:
    ~0.5 GB at 1M vectors).  Past that, block BOTH sides: cross-join block
    ids, matmul per (i, j) block pair, union per-row top-k — same kernel,
    one extra shuffle."""
    import numpy as np
    import pandas as pd

    spark = emb.sparkSession
    # gather B driver-side (only the two needed columns, Arrow path)
    pdf = emb.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    B = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(Bn)

    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("cos_sim", T.DoubleType()),
            T.StructField("rn", T.IntegerType()),
        ]
    )

    def score(pdfs):
        ids_b = b_ids.value
        Bn_l = b_mat.value
        for block in pdfs:
            if not len(block):
                continue
            A = np.stack([np.asarray(v, dtype=np.float64) for v in block[vec_col]])
            An = A / np.linalg.norm(A, axis=1, keepdims=True)
            sims = An @ Bn_l.T  # (block, n)
            a_ids = block[id_col].to_numpy()
            recs = []
            for r, aid in enumerate(a_ids):
                row = sims[r]
                # mask self, take k best (cos desc, id asc tie-break)
                order = np.lexsort((ids_b, -row))
                rank = 0
                for j in order:
                    if ids_b[j] == aid:
                        continue
                    rank += 1
                    recs.append((int(aid), int(ids_b[j]), round(float(row[j]), 6), rank))
                    if rank == k:
                        break
            yield pd.DataFrame(recs, columns=["id_a", "id_b", "cos_sim", "rn"])

    return spread(emb).select(id_col, vec_col).mapInPandas(score, out_schema)


# ---------------------------------------------------------------------------
# LSH (signed random projections), deterministic planes
# ---------------------------------------------------------------------------


def srp_planes(dim: int, n_planes: int, seed: str = "srp") -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-0.5, 0.5), derived from
    md5 — plain Python floats, embeddable as literals in Spark *and* the
    DuckDB oracle.  No RNG state, reproducible across engines and runs."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()[:8]
            row.append(int(h, 16) / 2**32 - 0.5)
        planes.append(row)
    return planes


def srp_signature(vec_sql: str, planes: list[list[float]]) -> Column:
    """Bit signature: bit p = [dot(vec, plane_p) >= 0], packed into a long.

    ``vec_sql`` is the vector column as SQL text; the whole signature is one
    expr() parse (plane literals embedded) — building it as Column arithmetic
    costs n_planes·dim py4j round-trips of pure plan-construction time."""
    terms = [
        f"if({_sql_dot(vec_sql, plane)} >= 0, {1 << p}L, 0L)"
        for p, plane in enumerate(planes)
    ]
    return F.expr(" + ".join(terms))


def lsh_ann_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    bands: int = 3,
    dim: int | None = None,
    exclude_id: int | None = None,
) -> DataFrame:
    """Approximate top-k: probe only vectors sharing ≥1 signature band with
    the query, then exact-rescore the candidates.

    Bucketing is a map-side projection; the band filter replaces the full
    scan's score computation with a cheap long-comparison — at 100 TB the
    win is reading *score only the ~n/2^bits candidate fraction*.  Recall
    is tuned by (n_planes, bands)."""
    dim = dim or len(query_vec)
    planes = srp_planes(dim, n_planes)
    bits_per_band = n_planes // bands
    mask = (1 << bits_per_band) - 1

    v = emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
    sig = srp_signature("v", planes)
    bucketed = v.withColumn("sig", sig)

    # query signature computed driver-side with the same plane literals
    qsig = 0
    for p, plane in enumerate(planes):
        d = sum(float(a) * b for a, b in zip(query_vec, plane))
        if d >= 0:
            qsig |= 1 << p
    band_match: Column = F.lit(False)
    for b in range(bands):
        qband = (qsig >> (b * bits_per_band)) & mask
        band_match = band_match | (
            F.shiftright(F.col("sig"), b * bits_per_band).bitwiseAND(F.lit(mask)) == F.lit(qband)
        )

    q = F.expr(_sql_double_array(query_vec))
    cands = bucketed.filter(band_match)
    if exclude_id is not None:
        cands = cands.filter(F.col(id_col) != exclude_id)
    return (
        cands.select(F.col(id_col), cosine(F.col("v"), q).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, F.round("cos_sim", 6).alias("cos_sim"))
    )


def embedding_near_duplicates(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    bands: int = 4,
    dim: int = 64,
    broadcast_vectors: bool = True,
) -> DataFrame:
    """Near-dup pairs by embedding cosine ≥ threshold, LSH-blocked.

    Same banding idea as minhash LSH: pairs must share ≥1 signature band,
    so the join is per-band on small integer keys, never all-pairs.

    ``broadcast_vectors``: the candidate-pair table is usually much larger
    than the vector table itself (n²/buckets vs n), so attaching vectors by
    broadcast keeps the pair rows from shuffling twice.  Turn OFF when the
    corpus is too big to broadcast (≳100M vectors) — the plan degrades to
    two shuffle joins keyed by id, which is the correct 100 TB path
    (pre-bucket the vector table by id to make them shuffle-free)."""
    planes = srp_planes(dim, n_planes)
    bits_per_band = n_planes // bands
    mask = (1 << bits_per_band) - 1
    # norm is per-vector: compute it once here, not once per candidate pair
    v = (
        spread(emb)
        .select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
        .withColumn("sig", srp_signature("v", planes))
        .withColumn("nrm", norm(F.col("v")))
    )
    # band bucketing carries ONLY (id, band, key): the vectors rejoin after
    # pair-dedup so each candidate pair is scored exactly once (a pair
    # colliding in 3 bands must not cost 3 cosines)
    bucketed = v.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("sig"), b * bits_per_band)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = bucketed.alias("a"), bucketed.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    # no spread() here: pairs comes out of a shuffle (already cluster-wide),
    # and spread's partition-count probe on a computed frame would plan and
    # run the upstream pipeline eagerly at build time
    if broadcast_vectors:
        # numpy scorer: pairs stay (long, long) rows end-to-end; vectors ride
        # once as a broadcast matrix and each partition scores its pairs with
        # one gather + einsum.  Chosen over the Column-expression fold because
        # higher-order functions (zip_with/aggregate) execute interpreted,
        # not codegen'd — at millions of candidate pairs that's the ceiling.
        scored = _score_pairs_numpy(emb, pairs, id_col=id_col, vec_col=vec_col)
    else:
        # ≳100M-vector path: attach vectors by shuffle join (pre-bucket the
        # vector table to make these shuffle-free) and fold JVM-side
        va = v.select(F.col(id_col).alias("id_a"), F.col("v").alias("v_a"), F.col("nrm").alias("n_a"))
        vb = v.select(F.col(id_col).alias("id_b"), F.col("v").alias("v_b"), F.col("nrm").alias("n_b"))
        cos = F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b")),
        ).otherwise(F.lit(0.0))
        scored = (
            pairs.join(va, "id_a").join(vb, "id_b").select("id_a", "id_b", cos.alias("cos_sim"))
        )
    return (
        scored.filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))
    )


def _score_pairs_numpy(
    emb: DataFrame,
    pairs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """cos_sim for (id_a, id_b) pairs via a broadcast normalized matrix.

    Exact semantics of dot/(|a||b|): computed as normalized-row dot (same
    value up to final-ulp rounding; every consumer rounds to 6dp)."""
    import numpy as np
    import pandas as pd

    spark = emb.sparkSession
    pdf = emb.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    B = np.stack([np.asarray(x, dtype=np.float64) for x in pdf[vec_col]])
    norms = np.linalg.norm(B, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    Bn = B / norms
    index = {int(i): r for r, i in enumerate(ids)}
    b_idx = spark.sparkContext.broadcast(index)
    b_mat = spark.sparkContext.broadcast(Bn)

    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def score(blocks):
        idx = b_idx.value
        M = b_mat.value
        for block in blocks:
            if not len(block):
                continue
            ra = np.fromiter((idx[int(i)] for i in block["id_a"]), dtype=np.int64, count=len(block))
            rb = np.fromiter((idx[int(i)] for i in block["id_b"]), dtype=np.int64, count=len(block))
            cos = np.einsum("ij,ij->i", M[ra], M[rb])
            yield pd.DataFrame(
                {"id_a": block["id_a"], "id_b": block["id_b"], "cos_sim": cos}
            )

    return pairs.mapInPandas(score, out_schema)
