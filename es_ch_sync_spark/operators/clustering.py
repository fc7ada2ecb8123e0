"""Relational k-means (Lloyd's) over embedding columns.

The IVF coarse quantizer (Jégou et al., TPAMI 2011 — the inverted-file
half) needs cell assignments; `queries_relational.q_ann_ivf_topk` uses the
testdata's label column as a stand-in.  This module computes real cells,
Spark-first:

- Each Lloyd iteration is TWO aggregations over the posexploded vector
  table — assign (per-(vector, centroid) squared distance, argmin) and
  re-center (per-(cell, pos) mean).  No UDFs, no driver-side vectors, no
  collect: centroids live in a k·d-row DataFrame that broadcast-joins into
  the fact side.
- Determinism: seeds are the k lowest vec_ids; every intermediate
  (centroid component, distance) is rounded to 9dp, and argmin ties break
  on the smaller cell id via a struct-min — so the DuckDB oracle (same
  pipeline with the iterations unrolled as CTEs, oracles.kmeans_cells_sql)
  reproduces the assignment bit-for-bit.  The rounding also pins down
  cross-engine float-summation association noise (~1e-14 ≪ 0.5e-9).

Scale: one iteration moves O(n·d·k) rows through a map-side-combined
aggregation — the shuffle carries (vec_id, cell, partial-sum) triples, not
vectors.  Once fitted, the perf path for ASSIGNMENT at serving time is to
collect the tiny k·d centroid table and embed it as plan literals (one
narrow map, no join) — the relational form here is the fit path and the
checkable contract."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def posexplode_vectors(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, pos, x float64) — the tall form every relational vector op uses."""
    return emb.select(
        F.col(id_col),
        F.posexplode(F.transform(F.col(vec_col), lambda v: v.cast("double"))).alias(
            "pos", "x"
        ),
    )


def kmeans_assign(
    emb: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell) after ``iters`` Lloyd iterations from deterministic seeds.

    ``cell`` is the seed vector's id (labels need not be dense).  The
    returned plan contains the whole unrolled iteration chain; callers
    running many iterations should localCheckpoint between rounds."""
    pe = posexplode_vectors(emb, id_col, vec_col)
    seeds = emb.select(id_col).orderBy(id_col).limit(k)
    cent = (
        pe.join(F.broadcast(seeds), id_col)
        .select(F.col(id_col).alias("cell"), "pos", F.round("x", 9).alias("c"))
    )
    assign = None
    for i in range(iters):
        diff = F.col("x") - F.col("c")
        dist = (
            pe.join(F.broadcast(cent), "pos")
            .groupBy(id_col, "cell")
            .agg(F.round(F.sum(diff * diff), 9).alias("d"))
        )
        assign = (
            dist.groupBy(id_col)
            .agg(F.min(F.struct("d", "cell")).alias("m"))
            .select(F.col(id_col), F.col("m.cell").alias("cell"))
        )
        if i < iters - 1:
            cent = (
                assign.join(pe, id_col)
                .groupBy("cell", "pos")
                .agg(F.round(F.avg("x"), 9).alias("c"))
            )
    return assign


def ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """IVF ANN over REAL k-means cells, end-to-end relational: fit the
    coarse quantizer (kmeans_assign), recompute final centroids, pick the
    query's cell by max centroid cosine (ties → smaller cell id), brute
    top-k inside that cell only.

    Still no driver-side vectors: the best cell is a 1-row DataFrame
    cross-joined into the cell filter.  Approximate vs exact kNN by cell
    truncation, deterministic end-to-end — the oracle replicates every
    stage (oracles.ivf_kmeans_topk_sql)."""
    from es_ch_sync_spark.operators.similarity import _sql_double_array, cosine

    assign = kmeans_assign(emb, k=n_cells, iters=iters, id_col=id_col, vec_col=vec_col)
    pe = posexplode_vectors(emb, id_col, vec_col)
    cent = (
        assign.join(pe, id_col)
        .groupBy("cell", "pos")
        .agg(F.round(F.avg("x"), 9).alias("c"))
    )
    q = [float(x) for x in query_vec]
    qn = sum(x * x for x in q) ** 0.5
    # cos(centroid, q): join the k·d centroid rows with the query literal by
    # position; one k-row aggregate, then a 1-row argmax (min struct over
    # (-cos, cell) — negation gives max with smaller-cell tie-break)
    qcol = F.expr(_sql_double_array(q))
    cq = cent.withColumn("qx", F.element_at(qcol, F.col("pos") + 1))
    cell_scores = cq.groupBy("cell").agg(
        F.sum(F.col("c") * F.col("qx")).alias("dot"),
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("cn"),
    )
    cos_c = F.when(F.col("cn") > 0, F.col("dot") / (F.col("cn") * F.lit(qn))).otherwise(
        F.lit(-2.0)
    )
    best = (
        cell_scores.select("cell", F.round(cos_c, 9).alias("ccos"))
        .agg(
            F.min(
                F.struct((-F.col("ccos")).alias("nc"), F.col("cell").alias("cell"))
            ).alias("m")
        )
        .select(F.col("m.cell").alias("best_cell"))
    )
    members = assign.join(F.broadcast(best), assign.cell == F.col("best_cell"), "inner").select(
        id_col
    )
    cand = emb.join(members, id_col, "left_semi")
    from es_ch_sync_spark.operators.similarity import _as_double

    scored = cand.select(
        F.col(id_col), cosine(_as_double(F.col(vec_col)), qcol).alias("cos_sim")
    )
    if exclude_id is not None:
        scored = scored.filter(F.col(id_col) != exclude_id)
    return (
        scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, F.round("cos_sim", 6).alias("cos_sim"))
    )
