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
