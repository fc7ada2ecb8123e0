"""Persistent IVF index — inverted lists as cell-partitioned parquet.

The relational IVF path (operators.clustering.ivf_topk) re-fits the coarse
quantizer per query; a real serving deployment fits ONCE and materializes
the layout so each query reads only its probed cells.  Spark-native
realization of Jégou et al.'s inverted file (TPAMI 2011 §III):

- **build**: fit k-means (relational, no driver vectors), then write the
  vector table ``partitionBy("cell")`` — each IVF inverted list becomes a
  hive-style partition directory — plus the tiny (cells·dim) centroid
  table next to it.
- **search**: score the query against centroids (a few-hundred-row
  relational aggregate), take the top ``nprobe`` cells, and scan only
  those partition directories.  The `.filter(cell IN …)` lands as a
  PartitionFilter — Spark never opens the other cells' files (pinned by
  tests/test_ann_index.py).

At 100 TB this converts ANN serving from a full-corpus scan to reading
``nprobe / n_cells`` of the data — with n_cells in the thousands, a
~1000× scan reduction per query, the same economics the reference gets
from its primary-key index.  The only driver-side transfer is the probed
cell-id list (``nprobe`` longs — bounded by a parameter, not by data).
``nprobe`` is the standard IVF recall knob: 1 = fastest, n_cells = exact
within the quantizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_ivf_index(
    emb: DataFrame,
    path: str,
    n_cells: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Fit the coarse quantizer and materialize ``{path}/vectors``
    (cell-partitioned inverted lists) + ``{path}/centroids``."""
    from es_ch_sync_spark.operators.clustering import kmeans_assign, posexplode_vectors

    assign = kmeans_assign(emb, k=n_cells, iters=iters, id_col=id_col, vec_col=vec_col)
    pe = posexplode_vectors(emb, id_col, vec_col)
    cent = (
        assign.join(pe, id_col)
        .groupBy("cell", "pos")
        .agg(F.round(F.avg("x"), 9).alias("c"))
    )
    (
        emb.join(assign, id_col)
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{path}/vectors")
    )
    cent.write.mode("overwrite").parquet(f"{path}/centroids")


def probe_cells(
    spark: SparkSession, path: str, query_vec: list[float], nprobe: int = 1
) -> list[int]:
    """Top-``nprobe`` cells by centroid cosine (ties → smaller cell id).

    Relational scoring over the centroid table; only the chosen cell ids
    (``nprobe`` longs) ever reach the driver."""
    cent = spark.read.parquet(f"{path}/centroids")
    q = [float(x) for x in query_vec]
    qn = sum(x * x for x in q) ** 0.5
    from es_ch_sync_spark.operators.similarity import _sql_double_array

    qcol = F.expr(_sql_double_array(q))
    cq = cent.withColumn("qx", F.element_at(qcol, (F.col("pos") + 1).cast("int")))
    scores = cq.groupBy("cell").agg(
        F.sum(F.col("c") * F.col("qx")).alias("dot"),
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("cn"),
    )
    ccos = F.when(
        F.col("cn") > 0, F.col("dot") / (F.col("cn") * F.lit(qn))
    ).otherwise(F.lit(-2.0))
    rows = (
        scores.select("cell", F.round(ccos, 9).alias("ccos"))
        .orderBy(F.col("ccos").desc(), F.col("cell").asc())
        .limit(nprobe)
        .collect()
    )
    return [r["cell"] for r in rows]


def search_ivf_index(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Top-k cosine among the ``nprobe`` probed cells only.

    The cell filter is a partition filter — unprobed inverted lists are
    never read."""
    from es_ch_sync_spark.operators.similarity import cosine_topk

    cells = probe_cells(spark, path, query_vec, nprobe)
    vecs = spark.read.parquet(f"{path}/vectors").filter(F.col("cell").isin(cells))
    return cosine_topk(
        vecs, query_vec, k=k, id_col=id_col, vec_col=vec_col, exclude_id=exclude_id
    )


def add_to_ivf_index(
    new_emb: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental ingest: route new vectors to their nearest EXISTING
    centroid and append them to that cell's partition directory — the
    quantizer is not refit (standard served-IVF practice: assignment is
    cheap and online, refit is an offline maintenance job — same
    economics as the signature-index batch ingest).  Append touches only
    the affected cell partitions; centroids stay unchanged so concurrent
    searches keep probing correctly.

    Idempotence: ids already present in the index are dropped (left-anti
    join on the hashes-sized id projection) so a retried batch cannot
    duplicate vectors in search results.  The append itself is not atomic
    across cell partitions — a crash mid-write can leave a partial batch,
    which the anti-join makes safe to re-run."""
    from es_ch_sync_spark.operators.clustering import assign_to_centroids

    spark = new_emb.sparkSession
    cent = spark.read.parquet(f"{path}/centroids")
    existing = spark.read.parquet(f"{path}/vectors")
    # align the batch's vector element type to the stored layout: appending
    # array<double> rows into an array<float> index would corrupt every
    # subsequent read of the touched partitions (parquet type mismatch)
    stored_vec_dt = next(
        f.dataType for f in existing.schema.fields if f.name == vec_col
    )
    new_emb = new_emb.withColumn(vec_col, F.col(vec_col).cast(stored_vec_dt))
    fresh = new_emb.join(existing.select(id_col), id_col, "left_anti")
    assign = assign_to_centroids(fresh, cent, id_col=id_col, vec_col=vec_col)
    (
        fresh.join(assign, id_col)
        .write.mode("append")
        .partitionBy("cell")
        .parquet(f"{path}/vectors")
    )


def ivf_drift_report(
    spark: SparkSession,
    path: str,
    refit_threshold: float = 0.25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Quantizer-staleness report: per cell, the L2 distance between the
    STORED centroid and the CURRENT mean of the cell's vectors, with
    ``needs_refit`` flagged when drift exceeds the threshold — the
    maintenance trigger that completes the incremental-ingest story
    (r5 stretch #8): appends route to frozen centroids, so sustained
    distribution shift degrades cell balance/recall until an offline
    refit; this report is how a pipeline decides WHEN.

    Fully relational: per-cell means are one partial-aggregable groupBy
    over (cell, pos) — no vectors ever reach the driver; the output is
    n_cells rows.  Same economics as embedding_centroid_drift
    (features.centroid_drift), specialized to the index layout."""
    from es_ch_sync_spark.operators.util import spread

    vecs = spark.read.parquet(f"{path}/vectors")
    cent = spark.read.parquet(f"{path}/centroids")
    # explode in place, carrying the partition column — no join-back
    pe = spread(vecs.select("cell", vec_col)).select(
        "cell",
        F.posexplode(
            F.transform(F.col(vec_col), lambda v: v.cast("double"))
        ).alias("pos", "x"),
    )
    cur = pe.groupBy("cell", "pos").agg(
        F.avg("x").alias("m"), F.count(F.lit(1)).alias("n")
    )
    joined = cur.join(cent, ["cell", "pos"])
    return (
        joined.groupBy("cell")
        .agg(
            F.round(
                F.sqrt(F.sum((F.col("m") - F.col("c")) * (F.col("m") - F.col("c")))), 9
            ).alias("drift"),
            F.max("n").alias("n_vectors"),
        )
        .withColumn("needs_refit", F.col("drift") > F.lit(refit_threshold))
        .orderBy("cell")
    )
