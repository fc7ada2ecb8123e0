"""Recall of fingerprint_nn_capped vs the exhaustive inverted-index join
(r8 judge directive #3): the cap's stated tradeoff — "a doc whose every
fingerprint term exceeds max_term_df reports no neighbor" — measured,
the same way the ANN tiers carry ann_recall.

For each ``max_term_df`` in the sweep, every doc that has an exhaustive
argmax neighbor is scored:

- ``recall_sim``   — fraction whose capped argmax has the SAME similarity
  as the exhaustive argmax (ties are interchangeable argmaxes: capping
  never changes a surviving pair's sim, weights stay normalized over the
  full fingerprint, so equal sim == an equally good neighbor);
- ``recall_exact`` — stricter: identical neighbor id (undercounts ties);
- ``no_neighbor``  — fraction reporting nothing (every candidate term
  capped away) — the headline tradeoff number.

Usage: python tools/fingerprint_recall.py [sf_dir|parquet_path] [caps...]
       default sweep: 16 32 64 on $SPARK_GRAFT_SF_DIR (sf0.1); pass the
       .scale_cache ×100 documents parquet for the scale corpus.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from es_ch_sync_spark.io.sources import read_parquet_table
    from es_ch_sync_spark.operators.features import fingerprint_nearest_neighbor
    from es_ch_sync_spark.session import get_spark

    target = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    caps = [int(c) for c in sys.argv[2:]] or [16, 32, 64]
    spark = get_spark("fingerprint_recall", shuffle_partitions=32)
    if target.endswith(".parquet"):
        docs = spark.read.parquet(target).select("doc_id", "text")
    else:
        docs = read_parquet_table(spark, target, "documents").select("doc_id", "text")
    n_docs = docs.count()

    t0 = time.time()
    exact = fingerprint_nearest_neighbor(docs).localCheckpoint(eager=True)
    n_exact = exact.count()
    t_exact = time.time() - t0
    print(
        f"corpus={target} docs={n_docs} exhaustive: {n_exact} neighbors "
        f"in {t_exact:.1f}s",
        flush=True,
    )

    print("| corpus | docs | max_term_df | wall_s | recall_sim | recall_exact | no_neighbor |")
    print("|---|---|---|---|---|---|---|")
    label = target.rstrip("/").rsplit("/", 1)[-1]
    for cap in caps:
        t0 = time.time()
        capped = fingerprint_nearest_neighbor(docs, max_term_df=cap)
        joined = (
            exact.alias("e")
            .join(
                capped.select(
                    "doc_id",
                    F.col("nbr_id").alias("c_nbr"),
                    F.col("sim").alias("c_sim"),
                ),
                "doc_id",
                "left",
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.when(F.col("c_sim") == F.col("e.sim"), 1).otherwise(0)
                ).alias("same_sim"),
                F.sum(
                    F.when(F.col("c_nbr") == F.col("e.nbr_id"), 1).otherwise(0)
                ).alias("same_nbr"),
                F.sum(F.when(F.col("c_sim").isNull(), 1).otherwise(0)).alias(
                    "missing"
                ),
            )
            .collect()[0]
        )
        wall = time.time() - t0
        print(
            f"| {label} | {n_docs} | {cap} | {wall:.1f} "
            f"| {joined['same_sim'] / joined['n']:.4f} "
            f"| {joined['same_nbr'] / joined['n']:.4f} "
            f"| {joined['missing'] / joined['n']:.4f} |",
            flush=True,
        )


if __name__ == "__main__":
    main()
