"""Persistent LSH signature index — the storage half of incremental dedup.

`operators.dedup.minhash_incremental` re-derives the indexed corpus's
bucket rows every batch; a production ingest pipeline computes them ONCE
per document and keeps them as a table.  The index is (doc_id, band, key)
— three short columns, ~100 bytes/doc regardless of document size — so at
100 TB of text the index is in the low-GB-per-band range and each daily
batch joins against it without touching stored documents.

Layout: parquet partitioned by ``band``.  The candidate join is per-band
equi on (band, key); partition pruning means each band's probe reads only
its own inverted file, and appending a verified batch back into the index
is a per-band append (the same hive-partition append the signal sink
uses).  Verification still needs candidate documents' shingles — those
come from the corpus table by id (a keyed semi-join, candidates only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from es_ch_sync_spark.operators.dedup import (
    jaccard,
    lsh_buckets,
    word_shingles,
)
from es_ch_sync_spark.operators.util import spread


def build_signature_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
    mode: str = "overwrite",
) -> None:
    """Materialize the (id, band, key) bucket table, partitioned by band.
    ``mode='append'`` is the per-batch index maintenance call."""
    lsh_buckets(docs, text_col, id_col, num_hashes, bands, shingle_k).write.mode(
        mode
    ).partitionBy("band").parquet(path)


def dedup_against_index(
    new_docs: DataFrame,
    index_path: str,
    corpus_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """Near-dup pairs (id_new, id_index, jaccard) between a new batch and
    the STORED index — no signature recompute for the corpus, candidates
    bounded by the batch's bucket collisions.

    ``corpus_docs`` supplies text for Jaccard verification of candidate
    index docs only (keyed semi-join)."""
    spark = new_docs.sparkSession
    idx = spark.read.parquet(index_path).select(
        F.col(id_col).alias("id_index"), "band", "key"
    )
    nb = lsh_buckets(new_docs, text_col, id_col, num_hashes, bands, shingle_k).select(
        F.col(id_col).alias("id_new"), "band", "key"
    )
    cands = (
        nb.join(idx, ["band", "key"])
        .filter(F.col("id_new") != F.col("id_index"))
        .select("id_new", "id_index")
        .distinct()
        .cache()
    )
    new_sh = (
        spread(new_docs)
        .join(
            F.broadcast(cands.select(F.col("id_new").alias(id_col)).distinct()),
            id_col,
            "left_semi",
        )
        .select(
            F.col(id_col).alias("id_new"),
            word_shingles(F.col(text_col), shingle_k).alias("sh_n"),
        )
    )
    idx_sh = (
        spread(corpus_docs)
        .join(
            F.broadcast(cands.select(F.col("id_index").alias(id_col)).distinct()),
            id_col,
            "left_semi",
        )
        .select(
            F.col(id_col).alias("id_index"),
            word_shingles(F.col(text_col), shingle_k).alias("sh_i"),
        )
    )
    return (
        cands.join(new_sh, "id_new")
        .join(idx_sh, "id_index")
        .select(
            "id_new",
            "id_index",
            F.round(jaccard(F.col("sh_n"), F.col("sh_i")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
