"""Persistent file-level Bloom-filter index for point lookups.

The signal table's layout (io/sinks.py) serves the reference's dominant
predicates with partition pruning (time) and row-group stats (token_id,
the sort key).  A point lookup on a NON-sort high-cardinality key —
"which files contain event_id X / document fingerprint F?" — gets no help
from either: min/max stats of a uniformly distributed key span the whole
domain in every file, so every file is read.  The storage-layer answer
(what Delta/Iceberg attach as per-file bloom filters) is a tiny secondary
index: one Bloom bitmap per data file, consulted BEFORE planning the
scan, so a point query reads only the files whose bitmap claims the key.

Design:
- **Build is one distributed pass**: distinct (file, key) via
  ``input_file_name()`` → k md5-derived bit positions per key (the
  sketches.hash56 family, seeds ``bl0..bl{k-1}``) → positions pack into
  64-bit words → ``groupBy(file, word_idx).agg(bit_or(mask))``.  The
  shuffle carries O(files · m/64) words, never keys.
- **The index is data**: a parquet table (file, word_idx, word) — tiny
  (m bits per file), broadcast-sized for any realistic file count, and
  rebuildable per partition after compaction.
- **Lookup is driver-cheap**: compute the k positions for the literal
  key (same md5 arithmetic in plain Python), read the index rows for
  those words only (predicate pushdown on word_idx), keep files with all
  k bits set, and plan the real scan over just those paths.
- **No false negatives by construction** (a present key's bits are all
  set in its file's bitmap); false positives only cost an extra file
  read.  With m bits/file and n keys/file, FPR ≈ (1 − e^{−kn/m})^k —
  the builder exposes bits-per-key directly.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BLOOM_K = 5  # hash functions


def _bit_positions_col(key, m: int) -> list:
    """k Column expressions: md5-derived bit positions of a key column."""
    from es_ch_sync_spark.operators.sketches import hash56

    return [hash56(key, seed=f"bl{i}") % F.lit(m) for i in range(BLOOM_K)]


def _bit_positions_py(value, m: int) -> list[int]:
    """The identical positions for a literal value, driver-side."""
    out = []
    for i in range(BLOOM_K):
        h = int(hashlib.md5(f"bl{i}:{value}".encode()).hexdigest()[:14], 16)
        out.append(h % m)
    return out


def build_bloom_index(
    spark: SparkSession,
    table_dir: str,
    index_dir: str,
    key_col: str,
    bits_per_file: int = 1 << 16,
) -> int:
    """One pass over the table → per-file Bloom bitmaps as a parquet
    index (file, word_idx, word).  Returns the number of files indexed.

    ``bits_per_file`` sizes the filter: at 2^16 bits and 5 hashes a file
    holding ~5k distinct keys has FPR ≈ 0.1%; tune upward for bigger
    files (the index stays m/64 longs per file)."""
    m = bits_per_file
    df = spark.read.parquet(table_dir)
    keyed = df.select(
        F.input_file_name().alias("file"), F.col(key_col).alias("k")
    ).dropDuplicates(["file", "k"])
    pos = keyed.select(
        "file",
        F.explode(F.array(*_bit_positions_col(F.col("k"), m))).alias("pos"),
    )
    words = (
        pos.select(
            "file",
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            F.expr("shiftleft(1L, cast(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("file", "word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )
    words.write.mode("overwrite").parquet(index_dir)
    return spark.read.parquet(index_dir).select("file").distinct().count()


def candidate_files(
    spark: SparkSession, index_dir: str, value, bits_per_file: int = 1 << 16
) -> list[str]:
    """Files whose bitmap has ALL k bits of ``value`` set (never misses a
    file that contains the key; may include false positives)."""
    positions = _bit_positions_py(value, bits_per_file)
    need = {}  # word_idx -> required mask
    for p in positions:
        need[p // 64] = need.get(p // 64, 0) | (1 << (p % 64))
    idx = (
        spark.read.parquet(index_dir)
        .filter(F.col("word_idx").isin(list(need)))
        .collect()
    )
    per_file: dict[str, dict[int, int]] = {}
    for r in idx:
        per_file.setdefault(r["file"], {})[r["word_idx"]] = r["word"]
    out = []
    for f, words in per_file.items():
        if all(words.get(w, 0) & mask == mask for w, mask in need.items()):
            out.append(f)
    return sorted(out)


def point_lookup(
    spark: SparkSession,
    table_dir: str,
    index_dir: str,
    key_col: str,
    value,
    bits_per_file: int = 1 << 16,
) -> DataFrame:
    """Index-pruned point query: plan the scan over only the candidate
    files.  Semantically identical to a full-table filter (the final
    equality predicate re-checks every row, so false positives cost IO,
    never correctness); an empty candidate set short-circuits to an
    empty frame with the table's schema."""
    files = candidate_files(spark, index_dir, value, bits_per_file)
    full = spark.read.parquet(table_dir)
    if not files:
        return full.filter(F.lit(False))
    # input_file_name() yields file:// URIs on local FS — normalize
    paths = [f[len("file:"):] if f.startswith("file:") else f for f in files]
    return spark.read.schema(full.schema).parquet(*paths).filter(
        F.col(key_col) == F.lit(value)
    )
