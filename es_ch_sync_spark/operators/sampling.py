"""Deterministic sampling / dataset splitting for training-data pipelines.

A training corpus needs reproducible membership decisions: the same
document must land in the same split on every run, on every cluster size,
with no RNG state to ship around.  Both operators here key the decision on
``md5(seed || ':' || id)`` — a pure column expression (JVM-side, no UDF,
no shuffle) that is bit-identical in DuckDB, which makes the assignments
oracle-checkable row-for-row.

- **assign_split**: hash-bucket each id into [0, 10000) and cut the range
  by cumulative weights (train/valid/test).  Unlike randomSplit, this is
  stable under repartitioning, data reordering, and incremental appends —
  a late-arriving document gets the same split it would have gotten on day
  one, so train/test contamination can't creep in across pipeline runs.
- **stratified_sample**: per-stratum Bernoulli sampling with the same
  hash: keep id iff bucket < fraction·10000, with the fraction chosen per
  stratum.  Used to rebalance sources (e.g. downsample boilerplate-heavy
  domains) — again append-stable, so a growing corpus keeps its sampling
  decisions.

At 100 TB both are map-only projections/filters fused into the scan: no
shuffle, no driver coordination, trivially parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SPLIT_BUCKETS = 10_000


def _hash_bucket(id_col: Column, seed: str) -> Column:
    """Stable bucket in [0, SPLIT_BUCKETS): first 56 bits of
    md5(seed:id) mod buckets — same construction as the minhash base hash
    (dedup.py), so the DuckDB oracle reproduces it exactly."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(seed), F.lit(":"), id_col.cast("string"))), 1, 14),
        16,
        10,
    ).cast("long")
    return h % SPLIT_BUCKETS


def assign_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    seed: str = "split",
) -> DataFrame:
    """Add a ``split`` column assigning each row to a named fraction.

    ``weights`` maps split name → fraction (must sum to ≤ 1; any remainder
    falls into the last split).  Assignment is by hash-bucket range, so
    fractions are exact in expectation and every run agrees."""
    weights = weights or {"train": 0.9, "valid": 0.05, "test": 0.05}
    bucket = _hash_bucket(F.col(id_col), seed)
    names = list(weights)
    cuts = []
    acc = 0.0
    for name in names[:-1]:
        acc += weights[name]
        cuts.append((name, int(round(acc * SPLIT_BUCKETS))))
    expr: Column = F.lit(names[-1])
    for name, cut in reversed(cuts):
        expr = F.when(bucket < cut, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    id_col: str = "doc_id",
    seed: str = "strat",
) -> DataFrame:
    """Keep a per-stratum deterministic fraction of rows.

    ``fractions`` maps stratum value → keep fraction; strata not listed
    keep ``default_fraction``.  The keep decision depends only on
    (seed, id), so re-runs and appends are consistent."""
    bucket = _hash_bucket(F.col(id_col), seed)
    frac: Column = F.lit(float(default_fraction))
    for value, f in fractions.items():
        frac = F.when(F.col(strata_col) == value, F.lit(float(f))).otherwise(frac)
    return df.filter(bucket < (frac * SPLIT_BUCKETS).cast("long"))
