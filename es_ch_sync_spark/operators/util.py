"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame

# Logical-plan node names that mean "this frame is downstream of a shuffle
# or an executed subtree" — spread()'s df.rdd probe is unsafe/pointless on
# such frames (the probe physically plans the frame; a broadcast join under
# it would EXECUTE at plan-build time).
_NON_SCAN_NODES = (
    "Join",
    "Aggregate",
    "Window",
    "Sort",
    "Distinct",
    "Deduplicate",
    "RepartitionByExpression",
    "Repartition",
    "GlobalLimit",
    "Union",
)

_INTERMEDIATES_ATTR = "_persisted_intermediates"


def _is_scan_stage(df: DataFrame) -> bool:
    """True iff the frame's analyzed LOGICAL plan is scan-shaped (relation +
    narrow ops only: Project/Filter/Generate/...). Inspecting the logical
    plan never triggers physical planning, so the check itself is free."""
    plan = df._jdf.queryExecution().analyzed().toString()
    return not any(
        line.lstrip().lstrip("+- :").startswith(node)
        for line in plan.splitlines()
        for node in _NON_SCAN_NODES
    )


def spread(
    df: DataFrame,
    min_partitions: int | None = None,
    by: str | tuple[str, ...] | None = None,
) -> DataFrame:
    """Ensure a compute-heavy map stage has enough partitions to use the
    cluster.

    Small inputs (one parquet file) arrive as 1 split; hashing/shingling
    5k docs on 1 core serializes the whole stage.  The repartition shuffle
    costs little (input is small by construction — that's why it had few
    splits); on real 100 TB inputs the condition is false and this is a
    no-op.  min_partitions defaults to the scheduler's defaultParallelism.

    ``by`` (r16 optimization, guide §2.4): callers whose downstream
    pipeline aggregates or joins on a key pass it here so the spread
    shuffle IS the key shuffle — ``repartition(n, key)`` satisfies the
    downstream ClusteredDistribution requirement, so the planner drops
    the second Exchange outright (verified: dedup_simhash 1.36 → 0.86 s
    at sf0.1, plan loses one Exchange).  A keyed repartition also skips
    the sortBeforeRepartition local sort that every keyless round-robin
    repartition pays (guide §2.5).  Key cardinality must comfortably
    exceed the partition count (true by construction for document/vector
    ids); results are identical either way — only row placement moves.

    The df.rdd partition-count probe physically plans the frame, and if
    the plan contains a broadcast join the broadcast (and everything under
    it) EXECUTES during the probe.  The contract is therefore ENFORCED,
    not conventional: the analyzed logical plan is checked first, and a
    non-scan-stage frame (join/aggregate/window/... anywhere in it) is
    returned unchanged without probing — such frames come out of a shuffle
    and are already cluster-wide, so widening them is a no-op anyway, and
    skipping the probe removes the silent-execution hazard entirely.
    """
    if not _is_scan_stage(df):
        return df
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        if by is not None:
            cols = [by] if isinstance(by, str) else list(by)
            return df.repartition(target, *cols)
        return df.repartition(target)
    return df


def bare_scan_files(df: DataFrame) -> list[str] | None:
    """Local parquet paths iff ``df`` is a BARE file scan — its analyzed
    logical plan is a single relation node (no Project/Filter/Join/...),
    so the files hold exactly the frame's rows and values.  Returns None
    otherwise.  Used by the r16 driver-metadata fast paths below; the
    plan inspection itself never triggers physical planning."""
    plan = df._jdf.queryExecution().analyzed().toString()
    lines = [ln for ln in plan.splitlines() if ln.strip()]
    if len(lines) != 1 or not lines[0].lstrip().startswith("Relation"):
        return None
    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001 — non-file relations
        return None
    out = []
    for f in files:
        if f.startswith("file:"):
            f = f[5:]
        elif "://" in f:  # non-local scheme: no driver-side footer access
            return None
        out.append(f)
    return out or None


def scan_row_count(df: DataFrame, max_files: int = 64) -> int:
    """Row count of a frame WITHOUT a Spark job when possible (r16
    optimization, guide §1.2: tier-gate ``df.count()`` calls each cost a
    blocking job that dominates small-input queries).  For a bare file
    scan the count is the sum of parquet footer row counts — exact, read
    driver-side in milliseconds.  Falls back to ``df.count()`` for
    non-scan frames; above ``max_files`` the scan is by construction
    far beyond every caller's small-tier threshold, so the footer walk
    is skipped and the (then cheap relative to the work that follows)
    distributed count runs instead."""
    files = bare_scan_files(df)
    if files is not None and len(files) <= max_files:
        import pyarrow.parquet as pq

        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    return df.count()


def gather_columns(df: DataFrame, cols: list[str]):
    """``df.select(*cols).toPandas()`` without a Spark job when the frame
    is a bare file scan: the parquet files are read driver-side with
    pyarrow (same bytes, same values — the scan has no expressions to
    apply).  The caller is responsible for having bounded the row count
    (every use rides behind a ``scan_row_count`` tier gate).  Column
    order follows ``cols``; row order is file order, which callers must
    not rely on (both paths build id→row indexes)."""
    files = bare_scan_files(df)
    if files is not None:
        import pyarrow.parquet as pq

        tables = [pq.read_table(f, columns=cols) for f in files]
        import pyarrow as pa

        return pa.concat_tables(tables).to_pandas()
    return df.select(*cols).toPandas()


def register_intermediate(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Attach persisted intermediates to ``result`` so long-lived sessions
    can reclaim their cached blocks once the plan has been materialized.

    Operators that persist() a scoring/projection pass (quality_budget_select,
    assign_shards, pagerank) return LAZY plans over those intermediates —
    unpersisting inside the operator would defeat the cache before the plan
    ever runs.  Ownership therefore transfers to the caller: after
    materializing the result, call :func:`release_intermediates` on it (a
    no-op for frames with nothing attached)."""
    existing = list(getattr(result, _INTERMEDIATES_ATTR, ()))
    setattr(result, _INTERMEDIATES_ATTR, existing + list(cached))
    return result


def release_intermediates(df: DataFrame) -> int:
    """Unpersist every intermediate attached by :func:`register_intermediate`
    (lineage is kept — a re-run recomputes instead of failing).  Returns the
    number of frames released; safe to call on any DataFrame."""
    cached = getattr(df, _INTERMEDIATES_ATTR, ())
    for c in cached:
        c.unpersist()
    n = len(cached)
    if n:
        setattr(df, _INTERMEDIATES_ATTR, [])
    return n


def round_half_up(col, scale: int):
    """Engine-portable half-up rounding: ``floor(x·10^s + 0.5) / 10^s``.

    Spark's ``round()`` goes through BigDecimal on the double's
    shortest-decimal representation; DuckDB's scales in floating point —
    on exact .5 boundaries they can disagree by one unit in the last
    rounded digit (first observed at sf0.1: gapfill_locf 67.49125 →
    67.4913 vs 67.4912).  This formula is pure IEEE multiply/add/floor,
    so identical inputs give bit-identical results in both engines; the
    SQL mirror is ``floor(x * 10^s + 0.5) / 10^s``.  Half-up is toward
    +inf for negatives (same in both engines — that's the point)."""
    from pyspark.sql import functions as F

    p = float(10**scale)
    return F.floor(col * F.lit(p) + F.lit(0.5)) / F.lit(p)


def two_phase_rank(
    df: DataFrame,
    *order_cols,
    rank_col: str = "_rk",
    partitions: int = 64,
) -> DataFrame:
    """Global ascending 1-based rank over ``order_col`` WITHOUT a
    single-partition window — the scale-safe replacement for
    ``row_number().over(Window.orderBy(...))`` (r10 verdict directive
    #2): range-repartition on the order expression(s) — strings or
    Columns, descending sort-order Columns allowed — materialize the
    partition assignment once (localCheckpoint — every consumer must
    see identical range boundaries), collect the ≤``partitions``-row
    per-partition counts to build exclusive offsets (the bounded
    zipWithIndex pattern), then rank = offset + row_number WITHIN each
    range partition.  Total order requires the order-key TUPLE to be
    DISTINCT in ``df`` (range partitions are disjoint and internally
    ordered, so the composed rank is then exactly the global one).

    Driver round-trip is ≤``partitions`` narrow rows; every window in
    the result is partitioned.

    The distinctness contract is ENFORCED, not conventional (r11 verdict
    directive #3): a duplicated order tuple would silently produce
    boundary-dependent nondeterministic ranks, so after checkpointing the
    range assignment the function probes for ties with one bounded job —
    ``rank() != row_number()`` over the per-partition window holds on some
    row iff the order tuple repeats (repartitionByRange sends equal keys
    to one partition, so the within-partition probe is complete; the probe
    accepts desc()/asc() sort-order Columns, which a groupBy-distinct
    check could not) — and raises ValueError naming the tuple."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    parted = (
        df.repartitionByRange(partitions, *order_cols)
        .withColumn("_tpr_p", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    _wp_probe = W.partitionBy("_tpr_p").orderBy(*order_cols)
    dup = (
        parted.select(
            (F.rank().over(_wp_probe) != F.row_number().over(_wp_probe)).alias("_t")
        )
        .filter(F.col("_t"))
        .limit(1)
        .count()
    )
    if dup:
        raise ValueError(
            "two_phase_rank: order-key tuple "
            f"{[str(c) for c in order_cols]} is not distinct in the input — "
            "range partitions + within-partition row_number compose to a "
            "total order only for distinct keys; add a unique tie-break "
            "column (e.g. the entity id) to the order tuple"
        )
    cnts = sorted(
        (r["_tpr_p"], r["c"])
        for r in parted.groupBy("_tpr_p").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    offs, acc = [], 0
    for p, c in cnts:
        offs.append((p, acc))
        acc += c
    if not offs:
        return parted.withColumn(rank_col, F.lit(0).cast("long")).drop("_tpr_p")
    offs_df = df.sparkSession.createDataFrame(offs, "_tpr_p int, _tpr_off long")
    wp = W.partitionBy("_tpr_p").orderBy(*order_cols)
    return (
        parted.join(F.broadcast(offs_df), "_tpr_p")
        .withColumn(rank_col, F.col("_tpr_off") + F.row_number().over(wp))
        .drop("_tpr_p", "_tpr_off")
    )
