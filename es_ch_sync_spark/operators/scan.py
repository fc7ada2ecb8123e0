"""S1–S7 — the reference's Elasticsearch scan surface as declarative filters.

The reference builds one ES Query DSL request per batch
(/root/reference/internal/service/elastic/elastic.go:46-108): subject match,
time range [start, stop), sort time desc, size=batchSize, _source column
includes, and an exists-disjunction.  All of it is pushdown the reference
hand-codes; here every piece is a Column expression Catalyst pushes into the
Parquet scan (PushedFilters / ReadSchema) or plans as
TakeOrderedAndProject — zero custom code survives at the physical layer.
"""

from __future__ import annotations

from datetime import datetime
from functools import reduce
from operator import or_

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scan_records(
    df: DataFrame,
    subject: str | int | None = None,
    start: datetime | str | None = None,
    stop: datetime | str | None = None,
    fields: list[str] | None = None,
    subject_col: str = "subject",
    ts_col: str = "time",
    envelope_cols: tuple[str, ...] = (),
    require_any_field: bool = True,
    limit: int | None = None,
    newest_first: bool = True,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Filtered + projected + (optionally) top-k scan.

    Semantics are exactly the reference's request builder:
    - subject equality (elastic.go:53)                          → S2
    - start-INclusive / stop-EXclusive time range (elastic.go:47-48,54) → S3
    - sort time desc (elastic.go:59-66)                         → S4
    - size → top-k newest (elastic.go:58)                       → S5
    - _source includes → column pruning (elastic.go:67-77)      → S6
    - exists-disjunction over requested fields (elastic.go:74-78) → S7

    ``tiebreak_col`` makes top-k deterministic when timestamps tie (ES
    guarantees stable pagination via its internal doc order; we need an
    explicit total order).  At scale Spark plans sort+limit as
    TakeOrderedAndProject: per-partition top-k then a single k-row merge on
    the driver — no global sort, no full shuffle.
    """
    out = df
    if subject is not None:
        out = out.filter(F.col(subject_col) == F.lit(subject))
    if start is not None:
        out = out.filter(F.col(ts_col) >= F.lit(start))
    if stop is not None:
        out = out.filter(F.col(ts_col) < F.lit(stop))
    if fields:
        if require_any_field:
            out = out.filter(reduce(or_, [F.col(f).isNotNull() for f in fields]))
        keep = [c for c in (*envelope_cols, subject_col, ts_col) if c in df.columns]
        # preserve order, dedupe
        cols: dict[str, None] = {}
        for c in (*keep, *fields):
            cols.setdefault(c, None)
        out = out.select(*cols)
    if limit is not None:
        order = [F.col(ts_col).desc() if newest_first else F.col(ts_col).asc()]
        if tiebreak_col:
            order.append(F.col(tiebreak_col).desc() if newest_first else F.col(tiebreak_col).asc())
        out = out.orderBy(*order).limit(limit)
    return out
