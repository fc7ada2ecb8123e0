"""Elasticsearch Query-DSL → Spark predicate translation.

The reference talks to ES by CONSTRUCTING a query-DSL document — a bool
filter of match/range clauses, a should-list of exists clauses with
minimum_should_match=1, a _source.includes projection, a sort, and a size
(`internal/service/elastic/elastic.go:46-80`, GetRecordsSince).  This
module is the inverse boundary for the Spark engine: given such a DSL
document (e.g. lifted from a reference deployment's config or logs),
translate it into a Column predicate + projection + sort + limit over any
DataFrame with the status schema, so the WHOLE request the reference
would send to ES becomes one declarative Spark plan — and every clause
lands in Catalyst as an ordinary filter/projection, which means pushdown
into the es_status DataSource (or parquet row-group skipping) happens for
free.

Supported subset — exactly the constructs the reference emits, plus the
adjacent ones any of its configs could produce:

- ``bool`` with ``filter`` / ``must`` (AND), ``must_not`` (AND of
  negations), ``should`` with ``minimum_should_match`` ∈ {absent, 0, 1}
  (OR; absent/0 with a filter present = optional, i.e. ignored for
  matching, which is ES semantics when filter/must exists);
- ``match`` / ``term`` (equality — status fields are keyword-typed, so
  analyzer semantics reduce to equality, same reduction the reference
  relies on), ``terms`` (IN-list);
- ``range`` with gte/gt/lte/lt; values may be epoch-millis STRINGS for
  timestamp columns — the reference sends UnixMilli as a string
  (elastic.go:48-49) — or ISO strings, or native numbers;
- ``exists`` (IS NOT NULL);
- ``match_all``.

Unsupported constructs raise loudly (never silently match-all).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class EsDslError(ValueError):
    """An ES-DSL construct this translator does not support."""


def _coerce(dt: T.DataType, v):
    """DSL literal → a Column literal in the field's type.  Timestamp
    fields accept epoch-millis (int, or the reference's stringified
    UnixMilli) and ISO-8601 strings."""
    if isinstance(dt, T.TimestampType) or isinstance(dt, T.TimestampNTZType):
        if isinstance(v, (int, float)) or (
            isinstance(v, str) and v.lstrip("-").isdigit()
        ):
            return F.timestamp_millis(F.lit(int(v)).cast("long"))
        return F.to_timestamp(F.lit(v))
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return F.lit(int(v))
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return F.lit(float(v))
    return F.lit(v)


def _field_type(schema: T.StructType, field: str) -> T.DataType:
    for f in schema.fields:
        if f.name == field:
            return f.dataType
    raise EsDslError(f"ES-DSL references unknown field {field!r}")


def _clause_to_column(clause: dict, schema: T.StructType) -> Column:
    if len(clause) != 1:
        raise EsDslError(f"expected single-key query clause, got {clause}")
    kind, body = next(iter(clause.items()))
    if kind == "match_all":
        return F.lit(True)
    if kind in ("match", "term"):
        (field, spec), = body.items()
        v = spec.get("query" if kind == "match" else "value") if isinstance(
            spec, dict
        ) else spec
        return F.col(field) == _coerce(_field_type(schema, field), v)
    if kind == "terms":
        (field, vals), = body.items()
        dt = _field_type(schema, field)
        lits = [_coerce(dt, v) for v in vals]
        return F.col(field).isin(*lits) if lits else F.lit(False)
    if kind == "range":
        (field, spec), = body.items()
        dt = _field_type(schema, field)
        conds = []
        ops = {
            "gte": lambda c, v: c >= v,
            "gt": lambda c, v: c > v,
            "lte": lambda c, v: c <= v,
            "lt": lambda c, v: c < v,
        }
        for op, v in spec.items():
            if op not in ops:
                raise EsDslError(f"unsupported range op {op!r}")
            conds.append(ops[op](F.col(field), _coerce(dt, v)))
        if not conds:
            raise EsDslError(f"empty range clause on {field!r}")
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return out
    if kind == "exists":
        field = body["field"]
        _field_type(schema, field)  # unknown field → loud EsDslError, like every other clause
        return F.col(field).isNotNull()
    if kind == "bool":
        return _bool_to_column(body, schema)
    raise EsDslError(f"unsupported ES-DSL clause {kind!r}")


def _bool_to_column(body: dict, schema: T.StructType) -> Column:
    unknown = set(body) - {
        "filter", "must", "must_not", "should", "minimum_should_match"
    }
    if unknown:
        raise EsDslError(f"unsupported bool keys {sorted(unknown)}")
    conds: list[Column] = []
    for key in ("filter", "must"):
        for c in body.get(key, []):
            conds.append(_clause_to_column(c, schema))
    for c in body.get("must_not", []):
        conds.append(~_clause_to_column(c, schema))
    should = body.get("should", [])
    # ES defaults minimum_should_match to 1 whenever the bool has NO
    # must/filter clause — must_not does NOT count (a bool with only
    # must_not + should still requires one should to match).
    has_positive = bool(body.get("filter") or body.get("must"))
    msm = body.get("minimum_should_match", 0 if (has_positive or not should) else 1)
    if should and msm:
        if int(msm) != 1:
            raise EsDslError("only minimum_should_match 0/1 is supported")
        ors = _clause_to_column(should[0], schema)
        for c in should[1:]:
            ors = ors | _clause_to_column(c, schema)
        conds.append(ors)
    if not conds:
        return F.lit(True)
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def apply_es_dsl(df: DataFrame, request: dict) -> DataFrame:
    """Apply a full ES search REQUEST (query + _source + sort + size) to a
    DataFrame — the declarative Spark equivalent of the reference POSTing
    the same document to ``/index/_search``.

    Clause order mirrors ES: predicate, then projection
    (``_source.includes`` restricted to columns the frame actually has —
    ES silently drops unknown includes), then sort (missing last, like ES
    on absent fields), then size.  A sort+size pair lowers to Spark's
    TakeOrderedAndProject; note ES pagination would use search_after —
    the engine's analog is the partitioned full scan (P1, job/sync.py),
    so ``size`` here is the top-k shape, not a page."""
    schema = df.schema
    q = request.get("query")
    if q is not None:
        df = df.filter(_clause_to_column(q, schema))
    src = request.get("_source")
    if src:
        includes = src.get("includes") if isinstance(src, dict) else list(src)
        if includes:
            have = [c for c in includes if c in df.columns]
            df = df.select(*have)
    sort_cols: list[Column] = []
    for s in request.get("sort", []):
        if not isinstance(s, dict) or len(s) != 1:
            raise EsDslError(f"unsupported sort spec {s!r}")
        (field, spec), = s.items()
        order = spec.get("order", "asc") if isinstance(spec, dict) else spec
        col = F.col(field)
        sort_cols.append(
            col.desc_nulls_last() if order == "desc" else col.asc_nulls_last()
        )
    if sort_cols:
        df = df.orderBy(*sort_cols)
    size = request.get("size")
    if size is not None:
        df = df.limit(int(size))
    return df
