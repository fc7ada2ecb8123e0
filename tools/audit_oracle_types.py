"""Audit every registered oracle's DuckDB result types for columns that
convert version-dependently to pandas — HUGEINT above all (sum() over
integer inputs promotes to INT128; pandas conversion behavior differs
across DuckDB versions, which is exactly the local-green/driver-red seam
seen in rounds 5 and 6 for oversample_balance / bpe_merges /
bpe_token_freqs).  Also flags UHUGEINT and DECIMAL surfaces where the
Spark side declares an integer/double column.

Usage: python tools/audit_oracle_types.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

FLAG = {"HUGEINT", "UHUGEINT", "UBIGINT"}
FLAG_PREFIX = ("DECIMAL",)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as entry

    oracles = entry.oracle_sql()
    print(f"duckdb {duckdb.__version__}; {len(oracles)} oracles; sf_dir={sf_dir}")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad = []
    errs = []
    for name, sql in sorted(oracles.items()):
        try:
            rel = con.sql(sql)
            flagged = [
                (c, str(t))
                for c, t in zip(rel.columns, rel.types)
                if str(t) in FLAG or str(t).startswith(FLAG_PREFIX)
            ]
        except Exception as e:  # noqa: BLE001
            errs.append((name, str(e).splitlines()[0][:160]))
            continue
        if flagged:
            bad.append((name, flagged))
            print(f"FLAG {name}: {flagged}")
    for name, e in errs:
        print(f"ERR  {name}: {e}")
    print(f"== {len(bad)} flagged, {len(errs)} errors ==")
    return 1 if bad or errs else 0


if __name__ == "__main__":
    raise SystemExit(main())
