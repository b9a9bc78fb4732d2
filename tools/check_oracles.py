"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same sf dir, then compares row count, column-name set, and an
order-insensitive exact value multiset (columns sorted by name, floats
compared bitwise). Usage:

    python tools/check_oracles.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

from processor_post_timeseries_spark.contract import TABLES, _REGISTRY  # noqa: E402
from processor_post_timeseries_spark.session import get_spark  # noqa: E402


def norm_cell(v):
    if v is None:
        return ("N",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, (int,)):
        return ("i", int(v))
    if isinstance(v, (bytes, bytearray)):
        return ("b", bytes(v))
    if isinstance(v, bool):
        return ("i", int(v))
    return ("s", str(v))


def canon(rows: list[dict]) -> list[tuple]:
    if not rows:
        return []
    cols = sorted(rows[0].keys())
    return sorted(tuple(norm_cell(r[c]) for c in cols) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""
    spark = get_spark("check-oracles", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")

    n_ok = n_fail = n_rowsonly = 0
    for name, (fn, osql) in _REGISTRY.items():
        if name_filter and name_filter not in name:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [r.asDict() for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            n_fail += 1
            continue
        if osql is None:
            print(f"ROWS-ONLY {name}: {len(srows)} rows")
            n_rowsonly += 1
            continue
        try:
            ddf = con.sql(osql)
            dcols = [d[0] for d in ddf.description]
            drows = [dict(zip(dcols, r)) for r in ddf.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            n_fail += 1
            continue
        scols, dcols_s = sorted(srows[0].keys()) if srows else [], sorted(dcols)
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}")
            n_fail += 1
            continue
        if srows and scols != dcols_s:
            print(f"FAIL {name}: columns spark={scols} duck={dcols_s}")
            n_fail += 1
            continue
        a, b = canon(srows), canon(drows)
        if a != b:
            bad = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: value mismatch; first diffs: {bad}")
            n_fail += 1
            continue
        print(f"OK   {name}: {len(srows)} rows")
        n_ok += 1

    print(f"\n{n_ok} ok, {n_rowsonly} rows-only, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
