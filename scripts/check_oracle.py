#!/usr/bin/env python
"""Self-check mimicking the driver's correctness gate.

Runs every registry query in Spark and its DuckDB oracle on the same
parquet, compares row count, column names, and an order-insensitive
value hash (columns sorted by name, rows sorted, values canonicalized).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

from pdf_extractor_spark.analytics import QUERIES  # noqa: E402
from pdf_extractor_spark.session import get_spark  # noqa: E402
from pdf_extractor_spark.analytics.base import TABLES  # noqa: E402


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        # full precision with 6-decimal rounding: absorbs fp noise but
        # still exposes large-magnitude divergences ('%.6g' would hash
        # 1.8e10 +- thousands identically)
        return repr(round(v, 6))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    unknown = only - set(QUERIES)
    if unknown:
        print(f"unknown query name(s): {sorted(unknown)}")
        return 2
    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    failures = []
    for name, spec in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if spec.sql is None:
            print(
                f"rows-only  {name}: {len(srows)} rows, cols={scols}"
                f" ({time.time() - t0:.1f}s)"
            )
            if not srows:
                print(f"  WARNING: zero rows for {name}")
            continue
        try:
            rel = con.sql(spec.sql)
            ocols = [c for c in rel.columns]
            otypes = [str(t) for t in rel.types]
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        problems = []
        # Non-canonical oracle output types (HUGEINT from sum(int),
        # DECIMAL from arithmetic) stringify differently under some hash
        # canons even when values are logically identical — require an
        # explicit CAST in the oracle SQL.
        bad_types = [
            f"{c}:{t}" for c, t in zip(ocols, otypes)
            if t.startswith(("HUGEINT", "UHUGEINT", "DECIMAL", "UBIGINT"))
        ]
        if bad_types:
            problems.append(f"non-canonical oracle types {bad_types}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={scols} duckdb={ocols}")
        if not problems:
            sh, oh = value_hash(scols, srows), value_hash(ocols, orows)
            if sh != oh:
                problems.append("value-hash mismatch")
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                sset = {"|".join(canon(r[i]) for i in order_s) for r in srows}
                oset = {"|".join(canon(r[i]) for i in order_o) for r in orows}
                for d in sorted(sset - oset)[:3]:
                    print(f"    spark-only: {d}")
                for d in sorted(oset - sset)[:3]:
                    print(f"    duck-only : {d}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)} ({time.time() - t0:.1f}s)")
        else:
            print(f"OK    {name}: {len(srows)} rows ({time.time() - t0:.1f}s)")
    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        return 1
    print("\nall queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
