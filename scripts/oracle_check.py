#!/usr/bin/env python
"""Dev harness: run every queries() entry against its DuckDB oracle at a
given sf and report count/schema/value agreement — a local approximation
of the driver's CORRECTNESS check. Usage:

    python scripts/oracle_check.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


# Canonical type families. The driver's CORRECTNESS hash is typed, so a
# DuckDB HUGEINT (sum of BIGINT widens to int128) vs Spark BIGINT mismatch
# is a real failure even when the printed values agree — round 1's q18
# escaped because this script compared normalized strings only.
_SPARK_TY = {
    "bigint": "i64", "int": "i32", "smallint": "i16", "tinyint": "i8",
    "double": "f64", "float": "f32", "string": "str", "boolean": "bool",
    "date": "date", "timestamp": "ts", "binary": "bin",
}
_DUCK_TY = {
    "BIGINT": "i64", "INTEGER": "i32", "SMALLINT": "i16", "TINYINT": "i8",
    "HUGEINT": "i128", "UBIGINT": "u64", "DOUBLE": "f64", "FLOAT": "f32",
    "VARCHAR": "str", "BOOLEAN": "bool", "DATE": "date", "BLOB": "bin",
    "TIMESTAMP": "ts", "TIMESTAMP WITH TIME ZONE": "ts",
}


def canon_spark(dtype: str) -> str:
    return _SPARK_TY.get(dtype, dtype)


def canon_duck(dtype: str) -> str:
    return _DUCK_TY.get(dtype.upper(), dtype.upper())


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # fixture/centroid oracles (q30/q35) must be built for THIS scale
    os.environ["XHS_ORACLE_SF_DIR"] = sf_dir

    import __spark_entry__ as E
    from xhs_ocr_spark.session import get_spark

    spark = get_spark("oracle-check", cores=int(os.environ.get("CORES", "16")))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, os_ = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sorted(sdf.columns)
            stypes = dict(sdf.dtypes)
            srows = sorted(
                tuple(norm_cell(r[c]) for c in scols) for r in sdf.collect()
            )
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"{name:28s} SPARK ERROR: {str(e)[:200]}")
            continue
        if name not in os_:
            print(f"{name:28s} rows-only: {len(srows)} rows, cols={scols}")
            continue
        try:
            otypes = {
                r[0]: r[1]
                for r in con.execute(f"DESCRIBE ({os_[name]})").fetchall()
            }
            cur = con.execute(os_[name])
            ocols_raw = [d[0] for d in cur.description]
            orows_raw = cur.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"{name:28s} DUCKDB ERROR: {str(e)[:200]}")
            continue
        order = sorted(range(len(ocols_raw)), key=lambda i: ocols_raw[i])
        ocols = sorted(ocols_raw)
        orows = sorted(tuple(norm_cell(r[i]) for i in order) for r in orows_raw)
        problems = []
        if scols != ocols:
            problems.append(f"cols {scols} vs {ocols}")
        else:
            ty_diff = [
                f"{c}: spark={stypes[c]} duckdb={otypes.get(c)}"
                for c in scols
                if canon_spark(stypes[c]) != canon_duck(otypes.get(c, "?"))
            ]
            if ty_diff:
                problems.append("types " + "; ".join(ty_diff))
        if len(srows) != len(orows):
            problems.append(f"count {len(srows)} vs {len(orows)}")
        elif srows != orows:
            diff = [i for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
            problems.append(
                f"values differ at {len(diff)}/{len(srows)} rows; first: "
                f"{srows[diff[0]]} vs {orows[diff[0]]}"
            )
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"{name:28s} MISMATCH: {'; '.join(problems)[:300]}")
        else:
            print(f"{name:28s} OK ({len(srows)} rows)")

    print(f"\n{len(failures)} failures")
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
