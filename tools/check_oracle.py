"""Local replica of the driver's correctness gate — driver-parity strict.

Runs each queries() entry on Spark and its oracle_sql() on DuckDB at
the given sf, compares row count, sorted-column-name schema, an
order-insensitive EXACT value comparison (no float rounding: a value
difference the driver's hash would see fails here too), and flags
DuckDB result types Spark cannot emit (HUGEINT from bare integer
sums, DECIMAL where Spark produces bigint/double) — the r2 failure
mode that 6-sig-fig normalization let ship. Usage:

    python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import decimal
import math
import sys

import duckdb

sys.path.insert(0, ".")

from etl_gov_spark.queries.catalog import all_oracles, all_queries  # noqa: E402
from etl_gov_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# DuckDB result types with no Spark equivalent: a query whose oracle
# emits one of these will hash-mismatch at the driver even when the
# numeric values agree, because the engines format them differently.
_FORBIDDEN_DUCK_TYPES = ("HUGEINT", "UHUGEINT", "INT128")


def norm_cell(v):
    """Exact, type-tagged normalization. int and float deliberately do
    NOT collapse (int 83 vs float 83.0 is a driver-visible diff)."""
    if v is None:
        return "␀"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in idx) for r in rows]
    return sorted(out)


def duck_type_flags(cols, types, spark_schema):
    """Flag DuckDB output types Spark can't emit (or that mismatch the
    Spark side's family): HUGEINT always; DECIMAL only when the Spark
    column is not itself a decimal."""
    spark_types = {f.name: f.dataType.simpleString() for f in spark_schema.fields}
    flags = []
    for c, t in zip(cols, types):
        ts = str(t).upper()
        if any(bad in ts for bad in _FORBIDDEN_DUCK_TYPES):
            flags.append(f"{c}: duck={ts} (no Spark equivalent — CAST to BIGINT)")
        elif ts.startswith("DECIMAL") and not spark_types.get(c, "").startswith(
            "decimal"
        ):
            flags.append(
                f"{c}: duck={ts} vs spark={spark_types.get(c)} — cast one side"
            )
        elif ts == "DOUBLE" and spark_types.get(c, "") in ("int", "bigint", "smallint"):
            flags.append(f"{c}: duck=DOUBLE vs spark={spark_types.get(c)}")
    return flags


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = all_queries(), all_oracles()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            sschema = sdf.schema
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows-only ({len(srows)} rows) — no oracle")
            n_pass += 1
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            dtypes = rel.types
            drows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        ok = True
        tflags = duck_type_flags(dcols, dtypes, sschema)
        if tflags:
            print(f"FAIL {name}: oracle type flags: {tflags}")
            ok = False
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: schema spark={sorted(scols)} duck={sorted(dcols)}")
            ok = False
        elif len(srows) != len(drows):
            print(f"FAIL {name}: rows spark={len(srows)} duck={len(drows)}")
            ok = False
        else:
            a, b = norm_rows(scols, srows), norm_rows(dcols, drows)
            if a != b:
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
                ok = False
        if ok:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
