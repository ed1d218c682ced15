"""Interactive optimization probe: run with `python -i tools/opt_repl.py`.

Provides one persistent local[32] session at sf0.1 plus helpers:
    t('name')            best-of-3 noop-sink seconds for a registry query
    t1('name')           single noop-sink run
    plan('name')         .explain('formatted') text
    save_plan('name', 'before'|'after')  write plans/r16/<name>_<tag>.txt
    td('name')           DuckDB oracle seconds (best-of-3) at the same sf
All timings label jobs so the (disabled) UI / event logs stay readable.
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = "/root/repo"
sys.path.insert(0, REPO_ROOT)

from etl_gov_spark.queries.catalog import all_oracles, all_queries  # noqa: E402
from etl_gov_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("opt-probe")
spark.sparkContext.setLogLevel("ERROR")
QS = all_queries()
ORACLES = all_oracles()


def t1(name: str, sf_dir: str = SF_DIR) -> float:
    spark.sparkContext.setJobDescription(f"opt-probe: {name}")
    t0 = time.perf_counter()
    QS[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    spark.sparkContext.setJobDescription(None)
    return round(dt, 3)


def t(name: str, runs: int = 3, sf_dir: str = SF_DIR) -> float:
    best = min(t1(name, sf_dir) for _ in range(runs))
    print(f"{name}: {best:.3f}s (best of {runs})")
    return best


def plan(name: str, sf_dir: str = SF_DIR) -> str:
    return QS[name](spark, sf_dir)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


PLANS_ROUND = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r17")


def save_plan(name: str, tag: str, sf_dir: str = SF_DIR) -> str:
    out_dir = os.path.join(REPO_ROOT, "plans", PLANS_ROUND)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{name}_{tag}.txt")
    with open(path, "w") as f:
        f.write(plan(name, sf_dir))
    print(path)
    return path


_duck_con = None


def td(name: str, runs: int = 3, sf_dir: str = SF_DIR) -> float:
    global _duck_con
    import duckdb

    if _duck_con is None:
        _duck_con = duckdb.connect()
        for tbl in (
            "region nation customer supplier part orders lineitem events "
            "documents embeddings"
        ).split():
            p = os.path.join(sf_dir, f"{tbl}.parquet")
            src = p if os.path.isfile(p) else os.path.join(p, "*.parquet")
            _duck_con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{src}'")
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        _duck_con.sql(ORACLES[name]).fetchall()
        best = min(best, time.perf_counter() - t0)
    print(f"duck {name}: {best:.3f}s")
    return round(best, 3)


print(f"opt repl ready: sf_dir={SF_DIR}, {len(QS)} queries")
