"""Round-9 replication stress for the geospatial widening II.

Replicates sf0.1 inputs N× with offset ids (stress_scale_r8.py's
offset scheme) and times the four new geo plans:

- ``od`` / ``stay`` / ``straight`` — events replicated with offset
  event AND user ids: more users of the same per-user stream length,
  i.e. the realistic scale-out for a partitioned-window trajectory
  plan. Wall must grow ~linearly (shuffle-bound), never blow up on a
  global sort (there is none — asserted by tests/test_geo.py).
- ``gi`` — customers replicated with offset keys: occupied 1° cells
  saturate toward the fixed 43 200-cell domain, so the scatter join
  and the top-k must flatten once the domain fills.

Stress-only input: results are NOT oracle-checked here (the oracle
gate runs on the driver-generated tables). Prints one JSON line.

Usage: python tools/stress_geo_r9.py [base_sf_dir] [replicas] [target ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from etl_gov_spark.io.scratch import scratch_dir  # noqa: E402
from etl_gov_spark.session import get_spark  # noqa: E402

_OFF = 10_000_000


def _replicate(spark, base, table, id_cols, replicas, work):
    src = spark.read.parquet(os.path.join(base, f"{table}.parquet"))
    rep = spark.range(replicas).select(F.col("id").alias("rep"))
    big = src.crossJoin(rep)
    for c in id_cols:
        big = big.withColumn(c, F.col(c) + F.col("rep") * F.lit(_OFF))
    big.drop("rep").write.mode("overwrite").parquet(
        os.path.join(work, f"{table}.parquet")
    )


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    only = set(sys.argv[3:])
    spark = get_spark("geo-stress-r9")
    spark.sparkContext.setLogLevel("ERROR")

    from etl_gov_spark.operators.geo import (
        geo_gi_hotspots,
        geo_od_flow_matrix,
        geo_stay_points,
        geo_trip_straightness,
    )

    targets = {
        "od": (geo_od_flow_matrix, "events", ["event_id", "user_id"]),
        "stay": (geo_stay_points, "events", ["event_id", "user_id"]),
        "straight": (geo_trip_straightness, "events", ["event_id", "user_id"]),
        "gi": (geo_gi_hotspots, "customer", ["c_custkey"]),
    }
    out: dict = {"base": base, "replicas": replicas, "targets": {}}
    for name, (fn, table, id_cols) in targets.items():
        if only and name not in only:
            continue
        work = scratch_dir(f"r9geo-{name}")
        _replicate(spark, base, table, id_cols, replicas, work)
        n_rows = spark.read.parquet(
            os.path.join(work, f"{table}.parquet")
        ).count()
        t0 = time.perf_counter()
        fn(spark, work).write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 2)
        out["targets"][name] = {"table": table, "n_rows": n_rows, "wall_s": wall}
        print(f"# {name}: {n_rows} rows, {wall}s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
