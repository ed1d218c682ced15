"""Round-13 attribution replication stress.

Replicates sf0.1 events N x with offset user_ids/event_ids (each
replica keeps its journey structure, so transition/coalition counts
scale exactly N x while the bounded model state stays <= 6x6 /
<= 32 cells). Both attribution models should be scan-bound: one
fact-grain windowed prefix pass + bounded aggregates.

Stress-only input; prints one JSON line.

Usage: python tools/stress_attrib_r13.py [base_sf_dir] [replicas ...]
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


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = [int(x) for x in sys.argv[2:]] or [1, 10, 30]
    spark = get_spark("attrib-stress")
    spark.sparkContext.setLogLevel("ERROR")

    from etl_gov_spark.operators.mlstats import (
        q_markov_attribution,
        q_shapley_attribution,
    )

    src = spark.read.parquet(os.path.join(base, "events.parquet"))
    out: dict = {"base": base, "ladder": {}}
    for n in replicas:
        work = scratch_dir(f"attrib-{n}x")
        rep = spark.range(n).select(F.col("id").alias("rep"))
        big = (
            src.crossJoin(rep)
            .withColumn("user_id", F.col("user_id") + F.col("rep") * F.lit(_OFF))
            .withColumn("event_id", F.col("event_id") + F.col("rep") * F.lit(_OFF))
        )
        big.drop("rep").write.mode("overwrite").parquet(
            os.path.join(work, "events.parquet")
        )
        n_rows = spark.read.parquet(os.path.join(work, "events.parquet")).count()
        rung: dict = {"n_events": n_rows}
        for name, fn in (
            ("markov", q_markov_attribution),
            ("shapley", q_shapley_attribution),
        ):
            t0 = time.perf_counter()
            fn(spark, work).collect()
            rung[f"{name}_s"] = round(time.perf_counter() - t0, 2)
        out["ladder"][f"{n}x"] = rung
        print(f"# {n}x: {rung}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
