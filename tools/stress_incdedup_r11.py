"""Round-11 incremental-dedup ladder: fingerprint store at N×.

Replicates documents N× with offset doc_ids (same scheme as
stress_scale_r8.py) and times ``dedup_incremental_minhash``
end-to-end (store write + epoch-1 ledger + footer probe + epoch-2
ledger + append) against the one-shot ``dedup_minhash_lsh`` on the
same corpus. The claim under test: the incremental path's extra
cost over one-shot is the store IO (linear, embarrassingly
parallel), not a new join regime — and the probe stays
bucket-local at any N.

Stress-only input: results are NOT oracle-checked here (the oracle
gate runs on the driver-generated tables — incremental ≡ full is
asserted there and in tests). Prints one JSON line.

Usage: python tools/stress_incdedup_r11.py [base_sf_dir] [replicas]
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
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("incdedup-stress-r11")
    spark.sparkContext.setLogLevel("ERROR")

    from etl_gov_spark.operators.dedup import (
        dedup_incremental_minhash,
        dedup_minhash_lsh,
    )

    work = scratch_dir("r11-incdedup")
    src = spark.read.parquet(os.path.join(base, "documents.parquet"))
    rep = spark.range(replicas).select(F.col("id").alias("rep"))
    big = (
        src.crossJoin(rep)
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * F.lit(_OFF))
        .drop("rep")
    )
    big.write.mode("overwrite").parquet(os.path.join(work, "documents.parquet"))
    n_rows = spark.read.parquet(os.path.join(work, "documents.parquet")).count()

    out: dict = {"base": base, "replicas": replicas, "n_docs": n_rows}
    for name, fn in (
        ("incremental", dedup_incremental_minhash),
        ("one_shot", dedup_minhash_lsh),
    ):
        t0 = time.perf_counter()
        fn(spark, work).write.format("noop").mode("overwrite").save()
        out[f"{name}_s"] = round(time.perf_counter() - t0, 2)
        print(f"# {name}: {out[f'{name}_s']}s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
