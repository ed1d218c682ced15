"""Round-13 streaming dedup-gate replication stress.

Replicates sf0.1 documents N× with offset doc_ids and times
``stream_dedup_gate`` end to end (micro-batch band-probe of the
persisted fingerprint store via parquet footer stats, pair ledger,
store append). Records the per-epoch probe stats
(STREAM_DEDUP_PROBE_STATS): touched store files vs total store
files per micro-batch. Expected: wall near-linear in corpus size,
and the probe TOUCH FRACTION bounded — a batch opens only files
whose band_key range intersects its keys, regardless of how much
history the store holds. Stress-only input; prints one JSON line.

Usage: python tools/stress_streamgate_r13.py [base_sf_dir] [replicas ...]
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
    spark = get_spark("streamgate-stress")
    spark.sparkContext.setLogLevel("ERROR")

    from etl_gov_spark.streaming.events_stream import (
        STREAM_DEDUP_PROBE_STATS,
        stream_dedup_gate,
    )

    src = spark.read.parquet(os.path.join(base, "documents.parquet"))
    out: dict = {"base": base, "ladder": {}}
    for n in replicas:
        work = scratch_dir(f"streamgate-{n}x")
        rep = spark.range(n).select(F.col("id").alias("rep"))
        big = src.crossJoin(rep).withColumn(
            "doc_id", F.col("doc_id") + F.col("rep") * F.lit(_OFF)
        )
        big.drop("rep").write.mode("overwrite").parquet(
            os.path.join(work, "documents.parquet")
        )
        n_rows = spark.read.parquet(
            os.path.join(work, "documents.parquet")
        ).count()
        t0 = time.perf_counter()
        ledger = stream_dedup_gate(spark, work)
        n_pairs = ledger.count()
        wall = round(time.perf_counter() - t0, 2)
        probes = {
            str(epoch): {"touched": t, "store_files": s}
            for epoch, (t, s) in sorted(STREAM_DEDUP_PROBE_STATS.items())
        }
        out["ladder"][f"{n}x"] = {
            "n_docs": n_rows,
            "n_ledger_pairs": n_pairs,
            "wall_s": wall,
            "probe_stats": probes,
        }
        print(
            f"# {n}x: {n_rows} docs, {n_pairs} pairs, {wall}s, probes={probes}",
            file=sys.stderr,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
