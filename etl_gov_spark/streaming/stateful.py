"""Custom stateful streaming operator: applyInPandasWithState.

The capability the built-in windowed aggregations can't express:
gap-based sessionization as a CONTINUOUS query, with per-user
session state carried across micro-batches. This is the Spark
analogue of the reference's long-running sensor→process loops
(``example_sensors.py``, ``example_time_delta_sensor_async.py``)
for stateful per-entity logic.

Semantics: update-mode emission — every batch emits the sessions it
closed plus the still-open session for each touched user (its row
is re-emitted, corrected, by later batches if the session grows).
Downstream sinks keep the latest row per (user_id, session_seq),
the standard update-mode contract. Over a finite source run to
completion (availableNow) the final emission equals the batch
``q_sessionize`` result exactly — which is what the oracle checks.

Scale notes
- State is one fixed-width tuple per user (5 numeric fields), not
  per event: memory is O(active users), evictable via event-time
  timeout in a production continuous run.
- Events arrive Arrow-batched per user group; session folding is
  pandas-vectorized (cumsum over gap flags), no per-row Python in
  the hot loop.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from etl_gov_spark.streaming.events_stream import _events_stream, _run_to_memory

SESSION_GAP_US = 30 * 60 * 1_000_000

OUT_SCHEMA = (
    "user_id long, session_seq int, session_start timestamp, "
    "session_end timestamp, n_events long, session_value double"
)
STATE_SCHEMA = "last_us long, seq int, start_us long, n long, vsum double"


def _sessionize_group(key, pdf_iter, state: GroupState):
    """Fold one user's micro-batch into sessions, carrying state."""
    (user_id,) = key
    if state.exists:
        last_us, seq, start_us, carry_n, carry_v = state.get
    else:
        last_us, seq, start_us, carry_n, carry_v = None, 0, None, 0, 0.0

    parts = [p for p in pdf_iter if len(p)]
    if not parts:  # timeout call with no data: emit nothing
        return
    df = (
        pd.concat(parts)
        .sort_values(["_us", "event_id"], kind="mergesort")
        .reset_index(drop=True)
    )
    us = df["_us"]
    prev = us.shift(1)
    if last_us is not None:
        prev.iloc[0] = last_us
    new_flag = prev.isna() | ((us - prev) > SESSION_GAP_US)
    df["_seq"] = seq + new_flag.cumsum().astype("int64")

    g = (
        df.groupby("_seq", sort=True)
        .agg(
            start_us=("_us", "min"),
            end_us=("_us", "max"),
            n=("_us", "size"),
            vsum=("value", "sum"),
        )
        .reset_index()
    )
    continues = last_us is not None and not bool(new_flag.iloc[0])
    if continues:
        # first group extends the open session from state
        g.loc[0, "_seq"] = seq
        g.loc[0, "start_us"] = start_us
        g.loc[0, "n"] += carry_n
        g.loc[0, "vsum"] += carry_v

    last = g.iloc[-1]
    state.update(
        (
            int(us.iloc[-1]),
            int(last["_seq"]),
            int(last["start_us"]),
            int(last["n"]),
            float(last["vsum"]),
        )
    )
    yield pd.DataFrame(
        {
            "user_id": user_id,
            "session_seq": g["_seq"].astype("int32"),
            "session_start": pd.to_datetime(g["start_us"], unit="us"),
            "session_end": pd.to_datetime(g["end_us"], unit="us"),
            "n_events": g["n"].astype("int64"),
            "session_value": g["vsum"].round(4),
        }
    )


def sessionize_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming plan: per-user stateful sessionization."""
    ev = _events_stream(spark, sf_dir).select(
        "user_id", "event_id", "value", F.unix_micros("ts").alias("_us")
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_sessionize_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run to completion; dedupe to the latest update per session
    (update-mode sink contract) and return the final sessions."""
    _run_to_memory(
        sessionize_stream(spark, sf_dir), "stream_sessionize_sink", "update"
    )
    rows = spark.table("stream_sessionize_sink")
    # latest update per (user, session): the one with the most events
    return (
        rows.groupBy("user_id", "session_seq")
        .agg(
            F.max(
                F.struct("n_events", "session_start", "session_end", "session_value")
            ).alias("s")
        )
        .select(
            "user_id",
            "session_seq",
            F.col("s.session_start").alias("session_start"),
            F.col("s.session_end").alias("session_end"),
            F.col("s.n_events").alias("n_events"),
            F.round(F.col("s.session_value"), 4).alias("session_value"),
        )
    )


# exact twin of the batch sessionization oracle
from etl_gov_spark.operators.timeseries import Q_SESSIONIZE_SQL  # noqa: E402

QUERIES: dict[str, tuple] = {
    "stream_sessionize_stateful": (stream_sessionize_stateful, Q_SESSIONIZE_SQL),
}


# ---- transformWithState (Spark 4 arbitrary-state API) ------------- #

try:  # Spark >= 4.0 AND protobuf present (the TWS control channel
    # is protobuf-based; this container ships Spark without it, so
    # the operator is gated — the processor below is the documented
    # pattern and registers automatically where the dep exists)
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401
    from pyspark.sql.streaming import (  # noqa: F401
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RunningTotals(StatefulProcessor):
        """Per-user running event count + value sum carried in a
        ValueState cell across micro-batches — the minimal
        transformWithState processor (the successor API to
        applyInPandasWithState: typed state cells, timers, TTL)."""

        def init(self, handle: "StatefulProcessorHandle") -> None:
            self._totals = handle.getValueState(
                "totals", "n BIGINT, v DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            cur = self._totals.get()
            n, v = (cur[0], cur[1]) if cur is not None else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                v += float(pdf["value"].sum())
            self._totals.update((n, v))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [v]}
            )

        def close(self) -> None:
            pass

    HAS_TWS = True
except ImportError:  # pragma: no cover - older Spark
    HAS_TWS = False


def stream_running_totals_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running totals via transformWithStateInPandas (needs
    the RocksDB state store). Update-mode emissions; the final
    per-user row equals the batch aggregate — asserted by the
    oracle. Runs availableNow like the other streaming entries."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    ev = _events_stream(spark, sf_dir).select("user_id", "value")
    out = ev.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_RunningTotals(),
        outputStructType="user_id BIGINT, n_events BIGINT, total_value DOUBLE",
        outputMode="Update",
        timeMode="None",
    )
    _run_to_memory(out, "stream_tws_sink", "update")
    rows = spark.table("stream_tws_sink")
    return (
        rows.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "total_value")).alias("s"))
        .select(
            "user_id",
            F.col("s.n_events").alias("n_events"),
            F.round(F.col("s.total_value"), 4).alias("total_value"),
        )
    )


STREAM_TWS_SQL = """
SELECT user_id, count(*) AS n_events, round(sum(value), 4) AS total_value
FROM events
GROUP BY user_id
"""

if HAS_TWS:
    QUERIES["stream_running_totals_tws"] = (
        stream_running_totals_tws,
        STREAM_TWS_SQL,
    )
