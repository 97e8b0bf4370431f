"""Event-time windowed aggregation + custom stateful streaming operators.

The reference has no event-time semantics (its only stream is the Kafka
price monitor, `/root/reference/kafka_mon.py:17-29`), but a 100 TB
training-data pipeline needs the two Structured-Streaming tools the brief
names: watermark + windowed aggregation for late data, and
``applyInPandasWithState`` for custom stateful operators.  Both are built
over the `events` table shape (event_id, ts, user_id, event_type, value).

Design rules mirrored from the rest of the engine:

- The WINDOWED path is one Column-only expression tree shared by batch and
  streaming frames: on a batch frame the watermark is a no-op and the result
  is exactly the DuckDB-oracle-able q41 answer; on a streaming frame the
  same function yields the late-data-tolerant incremental query (equality of
  the two is pytest-asserted via a file-stream replay of the same parquet).
- The STATEFUL path keeps per-group state as a tiny numeric tuple (count,
  value sum) — state size is O(groups), independent of event volume, which
  is what makes it safe at 10^10 events; the per-batch work is Arrow-batched
  pandas, never row-at-a-time Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

WINDOW_SECONDS = 600  # 10-minute tumbling windows, epoch-aligned


def windowed_event_counts(
    events: DataFrame,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling event-time window counts per event_type:
    (window_start:string, event_type, n_events, value_sum_x100).

    Streaming frames get ``withWatermark`` (bounded state + late-data drop);
    batch frames run the identical expressions (watermark is meaningless on
    batch, Spark ignores it).  The window start is formatted as a string so
    the driver's cross-engine value hash is timezone-representation-proof."""
    src = events
    if events.isStreaming:
        # watermarks require TIMESTAMP (ltz); parquet event times are NTZ.
        # Under the engine's fixed UTC session the cast preserves wall time,
        # so batch (NTZ) and streaming (cast) windows are identical —
        # asserted by the stream-equals-batch test.
        src = src.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
            "ts", watermark
        )
    win = F.window("ts", f"{WINDOW_SECONDS} seconds")
    return (
        src.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value") * 100).cast("long").alias("value_sum_x100"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "value_sum_x100",
        )
    )


RUNNING_TOTALS_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("events_seen", LongType()),
        StructField("value_sum", DoubleType()),
    ]
)

RUNNING_TOTALS_STATE = StructType(
    [
        StructField("events_seen", LongType()),
        StructField("value_sum", DoubleType()),
    ]
)


def _running_totals_fn(key, pdf_iter, state):
    """applyInPandasWithState body: fold this micro-batch's rows for one
    user into (events_seen, value_sum) state; emit the updated running
    totals.  State survives across micro-batches — the test feeds the same
    user in two separate files/batches and asserts the second emission
    includes the first batch's counts."""
    import pandas as pd

    if state.exists:
        seen, vsum = state.get
    else:
        seen, vsum = 0, 0.0
    for pdf in pdf_iter:
        seen += len(pdf)
        vsum += float(pdf["value"].sum())
    state.update((seen, vsum))
    yield pd.DataFrame(
        {"user_id": [key[0]], "events_seen": [seen], "value_sum": [vsum]}
    )


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Custom stateful operator over a STREAMING events frame: per-user
    running (events_seen, value_sum) emitted every micro-batch the user
    appears in.  Update output mode; state is a 2-number tuple per user."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _running_totals_fn,
            outputStructType=RUNNING_TOTALS_OUTPUT,
            stateStructType=RUNNING_TOTALS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
