"""Event-time windowed aggregation + applyInPandasWithState (q41 family).

The brief's two remaining Structured-Streaming tools: watermark + windowed
aggregation for late data, and a custom stateful operator.  Both are tested
by replaying the sf0.001 events parquet through a file-stream source and
comparing against batch-computed truth."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from spiderman_spark.streaming import stateful

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="stateful-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _split_events(spark, workdir, parts=3):
    """Write the events table as `parts` files so maxFilesPerTrigger=1
    yields a multi-micro-batch replay (files split by event_id range, NOT
    time-ordered within a batch — late rows relative to the watermark of
    earlier batches exist by construction)."""
    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    src = os.path.join(workdir, "src")
    for p in range(parts):
        # one append per slice → at least `parts` files, so
        # maxFilesPerTrigger=1 guarantees a multi-micro-batch replay
        events.where(F.col("event_id") % parts == p).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    return events, src


def test_windowed_counts_stream_equals_batch(spark, workdir):
    """The SAME windowed_event_counts expressions, run as an incremental
    streaming query over a file replay (watermark + append after watermark
    passes? — complete mode keeps every window), must equal the batch
    answer the q41 oracle checks."""
    events, src = _split_events(spark, workdir)
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["value_sum_x100"])
        for r in stateful.windowed_event_counts(events).collect()
    }

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stateful.windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["value_sum_x100"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert got == batch
    assert len(q.recentProgress) >= 3  # multi-micro-batch replay, not one gulp


def test_running_user_totals_state_spans_batches(spark, workdir):
    """applyInPandasWithState: per-user (events_seen, value_sum) state must
    carry ACROSS micro-batches — the final emission per user equals the
    whole-table batch aggregate, and users split over several files emit
    several times with increasing counts."""
    events, src = _split_events(spark, workdir)
    expect = {
        r["user_id"]: (r["n"], round(r["s"], 6))
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stateful.running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM running_totals").collect()
    # update mode appends one emission per (user, micro-batch-they-appear-in);
    # emissions are cumulative, so the max events_seen per user is the final
    # running total (row order across batches is not relied on)
    emissions: dict[int, list[tuple[int, float]]] = {}
    for r in rows:
        emissions.setdefault(r["user_id"], []).append(
            (r["events_seen"], round(r["value_sum"], 6))
        )
    final = {u: max(es) for u, es in emissions.items()}
    assert final == expect
    # state really spanned batches: some user must have emitted more than
    # once, and cumulative counts must be strictly increasing (no resets)
    multi = [es for es in emissions.values() if len(es) > 1]
    assert multi, "no user appeared in more than one micro-batch"
    for es in multi:
        ordered = sorted(es)
        assert all(a[0] < b[0] for a, b in zip(ordered, ordered[1:]))
