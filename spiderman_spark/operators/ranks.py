"""Two-phase global rank — dense, total-ordered row numbering without a
single-reducer window.

``row_number() OVER (ORDER BY k)`` forces every row through ONE task
(`Exchange SinglePartition`); at the north rule's 10^6–10^8-rows-per-round
scale that task is the job.  The classic fix (TeraSort-style):

  phase 1: ``repartitionByRange(P, k)`` — rows land in P partitions whose key
           ranges are ordered by partition id; tag ``spark_partition_id()``.
  phase 2: ONE small job collects per-partition row counts (P numbers) →
           cumulative offsets, embedded back as a literal array indexed by
           partition id.  rank = offset[pid] + row_number() within pid.

No single-partition exchange anywhere: the within-partition window is keyed
by ``_pid`` and the offsets travel as a P-element literal, not a join.  The
offsets job doubles as the round's row count, replacing a separate
``count()`` action (engine barrier reduction).

Correctness: repartitionByRange assigns ascending key ranges to ascending
partition ids and keeps equal keys together, so offset[pid] is exactly the
number of rows ordered strictly before partition pid; within a partition
row_number supplies the rest.  Caller must persist the prepared frame before
collecting offsets so the partition assignment is frozen for downstream use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_prepare(df: DataFrame, order_cols: list[str], npartitions: int) -> DataFrame:
    """Range-partition by the order key and tag partition ids.  Persist the
    result before calling collect_offsets."""
    part = df.repartitionByRange(npartitions, *[F.col(c) for c in order_cols])
    return part.withColumn("_pid", F.spark_partition_id())


def collect_offsets(part: DataFrame) -> tuple[list[int], int]:
    """One small action: per-partition counts → (cumulative offsets, total).
    Empty partitions get the running offset; result length = max pid + 1."""
    rows = part.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    cnt = {int(r["_pid"]): int(r["n"]) for r in rows}
    nparts = (max(cnt) + 1) if cnt else 0
    offsets, acc = [], 0
    for pid in range(nparts):
        offsets.append(acc)
        acc += cnt.get(pid, 0)
    return offsets, acc


def with_rank(
    part: DataFrame,
    order_cols: list[str],
    out_col: str,
    offsets: list[int],
    base: int = 0,
) -> DataFrame:
    """rank = base + offsets[_pid] + row_number() within _pid (1-based)."""
    arr = F.array(*[F.lit(int(o)) for o in (offsets or [0])])
    off = F.element_at(arr, (F.col("_pid") + 1).cast("int")).cast("long")
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return part.withColumn(
        out_col, F.lit(base).cast("long") + off + F.row_number().over(w)
    )
