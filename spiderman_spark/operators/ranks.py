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


def hist_offsets(
    df: DataFrame, np_col: str, seq_col: str, shift: int
) -> tuple[list[tuple[int, int, int]], int, int]:
    """ONE action replacing range_prepare's sampling job + collect_offsets:
    exact per-(np, seq>>shift) group counts (map-side combined, tiny shuffle
    of <= distinct-bucket keys), cumulated driver-side in (np, bucket) order.

    Returns ([(np, bucket, offset), ...] sorted, total rows, max group size).
    Works because bucket = seq >> shift is MONOTONIC in seq, so the
    lexicographic (np, bucket) group order is the global (np, seq) order
    split at bucket boundaries — offset[group] is exactly the number of rows
    strictly before the group.  Caller picks ``shift`` so bucket count stays
    ~2^16 (collect stays small) and checks ``max_group`` for skew: a
    degenerate seq distribution (one bucket holding the round) should fall
    back to the range-partitioned path rather than hand one window task the
    whole round."""
    rows = (
        df.select(
            F.col(np_col).alias("_hnp"),
            F.shiftright(F.col(seq_col), shift).alias("_hbk"),
        )
        .groupBy("_hnp", "_hbk")
        .agg(F.count(F.lit(1)).alias("_hn"))
        .collect()
    )
    groups = sorted((int(r["_hnp"]), int(r["_hbk"]), int(r["_hn"])) for r in rows)
    out, acc, mx = [], 0, 0
    for np_, bk, n in groups:
        out.append((np_, bk, acc))
        acc += n
        mx = max(mx, n)
    return out, acc, mx


def with_hist_rank(
    df: DataFrame,
    np_col: str,
    seq_col: str,
    shift: int,
    offsets_rows: list[tuple[int, int, int]],
    out_col: str,
    base: int = 0,
) -> DataFrame:
    """rank = base + offset[(np, seq>>shift)] + row_number within the group
    ordered by seq.  Small offset sets (the common case — occupied buckets,
    not bucket space) inline as a literal map (zero extra driver round
    trips); large ones travel as a broadcast-joined tiny frame (arbitrary
    group count without plan bloat).  The window is keyed by (np, bucket) —
    bounded groups, no single-partition Exchange."""
    w = Window.partitionBy(np_col, "_bk").orderBy(seq_col)
    part = df.withColumn("_bk", F.shiftright(F.col(seq_col), shift))
    if len(offsets_rows) <= 1024:
        # ONE py4j round trip for the whole literal map (an F.expr string the
        # JVM parses), not one per element: both create_map(*lits) and even
        # F.lit([list]) issue per-element lit() calls, and at n≈300-1000
        # groups that was ~0.4 s of pure driver time per crawl round — the
        # dominant plan-assembly cost in the per-round fixed budget
        keys = ",".join(f"'{int(a)}:{int(b)}'" for a, b, _ in offsets_rows)
        vals = ",".join(f"{int(o)}L" for _, _, o in offsets_rows)
        off = F.element_at(
            F.expr(f"map_from_arrays(array({keys}), array({vals}))"),
            F.concat_ws(
                ":", F.col(np_col).cast("string"), F.col("_bk").cast("string")
            ),
        )
        return part.withColumn(
            out_col, F.lit(base).cast("long") + off + F.row_number().over(w)
        ).drop("_bk")
    spark = df.sparkSession
    offs = F.broadcast(
        spark.createDataFrame(
            [(int(a), int(b), int(o)) for a, b, o in offsets_rows],
            f"{np_col} int, _bk long, _off long",
        )
    )
    return (
        part.join(offs, [np_col, "_bk"])
        .withColumn(
            out_col,
            F.lit(base).cast("long") + F.col("_off") + F.row_number().over(w),
        )
        .drop("_bk", "_off")
    )


def with_rank(
    part: DataFrame,
    order_cols: list[str],
    out_col: str,
    offsets: list[int],
    base: int = 0,
) -> DataFrame:
    """rank = base + offsets[_pid] + row_number() within _pid (1-based)."""
    # one parsed array literal, not one lit() round trip per partition
    arr = F.expr("array(" + ",".join(f"{int(o)}L" for o in (offsets or [0])) + ")")
    off = F.element_at(arr, (F.col("_pid") + 1).cast("int")).cast("long")
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return part.withColumn(
        out_col, F.lit(base).cast("long") + off + F.row_number().over(w)
    )
