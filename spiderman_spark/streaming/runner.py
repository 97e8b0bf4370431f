"""Streaming skin (SURVEY.md M8/T1/T2) — frontier rounds as Structured
Streaming micro-batches.

The reference's workers poll the Redis list until an idle-close extension
fires after IDLE_NUMBER consecutive empty ~5s ticks
(`/root/reference/SP/scrapy_redis_extensions.py:63-78`,
`SP/settings.py:107-108`).  Here a rate-source stream supplies the tick
cadence and ``foreachBatch`` executes exactly one frontier round per
micro-batch — the "frontier rounds are Structured-Streaming micro-batches"
posture of the north rule.  Determinism is untouched: each round is the same
``CrawlEngine.step()`` the batch loop runs (results are bit-identical, tested),
state still lives in snapshot-manifest tables, and a killed stream resumes via
``engine.resume()`` exactly like the batch loop.

Termination mirrors the idle-close extension: a round that fetches 0 pages is
an idle tick; ``idle_number`` consecutive idle ticks stop the query (the
batch loop's ``n == 0`` exit is the degenerate idle_number=1 case — with
table-state rounds an empty frontier cannot refill on its own, so any
idle_number yields the same final state; the knob models the reference's
behavior under external producers pushing mid-crawl).
"""

from __future__ import annotations

import time


class StreamingCrawlRunner:
    """Drive any engine exposing ``step() -> int`` (CrawlEngine or
    ImageDownloader) as one-round-per-micro-batch streaming query."""

    def __init__(self, engine, idle_number: int = 3, ticks_per_second: int = 10):
        self.engine = engine
        self.idle_number = idle_number  # IDLE_NUMBER (SP/settings.py:107)
        self.ticks_per_second = ticks_per_second
        self.rounds = 0
        self.fetched = 0

    def run(self, timeout_sec: float = 600.0) -> dict:
        spark = self.engine.spark
        idle = {"n": 0}

        def one_round(batch_df, epoch_id):
            # the tick batch itself carries no data we need — it is cadence
            if idle["n"] >= self.idle_number:
                return
            n = self.engine.step()
            if n == 0:
                idle["n"] += 1
            else:
                idle["n"] = 0
                self.rounds += 1
                self.fetched += n

        ticks = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", self.ticks_per_second)
            .load()
        )
        query = (
            ticks.writeStream.foreachBatch(one_round)
            .option("checkpointLocation", f"{self.engine.catalog.root}/_stream_ckpt")
            .start()
        )
        deadline = time.monotonic() + timeout_sec
        try:
            while time.monotonic() < deadline:
                if idle["n"] >= self.idle_number:
                    break
                if not query.isActive:
                    break
                time.sleep(0.2)
        finally:
            query.stop()
            query.awaitTermination(30)
        return {"rounds": self.rounds, "fetched": self.fetched}
