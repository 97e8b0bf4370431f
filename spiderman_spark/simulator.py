"""Single-threaded reference simulator — the crawl-semantics oracle.

Implements the *deterministic skeleton* of the reference's scrapy-redis crawl
loop (SURVEY.md §4.1), with no Spark and no network, so the Spark engine can be
checked bit-for-bit against it:

- FIFO frontier: RPUSH/LPOP list semantics (`SP/utils/ctrl_redis.py:21-33,59-75`,
  BFS per `README.md:103`); seeds in generation order, children appended in
  parse (DOM) order within a page (`SP/spiders/zhifang.py:80-96`).
- Dedup gate: canonical-URL fingerprint set consulted iff the callback's
  ``dont_filter`` is False (`SP/spiders/SPRedisSpider.py:35-44`,
  `SP/spiders/zhifang.py:55-61`; the zhifang demo runs with dont_filter=True
  for both callbacks — the registry is configurable here exactly as there).
- Politeness: per-host fetch budget per round, modeling
  CONCURRENT_REQUESTS_PER_DOMAIN / DOWNLOAD_DELAY (`SP/settings.py:126-135`).
  Requests over budget keep their FIFO position for the next round.
- Retry: HTTP code in RETRY_HTTP_CODES or body_size < MINSIZE → re-attempt next
  round keeping the original seq, at most ``retry_times`` retries
  (`SP/settings.py:121-124`, `SP/middlewares/SPMiddleWare.py:136-157`).
- Termination: loop ends when no pending requests remain — the exact analogue
  of the idle-close extension (`SP/scrapy_redis_extensions.py:63-78`) without
  the wall-clock dependence.

The simulator also models the decoupled attachment downloader
(`download.py:51-186`) as a second, childless crawl over the file-meta rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .corpusgen import RETRY_HTTP_CODES, host_of
from .functions.urltools import canonical, fingerprint  # noqa: F401 (shared defs)
from .parselib import parse_body

# callback registry: name -> dont_filter (True = skip dedup), as in
# SP/spiders/zhifang.py:55-61.  'file' covers the downloader phase.
DEFAULT_CALLBACKS = {"list": True, "detail": True, "file": False}


@dataclass
class Politeness:
    max_per_round: int = 8  # per-host fetch budget per frontier round
    retry_times: int = 3  # max retries after the first attempt
    minsize: int = 64  # SizeRetryMiddleWare MINSIZE
    per_host: dict = field(default_factory=dict)  # host -> override budget

    def budget(self, host: str) -> int:
        return self.per_host.get(host, self.max_per_round)


@dataclass
class SimRequest:
    seq: int
    url: str
    method: str = "GET"
    callback: str = "list"
    body: str = ""  # POST payload; part of the request fingerprint
    meta: dict = field(default_factory=dict)
    attempt: int = 0
    priority: int = 0  # higher fetches first; ties FIFO by seq


@dataclass
class SimResult:
    crawl_order: list  # [(rank, round, url, host, attempt)]
    url_seen: set  # fingerprints admitted past the dedup gate
    seen_urls: set  # canonical urls admitted (for readable asserts)
    items: dict  # tablename -> list[dict]
    fetch_counts: dict  # (round, host) -> n
    failed: list  # [(url, reason)] exhausted retries
    rounds: int


# the oracle uses the exact same parse callbacks as the engine's mapInPandas
# stage (spiderman_spark.parselib.parse_body) — shared by construction.


def _path_of(url: str) -> str:
    rest = url.split("://", 1)[-1] if "://" in url else url
    i = rest.find("/")
    return rest[i:] if i >= 0 else ""


def simulate_crawl(
    corpus: dict,
    seeds: list[dict],
    politeness: Politeness | None = None,
    callbacks: dict | None = None,
    parse_fn=None,
    page_callbacks: tuple = ("list", "detail"),
    robots_rules: dict | None = None,
    middleware: dict | None = None,
) -> SimResult:
    """Run the scrapy-redis deterministic skeleton to frontier exhaustion.

    ``corpus``: url -> corpus_row dict.  ``seeds``: ordered request dicts.

    ``middleware`` (U3 mirror): optional ``{"user_agents": [...],
    "cookies": [...]}`` — when given, every crawl_order tuple gains
    ``(ua, cookie)`` picked with the same deterministic xxhash64 rotation the
    engine stamps pre-fetch (``functions.xxh64.pick_rotating`` ==
    ``scalars.pick_rotating``); without it tuples keep their 5-ary shape.
    """
    pol = politeness or Politeness()
    cbs = callbacks if callbacks is not None else DEFAULT_CALLBACKS
    parse_fn = parse_fn or parse_body
    seen: set[str] = set()
    seen_urls: set[str] = set()
    pending: list[SimRequest] = []
    next_seq = 0
    crawl_order, failed = [], []
    items: dict[str, list] = {}
    fetch_counts: dict = {}
    rank = 0

    def admit(req_dict: dict, attempt: int = 0, priority: int | None = None) -> None:
        nonlocal next_seq
        cb = req_dict.get("callback", "list")
        dont_filter = cbs.get(cb, False)
        fp = fingerprint(
            req_dict.get("method", "GET"),
            req_dict["url"],
            req_dict.get("body", "") or "",
        )
        if not dont_filter:
            if fp in seen:
                return
            seen.add(fp)
            seen_urls.add(canonical(req_dict["url"]))
        pending.append(
            SimRequest(
                seq=next_seq,
                url=req_dict["url"],
                method=req_dict.get("method", "GET"),
                callback=cb,
                body=req_dict.get("body", "") or "",
                meta=dict(req_dict.get("meta") or {}),
                attempt=attempt,
                priority=(
                    int(req_dict.get("priority", 0)) if priority is None else priority
                ),
            )
        )
        next_seq += 1

    for s in seeds:
        admit(s)

    if middleware is not None:
        # loop-invariant: the simulator is the parity oracle over entire
        # corpora, so keep per-request work out of the fetch loop
        from .functions.xxh64 import pick_rotating as _pick

        _mw_uas = middleware.get("user_agents") or []
        _mw_cks = middleware.get("cookies") or []

    rnd = 0
    while pending:
        rnd += 1
        pending.sort(key=lambda r: (-r.priority, r.seq))
        taken_per_host: dict[str, int] = {}
        eligible, deferred = [], []
        for req in pending:
            host = host_of(req.url)
            if taken_per_host.get(host, 0) < pol.budget(host):
                taken_per_host[host] = taken_per_host.get(host, 0) + 1
                eligible.append(req)
            else:
                deferred.append(req)
        pending = deferred
        retries: list[SimRequest] = []
        for req in eligible:
            host = host_of(req.url)
            rank += 1
            if middleware is None:
                crawl_order.append((rank, rnd, req.url, host, req.attempt))
            else:
                crawl_order.append(
                    (
                        rank, rnd, req.url, host, req.attempt,
                        _pick(_mw_uas, req.url) if _mw_uas else "",
                        _pick(_mw_cks, req.url) if _mw_cks else "",
                    )
                )
            fetch_counts[(rnd, host)] = fetch_counts.get((rnd, host), 0) + 1
            row = corpus.get(req.url)
            ok = (
                row is not None
                and row["http_status"] == 200
                and row["body_size"] >= pol.minsize
            )
            if not ok:
                retryable = row is not None and (
                    row["http_status"] in RETRY_HTTP_CODES
                    or row["body_size"] < pol.minsize
                )
                if retryable and req.attempt < pol.retry_times:
                    req.attempt += 1
                    retries.append(req)  # keeps original seq → FIFO priority
                else:
                    failed.append((req.url, "exhausted" if retryable else "missing"))
                continue
            if req.callback in page_callbacks:
                new_items, children = parse_fn(req.url, row["body"])
                for tb, it in new_items:
                    items.setdefault(tb, []).append(it)
                for child in children:
                    if robots_rules is not None:
                        host = host_of(child["url"])
                        pathc = _path_of(child["url"])
                        if any(
                            pathc.startswith(p)
                            for p in robots_rules.get(host, [])
                        ):
                            failed.append((child["url"], "robots"))
                            continue
                    admit(child, priority=req.priority)
            else:  # 'file' downloader phase: no children, success recorded
                items.setdefault("_downloaded", []).append(
                    {"url": req.url, "attempt": req.attempt}
                )
        pending.extend(retries)

    return SimResult(
        crawl_order=crawl_order,
        url_seen=seen,
        seen_urls=seen_urls,
        items=items,
        fetch_counts=fetch_counts,
        failed=failed,
        rounds=rnd,
    )


def make_seeds(spec, pages: int | None = None) -> list[dict]:
    """Seed generator mirroring make_job (`SP_JOBS/zhifang_job.py:27-41`)."""
    from . import corpusgen

    pages = pages or spec.list_pages
    return [
        {
            "url": corpusgen.list_url(spec, p),
            "method": "GET",
            "callback": "list",
            "meta": {"pagenum": str(p)},
        }
        for p in range(1, pages + 1)
    ]


def corpus_as_dict(spec) -> dict:
    from . import corpusgen

    return {
        r["url"]: r
        for r in (corpusgen.corpus_row(spec, *k) for k in corpusgen.iter_keys(spec))
    }
