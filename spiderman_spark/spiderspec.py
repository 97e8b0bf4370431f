"""SpiderSpec — declarative spider definition, the codegen-free equivalent of
the reference's ``easy_scrapy.py`` template generator.

The reference scaffolds a new spider by writing three files from string
templates (`/root/reference/easy_scrapy.py:11-338,368-421`): a spider module
(parse callbacks + callback registry), an items module (field dicts), and a
job script (seed generator).  Here the same three concerns are one dataclass:

- ``item_tables``: tablename → DDL (replaces the Item field dicts; column
  order in the DDL is the ``idx`` order);
- ``callbacks``: callback name → dont_filter flag (replaces the
  ``get_callback`` registry, `SP/spiders/zhifang.py:55-61`);
- ``parse``: one pure function ``(url, body) -> (items, child_requests)``
  (replaces the per-callback parse methods — shared verbatim by the Spark
  mapInPandas stage and the reference simulator, so parity is by
  construction);
- ``make_seeds``: pages → ordered seed request dicts (replaces the job
  script's ``make_job``).

CrawlEngine takes a spec and runs any spider; ZHIFANG is the demo spider the
reference ships.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from . import parselib


@dataclass(frozen=True)
class SpiderSpec:
    name: str
    item_tables: dict  # tablename -> DDL string
    callbacks: dict  # callback name -> dont_filter (True = skip dedup)
    parse: Callable  # (url, body) -> ([(tablename, item_dict)], [request_dict])
    make_seeds: Callable | None = None  # (pages) -> [request_dict]
    # callbacks whose fetched pages run the parse stage (others, e.g. 'file',
    # are payload fetches handled by the downloader)
    page_callbacks: tuple = ("list", "detail")


ZHIFANG = SpiderSpec(
    name="zhifang",
    item_tables=dict(parselib.ITEM_TABLES),
    callbacks={"list": True, "detail": True},
    parse=parselib.parse_body,
    page_callbacks=parselib.PAGE_CALLBACKS,
)
