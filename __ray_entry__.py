"""Driver contract for the spider_ray engine.

- ``entry()``: flagship crawl — renders /root/testdata/sf0.001 documents into
  a pages corpus (BASELINE.json input_hint schema) under /tmp, runs the
  distributed BFS crawl (spider_ray.pipelines.crawl), returns the store.
- ``queries()``: every implemented operator from SURVEY.md §2 plus the
  training-data ops (dedup family, text analysis, ANN, multimodal plumbing),
  from spider_ray.pipelines.registry.
- ``oracle_sql()``: the DuckDB-equivalent SQL for each SQL-expressible query
  (column names match the Ray side exactly; see registry.py for the
  float-determinism rules).

Ray is initialised by the driver before this module is imported — nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    import shutil
    import tempfile

    from spider_ray.corpus import corpus_from_documents
    from spider_ray.pipelines.crawl import crawl, read_store

    root = tempfile.mkdtemp(prefix="spider_ray_entry_")
    corpus = corpus_from_documents("/root/testdata/sf0.001", f"{root}/pages")
    crawl(
        corpus,
        ["https://d0.example/doc0", "https://d1.example/doc1"],
        f"{root}/out",
        max_depth=3,
        per_host_budget=64,
    )
    df = read_store(f"{root}/out", canonical_order=True).to_pandas()
    shutil.rmtree(root, ignore_errors=True)
    return df


def queries() -> dict[str, Callable[[str], Any]]:
    from spider_ray.pipelines.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from spider_ray.pipelines.registry import ORACLE_SQL

    return dict(ORACLE_SQL)
