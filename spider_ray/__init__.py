"""spider_ray — a Ray-Data-native URL-frontier crawl + data-processing engine.

A from-scratch reimplementation of the query/data-processing capabilities of
``redd4ford/spider`` (reference at /root/reference, read-only), re-expressed as
``ray.data.Dataset`` pipelines over a Parquet table of Common-Crawl-style pages:

- ``spider_ray.canonical`` — URL canonicalization spec (replaces yarl usage,
  reference crawler.py:51-53,108,140-154).
- ``spider_ray.parse`` — HTML title/link extraction spec (replaces
  BeautifulSoup+lxml, reference crawler.py:157-172).
- ``spider_ray.corpus`` — deterministic synthetic ``pages`` corpus generator
  (the stand-in for the live network, per BASELINE.json input_hint).
- ``spider_ray.oracle`` — sequential single-process oracle implementing the
  canonical BFS crawl semantics (SURVEY.md §3.1); the correctness target.
- ``spider_ray.pipelines.crawl`` — the distributed BFS crawl engine
  (frontier rounds, url-seen actor shards, politeness, checkpoint/resume).
- ``spider_ray.pipelines.*`` — query ops, dedup family, text analysis, ANN,
  multimodal plumbing over the driver test tables.
"""

__version__ = "0.1.0"
