"""Edges-table SQL oracle for the crawl (VERDICT r2 'What's missing' #2).

The driver's DuckDB harness can't check `crawl_bfs` (the pages corpus is not
one of its registered views), so the crawl's BFS semantics get an INDEPENDENT
SQL oracle here instead: extract the corpus link graph into an edges table
(via the spec functions parse_page/generate_refs only — no engine machinery),
run a recursive-CTE BFS in DuckDB, and compare its reached-set + min-depth
against BOTH the sequential Python oracle and the distributed engine's store.
This closes the triangle: engine ↔ python-oracle (test_crawl_engine.py),
python-oracle ↔ SQL, engine ↔ SQL — a bug in the shared loop shape of the
first two can't hide from the third.

Scope: unthrottled crawls (no politeness/robots), where store depth ==
BFS min-depth. Rank order and deferral semantics stay with the Python oracle.
"""

import duckdb
import pandas as pd
import pytest

from spider_ray.canonical import canonicalize, ensure_scheme, generate_refs
from spider_ray.corpus import build_pages_table, corpus_as_dict
from spider_ray.oracle import crawl_oracle
from spider_ray.parse import parse_page

SEED = "https://h0.example/p0"


def _corpus():
    return corpus_as_dict(build_pages_table(n_pages=200, n_hosts=8, links_per_page=5))


def _edges(corpus: dict[str, bytes], start_url: str) -> pd.DataFrame:
    rows = []
    for src, html in corpus.items():
        _, _, hrefs = parse_page(html)
        for dst in generate_refs(hrefs, start_url):
            rows.append((src, dst))
    return pd.DataFrame(rows, columns=["src", "dst"])


def _sql_bfs(corpus: dict[str, bytes], seed: str, max_depth: int) -> dict[str, int]:
    """DuckDB recursive-CTE BFS: url -> min depth, restricted to corpus hits
    (misses are fetch attempts, never store rows, and never expand — they
    have no outgoing edges by construction)."""
    start = canonicalize(ensure_scheme(seed))
    edges = _edges(corpus, start)
    nodes = pd.DataFrame({"url": list(corpus)})
    con = duckdb.connect()
    con.register("edges", edges)
    con.register("nodes", nodes)
    got = con.execute(
        """
        WITH RECURSIVE reach(url, depth) AS (
            SELECT ?::VARCHAR, 0
          UNION
            SELECT e.dst, r.depth + 1
            FROM reach r JOIN edges e ON e.src = r.url
            WHERE r.depth < ?
        )
        SELECT r.url, MIN(r.depth) AS depth
        FROM reach r JOIN nodes n ON n.url = r.url
        GROUP BY r.url
        """,
        [start, max_depth],
    ).fetchall()
    con.close()
    return dict(got)


@pytest.mark.parametrize("depth", [0, 1, 2, 3])
def test_python_oracle_matches_sql_bfs(depth):
    c = _corpus()
    sql = _sql_bfs(c, SEED, depth)
    res = crawl_oracle(c, [SEED], max_depth=depth)
    got = {r.url: r.depth for r in res.store}
    assert got == sql


@pytest.mark.usefixtures("ray_session")
def test_engine_store_matches_sql_bfs(tmp_path):
    import pyarrow.parquet as pq

    from spider_ray.corpus import write_corpus
    from spider_ray.pipelines.crawl import crawl, read_store

    corpus_dir = str(tmp_path / "corpus")
    write_corpus(corpus_dir, n_pages=200, n_hosts=8, links_per_page=5)
    corpus = corpus_as_dict(pq.read_table(corpus_dir))
    sql = _sql_bfs(corpus, SEED, 3)

    out = str(tmp_path / "out")
    crawl(corpus_dir, [SEED], out, max_depth=3)
    store = read_store(out).to_pandas()
    got = dict(zip(store["url"], store["depth"]))
    assert got == sql
