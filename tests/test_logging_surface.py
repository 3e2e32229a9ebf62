"""Log-line surface tests — the reference asserts on operation log lines
(test_db_ops_controller.py:21-41, loggers/*); same contract here: one
``crawl_info`` line per round + ``crawl_done``, and one line per store op."""

import logging

import pytest

from spider_ray.corpus import write_corpus


@pytest.mark.usefixtures("ray_session")
def test_crawl_and_store_log_lines(tmp_path, caplog):
    from spider_ray.pipelines.crawl import crawl
    from spider_ray.pipelines.store_ops import catch, count_all, delete_url

    corpus = write_corpus(str(tmp_path / "c"), n_pages=60, n_hosts=4)
    out = str(tmp_path / "o")
    with caplog.at_level(logging.INFO, logger="spider_ray.crawl"):
        res = crawl(corpus, ["https://h0.example/p0"], out, max_depth=2)
    crawl_lines = [r.message for r in caplog.records if r.name == "spider_ray.crawl"]
    assert sum("crawl_info" in m for m in crawl_lines) == len(res.rounds)
    assert any("crawl_done" in m and f"crawled={res.crawled}" in m for m in crawl_lines)
    # per-round fields present
    assert any("round=0" in m and "fetched=1" in m for m in crawl_lines)

    caplog.clear()
    with caplog.at_level(logging.INFO, logger="spider_ray.store"):
        catch(out, "https://h0.example/p0", limit=2).to_pandas()
        n = count_all(out)
        delete_url(out, "https://definitely-not-there.example/x")
    store_lines = [r.message for r in caplog.records if r.name == "spider_ray.store"]
    assert any(m.startswith("catch parent=") for m in store_lines)
    assert any(m == f"count_all n={n}" for m in store_lines)
    assert any(m.startswith("delete_url url=") for m in store_lines)
