"""Randomized-corpus fuzz (engine == oracle on arbitrary seeded graphs) and
mid-round-crash resume (partial round debris must be cleaned exactly)."""

import os
import shutil

import pandas as pd
import pytest

from spider_ray.corpus import build_pages_table, corpus_as_dict, write_corpus
from spider_ray.oracle import crawl_oracle


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [7, 13, 99])
def test_engine_matches_oracle_random_corpora(tmp_path, seed):
    from spider_ray.pipelines.crawl import crawl, read_store

    corpus_dir = write_corpus(
        str(tmp_path / "c"), n_pages=100, n_hosts=5, links_per_page=4, seed=seed
    )
    cd = corpus_as_dict(
        build_pages_table(n_pages=100, n_hosts=5, links_per_page=4, seed=seed)
    )
    seeds = ["https://h0.example/p0", "https://h1.example/p0"]
    res = crawl(corpus_dir, seeds, str(tmp_path / "o"), max_depth=2)
    oracle = crawl_oracle(cd, seeds, max_depth=2)
    store = read_store(str(tmp_path / "o"), canonical_order=True).to_pandas()
    assert store["url"].tolist() == oracle.canonical_order()
    assert res.total_calls == oracle.total_calls
    assert res.seen_count == len(oracle.seen)
    o = {r.url: r for r in oracle.store}
    for row in store.itertuples():
        assert row.text == o[row.url].text


@pytest.mark.usefixtures("ray_session")
def test_resume_cleans_mid_round_crash_debris(tmp_path):
    """Simulate a crash DURING round k+1: store parts written, checkpoint
    not promoted (tmp dir + partial store round). Resume must discard the
    debris and converge to the uninterrupted result."""
    from spider_ray.pipelines.crawl import crawl, read_store

    corpus_dir = write_corpus(str(tmp_path / "c"), n_pages=100, n_hosts=5)
    seeds = ["https://h0.example/p0"]
    out = str(tmp_path / "o")
    part = crawl(corpus_dir, seeds, out, max_depth=2, max_rounds=1)
    assert not part.finished

    # fabricate crash debris for the round that never completed
    debris_store = os.path.join(out, "store", "r0001")
    os.makedirs(debris_store, exist_ok=True)
    with open(os.path.join(debris_store, "part-debris.parquet"), "wb") as f:
        f.write(b"not parquet")
    os.makedirs(os.path.join(out, "rounds", ".r0001.tmp", "frontier"), exist_ok=True)

    resumed = crawl(corpus_dir, seeds, out, max_depth=2, resume=True)
    assert resumed.finished

    ref = crawl(corpus_dir, seeds, str(tmp_path / "ref"), max_depth=2)
    a = read_store(out, canonical_order=True).to_pandas().reset_index(drop=True)
    b = read_store(str(tmp_path / "ref"), canonical_order=True).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert resumed.total_calls == ref.total_calls
