"""Engine-vs-oracle equivalence (SURVEY.md §5.2): the distributed crawl must
reproduce the sequential oracle's URL-seen set, canonical ordering, and
byte-identical title/text per url — across parallelism / partitioning /
politeness / fetch-strategy settings."""

import pandas as pd
import pytest

from spider_ray.corpus import build_pages_table, corpus_as_dict, write_corpus
from spider_ray.oracle import crawl_oracle

SEEDS = ["https://h0.example/p0", "h1.example/p0", "https://h2.example/p3"]


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    return write_corpus(str(d), n_pages=200, n_hosts=8, links_per_page=5)


@pytest.fixture(scope="module")
def corpus_dict():
    return corpus_as_dict(build_pages_table(n_pages=200, n_hosts=8, links_per_page=5))


def _run_engine(corpus_dir, tmp_path, **kw):
    from spider_ray.pipelines.crawl import crawl, read_store

    res = crawl(corpus_dir, SEEDS, str(tmp_path / "out"), **kw)
    store = read_store(str(tmp_path / "out")).to_pandas()
    return res, store


def _assert_matches_oracle(res, store: pd.DataFrame, oracle):
    # URL-seen set identical (includes misses)
    engine_seen_store = set(store["url"])
    oracle_store_urls = {r.url for r in oracle.store}
    assert engine_seen_store == oracle_store_urls
    assert res.seen_count == len(oracle.seen)
    # counters match (crawler.py:87-90 semantics)
    assert res.total_calls == oracle.total_calls
    assert res.crawled == oracle.crawled
    # canonical ordering identical
    ordered = store.sort_values(["depth", "discovery_rank"])["url"].tolist()
    assert ordered == oracle.canonical_order()
    # per-url depth, rank, title, text byte-identical; parent always start url
    o = {r.url: r for r in oracle.store}
    for row in store.itertuples():
        ref = o[row.url]
        assert (row.depth, row.discovery_rank) == (ref.depth, ref.discovery_rank), row.url
        assert row.title == ref.title or (pd.isna(row.title) and ref.title is None)
        assert row.text == ref.text, f"text mismatch for {row.url}"
        assert row.parent == ref.parent


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("depth", [0, 1, 2])
def test_engine_matches_oracle_depths(corpus_dir, corpus_dict, tmp_path, depth):
    res, store = _run_engine(corpus_dir, tmp_path, max_depth=depth)
    oracle = crawl_oracle(corpus_dict, SEEDS, max_depth=depth)
    _assert_matches_oracle(res, store, oracle)


@pytest.mark.usefixtures("ray_session")
def test_engine_matches_oracle_with_politeness(corpus_dir, corpus_dict, tmp_path):
    res, store = _run_engine(corpus_dir, tmp_path, max_depth=2, per_host_budget=3)
    oracle = crawl_oracle(corpus_dict, SEEDS, max_depth=2, per_host_budget=3)
    _assert_matches_oracle(res, store, oracle)
    # politeness is order-neutral (quirk q5 contract): same store as unbudgeted
    free = crawl_oracle(corpus_dict, SEEDS, max_depth=2)
    assert {r.url for r in free.store} == set(store["url"])


@pytest.mark.usefixtures("ray_session")
def test_engine_matches_oracle_with_robots(corpus_dir, corpus_dict, tmp_path):
    robots = {"h1.example": [""], "h2.example": ["/p1"]}
    res, store = _run_engine(corpus_dir, tmp_path, max_depth=2, robots=robots)
    oracle = crawl_oracle(corpus_dict, SEEDS, max_depth=2, robots=robots)
    _assert_matches_oracle(res, store, oracle)
    assert not any(u.startswith("https://h1.example") for u in store["url"])


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("shards", [1, 7])
def test_engine_invariant_to_shard_count(corpus_dir, corpus_dict, tmp_path, shards):
    res, store = _run_engine(corpus_dir, tmp_path, max_depth=2, seen_shards=shards)
    oracle = crawl_oracle(corpus_dict, SEEDS, max_depth=2)
    _assert_matches_oracle(res, store, oracle)


@pytest.mark.usefixtures("ray_session")
def test_engine_invariant_to_batch_size(corpus_dir, corpus_dict, tmp_path):
    res, store = _run_engine(
        corpus_dir, tmp_path, max_depth=2, fetch_batch_size=7, parse_batch_size=3
    )
    oracle = crawl_oracle(corpus_dict, SEEDS, max_depth=2)
    _assert_matches_oracle(res, store, oracle)


@pytest.mark.usefixtures("ray_session")
def test_engine_groupby_dedup_mode(corpus_dir, corpus_dict, tmp_path):
    # the groupby dedup path must produce identical claims to the fused
    # actor offer/harvest path (both == oracle)
    res, store = _run_engine(corpus_dir, tmp_path, max_depth=2, dedup_mode="groupby")
    oracle = crawl_oracle(corpus_dict, SEEDS, max_depth=2)
    _assert_matches_oracle(res, store, oracle)


@pytest.mark.usefixtures("ray_session")
def test_engine_join_fetch_mode(corpus_dir, corpus_dict, tmp_path):
    res, store = _run_engine(
        corpus_dir, tmp_path, max_depth=1, fetch_mode="join", join_partitions=3
    )
    oracle = crawl_oracle(corpus_dict, SEEDS, max_depth=1)
    _assert_matches_oracle(res, store, oracle)


@pytest.mark.usefixtures("ray_session")
def test_engine_actor_pool_fetch_mode(corpus_dir, corpus_dict, tmp_path):
    res, store = _run_engine(
        corpus_dir, tmp_path, max_depth=1, fetch_mode="indexed_actors",
        fetch_concurrency=2,
    )
    oracle = crawl_oracle(corpus_dict, SEEDS, max_depth=1)
    _assert_matches_oracle(res, store, oracle)


@pytest.mark.usefixtures("ray_session")
def test_finalize_store_dedups_duplicate_parts(corpus_dir, tmp_path):
    # simulate a task-retry duplicated part file, then run the exactness net
    import glob
    import shutil

    from spider_ray.pipelines.crawl import crawl, read_store
    from spider_ray.stages.expand import finalize_store

    out = str(tmp_path / "o")
    crawl(corpus_dir, SEEDS, out, max_depth=1)
    clean = read_store(out, canonical_order=True).to_pandas()
    part = glob.glob(f"{out}/store/r0000/*.parquet")[0]
    shutil.copy(part, part.replace(".parquet", "-retry-dup.parquet"))
    assert read_store(out).count() > len(clean)  # duplicates present

    finalize_store(f"{out}/store", str(tmp_path / "final"))
    import ray

    final = (
        ray.data.read_parquet(str(tmp_path / "final"))
        .to_pandas()
        .sort_values(["depth", "discovery_rank"])
        .reset_index(drop=True)
    )
    assert final.equals(clean)


@pytest.mark.usefixtures("ray_session")
def test_engine_partitioned_fetch_mode(corpus_dir, corpus_dict, tmp_path):
    res, store = _run_engine(corpus_dir, tmp_path, max_depth=1, fetch_mode="partitioned")
    oracle = crawl_oracle(corpus_dict, SEEDS, max_depth=1)
    _assert_matches_oracle(res, store, oracle)


@pytest.mark.usefixtures("ray_session")
def test_engine_robots_table_with_budgets(corpus_dir, corpus_dict, tmp_path):
    from spider_ray.robots import load_robots_table, write_robots_table

    path = write_robots_table(
        str(tmp_path / "robots.parquet"),
        rules={"h1.example": [""], "h2.example": ["/p1"]},
        delays_ms={"h0.example": 30_000},  # → budget 2/round
    )
    rules, budgets = load_robots_table(path)
    assert budgets == {"h0.example": 2}
    res, store = _run_engine(
        corpus_dir, tmp_path, max_depth=2, robots=path, per_host_budget=5
    )
    oracle = crawl_oracle(
        corpus_dict,
        SEEDS,
        max_depth=2,
        robots=rules,
        per_host_budget=5,
        host_budgets=budgets,
    )
    _assert_matches_oracle(res, store, oracle)
    assert not any(u.startswith("https://h1.example") for u in store["url"])


@pytest.mark.usefixtures("ray_session")
def test_engine_distributed_rank_and_big_checkpoint_paths(corpus_dir, corpus_dict, tmp_path):
    # force the >threshold branches: distributed sort+rank for every round
    # and streaming write_parquet checkpoints — must be byte-equivalent to
    # the driver-side fast paths (and resume from a ray-written frontier)
    res, store = _run_engine(
        corpus_dir, tmp_path, max_depth=2, small_round_rows=1, small_checkpoint_rows=1
    )
    oracle = crawl_oracle(corpus_dict, SEEDS, max_depth=2)
    _assert_matches_oracle(res, store, oracle)

    from spider_ray.pipelines.crawl import crawl, read_store

    out2 = str(tmp_path / "big_resume")
    part = crawl(
        corpus_dir, SEEDS, out2, max_depth=2,
        small_round_rows=1, small_checkpoint_rows=1, max_rounds=1,
    )
    assert not part.finished
    resumed = crawl(
        corpus_dir, SEEDS, out2, max_depth=2,
        small_round_rows=1, small_checkpoint_rows=1, resume=True,
    )
    assert resumed.finished
    df = read_store(out2, canonical_order=True).to_pandas()
    assert df["url"].tolist() == oracle.canonical_order()


@pytest.mark.usefixtures("ray_session")
def test_bloom_mode_no_false_negatives(corpus_dir, corpus_dict, tmp_path):
    # bloom sized generously → no FPs at this scale → identical to exact
    res, store = _run_engine(
        corpus_dir, tmp_path, max_depth=2, seen_mode="bloom", bloom_bits=1 << 20
    )
    oracle = crawl_oracle(corpus_dict, SEEDS, max_depth=2)
    _assert_matches_oracle(res, store, oracle)


@pytest.mark.usefixtures("ray_session")
def test_cuckoo_mode_matches_oracle(corpus_dir, corpus_dict, tmp_path):
    # cuckoo filter sized generously (2^20 bits → 2^14 buckets ≈ 65k slots
    # for ~150 urls) → FP probability ~1e-4/url → identical to exact here
    res, store = _run_engine(
        corpus_dir, tmp_path, max_depth=2, seen_mode="cuckoo", bloom_bits=1 << 20
    )
    oracle = crawl_oracle(corpus_dict, SEEDS, max_depth=2)
    _assert_matches_oracle(res, store, oracle)


def test_corpus_index_all_miss_batch():
    # a batch whose urls ALL miss the corpus (expected near the crawl edge)
    # must come back empty, not crash in pa.concat_arrays([])
    import numpy as np
    import pyarrow as pa

    from spider_ray.stages.fetch import _CorpusIndex, _url_hash64

    tbl = pa.table(
        {
            "url": pa.array(["https://a/x", "https://a/y"], pa.string()),
            "html": pa.array([b"<p>x</p>", b"<p>y</p>"], pa.large_binary()),
        }
    )
    hashes = np.array([_url_hash64(u) for u in tbl.column("url").to_pylist()], dtype=np.uint64)
    order = np.argsort(hashes, kind="stable").astype(np.int64)
    idx = _CorpusIndex((tbl, hashes[order], order))

    batch = pa.table(
        {
            "url": pa.array(["https://nope/1", "https://nope/2"], pa.string()),
            "depth": pa.array([1, 1], pa.int32()),
            "rank": pa.array([5, 6], pa.int64()),
        }
    )
    out = idx.lookup(batch)
    assert out.num_rows == 0
    assert out.schema.names == ["url", "depth", "rank", "html"]
    # mixed batch still resolves the hit
    mixed = pa.table(
        {
            "url": pa.array(["https://nope/1", "https://a/y"], pa.string()),
            "depth": pa.array([1, 1], pa.int32()),
            "rank": pa.array([5, 6], pa.int64()),
        }
    )
    got = idx.lookup(mixed)
    assert got.column("url").to_pylist() == ["https://a/y"]
    assert got.column("html").to_pylist() == [b"<p>y</p>"]


@pytest.mark.usefixtures("ray_session")
def test_engine_partitioned_fetch_mode_full_skew(tmp_path):
    # 100 % skew: ONE host owns the whole frontier. The (host, rank % S)
    # sub-split must keep oracle equivalence while bounding task sizes.
    corpus = write_corpus(
        str(tmp_path / "hot"), n_pages=150, n_hosts=1, links_per_page=5
    )
    cdict = corpus_as_dict(
        build_pages_table(n_pages=150, n_hosts=1, links_per_page=5)
    )
    seeds = ["https://h0.example/p0"]
    from spider_ray.pipelines.crawl import crawl, read_store

    res = crawl(
        corpus, seeds, str(tmp_path / "out"), max_depth=3, fetch_mode="partitioned"
    )
    store = read_store(str(tmp_path / "out")).to_pandas()
    oracle = crawl_oracle(cdict, seeds, max_depth=3)
    _assert_matches_oracle(res, store, oracle)


@pytest.mark.usefixtures("ray_session")
def test_corpus_index_rebuilds_on_hash_sentinel_mismatch(corpus_dir):
    """A persisted index whose sentinel doesn't match this process's hash
    implementation must be rebuilt (not trusted by mtime) — otherwise a
    hash-library change would silently miss every lookup."""
    import numpy as np

    import spider_ray.stages.fetch as F

    ref1 = F.load_corpus_ref(corpus_dir)
    import glob
    import os

    idxs = glob.glob(os.path.join(corpus_dir, "_prepared_idx*.npz"))
    assert idxs, "prepared index should have been persisted"
    d = dict(np.load(idxs[0]))
    d["s"] = np.array([123], dtype=np.uint64)  # wrong-implementation marker
    np.savez(idxs[0], **d)
    os.utime(idxs[0])  # keep it mtime-fresh — only the sentinel is off
    F._REF_CACHE.clear()
    ref2 = F.load_corpus_ref(corpus_dir)
    import ray

    tbl, h, o, *_ = ray.get(ref2)
    # rebuilt index resolves a real corpus url
    idx = F._CorpusIndex((tbl, h, o))
    url = tbl.column("url")[0].as_py()
    import pyarrow as pa

    got = idx.lookup(
        pa.table(
            {
                "url": pa.array([url], pa.string()),
                "depth": pa.array([0], pa.int32()),
                "rank": pa.array([0], pa.int64()),
            }
        )
    )
    assert got.num_rows == 1
    # and the npz was re-persisted with the CORRECT sentinel
    d2 = np.load(idxs[0])
    assert d2["s"][0] != np.uint64(123)


@pytest.mark.usefixtures("ray_session")
def test_corpus_index_rejects_runtime_hash_skew(corpus_dir):
    """The broadcast payload carries the builder's sentinel hash; a worker
    whose hash implementation disagrees must fail LOUDLY in __init__
    instead of silently resolving every url as a miss."""
    import numpy as np

    import ray
    import spider_ray.stages.fetch as F

    tbl, h, o, sentinel = ray.get(F.load_corpus_ref(corpus_dir))
    # matching sentinel: constructs fine
    F._CorpusIndex((tbl, h, o, sentinel))
    # skewed sentinel (a different hash implementation): loud failure
    with pytest.raises(RuntimeError, match="hash implementation skew"):
        F._CorpusIndex((tbl, h, o, np.uint64(int(sentinel) ^ 1)))


@pytest.mark.usefixtures("ray_session")
def test_read_store_canonical_order_with_pruned_columns(corpus_dir, tmp_path):
    """canonical_order=True must work with columns= pruning (the sort keys
    are read alongside and dropped after ordering)."""
    from spider_ray.pipelines.crawl import crawl, read_store

    out = str(tmp_path / "o")
    crawl(corpus_dir, SEEDS, out, max_depth=1)
    full = read_store(out, canonical_order=True).to_pandas()
    pruned = read_store(out, canonical_order=True, columns=["url", "title"]).to_pandas()
    assert list(pruned.columns) == ["url", "title"]
    assert pruned["url"].tolist() == full["url"].tolist()

    import pytest as _pytest

    with _pytest.raises(ValueError):
        from spider_ray.pipelines.crawl import crawl as _c

        _c(corpus_dir, [], str(tmp_path / "noseeds"))
