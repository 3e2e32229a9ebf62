import numpy as np
import pandas as pd
import pytest

from spider_ray.config import (
    ConfigController,
    IncorrectProxyFormatError,
    validate_proxy,
)
from spider_ray.sinks import get_sink, sink_choices


def test_config_create_if_missing(tmp_path):
    c = ConfigController(base_dir=str(tmp_path))
    assert (tmp_path / "config.ini").exists()
    assert c.is_config_section_empty("DATABASE")
    c.set_config("DATABASE", "username", "u")
    c2 = ConfigController(base_dir=str(tmp_path))
    assert c2.get_db_config("username") == "u"
    assert not c2.is_config_section_empty("DATABASE")


def test_config_update_routes_sections(tmp_path):
    c = ConfigController(base_dir=str(tmp_path))
    c.update({"type": "parquet", "proxy_host": "http://p:8080", "password": None})
    assert c.get_db_config("type") == "parquet"
    assert c.get_infrastructure_config("proxy_host") == "http://p:8080"
    assert c.get_db_config("password") is None


def test_validate_proxy():
    assert validate_proxy(None) is None
    assert validate_proxy("http://proxy.local:3128") == "http://proxy.local:3128"
    for bad in ["not-a-url", "ftp://x", "http://", ""]:
        with pytest.raises(IncorrectProxyFormatError):
            validate_proxy(bad)


@pytest.mark.usefixtures("ray_session")
def test_crawl_rejects_bad_proxy(tmp_path):
    from spider_ray.corpus import write_corpus
    from spider_ray.pipelines.crawl import crawl

    corpus = write_corpus(str(tmp_path / "c"), n_pages=20, n_hosts=2)
    with pytest.raises(IncorrectProxyFormatError):
        crawl(corpus, ["https://h0.example/p0"], str(tmp_path / "o"), proxy="bogus")


@pytest.mark.usefixtures("ray_session")
def test_sink_registry_roundtrip_and_fallback(tmp_path):
    import ray

    df = pd.DataFrame({"a": np.arange(5), "b": list("abcde")})
    ds = ray.data.from_pandas(df)
    assert set(sink_choices()) >= {"parquet", "csv", "json"}
    for name in ["parquet", "csv"]:
        sink = get_sink(name)
        path = str(tmp_path / name)
        sink.write(ds, path)
        back = sink.read(path).to_pandas().sort_values("a").reset_index(drop=True)
        assert back["b"].tolist() == list("abcde")
    # unknown sink name falls back to the default (reference: unknown
    # --db-type → Postgres, manager.py:25-31)
    assert type(get_sink("not-a-sink")).__name__ == type(get_sink(None)).__name__


@pytest.mark.usefixtures("ray_session")
def test_no_cache_mode_matches_oracle(tmp_path):
    from spider_ray.corpus import build_pages_table, corpus_as_dict, write_corpus
    from spider_ray.oracle import crawl_oracle
    from spider_ray.pipelines.crawl import crawl, read_store

    corpus = write_corpus(str(tmp_path / "c"), n_pages=60, n_hosts=4)
    cd = corpus_as_dict(build_pages_table(n_pages=60, n_hosts=4))
    seeds = ["https://h0.example/p0"]
    res = crawl(corpus, seeds, str(tmp_path / "o"), max_depth=2, use_cache=False)
    oracle = crawl_oracle(cd, seeds, max_depth=2, use_cache=False)
    store = read_store(str(tmp_path / "o"), canonical_order=True).to_pandas()
    # every occurrence fetched: multiset of (url, depth, rank) matches
    assert [(r.url, r.depth, r.discovery_rank) for r in store.itertuples()] == [
        (s.url, s.depth, s.discovery_rank)
        for s in sorted(oracle.store, key=lambda s: (s.depth, s.discovery_rank))
    ]
    assert res.total_calls == oracle.total_calls
    # duplicates really happen without the cache
    assert store["url"].duplicated().any()


def test_mongo_sink_is_registered_stub():
    """4th DAO parity: the reference's Mongo backend is itself a stub
    (mongodb_database.py:56-113) — selectable, not usable."""
    import pytest as _pytest

    from spider_ray.sinks import get_sink, sink_choices

    assert "mongo" in sink_choices()
    s = get_sink("mongo")
    with _pytest.raises(NotImplementedError):
        s.write(None, "/tmp/nope")
    with _pytest.raises(NotImplementedError):
        s.read("/tmp/nope")
