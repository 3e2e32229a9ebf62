"""Per-url store mutations (delete / upsert) and interrupt deferral."""

import signal

import pytest

from spider_ray.corpus import write_corpus


@pytest.fixture(scope="module")
def crawled(tmp_path_factory, ray_session):
    from spider_ray.pipelines.crawl import crawl

    root = tmp_path_factory.mktemp("upsert_delete")
    corpus = write_corpus(str(root / "corpus"), n_pages=80, n_hosts=4)
    out = str(root / "out")
    crawl(corpus, ["https://h0.example/p0", "https://h1.example/p0"], out, max_depth=2)
    return out


@pytest.mark.usefixtures("ray_session")
def test_delete_url(crawled):
    from spider_ray.pipelines.crawl import read_store
    from spider_ray.pipelines.store_ops import delete_url

    out = crawled
    before = read_store(out).to_pandas()
    victim = before["url"].iloc[3]
    assert delete_url(out, victim) is True
    after = read_store(out).to_pandas()
    assert victim not in set(after["url"])
    assert len(after) == len(before) - 1
    # everything else untouched
    assert after.sort_values("discovery_rank")["url"].tolist() == [
        u for u in before.sort_values("discovery_rank")["url"] if u != victim
    ]
    # deleting a missing url is a no-op returning False
    assert delete_url(out, "https://nope.example/x") is False


@pytest.mark.usefixtures("ray_session")
def test_upsert_url_overwrite_semantics(crawled):
    from spider_ray.pipelines.crawl import read_store
    from spider_ray.pipelines.store_ops import upsert_url

    out = crawled
    before = read_store(out).to_pandas()
    target = before["url"].iloc[5]
    old_row = before[before.url == target].iloc[0]

    # overwrite=False: returns the old row, changes nothing
    got = upsert_url(out, target, "NEW TITLE", "new text", overwrite=False)
    assert got is not None and got["title"] == old_row["title"]
    assert read_store(out).to_pandas().pipe(
        lambda d: d[d.url == target]["title"].iloc[0]
    ) == old_row["title"]

    # overwrite=True: replaces title/text in place, keeps rank/depth/parent
    got = upsert_url(out, target, "NEW TITLE", "new text", overwrite=True)
    assert got["title"] == old_row["title"]
    after = read_store(out).to_pandas()
    row = after[after.url == target].iloc[0]
    assert row["title"] == "NEW TITLE" and row["text"] == "new text"
    assert row["discovery_rank"] == old_row["discovery_rank"]
    assert row["depth"] == old_row["depth"]
    assert len(after) == len(before)

    # absent url: inserted with a fresh unique rank, returns None
    assert upsert_url(out, "https://h9.example/newpage", "T", "body") is None
    after2 = read_store(out).to_pandas()
    assert "https://h9.example/newpage" in set(after2["url"])
    assert after2["discovery_rank"].is_unique


def test_defer_sigint_captures_and_replays():
    from spider_ray.pipelines.crawl import _DeferSigint

    with _DeferSigint() as intr:
        signal.raise_signal(signal.SIGINT)  # must NOT raise here
        with pytest.raises(KeyboardInterrupt):
            intr.check()
        intr.check()  # consumed — no re-raise
    # handler restored
    assert signal.getsignal(signal.SIGINT) not in (intr._capture,)

    # an un-checked deferred interrupt surfaces at context exit
    with pytest.raises(KeyboardInterrupt):
        with _DeferSigint():
            signal.raise_signal(signal.SIGINT)
