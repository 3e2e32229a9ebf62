from spider_ray.canonical import host_of
from spider_ray.corpus import build_pages_table, corpus_as_dict
from spider_ray.oracle import crawl_oracle

SEED = ["https://h0.example/p0"]


def _corpus():
    return corpus_as_dict(build_pages_table(n_pages=200, n_hosts=8, links_per_page=5))


def test_depth_zero_only_seed():
    res = crawl_oracle(_corpus(), SEED, max_depth=0)
    assert [r.url for r in res.store] == SEED
    assert res.total_calls == 1 and res.crawled == 1
    assert set(res.seen) == set(SEED)


def test_depth_one_expands_once():
    c = _corpus()
    res = crawl_oracle(c, SEED, max_depth=1)
    depths = {r.url: r.depth for r in res.store}
    assert depths[SEED[0]] == 0
    assert all(d <= 1 for d in depths.values())
    assert res.crawled > 1
    # total_calls counts misses too (dangling links)
    assert res.total_calls >= res.crawled
    # parent column is ALWAYS the start url (quirk q2)
    assert {r.parent for r in res.store} == {SEED[0]}
    # no url with a query string ever claimed (quirk q3)
    assert not any("?" in u for u in res.seen)
    # seed never re-claimed (quirk q4 + cache)
    assert sum(1 for r in res.store if r.url == SEED[0]) == 1


def test_determinism_and_rank_density():
    c = _corpus()
    r1 = crawl_oracle(c, SEED, max_depth=2)
    r2 = crawl_oracle(c, SEED, max_depth=2)
    assert [(s.url, s.discovery_rank) for s in r1.store] == [
        (s.url, s.discovery_rank) for s in r2.store
    ]
    ranks = sorted(d[1] for d in r1.seen.values())
    assert ranks == list(range(len(ranks)))  # dense, no gaps
    # ranks respect depth monotonicity per claim round ordering: seed is rank 0
    assert r1.seen[SEED[0]] == (0, 0)


def test_politeness_budget_preserves_seen_set_and_order():
    c = _corpus()
    free = crawl_oracle(c, SEED, max_depth=2)
    budgeted = crawl_oracle(c, SEED, max_depth=2, per_host_budget=3)
    # quirk q5 contract: budget must not change the final URL-seen set,
    # the store row set, or the canonical order
    assert set(free.seen) == set(budgeted.seen)
    assert {(r.url, r.title, r.text, r.depth) for r in free.store} == {
        (r.url, r.title, r.text, r.depth) for r in budgeted.store
    }
    assert free.canonical_order() == budgeted.canonical_order()
    assert free.total_calls == budgeted.total_calls
    assert len(budgeted.rounds) > len(free.rounds)  # deferral takes more rounds


def test_robots_filters_host():
    c = _corpus()
    res = crawl_oracle(c, SEED, max_depth=2, robots={"h1.example": [""]})
    assert not any(host_of(u) == "h1.example" for u in res.seen)


def test_first_wins_same_round_duplicate():
    # two parents linking the same child in one round: child claimed once,
    # with the rank position of its first (min parent_rank, link_pos) sighting
    corpus = {
        "https://s.example/p0": b'<title>s</title><a href="https://a.example/c1">x</a>'
        b'<a href="https://b.example/c2">y</a>',
        "https://a.example/c1": b'<title>a</title><a href="https://x.example/dup">d</a>',
        "https://b.example/c2": b'<title>b</title><a href="https://x.example/dup">d</a>',
        "https://x.example/dup": b"<title>dup</title>",
    }
    res = crawl_oracle(corpus, ["https://s.example/p0"], max_depth=3)
    assert len(res.store) == 4
    assert sum(1 for r in res.store if r.url.endswith("dup")) == 1
    # dup is claimed in the round where both c1 and c2 expand; rank dense
    assert res.seen["https://x.example/dup"][0] == 2  # depth 2


def test_miss_counted_not_stored():
    corpus = {
        "https://s.example/p0": b'<title>s</title><a href="https://s.example/gone">g</a>',
    }
    res = crawl_oracle(corpus, ["https://s.example/p0"], max_depth=1)
    assert res.total_calls == 2 and res.crawled == 1
    assert "https://s.example/gone" in res.seen  # claimed even though missing
    assert len(res.store) == 1
