"""Property-based tests (hypothesis) over the spec functions — the pieces
whose exactness everything else leans on."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from spider_ray.canonical import canonicalize, generate_refs, host_of
from spider_ray.parse import extract
from spider_ray.stages import claim
from spider_ray.state.seen import BloomSeen, shard_of

host_st = st.from_regex(r"[a-z0-9]([a-z0-9-]{0,10}[a-z0-9])?(\.[a-z0-9]{1,8}){1,2}", fullmatch=True)
path_st = st.from_regex(r"(/[A-Za-z0-9._~-]{0,12}){0,4}", fullmatch=True)


@given(
    scheme=st.sampled_from(["http", "https", "HTTP", "Https"]),
    host=host_st,
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    path=path_st,
    query=st.sampled_from(["", "?a=1"]),
)
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent(scheme, host, port, path, query):
    url = f"{scheme}://{host}{port}{path}{query}"
    c = canonicalize(url)
    # idempotence also pins the regex fast path to the urllib slow path:
    # whatever the slow path emits, the fast path must return unchanged
    assert canonicalize(c) == c
    assert host_of(c) == host_of(url)


@given(host=host_st, path=path_st)
@settings(max_examples=100, deadline=None)
def test_fast_path_equals_slow_path(host, path):
    # construct an already-canonical URL; canonicalize must be identity
    url = f"https://{host}{path or '/'}"
    assert canonicalize(url) == url


@given(
    depth=st.integers(0, claim.MAX_DEPTH),
    rank=st.integers(0, claim.MAX_RANK),
    pos=st.integers(0, claim.MAX_POS),
)
@settings(max_examples=300, deadline=None)
def test_claim_key_roundtrip_and_order(depth, rank, pos):
    import numpy as np

    k = claim.encode(depth, rank, pos)
    ks = np.array([k], dtype=np.int64)
    assert claim.decode_depth(ks)[0] == depth
    assert claim.decode_parent_rank(ks)[0] == rank
    assert claim.decode_link_pos(ks)[0] == pos
    assert k >= 0  # sign bit clear → int64 order == priority order


@given(
    a=st.tuples(st.integers(0, 50), st.integers(0, 1 << 30), st.integers(0, 100)),
    b=st.tuples(st.integers(0, 50), st.integers(0, 1 << 30), st.integers(0, 100)),
)
@settings(max_examples=300, deadline=None)
def test_claim_key_lexicographic(a, b):
    assert (claim.encode(*a) < claim.encode(*b)) == (a < b)


@given(st.lists(st.text(min_size=1, max_size=40), min_size=1, max_size=200, unique=True))
@settings(max_examples=50, deadline=None)
def test_bloom_never_false_negative(urls):
    bloom = BloomSeen(bits=1 << 12, n_hashes=5)
    for u in urls:
        bloom.add(u)
    assert all(u in bloom for u in urls)


@given(st.text(max_size=60), st.integers(1, 32))
@settings(max_examples=200, deadline=None)
def test_shard_routing_in_range(url, k):
    assert 0 <= shard_of(url, k) < k


@given(st.text(max_size=500))
@settings(max_examples=200, deadline=None)
def test_extract_total_on_arbitrary_text(html):
    # the parser must be total: never raises, title is None/str, hrefs strs
    title, hrefs = extract(html)
    assert title is None or isinstance(title, str)
    assert all(isinstance(h, str) for h in hrefs)


@given(st.lists(st.text(alphabet=string.printable, max_size=40), max_size=20))
@settings(max_examples=100, deadline=None)
def test_generate_refs_total_and_canonical(hrefs):
    start = "https://start.example/p0"
    refs = generate_refs(hrefs, start)
    for r in refs:
        assert r != start
        assert canonicalize(r) == r  # outputs are always canonical
