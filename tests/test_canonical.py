from spider_ray.canonical import (
    canonicalize,
    ensure_scheme,
    generate_refs,
    has_query,
    host_of,
    human_repr,
    is_absolute,
)


def test_ensure_scheme():
    assert ensure_scheme("h0.example/p0") == "https://h0.example/p0"
    assert ensure_scheme("http://a.b") == "http://a.b"
    assert ensure_scheme("https://a.b") == "https://a.b"
    # reference quirk: startswith('http') — not a real scheme check (crawler.py:51)
    assert ensure_scheme("httpfoo.com") == "httpfoo.com"


def test_canonicalize():
    assert canonicalize("HTTPS://H0.Example/p1") == "https://h0.example/p1"
    assert canonicalize("https://h0.example:443/p1") == "https://h0.example/p1"
    assert canonicalize("http://h0.example:80/p1") == "http://h0.example/p1"
    assert canonicalize("http://h0.example:8080/p1") == "http://h0.example:8080/p1"
    # empty path on absolute URL normalizes to '/' (yarl parity)
    assert canonicalize("https://h0.example") == "https://h0.example/"


def test_host_and_query_and_absolute():
    assert host_of("https://H3.Example:8080/p9") == "h3.example"
    assert has_query("https://a.b/p?x=1")
    assert has_query("p1?x=1")
    assert not has_query("https://a.b/p")
    assert is_absolute("https://a.b/p")
    assert is_absolute("//a.b/p")
    assert not is_absolute("p1")
    assert not is_absolute("/p1")


def test_human_repr_decodes():
    assert human_repr("https://h0.example/a%20b") == "https://h0.example/a b"


def test_generate_refs_quirks():
    start = "https://h0.example/p0"
    hrefs = [
        "https://h1.example/p3",  # kept
        "https://h1.example/p3?q=1",  # q3: query string → dropped
        "p7",  # q1: relative → joined to START url host
        "/p0",  # resolves to start → q4: dropped
        "https://h0.example/p0",  # exactly start → dropped
        "HTTPS://H1.example/p3",  # case-normalizes to dup of first (kept; dedup later)
    ]
    refs = generate_refs(hrefs, start)
    assert refs == [
        "https://h1.example/p3",
        "https://h0.example/p7",
        "https://h1.example/p3",
    ]
