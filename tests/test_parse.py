from spider_ray.parse import extract, parse_page


def test_title_basic():
    t, _ = extract("<html><head><title>Hello World</title></head><body></body></html>")
    assert t == "Hello World"


def test_title_cleanup_newlines_and_strip():
    # reference crawler.py:165-168: '\n' removed, then strip
    t, _ = extract("<title>\n  A\nB  \n</title>")
    assert t == "AB"  # '\n' removed joins the fragments, then strip
    t2, _ = extract("<title>\n  AB  \n</title>")
    assert t2 == "AB"
    t3, _ = extract("<title>  A \n B </title>")
    assert t3 == "A  B"  # newline removed (not replaced by space), then strip


def test_title_missing_is_none_and_empty_stays_empty():
    t, _ = extract("<html><body>x</body></html>")
    assert t is None
    t2, _ = extract("<title></title>")
    assert t2 == ""


def test_first_title_wins():
    t, _ = extract("<title>first</title><title>second</title>")
    assert t == "first"


def test_entities_unescaped():
    t, _ = extract("<title>A &amp; B</title>")
    assert t == "A & B"


def test_hrefs_in_order_and_skip_missing():
    _, hrefs = extract(
        '<a href="x">1</a><a>no</a><a href="">empty</a><a href="y">2</a><a href>bare</a>'
    )
    assert hrefs == ["x", "", "y", ""]


def test_parse_page_body_verbatim():
    html = "<html><head><title>T</title></head><body>Bé</body></html>".encode()
    title, body, hrefs = parse_page(html)
    assert title == "T"
    assert body == html.decode("utf-8")
    assert hrefs == []
