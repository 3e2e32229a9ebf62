"""URL canonicalization spec.

Pure-stdlib replacement for the reference's yarl usage. The reference relies on
yarl for: https-prefixing of schemeless seeds (crawler.py:51-53), URL equality
(use_cache.py:22-24 — cache keyed by URL objects), ``human_repr()`` for the
``parent`` column (crawler.py:108), query-string detection / absoluteness /
relative join in link generation (crawler.py:140-154).

This module defines the engine's single canonical URL form, shared verbatim by
the distributed engine AND the sequential oracle — the spec, not yarl, is the
source of truth (SURVEY.md §7 hard-part 2).

Canonical form: lower-case scheme and host, default port stripped, path kept
verbatim except an empty path on an absolute URL becomes ``/`` only for
EQUALITY purposes (yarl parses ``https://h`` with path ``/``); fragments kept.
The synthetic corpus only emits clean ASCII URLs, so percent-encoding
normalization is a no-op by construction.

All functions are deterministic pure functions; batch variants operate on
Python lists (URL parsing is irreducibly per-string — the lists come from
Arrow columns inside ``map_batches`` and go straight back to Arrow).
"""

from __future__ import annotations

import re
from urllib.parse import unquote, urljoin, urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": "80", "https": "443"}

# Fast path: a URL matching this is ALREADY in canonical form (lower-case
# http(s) scheme and host, no port, non-empty path, no query, no fragment) —
# canonicalize() is the identity on it, has_query() is False, is_absolute()
# is True. The slow urllib path below is the spec; this is a pure
# short-circuit for the overwhelmingly common shape of crawl-discovered
# links (urlsplit+urlunsplit cost ~10µs/URL — the hot-path cost at 10^10
# URLs).
_CANONICAL_RE = re.compile(r"^https?://[a-z0-9](?:[a-z0-9.-]*[a-z0-9])?/[^?#]*$")
_HOST_FAST_RE = re.compile(r"^[a-z0-9+.-]+://([^/?#]+)")


def ensure_scheme(url: str) -> str:
    """Prepend ``https://`` to schemeless seed URLs (reference crawler.py:51-52).

    The reference checks ``startswith('http')`` — reproduced exactly, including
    the quirk that e.g. ``httpfoo.com`` is treated as already having a scheme.
    """
    if not url.startswith("http"):
        return f"https://{url}"
    return url


def canonicalize(url: str) -> str:
    """Canonical string form used for the seen-set key, frontier rows and store.

    Mirrors yarl's normalization relevant to the reference's behavior: scheme
    and host lower-cased, default port dropped, empty path on an absolute URL
    normalized to ``/`` (yarl's parsing does this implicitly).
    """
    if _CANONICAL_RE.match(url):
        return url
    s = urlsplit(url)
    scheme = s.scheme.lower()
    host = s.hostname.lower() if s.hostname else ""
    port = s.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    path = s.path or ("/" if netloc else "")
    return urlunsplit((scheme, netloc, path, s.query, s.fragment))


def host_of(url: str) -> str:
    """Canonical host (lower-cased, no port) — the partitioning key for
    politeness / skew handling (SURVEY.md §4 'Partitioning / skew')."""
    if _CANONICAL_RE.match(url):
        return _HOST_FAST_RE.match(url).group(1)
    h = urlsplit(url).hostname
    return h.lower() if h else ""


def human_repr(url: str) -> str:
    """Percent-decoded human-readable form (reference crawler.py:108 uses
    ``yarl.URL.human_repr()`` as the ``parent`` value and the ``catch`` lookup
    key, db_ops_controller.py:59)."""
    s = urlsplit(url)
    return urlunsplit(
        (s.scheme, s.netloc, unquote(s.path), unquote(s.query), unquote(s.fragment))
    )


def has_query(href: str) -> bool:
    """True when the href carries a query string — such links are dropped
    (reference crawler.py:148-149, quirk q3)."""
    return urlsplit(href).query != ""


def is_absolute(href: str) -> bool:
    """yarl semantics: absolute ⇔ the URL has a host (crawler.py:150)."""
    return bool(urlsplit(href).netloc)


def generate_refs(hrefs: list[str], start_url: str) -> list[str]:
    """The reference's link filter+join (crawler.py:140-154), quirks included:

    - hrefs with a query string are skipped (q3, crawler.py:148-149);
    - relative hrefs are joined against the START url — not the current page
      (q1, crawler.py:151);
    - a ref equal to the start url is skipped (q4, crawler.py:152);
    - hrefs arrive already filtered for presence (the ``KeyError: href``
      skip, crawler.py:154, happens at extraction — parse.extract()).

    ``start_url`` must already be canonical. Returns canonical child URLs in
    document order (duplicates within one page preserved, as the reference
    would schedule duplicate coroutines and dedupe via the cache).
    """
    out: list[str] = []
    start_c = canonicalize(start_url)
    for href in hrefs:
        if _CANONICAL_RE.match(href):  # already-canonical absolute link
            if href != start_c:
                out.append(href)
            continue
        if has_query(href):
            continue
        if not is_absolute(href):
            joined = urljoin(start_url, href)
        else:
            joined = href
        c = canonicalize(joined)
        if c != start_c:
            out.append(c)
    return out
