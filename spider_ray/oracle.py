"""Sequential oracle: the single-process reference implementation of the
canonical crawl semantics (SURVEY.md §3.1 + §5.1).

The reference's recursion (crawler.py:92-119) claims each URL at most once per
run at ``load()`` start (use_cache.py:22-24) and creates children's coroutines
in link-document-order (crawler.py:117-119); over a deterministic corpus this
collapses to canonical BFS order. The engine and this oracle both implement
that collapsed spec:

Round r (repeat until no pending URLs):
  1. POLITENESS: per host, up to ``budget`` pending URLs (by ascending
     discovery_rank) are fetched this round; the rest stay pending with their
     original rank/depth (deferral never drops and never re-ranks — quirk q5:
     the reference's semaphore changes nothing semantically, crawler.py:82).
  2. FETCH+PARSE in rank order: corpus lookup; a miss is counted and skipped
     forever (crawler.py:102-104, no retry); a hit emits a store row
     ``(url, title, parent=start_url.human_repr(), text=body, depth, rank)``
     — parent is ALWAYS the start URL (quirk q2, crawler.py:108).
  3. EXPAND: pages with ``depth < max_depth`` yield candidates
     ``(child_url, depth+1, parent_rank, link_pos)`` via the link filter
     (canonical.generate_refs — quirks q1/q3/q4). Depth semantics per
     README.md:10-14 / crawler.py:114-115: depth=0 → seed only.
  4. ADMIT: drop robots-disallowed candidates; sort by
     ``(depth, parent_rank, link_pos)``; first occurrence of each URL wins;
     drop already-seen URLs; claim the rest in order, assigning dense global
     ``discovery_rank`` values.

Counters: ``total_calls`` = fetch attempts (reference crawler.py:98 counts
every cache-missed load, including failures); ``crawled`` = successful
fetches (crawler.py:101).

The oracle is deliberately naive and sequential — it shares only the SPEC
functions (canonical.py, parse.py) with the engine, never its distributed
machinery.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from spider_ray.canonical import (
    canonicalize,
    ensure_scheme,
    generate_refs,
    host_of,
    human_repr,
)
from spider_ray.parse import parse_page


@dataclass
class StoreRow:
    url: str
    title: str | None
    parent: str
    text: str
    depth: int
    discovery_rank: int


@dataclass
class RoundMetrics:
    round: int
    fetched: int
    crawled: int
    misses: int
    claimed: int
    deferred: int


@dataclass
class OracleResult:
    store: list[StoreRow]
    seen: dict[str, tuple[int, int]]  # url -> (depth, discovery_rank)
    rounds: list[RoundMetrics]
    total_calls: int = 0
    crawled: int = 0

    def canonical_order(self) -> list[str]:
        """URLs of stored pages in canonical order (sort by depth, rank)."""
        return [r.url for r in sorted(self.store, key=lambda r: (r.depth, r.discovery_rank))]


@dataclass
class _Pending:
    url: str
    host: str
    depth: int
    rank: int


def robots_allows(url: str, rules: dict[str, list[str]] | None) -> bool:
    """rules: host → list of disallowed path prefixes ('' disallows all)."""
    if not rules:
        return True
    prefixes = rules.get(host_of(url))
    if not prefixes:
        return True
    from urllib.parse import urlsplit

    path = urlsplit(url).path or "/"
    return not any(path.startswith(p) for p in prefixes)


def crawl_oracle(
    corpus: dict[str, bytes],
    seeds: list[str],
    max_depth: int = 1,
    per_host_budget: int | None = None,
    robots: dict[str, list[str]] | None = None,
    use_cache: bool = True,
    host_budgets: dict[str, int] | None = None,
) -> OracleResult:
    """``use_cache=False`` reproduces ``--no-cache`` (use_cache.py:19-28 /
    cli.py:79-83): the claim check is bypassed entirely, so every candidate
    occurrence is admitted, fetched and re-expanded (terminates via the
    depth gate); the store gets one row per occurrence (the reference's
    repeated DB overwrites)."""
    seen: dict[str, tuple[int, int]] = {}
    pending: list[_Pending] = []
    next_rank = 0
    res = OracleResult(store=[], seen=seen, rounds=[])

    start_url = canonicalize(ensure_scheme(seeds[0]))
    parent_value = human_repr(start_url)

    # round-0 admission: the seed list (depth 0, seed-list order)
    seed_candidates = [
        (canonicalize(ensure_scheme(s)), 0, -1, i) for i, s in enumerate(seeds)
    ]
    for url, depth, _pr, _lp in seed_candidates:
        if not robots_allows(url, robots):
            continue
        if use_cache and url in seen:
            continue
        if url not in seen:
            seen[url] = (depth, next_rank)
        pending.append(_Pending(url, host_of(url), depth, next_rank))
        next_rank += 1

    rnd = 0
    while pending:
        # 1. politeness split (per-host override beats the global default;
        # a host with neither is unthrottled)
        if per_host_budget is None and not host_budgets:
            fetch_now, deferred = pending, []
        else:
            overrides = host_budgets or {}
            taken: dict[str, int] = {}
            fetch_now, deferred = [], []
            for p in sorted(pending, key=lambda p: p.rank):
                b = overrides.get(p.host, per_host_budget)
                if b is None or taken.get(p.host, 0) < b:
                    taken[p.host] = taken.get(p.host, 0) + 1
                    fetch_now.append(p)
                else:
                    deferred.append(p)
        fetch_now.sort(key=lambda p: p.rank)

        # 2+3. fetch, parse, store, expand
        candidates: list[tuple[str, int, int, int]] = []
        crawled_this, misses_this = 0, 0
        for p in fetch_now:
            res.total_calls += 1
            html = corpus.get(p.url)
            if html is None:
                misses_this += 1
                continue
            title, body, hrefs = parse_page(html)
            res.crawled += 1
            crawled_this += 1
            res.store.append(
                StoreRow(p.url, title, parent_value, body, p.depth, p.rank)
            )
            if p.depth < max_depth:
                for lp, child in enumerate(generate_refs(hrefs, start_url)):
                    candidates.append((child, p.depth + 1, p.rank, lp))

        # 4. admission
        candidates = [c for c in candidates if robots_allows(c[0], robots)]
        candidates.sort(key=lambda c: (c[1], c[2], c[3]))
        newly: list[_Pending] = []
        for url, depth, _pr, _lp in candidates:
            if use_cache and url in seen:
                continue
            if url not in seen:
                seen[url] = (depth, next_rank)
            newly.append(_Pending(url, host_of(url), depth, next_rank))
            next_rank += 1

        res.rounds.append(
            RoundMetrics(
                round=rnd,
                fetched=len(fetch_now),
                crawled=crawled_this,
                misses=misses_this,
                claimed=len(newly),
                deferred=len(deferred),
            )
        )
        pending = deferred + newly
        rnd += 1

    return res
