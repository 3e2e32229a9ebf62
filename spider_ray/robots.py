"""Robots rules as a table (engine addition per the north rule).

The reference has no robots handling; the engine's politeness layer consumes
a rules TABLE (FIXTURES.md §3: ``host, disallow_prefix, crawl_delay_ms``)
that in production would be refreshed by its own fetch pipeline. The table
is small per-host metadata — broadcast once into the parse/expand stage's
closure (see stages/expand.py) rather than joined.

``crawl_delay_ms`` maps onto the engine's round-scoped politeness budget:
budget_per_round(host) = max(1, round_time_budget_ms // crawl_delay_ms) —
i.e. how many polite fetches fit in one round's nominal wall budget. Hosts
without a delay use the global default budget.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

DEFAULT_ROUND_TIME_BUDGET_MS = 60_000

# one anchored regex splits a URL into authority + path (query/fragment
# excluded by [^?#]); host/port/userinfo discrimination happens on the
# authority afterwards
_AUTH_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?P<auth>[^/?#]*)(?P<path>[^?#]*)"
# rows whose parse could differ from urlsplit's take the per-row fallback:
# userinfo/port/IPv6 in the authority, embedded tab/CR/LF (urlsplit strips
# them anywhere), or leading/trailing whitespace (urlsplit strips it)
_ODD_AUTH_RE = r"[@:]"
_ODD_URL_RE = r"^\s|\s$|[\t\n\r]"


def robots_keep_mask(urls, rules: dict[str, list[str]] | None) -> np.ndarray:
    """Vectorized robots gate: ``keep[i] ⇔ oracle.robots_allows(urls[i],
    rules)`` — pinned equal by tests/test_politeness.py on randomized rules.

    The oracle's ``robots_allows`` stays the SPEC (one rule implementation,
    so engine and spec cannot drift); this is its batch form: one
    ``extract_regex`` pass splits authority/path for the whole batch, then
    one ``pc.starts_with`` per (host-in-batch ∩ rules, prefix) — no Python
    per row. Rows the regex cannot parse exactly like ``urlsplit`` (no
    scheme, userinfo/port/IPv6 authority, embedded control whitespace) fall
    back to ``robots_allows`` per row — rare by construction: crawl
    candidates are canonicalized (lower-case host, default port stripped,
    control chars stripped by urlsplit inside ``canonicalize``)."""
    if not isinstance(urls, (pa.Array, pa.ChunkedArray)):
        urls = pa.array(list(urls), pa.string())
    n = len(urls)
    keep = np.ones(n, dtype=bool)
    if not rules or n == 0:
        return keep
    m = pc.extract_regex(urls, _AUTH_PATH_RE)
    auth = pc.fill_null(pc.struct_field(m, "auth"), "")
    path = pc.fill_null(pc.struct_field(m, "path"), "")
    valid = pc.is_valid(m).to_numpy(zero_copy_only=False).astype(bool)
    odd = (
        pc.match_substring_regex(auth, _ODD_AUTH_RE).to_numpy(zero_copy_only=False)
        | pc.match_substring_regex(urls, _ODD_URL_RE).to_numpy(zero_copy_only=False)
    ).astype(bool)
    fast = valid & ~odd
    hosts_np = pc.utf8_lower(auth).to_numpy(zero_copy_only=False)
    paths_np = path.to_numpy(zero_copy_only=False)
    # loop over the (few) distinct rule-hosts present in THIS batch — never
    # over the rule table (10^8 rule hosts must not cost 10^8 batch passes)
    batch_hosts = np.unique(hosts_np[fast]) if fast.any() else ()
    for h in batch_hosts:
        prefixes = rules.get(h)
        if not prefixes:
            continue
        idx = np.flatnonzero(fast & (hosts_np == h))
        sp = paths_np[idx].copy()
        sp[sp == ""] = "/"  # urlsplit(url).path or "/" — the oracle's form
        sp_arr = pa.array(sp, pa.string())
        disallow = np.zeros(len(idx), dtype=bool)
        for p in prefixes:
            if p == "":  # '' disallows everything on the host
                disallow[:] = True
                break
            disallow |= (
                pc.starts_with(sp_arr, p).to_numpy(zero_copy_only=False).astype(bool)
            )
        keep[idx[disallow]] = False
    if not fast.all():
        from spider_ray.oracle import robots_allows

        for i in np.flatnonzero(~fast):
            keep[i] = robots_allows(urls[i].as_py(), rules)
    return keep


def load_robots_table(
    path: str, round_time_budget_ms: int = DEFAULT_ROUND_TIME_BUDGET_MS
) -> tuple[dict[str, list[str]], dict[str, int]]:
    """→ (rules: host → disallowed path prefixes, budgets: host → per-round
    fetch budget derived from crawl_delay_ms)."""
    tbl = pq.read_table(path)
    rules: dict[str, list[str]] = {}
    budgets: dict[str, int] = {}
    cols = set(tbl.column_names)
    hosts = tbl.column("host").to_pylist()
    prefixes = (
        tbl.column("disallow_prefix").to_pylist()
        if "disallow_prefix" in cols
        else [None] * len(hosts)
    )
    delays = (
        tbl.column("crawl_delay_ms").to_pylist()
        if "crawl_delay_ms" in cols
        else [None] * len(hosts)
    )
    for host, prefix, delay in zip(hosts, prefixes, delays):
        if prefix is not None:
            rules.setdefault(host, []).append(prefix)
        if delay:
            budgets[host] = max(1, round_time_budget_ms // int(delay))
    return rules, budgets


def write_robots_table(
    path: str,
    rules: dict[str, list[str]] | None = None,
    delays_ms: dict[str, int] | None = None,
) -> str:
    import pyarrow as pa

    rows = []
    for host, prefixes in (rules or {}).items():
        for p in prefixes:
            rows.append(
                {"host": host, "disallow_prefix": p, "crawl_delay_ms": None}
            )
    for host, d in (delays_ms or {}).items():
        rows.append({"host": host, "disallow_prefix": None, "crawl_delay_ms": d})
    tbl = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("host", pa.string()),
                ("disallow_prefix", pa.string()),
                ("crawl_delay_ms", pa.int32()),
            ]
        ),
    )
    pq.write_table(tbl, path)
    return path
