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

import pyarrow.parquet as pq

DEFAULT_ROUND_TIME_BUDGET_MS = 60_000


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
