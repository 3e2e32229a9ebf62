"""Per-host politeness: round-scoped fetch budgets with deferral.

The reference's ``--concur`` semaphore never actually limits anything (quirk
q5, crawler.py:82) — the engine implements the INTENDED semantics (a per-host
fetch budget per round) under the hard contract that politeness must not
change the final URL-seen set, the store row set, or the canonical order
(SURVEY.md §3.1). That holds because claims happen at frontier-admission
time, before any deferral, and deferred rows keep their original
``(depth, rank)`` — deferral delays fetch, never re-ranks and never drops
(SURVEY.md §7 hard-part 4).

Physical shape: the frontier is grouped by canonical host (this is THE
partitioning key of the crawl — politeness and hot-host skew both localize
on it, SURVEY.md §4) and each host group keeps its ``budget`` smallest ranks
for this round. The hot host's group is one task; its rows are frontier
metadata (url + ints), so even a 50%-skewed frontier group is small.
"""

from __future__ import annotations

import pandas as pd
from ray.data import Dataset


def politeness_split(
    pending: Dataset,
    per_host_budget: int | None,
    host_budgets: dict[str, int] | None = None,
) -> tuple[Dataset, Dataset]:
    """→ (fetch_now, deferred). With no budget at all, everything fetches
    now. ``host_budgets`` (e.g. derived from robots crawl_delay_ms —
    spider_ray.robots) overrides the global default per host; a host with
    neither budget is unthrottled."""
    if per_host_budget is None and not host_budgets:
        return pending, None

    budget = per_host_budget
    overrides = host_budgets or {}

    def flag_group(g: pd.DataFrame) -> pd.DataFrame:
        b = overrides.get(g["host"].iloc[0], budget)
        g = g.sort_values("rank")
        g = g.assign(_fetch_now=True)
        if b is not None:
            g.iloc[min(b, len(g)) :, g.columns.get_loc("_fetch_now")] = False
        return g

    flagged = pending.groupby("host").map_groups(flag_group, batch_format="pandas")
    flagged = flagged.materialize()  # frontier metadata only — small
    fetch_now = flagged.filter(expr="_fetch_now == True").drop_columns(["_fetch_now"])
    deferred = flagged.filter(expr="_fetch_now == False").drop_columns(["_fetch_now"])
    return fetch_now, deferred
