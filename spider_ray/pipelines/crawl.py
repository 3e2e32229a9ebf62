"""The flagship pipeline: a Ray-Data-native BFS crawl over a pages corpus.

Distributed implementation of the canonical crawl semantics defined by the
sequential oracle (spider_ray.oracle — SURVEY.md §3.1); the reference
recursion (crawler.py:92-119) becomes a driver loop over BFS rounds where
each round is one streaming Dataset pipeline:

  pending frontier (materialized; url, host, depth, rank)
    → politeness_split                      [per-host budgets, deferral]
    → ONE streaming execution:              [dedup_mode="actor", default]
        fetch (broadcast index | partitioned read | hash join)
        → parse + store-part write + robots gate
        → dedup+claim OFFER to seen shards  [all-to-all = url-hash routing]
    → HARVEST winners per shard → sort(claim_key) + dense rank
      (small rounds: driver sort + PARALLEL per-slice decode tasks whose
      output slices double as the next round's pre-split input blocks AND
      the checkpoint payload; large rounds: distributed sort+rank)
    → union with deferred → next pending

(dedup_mode="groupby" keeps the equivalent Dataset-native pipeline:
candidates as rows → groupby(url).min(claim_key) → seen-shard filter →
sort+rank — same semantics, tested equal; the actor path exists because the
string-key groupby shuffle measured ~6× slower at 10^6 candidates/round.)

Scale notes (the 100 TB / 10^10-URL design point):
- Only frontier METADATA (url + 3 ints) is ever materialized or shuffled;
  page bodies stream through fetch→parse→parquet inside one pass and are
  never held beyond a batch.
- All per-round data movement is frontier-sized, never corpus-sized.
- The seen state is K hash-partitioned actors (exact or bloom); its lineage
  is the seeds file + the union of per-round frontier checkpoints (every
  claimed url is pending at the end of its claim round), replayed on resume.
- Rounds promote atomically (write to ``rounds/.rXXXX.tmp``, rename; the
  checkpoint writer thread is serialized so promotion order is strict), so
  a killed job resumes from the last complete round and reproduces the
  byte-identical final store (tested in tests/test_resume.py).
"""

from __future__ import annotations

import glob
import logging
import os
import shutil
import signal
import threading
import time
from dataclasses import dataclass, field, replace

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
from ray.data import Dataset
from ray.data.aggregate import Min

from spider_ray.canonical import canonicalize, ensure_scheme, host_of, human_repr
from spider_ray.oracle import robots_allows
from spider_ray.stages import claim
from spider_ray.stages.expand import (
    add_host_column,
    make_parse_store_expand,
    make_robots_filter,
)
from spider_ray.stages.fetch import fetch_indexed, fetch_join, load_corpus_ref
from spider_ray.stages.politeness import politeness_split
from spider_ray.stages.rank import assign_ranks
from spider_ray.state.seen import UrlSeenShard, iter_shard_groups, route_sentinel

# the reference's logging surface (spider/controllers/core/loggers —
# ``crawl_info`` lines consumed by its log-based tests): one structured
# info line per round + a completion line, on a dedicated logger users can
# route or silence independently of ray.data's loggers
LOG = logging.getLogger("spider_ray.crawl")

FRONTIER_COLS = ["url", "host", "depth", "rank"]
FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("rank", pa.int64()),
    ]
)


# checkpoints up to this many rows are written by the driver-side writer
# thread (zero extra Dataset executions, overlapped with the next round);
# larger ones stream via write_parquet
_SMALL_CHECKPOINT_ROWS = 8_000_000
# rounds with at most this many candidates rank on the driver — frontier
# rows are ~100 B of metadata, so even 8M rows is ~800 MB moved once and a
# sub-second driver sort (decode runs as parallel slice tasks), cheaper
# than a distributed sort execution; beyond that the distributed sort+rank
# path takes over
_SMALL_ROUND_ROWS = 8_000_000


@dataclass
class CrawlConfig:
    max_depth: int = 1
    per_host_budget: int | None = None
    # robots: a rules dict (host → disallowed path prefixes) or the path of
    # a robots parquet table (host, disallow_prefix, crawl_delay_ms) —
    # crawl_delay_ms rows become per-host politeness budgets
    robots: dict[str, list[str]] | str | None = None
    host_budgets: dict[str, int] | None = None
    seen_shards: int = 8
    seen_mode: str = "exact"  # "exact" | "bloom"
    dedup_mode: str = "actor"  # "actor" (offer/harvest on shards) | "groupby"
    use_cache: bool = True  # False = reference --no-cache: no claims at all
    bloom_bits: int = 1 << 24
    fetch_mode: str = "indexed"  # "indexed" (broadcast corpus, cached task fn)
    # | "indexed_actors" (same, actor pool) | "join" (hash join vs corpus)
    fetch_concurrency: int = 4
    fetch_batch_size: int = 1024
    # parse batches bound BOTH per-batch memory (html + parsed text) AND the
    # dedup-offer granularity: each batch locally min-key-dedups its
    # candidates then blocks once on its shard offers, so bigger batches
    # mean fewer actor round-trips AND a better local dedup rate (links of
    # neighboring pages overlap heavily) — 2048 pages ≈ 8-16 MB per batch
    parse_batch_size: int = 2048
    join_partitions: int = 8
    prewarm: bool = False  # pre-build the corpus index in every worker
    # rows under these thresholds are ranked / checkpointed on the driver
    # (cheap metadata moves); above them the distributed sort+rank and
    # streaming write_parquet paths take over (see module constants)
    small_round_rows: int = _SMALL_ROUND_ROWS
    small_checkpoint_rows: int = _SMALL_CHECKPOINT_ROWS
    max_rounds: int | None = None  # stop after N rounds this call (resume later)
    proxy: str | None = None  # validated eagerly (S2); a no-op in corpus mode
    # opt-in: gather per-shard seen-state stats (items, structure bytes,
    # actor RSS) at crawl end — an O(seen) pass per shard, so OFF by default
    # to keep benched crawls pure
    collect_shard_stats: bool = False


@dataclass
class CrawlResult:
    out_dir: str
    rounds: list[dict] = field(default_factory=list)
    total_calls: int = 0
    crawled: int = 0
    seen_count: int = 0
    finished: bool = True
    shard_stats: list[dict] = field(default_factory=list)

    @property
    def store_path(self) -> str:
        return os.path.join(self.out_dir, "store")


def _store_round_dir(out_dir: str, r: int) -> str:
    return os.path.join(out_dir, "store", f"r{r:04d}")


def _round_dir(out_dir: str, r: int) -> str:
    return os.path.join(out_dir, "rounds", f"r{r:04d}")


def _store_rows_count(store_dir: str) -> int:
    return sum(
        pq.read_metadata(p).num_rows
        for p in glob.glob(os.path.join(store_dir, "*.parquet"))
    )


def make_seen_filter(shards: list, round_id: int, n_shards: int):
    """map_batches UDF: keep rows whose url is newly claimed by its shard.
    Routing is one vectorized hash pass per batch (``iter_shard_groups``);
    the driver's route sentinel rides the closure so a hash-skewed worker
    fails loudly instead of mis-routing (see state/seen.py)."""
    sentinel = route_sentinel()

    def seen_filter(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        urls = batch.column("url").to_numpy(zero_copy_only=False)
        keep = np.zeros(len(urls), dtype=bool)
        futs, idxs = [], []
        for s, rows in iter_shard_groups(urls, n_shards, sentinel):
            futs.append(shards[s].check_and_add.remote(round_id, urls[rows].tolist()))
            idxs.append(rows)
        for rows, mask in zip(idxs, ray.get(futs)):
            keep[rows] = mask
        return batch.filter(pa.array(keep))

    return seen_filter


def _decode_candidates(batch: pa.Table) -> pa.Table:
    keys = batch.column("claim_key").to_numpy()
    depth = pa.array(claim.decode_depth(keys), pa.int32())
    out = batch.append_column("depth", depth)
    out = add_host_column(out)
    return out.select(FRONTIER_COLS)


def _compact(t: pa.Table) -> pa.Table:
    """Fresh buffers sized to the table. A SLICED Arrow column pickles its
    FULL parent buffers (measured on pyarrow 16: a 1000-row slice of a
    1M-row table serializes 38.7 MB; compacted, 37 KB) and
    ``combine_chunks`` does NOT compact a single sliced chunk —
    ``concat_arrays`` does. Apply before returning any slice-derived table
    from a Ray task."""
    if t.num_rows == 0:
        return t
    return pa.Table.from_arrays(
        [pa.concat_arrays(list(c.chunks)) for c in t.columns], schema=t.schema
    )


@ray.remote
def _decode_block_task(tbl: pa.Table, offset: int, length: int) -> pa.Table:
    """Per-slice candidate decode (depth bits + host regex) as a parallel
    task — the host extraction costs ~0.6 s/M rows, serial driver time the
    refill path cannot afford on multi-million-claim rounds. The ranked
    table arrives as ONE ``ray.put`` ref (every task reads it zero-copy
    from plasma — shipping ``tbl.slice(...)`` per task would serialize the
    FULL parent buffers once per slice, ~nblocks× the frontier size), and
    the output is compacted so the returned slice doesn't re-ship them."""
    return _compact(_decode_candidates(tbl.slice(offset, length)))


def _seed_frontier(
    seeds: list[str],
    shards: list,
    n_shards: int,
    robots: dict | None,
    use_cache: bool = True,
) -> tuple[pa.Table, str]:
    """Driver-side round-0 admission: canonical seed list, robots-gated,
    claimed in order (dense ranks from 0). Returns (frontier, start_url)."""
    start_url = canonicalize(ensure_scheme(seeds[0]))
    ordered: list[str] = []
    seen_local: set[str] = set()
    for s in seeds:
        c = canonicalize(ensure_scheme(s))
        if (use_cache and c in seen_local) or not robots_allows(c, robots):
            continue
        seen_local.add(c)
        ordered.append(c)
    # claim on the shards (round_id 0) — keeps shard state authoritative
    seed_arr = np.asarray(ordered, dtype=object)
    ray.get(
        [
            shards[s].check_and_add.remote(0, seed_arr[rows].tolist())
            for s, rows in iter_shard_groups(seed_arr, n_shards)
        ]
    )
    tbl = pa.Table.from_arrays(
        [
            pa.array(ordered, pa.string()),
            pa.array([host_of(u) for u in ordered], pa.string()),
            pa.array(np.zeros(len(ordered), dtype=np.int32)),
            pa.array(np.arange(len(ordered), dtype=np.int64)),
        ],
        schema=FRONTIER_SCHEMA,
    )
    return tbl, start_url




def _target_blocks(n_rows: int, cpus: int, batch_size: int) -> int:
    """Block count for a round's frontier: enough blocks that every CPU has
    work, capped so blocks never get degenerate."""
    desired = max(
        -(-n_rows // batch_size),  # ceil
        min(cpus, -(-n_rows // 64)),
    )
    return max(1, min(desired, 4 * cpus))


def _collect_tables(ds: Dataset) -> pa.Table | None:
    tbls = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not tbls:
        return None
    return pa.concat_tables(tbls)


def _checkpoint_round(
    out_dir: str,
    r: int,
    pending_tbls: list[pa.Table],
    n_pending: int,
    pending_big: Dataset | None,
    seed_tbl: pa.Table | None,
    metrics: list[dict],
    pending_refs: list | None = None,
) -> None:
    """Write round r's checkpoint and atomically promote it.

    The URL-seen lineage needs NO separate claims files: every claimed url
    sits in the pending frontier at the end of its claim round (it is only
    removed by being fetched in a LATER round), so the union of all rounds'
    frontier files + the seed list reproduces the full seen set on resume.
    Seeds are the one exception (fetched in round 0, never pending at a
    checkpoint) and get their own tiny file."""
    tmp = os.path.join(out_dir, "rounds", f".r{r:04d}.tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(os.path.join(tmp, "frontier"), exist_ok=True)

    if n_pending == 0:
        pq.write_table(
            FRONTIER_SCHEMA.empty_table(), os.path.join(tmp, "frontier", "empty.parquet")
        )
    elif pending_refs is not None:
        # decoded frontier slices are already in the object store — collect
        # them HERE, on the writer thread, overlapped with the next round
        pq.write_table(
            pa.concat_tables(ray.get(list(pending_refs))).select(FRONTIER_SCHEMA.names),
            os.path.join(tmp, "frontier", "data.parquet"),
        )
    elif pending_big is not None:
        pending_big.write_parquet(os.path.join(tmp, "frontier"))
    else:
        pq.write_table(
            pa.concat_tables(pending_tbls).select(FRONTIER_SCHEMA.names),
            os.path.join(tmp, "frontier", "data.parquet"),
        )

    if seed_tbl is not None and seed_tbl.num_rows:
        pq.write_table(seed_tbl.select(["url"]), os.path.join(tmp, "seeds.parquet"))

    pq.write_table(pa.Table.from_pylist(metrics), os.path.join(tmp, "metrics.parquet"))
    final = _round_dir(out_dir, r)
    shutil.rmtree(final, ignore_errors=True)
    os.replace(tmp, final)


class _DeferSigint:
    """Defer Ctrl-C to round boundaries (reference
    delayed_kb_interrupt.py:9-28): a SIGINT arriving mid-round is recorded
    and re-raised as KeyboardInterrupt AFTER the in-flight round body and
    checkpoint submission complete, so round atomicity (and therefore
    resume exactness) survives an interactive interrupt. No-op outside the
    main thread (signal handlers can only be installed there)."""

    def __enter__(self):
        self._pending = None
        try:
            self._old = signal.signal(signal.SIGINT, self._capture)
        except ValueError:  # not the main thread
            self._old = None
        return self

    def _capture(self, signum, frame):
        self._pending = (signum, frame)

    def check(self):
        """Raise the deferred interrupt, if any (call at a safe point)."""
        if self._pending is not None:
            self._pending = None
            raise KeyboardInterrupt

    def __exit__(self, *exc):
        if self._old is not None:
            signal.signal(signal.SIGINT, self._old)
            if self._pending is not None and exc == (None, None, None):
                raise KeyboardInterrupt
        return False


class _CheckpointThread(threading.Thread):
    """Checkpoint writer whose failure is NOT silent: a swallowed write
    error would let later rounds promote past a missing one, and resume's
    claim replay (which globs every round dir) would silently rebuild an
    incomplete seen set. join_and_raise re-raises in the driver."""

    def __init__(self, *args):
        super().__init__(target=self._run, args=args)
        self.error: BaseException | None = None

    def _run(self, *args):
        try:
            _checkpoint_round(*args)
        except BaseException as e:  # noqa: BLE001 — must reach the driver
            self.error = e

    def join_and_raise(self):
        self.join()
        if self.error is not None:
            raise RuntimeError("checkpoint write failed") from self.error


def _union_parts(parts: list[Dataset]) -> Dataset | None:
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def _find_last_complete_round(out_dir: str) -> int | None:
    rounds = glob.glob(os.path.join(out_dir, "rounds", "r[0-9]*"))
    if not rounds:
        return None
    # numeric max — lexicographic sort breaks past round 9999 (r10000 < r9999)
    return max(int(os.path.basename(r)[1:]) for r in rounds)


def _restore(
    out_dir: str, shards: list, n_shards: int
) -> tuple[Dataset, int, list[dict]]:
    """Rebuild seen state + pending frontier + counters from the last
    complete round's checkpoint (claims replayed across ALL rounds)."""
    last = _find_last_complete_round(out_dir)
    if last is None:
        raise RuntimeError(
            f"nothing to resume from: no complete round checkpoints under "
            f"{os.path.join(out_dir, 'rounds')} (a re-crawl reconcile discards "
            f"old checkpoints — run without --resume)"
        )
    # clean partial work from EVERY round past the last complete checkpoint:
    # round last+2 may have started writing store parts while checkpoint
    # last+1 was still in flight, and a stale partial dir would leak rows
    # into read_store if the resumed run is truncated with max_rounds
    for d in glob.glob(os.path.join(out_dir, "store", "r[0-9]*")):
        if int(os.path.basename(d)[1:]) > last:
            shutil.rmtree(d, ignore_errors=True)
    for t in glob.glob(os.path.join(out_dir, "rounds", ".r*.tmp")):
        shutil.rmtree(t, ignore_errors=True)

    # seen set = seeds ∪ union of every round's pending frontier (each
    # claimed url is pending at the end of its claim round — see
    # _checkpoint_round docstring)
    claim_files: list[str] = []
    for r in range(last + 1):
        claim_files += glob.glob(os.path.join(_round_dir(out_dir, r), "frontier", "*.parquet"))
        claim_files += glob.glob(os.path.join(_round_dir(out_dir, r), "seeds.parquet"))
    claims_ds = ray.data.read_parquet(claim_files, columns=["url"])

    sentinel = route_sentinel()

    def bulk(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_numpy(zero_copy_only=False)
        ray.get(
            [
                shards[s].bulk_add.remote(urls[rows].tolist())
                for s, rows in iter_shard_groups(urls, n_shards, sentinel)
            ]
        )
        return pa.Table.from_pylist([{"n": len(urls)}])

    claims_ds.map_batches(bulk, batch_format="pyarrow").count()

    metrics_tbl = pq.read_table(os.path.join(_round_dir(out_dir, last), "metrics.parquet"))
    metrics = metrics_tbl.to_pylist()
    frontier_files = glob.glob(os.path.join(_round_dir(out_dir, last), "frontier", "*.parquet"))
    pending = ray.data.read_parquet(frontier_files).materialize()
    return pending, last + 1, metrics


def crawl(
    corpus_path: str,
    seeds: list[str],
    out_dir: str,
    cfg: CrawlConfig | None = None,
    resume: bool = False,
    **overrides,
) -> CrawlResult:
    """Run (or resume) a crawl. See module docstring for the round anatomy."""
    if not seeds:
        raise ValueError("crawl() needs at least one seed url")
    cfg = replace(cfg or CrawlConfig(), **overrides)
    assert cfg.max_depth <= claim.MAX_DEPTH
    if cfg.proxy is not None:
        from spider_ray.config import validate_proxy

        validate_proxy(cfg.proxy)  # S2: fail fast on bad proxy format
    if cfg.per_host_budget is not None and cfg.per_host_budget < 1:
        raise ValueError(
            "per_host_budget must be >= 1 (0 would defer every URL forever — "
            "the reference's Semaphore(0) hangs the same way, crawler.py:82)"
        )
    if not resume:
        # a fresh crawl owns the whole out_dir: stale store/rounds dirs from
        # an earlier (possibly deeper) run would otherwise leak into
        # read_store() and hijack a later --resume
        shutil.rmtree(os.path.join(out_dir, "store"), ignore_errors=True)
        shutil.rmtree(os.path.join(out_dir, "rounds"), ignore_errors=True)
    os.makedirs(os.path.join(out_dir, "store"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "rounds"), exist_ok=True)

    if isinstance(cfg.robots, str):
        # load (and fail on) the robots table before any actors exist
        from spider_ray.robots import load_robots_table

        rules, table_budgets = load_robots_table(cfg.robots)
        # robots-derived budgets may only TIGHTEN the user's global cap,
        # never loosen it; explicit cfg.host_budgets entries win outright
        if cfg.per_host_budget is not None:
            table_budgets = {
                h: min(b, cfg.per_host_budget) for h, b in table_budgets.items()
            }
        cfg = replace(
            cfg, robots=rules, host_budgets={**table_budgets, **(cfg.host_budgets or {})}
        )
    if cfg.host_budgets and any(b < 1 for b in cfg.host_budgets.values()):
        raise ValueError("host_budgets values must be >= 1 (0 defers forever)")
    robots_fn = make_robots_filter(cfg.robots) if cfg.robots else None

    SeenActor = ray.remote(UrlSeenShard)
    shards = [
        SeenActor.remote(cfg.seen_mode, cfg.bloom_bits) for _ in range(cfg.seen_shards)
    ]
    for s in shards:
        s.n_items.remote()  # fire-and-forget: actor processes start spawning
        # NOW, overlapped with driver-side seed normalization — otherwise the
        # spawn (~1-2 s for 8 processes) lands on round 0's critical path at
        # the first claim/offer
    corpus_ref = (
        load_corpus_ref(corpus_path) if cfg.fetch_mode.startswith("indexed") else None
    )
    if corpus_ref is not None and cfg.prewarm:
        from spider_ray.stages.fetch import prewarm_workers

        prewarm_workers(corpus_ref, int(ray.cluster_resources().get("CPU", 4)))

    start_url = canonicalize(ensure_scheme(seeds[0]))
    parent_value = human_repr(start_url)

    if resume:
        pending, round_idx, metrics = _restore(out_dir, shards, cfg.seen_shards)
        pending_count = pending.count()
        last = metrics[-1]
        next_rank = last["next_rank"]
        total_calls = last["total_calls"]
        crawled_cum = last["crawled_cum"]
        seed_tbl = None
    else:
        seed_tbl, start_url = _seed_frontier(
            seeds, shards, cfg.seen_shards, cfg.robots, cfg.use_cache
        )
        parent_value = human_repr(start_url)
        pending = ray.data.from_arrow(seed_tbl).materialize()
        pending_count = seed_tbl.num_rows
        round_idx, next_rank = 0, seed_tbl.num_rows
        total_calls, crawled_cum = 0, 0
        metrics = []

    rounds_run = 0
    ckpt_thread: threading.Thread | None = None
    pending_presplit = False  # True when pending is already driver-sliced
    intr = _DeferSigint()
    intr.__enter__()  # defer Ctrl-C to round boundaries
    try:
        while pending_count > 0 and (cfg.max_rounds is None or rounds_run < cfg.max_rounds):
            r = round_idx
            t0 = time.perf_counter()
            store_dir = _store_round_dir(out_dir, r)
            shutil.rmtree(store_dir, ignore_errors=True)  # crashed-attempt leftovers
            os.makedirs(store_dir)

            fetch_now, deferred = politeness_split(
                pending, cfg.per_host_budget, cfg.host_budgets
            )
            n_fetch = pending_count if deferred is None else fetch_now.count()
            n_defer = pending_count - n_fetch

            # fetch/parse parallelism == input block count: split the round's
            # frontier so every CPU gets work (a sorted/unioned frontier often
            # arrives as 1-2 blocks), capped so blocks never get degenerate.
            # Skipped when last round's refill already pre-split the frontier
            # driver-side (_presplit_table) — one less stage per round.
            cpus = int(ray.cluster_resources().get("CPU", 4))
            target_blocks = _target_blocks(n_fetch, cpus, cfg.fetch_batch_size)
            if n_fetch > 0 and not (pending_presplit and deferred is None):
                fetch_now = fetch_now.repartition(target_blocks)
            ranked_tbl = None  # set by the small-round refill path

            if cfg.fetch_mode in ("indexed", "indexed_actors"):
                fetched = fetch_indexed(
                    fetch_now,
                    corpus_ref,
                    cfg.fetch_concurrency,
                    cfg.fetch_batch_size,
                    actors=cfg.fetch_mode == "indexed_actors",
                )
            elif cfg.fetch_mode == "partitioned":
                from spider_ray.stages.fetch import fetch_partitioned

                fetched = fetch_partitioned(fetch_now, corpus_path)
            else:
                fetched = fetch_join(fetch_now, corpus_path, cfg.join_partitions)

            if not cfg.use_cache:
                # --no-cache (use_cache.py:19-28): every candidate occurrence is
                # admitted — no dedup, no seen claims; ordering still canonical
                cand = fetched.map_batches(
                    make_parse_store_expand(
                        start_url, parent_value, cfg.max_depth, store_dir
                    ),
                    batch_format="pyarrow",
                    batch_size=cfg.parse_batch_size,
                    zero_copy_batch=True,
                )
                if robots_fn is not None:
                    cand = cand.map_batches(robots_fn, batch_format="pyarrow")
                cand = cand.materialize()
                t_parse = time.perf_counter() - t0
                crawled_this = _store_rows_count(store_dir)
                n_cand = cand.count()
                t1 = time.perf_counter()
                ranked, n_new = None, 0
                if n_cand > 0:
                    ranked, n_new = assign_ranks(
                        cand.sort("claim_key"),
                        next_rank,
                        col="rank",
                        post_fn=_decode_candidates,
                    )
                t_refill = time.perf_counter() - t1
            elif cfg.dedup_mode == "actor":
                # ONE streaming execution for the whole round body: fetch →
                # parse → store-part write → robots gate → dedup+claim OFFER to
                # the seen shards (fused in expand.py). Only per-batch counts
                # come back; candidates never hit the object store. The
                # candidates' one unavoidable all-to-all is the url-hash actor
                # routing itself.
                stage = make_parse_store_expand(
                    start_url,
                    parent_value,
                    cfg.max_depth,
                    store_dir,
                    offer_to=(shards, r + 1, cfg.seen_shards, route_sentinel()),
                    robots_rules=cfg.robots,
                )
                counts = fetched.map_batches(
                    stage,
                    batch_format="pyarrow",
                    batch_size=cfg.parse_batch_size,
                    zero_copy_batch=True,
                ).materialize()
                t_parse = time.perf_counter() - t0
                ctbl = _collect_tables(counts)
                crawled_this = int(pa.compute.sum(ctbl.column("crawled")).as_py()) if ctbl else 0
                n_cand = int(pa.compute.sum(ctbl.column("candidates")).as_py()) if ctbl else 0

                t1 = time.perf_counter()
                ranked, n_new = None, 0
                if n_cand > 0:
                    harvests = [s.harvest.remote(r + 1) for s in shards]
                    if n_cand <= cfg.small_round_rows:
                        # small round: sort+rank on the driver — a distributed
                        # execution costs more than the data
                        tbls = [t for t in ray.get(harvests) if t.num_rows]
                        if tbls:
                            tbl = pa.concat_tables(tbls)
                            order = pa.compute.sort_indices(
                                tbl, sort_keys=[("claim_key", "ascending")]
                            )
                            tbl = tbl.take(order)
                            ranks = pa.array(
                                np.arange(next_rank, next_rank + tbl.num_rows, dtype=np.int64)
                            )
                            tbl = tbl.append_column("rank", ranks)
                            n_new = tbl.num_rows
                            # pre-split for the NEXT round's fetch (skips a
                            # repartition stage per round) with the decode
                            # running as PARALLEL per-slice tasks; the
                            # checkpoint writer collects the same decoded
                            # refs on its own thread (no put/get round trip
                            # and no serial decode on the driver)
                            nblocks = _target_blocks(n_new, cpus, cfg.fetch_batch_size)
                            step = -(-n_new // nblocks)
                            # ONE put; tasks slice by (offset, length) —
                            # see _decode_block_task for the pickle trap
                            tref = ray.put(tbl)
                            dec_refs = [
                                _decode_block_task.remote(
                                    tref, i, min(step, n_new - i)
                                )
                                for i in range(0, n_new, step)
                            ]
                            ranked = ray.data.from_arrow_refs(dec_refs)
                            ranked_tbl = dec_refs
                    else:
                        new = ray.data.from_arrow_refs(harvests)
                        ranked, n_new = assign_ranks(
                            new.sort("claim_key"),
                            next_rank,
                            col="rank",
                            post_fn=_decode_candidates,
                        )
                t_refill = time.perf_counter() - t1
            else:
                cand = fetched.map_batches(
                    make_parse_store_expand(
                        start_url, parent_value, cfg.max_depth, store_dir
                    ),
                    batch_format="pyarrow",
                    batch_size=cfg.parse_batch_size,
                    zero_copy_batch=True,
                )
                if robots_fn is not None:
                    cand = cand.map_batches(robots_fn, batch_format="pyarrow")
                cand = cand.materialize()  # store parts + candidates exactly once
                t_parse = time.perf_counter() - t0

                crawled_this = _store_rows_count(store_dir)
                n_cand = cand.count()

                t1 = time.perf_counter()
                ranked, n_new = None, 0
                if n_cand > 0:
                    uniq = cand.groupby("url").aggregate(
                        Min("claim_key", alias_name="claim_key")
                    )
                    new = uniq.map_batches(
                        make_seen_filter(shards, r + 1, cfg.seen_shards),
                        batch_format="pyarrow",
                    )
                    # decode fused into the rank tasks — one execution for
                    # groupby→seen→sort→rank→decode
                    ranked, n_new = assign_ranks(
                        new.sort("claim_key"),
                        next_rank,
                        col="rank",
                        post_fn=_decode_candidates,
                    )
                t_refill = time.perf_counter() - t1

            next_rank += n_new
            total_calls += n_fetch
            crawled_cum += crawled_this
            pending_count = n_defer + n_new

            # next frontier = lazy union of already-materialized parts (no extra
            # execution; counts are known arithmetically)
            parts = []
            if deferred is not None and n_defer > 0:
                parts.append(deferred.select_columns(FRONTIER_COLS).materialize())
            if ranked is not None:
                parts.append(ranked)
            pending = _union_parts(parts)
            pending_presplit = ranked_tbl is not None and len(parts) == 1

            metrics.append(
                {
                    "round": r,
                    "fetched": n_fetch,
                    "crawled": crawled_this,
                    "misses": n_fetch - crawled_this,
                    "claimed": n_new,
                    "candidates": n_cand,
                    "deferred": n_defer,
                    "elapsed_s": time.perf_counter() - t0,
                    "t_fetch_parse": t_parse,
                    "t_frontier_refill": t_refill,
                    "total_calls": total_calls,
                    "crawled_cum": crawled_cum,
                    "next_rank": next_rank,
                }
            )
            LOG.info(
                "crawl_info round=%d fetched=%d crawled=%d misses=%d "
                "claimed=%d deferred=%d elapsed=%.2fs",
                r,
                n_fetch,
                crawled_this,
                n_fetch - crawled_this,
                n_new,
                n_defer,
                metrics[-1]["elapsed_s"],
            )
            # checkpoint r overlaps round r+1's heavy execution via a single
            # writer thread; threads are serialized (join before submit) so
            # round dirs promote strictly in order — resume correctness depends
            # on rounds/rK existing for every K < last
            p_refs = None
            if pending_count == 0:
                p_tbls, p_big = [], None
            elif pending_count <= cfg.small_checkpoint_rows:
                if pending_presplit:
                    # decoded frontier slice refs — the writer thread
                    # collects them itself (no put/get round trip here)
                    p_tbls, p_refs = [], list(ranked_tbl)
                else:
                    p_tbls = [
                        t for p in parts for t in [_collect_tables(p)] if t is not None
                    ]
                p_big = None
            else:
                p_tbls, p_big = [], _union_parts(parts)
            if ckpt_thread is not None:
                ckpt_thread.join_and_raise()
            ckpt_thread = _CheckpointThread(
                out_dir,
                r,
                p_tbls,
                pending_count,
                p_big,
                seed_tbl if r == 0 else None,
                list(metrics),
                p_refs,
            )
            ckpt_thread.start()
            seed_tbl = None
            round_idx += 1
            rounds_run += 1
            # a Ctrl-C captured mid-round surfaces HERE, at the round
            # boundary (round r's checkpoint is already submitted, so resume
            # is exact) — without this, an interrupt during an unbounded
            # crawl would be swallowed until every round completed
            intr.check()

        if ckpt_thread is not None:
            ckpt_thread.join_and_raise()
        seen_count = sum(ray.get([s.n_items.remote() for s in shards]))
        shard_stats = (
            ray.get([s.stats.remote() for s in shards])
            if cfg.collect_shard_stats
            else []
        )
        LOG.info(
            "crawl_done rounds=%d crawled=%d total_calls=%d seen=%d finished=%s",
            len(metrics),
            crawled_cum,
            total_calls,
            seen_count,
            pending_count == 0,
        )
        intr.check()  # a deferred Ctrl-C surfaces before reporting success
    finally:
        # restore the SIGINT handler WITHOUT raising (a raise here would
        # mask the original exception), then release distributed state:
        # the checkpoint writer thread and the seen-shard actors must
        # not outlive a failed crawl for the rest of the Ray session
        intr._old is not None and signal.signal(signal.SIGINT, intr._old)
        if ckpt_thread is not None and ckpt_thread.is_alive():
            ckpt_thread.join()
        for s in shards:
            ray.kill(s)
    return CrawlResult(
        out_dir=out_dir,
        rounds=metrics,
        total_calls=total_calls,
        crawled=crawled_cum,
        seen_count=seen_count,
        finished=pending_count == 0,
        shard_stats=shard_stats,
    )


def read_store(
    out_dir: str, canonical_order: bool = False, columns: list[str] | None = None
) -> Dataset:
    """The crawl output as a Dataset (the reference's ``url`` table,
    schema.py:11-19, with text inline instead of side files).

    Pass ``columns`` to prune at the read — a query that never touches the
    page ``text`` must not scan it (on a 10^10-row store the text column IS
    the store; every metadata query would otherwise be a full-corpus scan)."""
    files = sorted(glob.glob(os.path.join(out_dir, "store", "r[0-9]*", "*.parquet")))
    if not files:  # empty store (e.g. freshly 'cobweb create'd) → empty table
        from spider_ray.stages.expand import STORE_SCHEMA

        empty = STORE_SCHEMA.empty_table()
        return ray.data.from_arrow(empty.select(columns) if columns else empty)
    # clean read: store parts are engine-written (metadata-free), but the
    # finalize_store retry net can rewrite parts through pandas blocks —
    # stripping at the read keeps hash(Schema) working downstream either way
    from spider_ray.blockutil import read_clean_parquet

    sort_keys = ["depth", "discovery_rank"]
    read_cols = columns
    extra = []
    if canonical_order and columns is not None:
        # the sort needs its keys — read them alongside the pruned
        # selection and drop them after ordering
        extra = [k for k in sort_keys if k not in columns]
        read_cols = columns + extra
    ds = read_clean_parquet(files, columns=read_cols)
    if canonical_order:
        ds = ds.sort(sort_keys)
        if extra:
            ds = ds.drop_columns(extra)
    return ds
