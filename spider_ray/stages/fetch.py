"""Fetch stage: "download" = look the URL up in the pages corpus.

Replaces the reference's live HTTP GET (crawler.py:121-138). A URL absent
from the corpus is the fetch-failure path (crawler.py:102-104): the row is
dropped here and accounted as a miss by the driver (fetched − crawled),
never retried — reference semantics.

Two physical strategies (SURVEY.md §2.1 S1):

- **indexed** (default): the corpus html table AND a hash-sorted url index
  (two numpy arrays) are ``ray.put`` ONCE by the driver; every worker reads
  all of it zero-copy from the object store — no per-worker index build at
  all — and serves each batch with a vectorized ``searchsorted`` + one
  Arrow ``take``. This is the broadcast-small-side pattern — right whenever
  the corpus fits the cluster object store.
- **join**: per round, inner hash-join of the frontier against
  ``read_parquet(corpus, columns=[url, html])`` on ``url``
  (``Dataset.join``, hash-partitioned). Right when the corpus is far larger
  than the object store; costs a corpus scan per round, so real deployments
  would bucket the corpus by ``crc32(url) % B`` at ingest and read only the
  buckets the frontier touches — the layout ``write_corpus`` mirrors with
  per-host files.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset


def _url_hash_batch(urls) -> np.ndarray:
    """Vectorized 64-bit url hash (pandas' C siphash via
    ``pd.util.hash_array`` — deterministic across processes: the key is
    pandas' fixed default). Replaces a per-string ``hashlib.blake2b`` call
    inside ``np.fromiter`` — the biggest remaining constant on the fetch
    hot path (paid per frontier row per round and per corpus row at index
    build). Only invariants required of the hash: 64-bit, identical on the
    index-build and lookup sides (collisions are verified away by url
    equality in ``_CorpusIndex._resolve``)."""
    import pandas as pd

    arr = np.asarray(urls, dtype=object)
    return pd.util.hash_array(arr, categorize=False).astype(np.uint64)


def _url_hash64(u: str) -> int:
    """Scalar view of ``_url_hash_batch`` (tests / single-url probes)."""
    return int(_url_hash_batch([u])[0])


# pd.util.hash_array is an implementation detail of pandas, not a stable
# contract. Two distinct skew risks are guarded by hashing this sentinel URL:
#   - PERSISTED index vs current process (a pandas upgrade between runs) —
#     load_corpus_ref stores the sentinel hash in the npz and rebuilds on
#     mismatch;
#   - DRIVER (index build) vs WORKER (lookup) within one run (a real cluster
#     with version-skewed nodes) — the sentinel hash ships inside the
#     broadcast payload and _CorpusIndex re-derives it per worker, so skew
#     fails loudly instead of silently resolving every url as a miss.
_SENTINEL_URL = "spider-ray-hash-sentinel-v2"


class _CorpusIndex:
    """url → row lookup over the broadcast corpus, SHARED via the object
    store: the driver ships ``(table, sorted_hashes, row_indices)`` where
    the numpy arrays are a 64-bit-hash-sorted index over the url column.
    Workers deserialize all three ZERO-COPY from plasma — there is NO
    per-worker build step (the previous per-worker 3M-entry python dict
    cost ~8 s and ~400 MB heap in EVERY worker Ray spawned, and a cold
    worker spawned mid-round stalled its whole block behind the build).
    Lookups are vectorized: hash the batch urls, ``np.searchsorted`` into
    the shared index, verify by actual url equality (hash collisions fall
    back to probing the equal-hash run)."""

    def __init__(self, payload):
        tbl, self._hashes, self._rows, *rest = payload
        if rest:
            # broadcast sentinel (see _SENTINEL_URL): this process's hash
            # function must reproduce the index builder's values, or every
            # lookup would silently miss
            here = _url_hash_batch([_SENTINEL_URL])[0]
            if here != rest[0]:
                raise RuntimeError(
                    "url-hash implementation skew between the index builder "
                    f"and this worker (sentinel {rest[0]} != {here}) — "
                    "pandas version mismatch across the cluster?"
                )
        self._urls = tbl.column("url")
        self._html = tbl.column("html")
        self._chunk_offsets = np.cumsum(
            [0] + [len(c) for c in self._html.chunks], dtype=np.int64
        )

    def _take(self, col: pa.ChunkedArray, rows: np.ndarray) -> pa.Array:
        """Row take over a MULTI-chunk column without touching untaken
        chunks (``ChunkedArray.take`` concatenates the whole column
        internally — a multi-GB copy per call on the broadcast corpus):
        group the row ids per chunk, take within each chunk, restore the
        caller's order."""
        if rows.size == 0:
            # all-miss batch (expected near the crawl edge: every frontier
            # url out of corpus) — concat_arrays([]) would raise
            return pa.array([], type=col.type)
        order = np.argsort(rows, kind="stable")
        srows = rows[order]
        cid = np.searchsorted(self._chunk_offsets, srows, side="right") - 1
        parts = []
        for c in np.unique(cid):
            sel = srows[cid == c] - self._chunk_offsets[c]
            parts.append(col.chunk(int(c)).take(pa.array(sel)))
        merged = pa.concat_arrays(parts) if len(parts) != 1 else parts[0]
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        return merged.take(pa.array(inv))

    def _resolve(self, burls: list[str]) -> np.ndarray:
        """Corpus row per url, -1 for misses."""
        n = len(self._hashes)
        bh = _url_hash_batch(burls)
        pos = np.searchsorted(self._hashes, bh)
        out = np.full(len(burls), -1, dtype=np.int64)
        in_range = pos < n
        cand = np.where(in_range, pos, 0)
        hash_hit = in_range & (self._hashes[cand] == bh)
        if hash_hit.any():
            hit_idx = np.flatnonzero(hash_hit)
            rows = self._rows[pos[hit_idx]]
            # vectorized url-equality verify (one C-level object compare,
            # not a python loop per hit — this runs per frontier row per
            # round); the python probe below only ever sees the ~n²·2⁻⁶⁴
            # hash-collision mismatches
            got = self._take(self._urls, rows).to_numpy(zero_copy_only=False)
            want = np.asarray(burls, dtype=object)[hit_idx]
            ok = got == want
            out[hit_idx[ok]] = rows[ok]
            for i in hit_idx[~ok]:
                # 64-bit hash collision: probe the equal-hash run
                u = burls[i]
                p = pos[i]
                while p < n and self._hashes[p] == bh[i]:
                    r2 = int(self._rows[p])
                    if self._urls[r2].as_py() == u:
                        out[i] = r2
                        break
                    p += 1
        return out

    def lookup(self, batch: pa.Table) -> pa.Table:
        # object ndarray, not to_pylist: the hash pass wants an ndarray
        # anyway, and this skips one list materialization per batch
        burls = batch.column("url").to_numpy(zero_copy_only=False)
        idx = self._resolve(burls)
        hit_rows = np.flatnonzero(idx >= 0)
        sub = batch.select(["url", "depth", "rank"]).take(pa.array(hit_rows))
        html = self._take(self._html, idx[hit_rows])
        return sub.append_column("html", html)


# Worker-process-global cache: Ray worker processes persist across Dataset
# executions, so the index is built once per worker for the whole crawl even
# though each BFS round is a separate execution. (An actor pool would give
# the same amortization but pays pool startup EVERY round, since Ray Data
# actor pools are per-execution — measured at ~3s/round at test scale.)
_CORPUS_CACHE: dict = {}


def _ensure_index(table_ref) -> _CorpusIndex:
    idx = _CORPUS_CACHE.get(table_ref)
    if idx is None:
        idx = _CorpusIndex(ray.get(table_ref))
        _CORPUS_CACHE.clear()  # one corpus per worker — don't leak old runs
        _CORPUS_CACHE[table_ref] = idx
    return idx


def make_fetch_fn(table_ref):
    def fetch(batch: pa.Table) -> pa.Table:
        return _ensure_index(table_ref).lookup(batch)

    return fetch


def prewarm_workers(table_ref, n_workers: int) -> None:
    """Spawn (up to) ``n_workers`` worker processes and map the shared
    corpus + index into each, so the first big fetch round doesn't
    serialize behind process spawn. (The index itself needs no build — it
    is deserialized zero-copy from plasma.)"""

    @ray.remote
    def _warm(i: int) -> int:
        idx = _ensure_index(table_ref)
        if i == 0:
            # fault the shared html pages into memory ONCE (they are plasma
            # shm pages — the first toucher pays for everyone); otherwise
            # the first big fetch round pays ~1-2 s/GB of page faults
            for chunk in idx._html.chunks:
                for buf in chunk.buffers():
                    if buf is not None:
                        np.frombuffer(buf, dtype=np.uint8)[:: 4096].sum()
        return 0

    ray.get([_warm.remote(i) for i in range(n_workers)])


class CorpusFetcher:
    """Actor-pool variant of the same stage (``fetch_mode="indexed_actors"``):
    the shape to use when per-worker state must NOT be process-global (e.g.
    a model handle or GPU context per actor)."""

    def __init__(self, table_ref):
        self._idx = _CorpusIndex(ray.get(table_ref))

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self._idx.lookup(batch)


def fetch_indexed(
    frontier: Dataset, table_ref, concurrency: int, batch_size: int, actors: bool = False
) -> Dataset:
    if actors:
        return frontier.map_batches(
            CorpusFetcher,
            fn_constructor_args=(table_ref,),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=1,
        )
    return frontier.map_batches(
        make_fetch_fn(table_ref), batch_format="pyarrow", batch_size=batch_size
    )


# one pyarrow dataset handle per worker PROCESS (not per group): the handle
# discovers and caches the corpus file listing + parquet metadata, which is
# exactly the work a per-group re-open would repeat per host per round
_PADS_CACHE: dict = {}


def _corpus_pads(path: str):
    d = _PADS_CACHE.get(path)
    if d is None:
        import pyarrow.dataset as pads

        _PADS_CACHE.clear()  # one corpus per run — don't leak old handles
        d = _PADS_CACHE[path] = pads.dataset(path)
    return d


def fetch_partitioned(
    frontier: Dataset, corpus_path: str, sub_splits: int = 16
) -> Dataset:
    """Scale path for corpora far larger than the cluster object store:
    read ONLY the corpus files covering the frontier.

    ``write_corpus`` lays the corpus out one file-set per host, so grouping
    the frontier by host and filtering each host's lookup with a
    ``min≤url≤max`` range + ``isin`` predicate lets parquet file/row-group
    statistics prune everything the round doesn't touch — per-round I/O is
    O(frontier's hosts), not O(corpus). This is the layout-aware pattern
    that replaces the broadcast index at the 100 TB tier.

    Hot-host safety (SURVEY.md §7 hard-part 5): the group key is
    ``(host, rank % sub_splits)``, not host alone — a host owning 50 % of a
    10^10-row frontier lands in ``sub_splits`` parallel tasks of bounded
    size instead of ONE giant task. The trade: sub-groups of one host can
    touch overlapping row-groups of that host's files (amplification ≤
    sub_splits on the hot host only, against row-group-stat-pruned reads);
    the wall-clock win is the 1/sub_splits task critical path."""
    import pandas as pd

    def add_sub(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(
            _sub=(b["rank"].to_numpy() % sub_splits).astype(np.int64)
        )

    def fetch_group(g: pd.DataFrame) -> pa.Table:
        urls = sorted(g["url"].tolist())
        dset = _corpus_pads(corpus_path)
        flt = (
            (pc.field("url") >= urls[0])
            & (pc.field("url") <= urls[-1])
            & pc.field("url").isin(urls)
        )
        t = dset.to_table(filter=flt, columns=["url", "html"])
        # Arrow-native inner merge on url (corpus urls are unique): a pandas
        # round-trip would downgrade html large_binary → binary and attach
        # the b'pandas' schema blob that breaks downstream schema hashing
        g_tbl = pa.table(
            {
                "url": pa.array(g["url"], pa.string()),
                "depth": pa.array(g["depth"]),
                "rank": pa.array(g["rank"], pa.int64()),
            }
        )
        pos = pc.index_in(g_tbl.column("url"), value_set=t.column("url").combine_chunks())
        hit = pos.is_valid()
        html = t.column("html").take(pos.filter(hit))
        return g_tbl.filter(hit).append_column("html", html)

    return (
        frontier.map_batches(add_sub, batch_format="pandas")
        .groupby(["host", "_sub"])
        .map_groups(fetch_group, batch_format="pandas")
    )


def fetch_join(frontier: Dataset, corpus_path: str, num_partitions: int) -> Dataset:
    """Hash-join fetch for corpora too big to broadcast."""
    from spider_ray.blockutil import drop_empty_blocks

    pages = ray.data.read_parquet(corpus_path, columns=["url", "html"])
    # the frontier side can carry empty blocks (politeness filters) — every
    # join input must be empty-block-free, see blockutil.drop_empty_blocks
    joined = drop_empty_blocks(frontier.select_columns(["url", "depth", "rank"])).join(
        pages,
        join_type="inner",
        num_partitions=num_partitions,
        on=("url",),
    )
    return joined


_REF_CACHE: dict = {}


def load_corpus_ref(corpus_path: str):
    """Driver-side: read the corpus (url+html only — prune at the read) and
    put it in the object store once for all fetch workers. Memoized per
    (path, file list, max mtime) so repeated crawls (warmup + measured run,
    kill + resume) share one broadcast copy while a corpus REGENERATED at
    the same path within one Ray session is re-read instead of silently
    serving stale pages."""
    import pyarrow.parquet as pq
    import glob
    import os

    root = os.path.abspath(corpus_path)
    paths = (
        sorted(glob.glob(os.path.join(root, "*.parquet")))
        if os.path.isdir(root)
        else [root]
    )
    src_mtime = max((os.path.getmtime(p) for p in paths), default=0)
    key = (root, tuple(paths), src_mtime)
    if key in _REF_CACHE:
        return _REF_CACHE[key]
    _REF_CACHE.clear()  # one corpus per session is the common case — don't
    # pin superseded broadcast tables in the object store

    # On-disk prepared cache: the combined table as UNCOMPRESSED Arrow IPC
    # (zero-copy mmap on reload) + the hash index as npz. A fresh process
    # (each scaling-protocol subprocess) then skips read+combine+hash
    # (~2 min at 8 GB on this host) and pays only the ray.put.
    prep = os.path.join(root, "_prepared.arrow")
    # v2: hash function changed (blake2b → vectorized siphash) — a v1 npz
    # holds hashes the lookup side no longer computes, so it must never be
    # picked up by mtime alone
    idxf = os.path.join(root, "_prepared_idx_v2.npz")
    # The persisted index is only valid if THIS process's hash function
    # produces the same values the builder's did — pandas' hash_array is an
    # implementation detail, not a stable contract, so the npz carries a
    # sentinel hash and a mismatch (e.g. a pandas upgrade) forces an index
    # rebuild instead of silently missing every lookup. The same sentinel
    # also rides the broadcast payload so RUNTIME driver/worker skew fails
    # loudly too (see _CorpusIndex.__init__).
    sentinel = _url_hash_batch([_SENTINEL_URL])[0]

    def _build_index(tbl):
        urls = tbl.column("url").to_numpy(zero_copy_only=False)
        hashes = _url_hash_batch(urls)
        order = np.argsort(hashes, kind="stable").astype(np.int64)
        return hashes[order], order

    def _save_index(h_sorted, order):
        try:  # best effort — the npz only saves the next process the build
            np.savez(
                idxf + ".tmp.npz",
                h=h_sorted,
                o=order,
                s=np.array([sentinel], dtype=np.uint64),
            )
            os.replace(idxf + ".tmp.npz", idxf)
        except OSError:
            pass

    if (
        os.path.isdir(root)
        and os.path.exists(prep)
        and os.path.getmtime(prep) >= src_mtime
    ):
        import pyarrow.ipc as ipc

        tbl = ipc.open_file(pa.memory_map(prep)).read_all()
        d = None
        if os.path.exists(idxf) and os.path.getmtime(idxf) >= src_mtime:
            d = np.load(idxf)
            if "s" not in d or d["s"][0] != sentinel:
                d = None  # hash implementation moved — rebuild below
        if d is not None:
            h_sorted, order = d["h"], d["o"]
        else:
            # prepared table valid but index missing/stale (e.g. the hash
            # function version moved): rebuild JUST the index from the
            # mmapped table — seconds, vs minutes for a full re-read
            h_sorted, order = _build_index(tbl)
            _save_index(h_sorted, order)
        ref = ray.put((tbl, h_sorted, order, sentinel))
        _REF_CACHE[key] = ref
        return ref

    big = pa.schema([("url", pa.string()), ("html", pa.large_binary())])

    def _read(p):
        return pq.read_table(p, columns=["url", "html"]).cast(big)

    # parquet decode releases the GIL — a thread pool reads the shards in
    # parallel (a serial driver read of a multi-GB corpus took minutes)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=16) as ex:
        tbls = list(ex.map(_read, paths))
    # Re-chunk to a handful of ~512 MB chunks, combining GROUPS serially:
    # ray.put of a many-hundred-chunk table is pathologically slow
    # (measured 223 s at 615 chunks vs ~10 s at 1), a SINGLE 8 GB
    # combine_chunks is super-linear (110-200 s vs ~0.5 s per 500 MB
    # group), and workers must never combine (a full copy per worker).
    # _CorpusIndex._take handles the remaining few chunks without copies.
    group, size, groups = [], 0, []
    for t in tbls:
        group.append(t)
        size += t.nbytes
        if size >= 512 * 1024 * 1024:
            groups.append(group)
            group, size = [], 0
    if group:
        groups.append(group)
    tbl = pa.concat_tables(
        pa.concat_tables(g).combine_chunks() for g in groups
    )
    del tbls
    h_sorted, order = _build_index(tbl)
    if os.path.isdir(root):
        try:  # persist the prepared form for the next process (best effort)
            import pyarrow.ipc as ipc

            tmp = prep + ".tmp"
            with pa.OSFile(tmp, "wb") as f, ipc.new_file(f, tbl.schema) as w:
                w.write_table(tbl)
            os.replace(tmp, prep)
        except OSError:
            pass
        _save_index(h_sorted, order)
    ref = ray.put((tbl, h_sorted, order, sentinel))
    _REF_CACHE[key] = ref
    return ref
