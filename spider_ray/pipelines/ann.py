"""Similarity search over an embedding column (``list<float>``).

- ``brute_topk``: exact cosine top-k. The query matrix is broadcast once
  (``ray.put``); every batch computes a numpy matmul against it and emits its
  LOCAL top-k (a per-batch partial), and a final tiny reduce merges partials
  — the shuffle carries k rows per block, never the corpus.
- ``lsh_topk``: the scale path — signed-random-projection LSH buckets
  (seeded hyperplanes, identical on every worker); only buckets within
  ``probe_hamming`` of the query's bucket are scanned. Approximate; recall
  rises with probe distance (tested against brute force).

Float discipline: all similarity math in float64; the oracle-checked query
(registry: ``embedding_topk``) returns only the ranked vec_ids, not the
float scores, so the DuckDB compare is over exact integers.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
from ray.data import Dataset

_N_PLANES = 8  # 256 LSH buckets
_PLANES_SEED = 7


def _emb(sf_dir: str) -> Dataset:
    return ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _to_matrix(batch: pd.DataFrame) -> np.ndarray:
    return np.stack(batch["embedding"].to_numpy()).astype(np.float64)


def query_vector(sf_dir: str, vec_id: int = 0) -> np.ndarray:
    tbl = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    i = tbl.column("vec_id").to_pylist().index(vec_id)
    return np.asarray(tbl.column("embedding")[i].as_py(), dtype=np.float64)


def brute_topk(sf_dir: str, k: int = 10, query_id: int = 0) -> Dataset:
    """Exact cosine top-k vs the embedding of ``query_id``; deterministic
    tie-break by vec_id. Returns (vec_id,) in rank order."""
    q = query_vector(sf_dir, query_id)
    q = q / np.linalg.norm(q)
    q_ref = ray.put(q)

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        from spider_ray.stages.broadcast import get_broadcast

        qv = get_broadcast(q_ref)
        m = _to_matrix(batch)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        cos = m @ qv
        ids = batch["vec_id"].to_numpy()
        order = np.lexsort((ids, -cos))[:k]
        return pd.DataFrame({"vec_id": ids[order].astype(np.int64), "cos": cos[order]})

    partials = _emb(sf_dir).map_batches(local_topk, batch_format="pandas", batch_size=8192)
    merged = partials.to_pandas()  # ≤ k × n_blocks rows — tiny
    order = np.lexsort((merged["vec_id"].to_numpy(), -merged["cos"].to_numpy()))[:k]
    out = merged.iloc[order][["vec_id"]].reset_index(drop=True)
    return ray.data.from_pandas(out)


_IVF_SEED = 11


def train_ivf_centroids(
    sf_dir: str,
    n_clusters: int = 16,
    sample: int = 2048,
    iters: int = 10,
    matrix: np.ndarray | None = None,
) -> np.ndarray:
    """Deterministic mini k-means on a driver-side sample — the coarse
    quantizer of an IVF index. At the 100 TB tier the sample is a
    ``random_sample`` of the embedding dataset; centroid training stays a
    driver-side numpy loop either way (centroids are tiny). Pass ``matrix``
    (already unit-normalized) to reuse a table the caller has read."""
    if matrix is None:
        tbl = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
        m = np.stack(tbl["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
    else:
        m = matrix
    rng = np.random.RandomState(_IVF_SEED)
    idx = rng.choice(len(m), size=min(sample, len(m)), replace=False)
    x = m[idx]
    n_clusters = min(n_clusters, len(x))  # tiny corpora: ≤1 point per cluster
    cent = x[rng.choice(len(x), size=n_clusters, replace=False)]
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)  # cosine on unit vectors
        for c in range(n_clusters):
            mask = assign == c
            if mask.any():
                v = x[mask].mean(axis=0)
                cent[c] = v / np.linalg.norm(v)
    return cent


def ivf_topk(
    sf_dir: str, k: int = 10, query_id: int = 0, nprobe: int = 4, n_clusters: int = 16
) -> pd.DataFrame:
    """IVF approximate top-k: scan only the ``nprobe`` clusters nearest the
    query. Centroids are broadcast; every batch assigns its vectors to
    clusters (one matmul) and scores only the rows in probed clusters —
    per-batch work shrinks by ~nprobe/n_clusters at scale (a real IVF
    pre-partitions the corpus by cluster id at ingest so non-probed
    clusters are never read at all; this is the streaming version)."""
    # one driver-side read serves the query vector AND centroid training
    tbl = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    m = np.stack(tbl["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    qi = tbl.column("vec_id").to_pylist().index(query_id)
    q = m[qi]
    cent = train_ivf_centroids(sf_dir, n_clusters, matrix=m)
    probe_set = set(np.argsort(-(cent @ q))[:nprobe].tolist())
    ref = ray.put((q, cent, probe_set))

    def scan(batch: pd.DataFrame) -> pd.DataFrame:
        from spider_ray.stages.broadcast import get_broadcast

        qv, c, ok = get_broadcast(ref)
        m = _to_matrix(batch)
        norm = m / np.linalg.norm(m, axis=1, keepdims=True)
        assign = (norm @ c.T).argmax(axis=1)
        keep = np.isin(assign, list(ok))
        if not keep.any():
            return pd.DataFrame(
                {"vec_id": pd.Series([], dtype=np.int64), "cos": pd.Series([], dtype=np.float64)}
            )
        cos = norm[keep] @ qv
        ids = batch["vec_id"].to_numpy()[keep]
        order = np.lexsort((ids, -cos))[:k]
        return pd.DataFrame({"vec_id": ids[order].astype(np.int64), "cos": cos[order]})

    partials = _emb(sf_dir).map_batches(scan, batch_format="pandas", batch_size=8192)
    merged = partials.to_pandas()
    order = np.lexsort((merged["vec_id"].to_numpy(), -merged["cos"].to_numpy()))[:k]
    return merged.iloc[order].reset_index(drop=True)


def _bucket_of(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    signs = (m @ planes.T) > 0
    return (signs << np.arange(planes.shape[0])).sum(axis=1).astype(np.int64)


def lsh_topk(sf_dir: str, k: int = 10, query_id: int = 0, probe_hamming: int = 1) -> pd.DataFrame:
    """Approximate top-k: scan only embeddings whose LSH bucket is within
    ``probe_hamming`` bit flips of the query's bucket."""
    rng = np.random.RandomState(_PLANES_SEED)
    q = query_vector(sf_dir, query_id)  # one read serves dim + query
    planes = rng.standard_normal((_N_PLANES, q.shape[0]))
    q = q / np.linalg.norm(q)
    qb = int(_bucket_of(q[None, :], planes)[0])
    allowed = {
        b
        for b in range(1 << _N_PLANES)
        if bin(b ^ qb).count("1") <= probe_hamming
    }
    q_ref = ray.put((q, planes, allowed))

    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        from spider_ray.stages.broadcast import get_broadcast

        qv, pl, ok = get_broadcast(q_ref)
        m = _to_matrix(batch)
        norm = m / np.linalg.norm(m, axis=1, keepdims=True)
        buckets = _bucket_of(norm, pl)
        keep = np.isin(buckets, list(ok))
        if not keep.any():
            return pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64), "cos": pd.Series([], dtype=np.float64)})
        cos = norm[keep] @ qv
        ids = batch["vec_id"].to_numpy()[keep]
        order = np.lexsort((ids, -cos))[:k]
        return pd.DataFrame({"vec_id": ids[order].astype(np.int64), "cos": cos[order]})

    partials = _emb(sf_dir).map_batches(probe, batch_format="pandas", batch_size=8192)
    merged = partials.to_pandas()
    order = np.lexsort((merged["vec_id"].to_numpy(), -merged["cos"].to_numpy()))[:k]
    return merged.iloc[order].reset_index(drop=True)
