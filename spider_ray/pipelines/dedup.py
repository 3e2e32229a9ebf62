"""Deduplication family over a documents table — exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine — each shaped for the 100 TB tier:

- **exact**: content-hash column (vectorized md5) → ``groupby(fp)`` →
  first-wins (min doc_id). One shuffle over (fp, doc_id) pairs only — the
  text never moves.
- **MinHash+LSH**: per-doc shingles → 64 minhashes (one blake2b per shingle
  + 64 universal-hash permutations, numpy) → ``bands`` explode to
  ``(band_id, band_key, doc_id)`` rows → ``groupby(band)`` emits candidate
  pairs → pairs verified with EXACT shingle-set Jaccard. Only candidate
  pairs (a vanishing fraction at scale) ever touch text again.
- **SimHash**: 64-bit sign-aggregated word-feature hash per doc; near-dups
  = small Hamming distance (verified in tests on planted near-dups).
- **embedding near-dup**: cosine ≥ τ over an embedding column; brute-force
  within a bounded id range (the oracle-checked baseline), LSH-bucketed for
  the scale path (see ann.py).

The verify stage looks document text up via a broadcast ``ray.put`` table —
right while the candidate set fits memory; at 10^10 docs this becomes a hash
join of pairs against the documents table on doc_id.
"""

from __future__ import annotations

import hashlib
import os
from itertools import combinations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
from ray.data import Dataset
from ray.data.aggregate import Min

# 64 universal-hash permutations over a Mersenne prime — fixed seeds, so
# every worker computes identical signatures.
_MINHASH_PERMS = 64
_PRIME = (1 << 61) - 1
_rng = np.random.RandomState(42)
_A = _rng.randint(1, _PRIME, size=_MINHASH_PERMS, dtype=np.int64).astype(np.uint64)
_B = _rng.randint(0, _PRIME, size=_MINHASH_PERMS, dtype=np.int64).astype(np.uint64)
_BANDS = 16
_ROWS_PER_BAND = _MINHASH_PERMS // _BANDS


def _docs(sf_dir: str, columns):
    return ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def shingle_set(text: str, n: int = 3) -> set[str]:
    words = text.lower().split()
    if len(words) < n:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    return np.array(
        [
            int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")
            for s in shingle_set(text, n)
        ],
        dtype=np.uint64,
    )


def minhash_signature(text: str, n: int = 3) -> np.ndarray:
    """64 minhash values (uint64) for the doc's shingle set."""
    h = _shingle_hashes(text, n)
    if h.size == 0:
        return np.full(_MINHASH_PERMS, np.iinfo(np.uint64).max, dtype=np.uint64)
    # (perms × shingles) universal hash, min over shingles — vectorized
    v = (h[None, :] * _A[:, None] + _B[:, None]) % np.uint64(_PRIME)
    return v.min(axis=1)


def band_keys(sig: np.ndarray) -> list[bytes]:
    return [sig[b * _ROWS_PER_BAND : (b + 1) * _ROWS_PER_BAND].tobytes() for b in range(_BANDS)]


def exact_dedup(sf_dir: str) -> Dataset:
    """First-wins exact dedup by content hash (A3 — the reference's
    UNIQUE(url) upsert key, schema.py:15, over text instead of url)."""

    def fp(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "fp": [hashlib.md5(t.encode()).hexdigest() for t in batch["text"]],
                "doc_id": batch["doc_id"],
            }
        )

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(fp, batch_format="pandas")
    return ds.groupby("fp").aggregate(Min("doc_id", alias_name="doc_id"))


def minhash_lsh_pairs(
    docs: Dataset | str, jaccard_threshold: float = 0.8
) -> Dataset:
    """MinHash+LSH near-dup candidate generation + exact-Jaccard verify.

    Returns one row per verified pair: (doc_a, doc_b, n_inter, n_union) with
    doc_a < doc_b and n_inter/n_union ≥ threshold (counts kept as ints so
    results are exactly comparable; jaccard = n_inter/n_union)."""
    if isinstance(docs, str):
        texts_tbl = pq.read_table(
            os.path.join(docs, "documents.parquet"), columns=["doc_id", "text"]
        )
        # reuse the one read, but re-split: from_arrow yields ONE block and
        # the minhash pass is CPU-heavy — a single task would serialize it
        docs = ray.data.from_arrow(texts_tbl).repartition(
            max(1, min(64, texts_tbl.num_rows // 128))
        )
    else:
        texts_tbl = pa.concat_tables(
            ray.get(list(docs.to_arrow_refs()))
        ).select(["doc_id", "text"])
    texts_ref = ray.put(
        dict(zip(texts_tbl.column("doc_id").to_pylist(), texts_tbl.column("text").to_pylist()))
    )

    def to_bands(batch: pd.DataFrame) -> pd.DataFrame:
        ids, bids, keys = [], [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            sig = minhash_signature(text)
            for b, key in enumerate(band_keys(sig)):
                ids.append(doc_id)
                bids.append(b)
                keys.append(hashlib.blake2b(key, digest_size=8).hexdigest())
        return pd.DataFrame({"doc_id": ids, "band_id": bids, "band_key": keys})

    bands = docs.map_batches(to_bands, batch_format="pandas")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(g["doc_id"]))
        pairs = list(combinations(ids, 2))
        if not pairs:
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64), "doc_b": pd.Series([], dtype=np.int64)})
        a, b = zip(*pairs)
        return pd.DataFrame({"doc_a": np.asarray(a, np.int64), "doc_b": np.asarray(b, np.int64)})

    cand = bands.groupby(["band_id", "band_key"]).map_groups(bucket_pairs, batch_format="pandas")
    # a pair can surface from several bands — dedupe before the verify stage
    cand = cand.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )

    thr = jaccard_threshold

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        from spider_ray.stages.broadcast import get_broadcast

        texts = get_broadcast(texts_ref)  # deserialized once per worker
        rows = []
        for a, b in zip(batch["doc_a"], batch["doc_b"]):
            sa, sb = shingle_set(texts[a]), shingle_set(texts[b])
            inter = len(sa & sb)
            union = len(sa | sb)
            if union and inter >= thr * union:
                rows.append((a, b, inter, union))
        return pd.DataFrame(
            rows, columns=["doc_a", "doc_b", "n_inter", "n_union"]
        ).astype({"doc_a": np.int64, "doc_b": np.int64, "n_inter": np.int64, "n_union": np.int64})

    return cand.map_batches(verify, batch_format="pandas", batch_size=4096)


def simhash64(text: str) -> int:
    """64-bit SimHash over word features (blake2b word hashes, ±1 per bit)."""
    acc = np.zeros(64, dtype=np.int64)
    for w in text.lower().split():
        h = int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "little")
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    return int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def simhash_table(sf_dir: str) -> Dataset:
    def f(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "simhash": [format(simhash64(t), "016x") for t in batch["text"]],
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pandas")


def embedding_near_dup_pairs(
    sf_dir: str, threshold_pct: int = 40, max_id: int = 200
) -> Dataset:
    """Embedding-cosine near-dup pairs among vec_id < max_id (bounded so the
    O(n²) oracle stays cheap; the unbounded scale path is LSH-bucketed, see
    ann.lsh_topk). Cosine compared in float64 against an integer percent
    threshold; returns (vec_a, vec_b) pairs with cos ≥ threshold_pct/100."""
    tbl = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    tbl = tbl.filter(pa.compute.less(tbl["vec_id"], max_id))
    ids = np.asarray(tbl["vec_id"])
    m = np.stack(tbl["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    ia, ib = np.triu_indices(len(ids), k=1)
    keep = sims[ia, ib] * 100 >= threshold_pct
    out = pa.table(
        {
            "vec_a": pa.array(ids[ia[keep]], pa.int64()),
            "vec_b": pa.array(ids[ib[keep]], pa.int64()),
        }
    )
    return ray.data.from_arrow(out)
