"""Oracle tests for the iterative operators: integer PageRank (DuckDB
unrolled-CTE oracle, including a gapped-doc_id corpus) and quantized
k-means (sequential numpy oracle implementing the same integer formulas —
the distributed result must be IDENTICAL, not just close, because every
step is addition-order-free integer arithmetic)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF001 = "/root/testdata/sf0.001"


def _df(obj) -> pd.DataFrame:
    from ray.data import Dataset

    df = obj.to_pandas() if isinstance(obj, (Dataset, pa.Table)) else obj.copy()
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


@pytest.mark.usefixtures("ray_session")
def test_pagerank_gapped_doc_ids(tmp_path):
    """doc_ids with gaps (dsts that hit a gap drop identically on both
    engines) and a non-power-of-two count still match the SQL oracle."""
    from spider_ray.pipelines.graph import pagerank_docs, pagerank_sql

    ids = np.array([0, 1, 2, 5, 7, 11, 13, 17, 23, 29, 31], dtype=np.int64)
    pq.write_table(
        pa.table({"doc_id": pa.array(ids)}), str(tmp_path / "documents.parquet")
    )
    got = _df(pagerank_docs(str(tmp_path), iterations=4, k=50))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = _df(con.execute(pagerank_sql(iterations=4, k=50)).fetch_df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) == len(ids)  # k=50 > nodes → every node ranked


@pytest.mark.usefixtures("ray_session")
def test_pagerank_empty_corpus(tmp_path):
    from spider_ray.pipelines.graph import pagerank_docs

    pq.write_table(
        pa.table({"doc_id": pa.array([], pa.int64())}),
        str(tmp_path / "documents.parquet"),
    )
    assert len(_df(pagerank_docs(str(tmp_path)))) == 0


def _kmeans_sequential(sf_dir: str, k: int, iterations: int, quant_scale: int):
    """Single-process reference: the same quantized Lloyd's, no Ray."""
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).sort_by("vec_id")
    vecs = np.floor(
        np.array(t.column("embedding").to_pylist(), dtype=np.float64) * quant_scale
    ).astype(np.int64)
    cent = vecs[:k].copy()

    def assign(q, c):
        d2 = (
            (q * q).sum(axis=1, keepdims=True)
            - 2 * (q @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        return np.argmin(d2, axis=1)

    for _ in range(iterations):
        a = assign(vecs, cent)
        counts = np.bincount(a, minlength=k)
        sums = np.zeros_like(cent)
        np.add.at(sums, a, vecs)
        nz = counts > 0
        cent = cent.copy()
        cent[nz] = sums[nz] // counts[nz, None]
    a = assign(vecs, cent)
    counts = np.bincount(a, minlength=k)
    nz = np.flatnonzero(counts)
    return pd.DataFrame(
        {"cluster_id": nz.astype(np.int64), "n_vecs": counts[nz].astype(np.int64)}
    )


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("k,iters", [(8, 5), (3, 2)])
def test_kmeans_matches_sequential_oracle(k, iters):
    from spider_ray.pipelines.ann import kmeans_clusters

    got = _df(kmeans_clusters(SF001, k=k, iterations=iters))
    want = _df(_kmeans_sequential(SF001, k=k, iterations=iters, quant_scale=1 << 16))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["n_vecs"].sum() == 500
