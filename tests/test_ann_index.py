"""IVF bucketed-index tests: the ingest-time cluster layout must (a) agree
with brute force when every cluster is probed, and (b) physically prune —
a narrow probe reads only its buckets' files, not the whole table."""

import glob
import os

import numpy as np
import pytest


SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_ivf_ingest_bucketed_probe(tmp_path):
    import pyarrow.parquet as pq

    from spider_ray.pipelines.ann import (
        brute_topk,
        ivf_topk_bucketed,
        ivf_ingest,
        query_vector,
    )

    idx = str(tmp_path / "ivf")
    cent = ivf_ingest(SF, idx, n_clusters=8)
    bucket_dirs = glob.glob(os.path.join(idx, "cluster=*"))
    assert len(bucket_dirs) > 2  # real spread across clusters

    # probing every cluster == exact brute force
    exact = brute_topk(SF, k=10).to_pandas()["vec_id"].tolist()
    allp = ivf_topk_bucketed(SF, idx, k=10, nprobe=len(bucket_dirs))[
        "vec_id"
    ].tolist()
    assert allp == exact

    # a narrow probe touches STRICTLY fewer rows than the table holds —
    # the pruned-read property the layout exists for
    q = query_vector(SF, 0)
    q = q / np.linalg.norm(q)
    probes = np.argsort(-(cent @ q))[:2].tolist()
    probed_rows = sum(
        pq.read_metadata(f).num_rows
        for c in probes
        for f in glob.glob(os.path.join(idx, f"cluster={c}", "*.parquet"))
    )
    total_rows = pq.read_metadata(os.path.join(SF, "embeddings.parquet")).num_rows
    assert 0 < probed_rows < total_rows

    narrow = ivf_topk_bucketed(SF, idx, k=10, nprobe=2)
    assert narrow["vec_id"].iloc[0] == 0  # query's own cluster always probed


@pytest.mark.usefixtures("ray_session")
def test_query_vector_pushdown_matches_full_read():
    import pyarrow.parquet as pq

    from spider_ray.pipelines.ann import query_vector

    tbl = pq.read_table(os.path.join(SF, "embeddings.parquet"))
    i = tbl.column("vec_id").to_pylist().index(3)
    full = np.asarray(tbl.column("embedding")[i].as_py(), dtype=np.float64)
    assert np.array_equal(query_vector(SF, 3), full)
    with pytest.raises(KeyError):
        query_vector(SF, 10**9)
