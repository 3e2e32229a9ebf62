import numpy as np
import pandas as pd
import pytest

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches from "
    "the warm windowsill and the birds sing in the garden under a bright sky"
)
NEAR = BASE.replace("bright", "cloudy")
OTHER = (
    "completely different content about database engines and vectorized "
    "execution with columnar storage formats and distributed shuffles"
)


@pytest.mark.usefixtures("ray_session")
def test_minhash_lsh_finds_planted_dupes():
    import ray

    from spider_ray.pipelines.dedup import minhash_lsh_pairs

    docs = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [BASE, BASE, NEAR, OTHER],
            }
        )
    )
    pairs = minhash_lsh_pairs(docs, jaccard_threshold=0.6).to_pandas()
    got = {(a, b) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    assert (1, 2) in got  # exact dup
    assert (1, 3) in got and (2, 3) in got  # near dup
    assert not any(4 in p for p in got)  # unrelated never pairs
    exact = pairs[(pairs.doc_a == 1) & (pairs.doc_b == 2)].iloc[0]
    assert exact.n_inter == exact.n_union  # jaccard exactly 1


@pytest.mark.usefixtures("ray_session")
def test_lsh_pipelines_invariant_to_partition_count():
    """VERDICT r2 item 6: the shuffle fan-out is a pure parallelism knob —
    output must be identical at any num_partitions."""
    import ray

    from spider_ray.pipelines.ann import embedding_near_dup_lsh
    from spider_ray.pipelines.dedup import minhash_lsh_pairs

    docs = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [1, 2, 3, 4], "text": [BASE, BASE, NEAR, OTHER]})
    )

    def canon(df, cols):
        return sorted(map(tuple, df[cols].itertuples(index=False)))

    mh = [
        canon(
            minhash_lsh_pairs(docs, jaccard_threshold=0.6, num_partitions=p).to_pandas(),
            ["doc_a", "doc_b", "n_inter", "n_union"],
        )
        for p in (2, 7)
    ]
    assert mh[0] == mh[1] and len(mh[0]) >= 3

    sf = "/root/testdata/sf0.001"
    emb = [
        canon(
            embedding_near_dup_lsh(sf, threshold_pct=40, num_partitions=p).to_pandas(),
            ["vec_a", "vec_b"],
        )
        for p in (2, 7)
    ]
    assert emb[0] == emb[1] and len(emb[0]) >= 1


def test_minhash_signature_deterministic_and_similar():
    from spider_ray.pipelines.dedup import minhash_signature

    s1, s2 = minhash_signature(BASE), minhash_signature(BASE)
    assert (s1 == s2).all()
    near = minhash_signature(NEAR)
    other = minhash_signature(OTHER)
    sim_near = (s1 == near).mean()
    sim_other = (s1 == other).mean()
    assert sim_near > 0.5 > sim_other  # minhash agreement ≈ jaccard


def test_sketch_views_matches_per_row_decode():
    """Buffer-level sketch decode must equal the per-row as_py()+frombuffer
    it replaced — across multiple chunks, a SLICED chunk (nonzero
    chunk.offset), an empty row, and both int32 (binary) and int64
    (large_binary) offset widths."""
    import pyarrow as pa

    from spider_ray.pipelines.dedup import sketch_views

    rows = [
        np.array([1, 5, 9], dtype=np.uint64),
        np.array([], dtype=np.uint64),
        np.arange(100, dtype=np.uint64),
        np.array([2**63 + 7], dtype=np.uint64),
        np.array([3, 4], dtype=np.uint64),
    ]
    payload = [r.tobytes() for r in rows]
    for typ in (pa.binary(), pa.large_binary()):
        full = pa.chunked_array(
            [pa.array(payload[:2], typ), pa.array(payload[2:], typ)]
        )
        got = sketch_views(full)
        assert len(got) == len(rows)
        for g, want in zip(got, rows):
            assert g.dtype == np.uint64 and np.array_equal(g, want)
        # sliced chunk: offsets window must respect chunk.offset
        sliced = pa.chunked_array([pa.array(payload, typ).slice(1, 3)])
        got_s = sketch_views(sliced)
        assert len(got_s) == 3
        for g, want in zip(got_s, rows[1:4]):
            assert np.array_equal(g, want)


def test_simhash_hamming_properties():
    from spider_ray.pipelines.dedup import simhash64

    a, b, c = simhash64(BASE), simhash64(NEAR), simhash64(OTHER)
    assert a == simhash64(BASE)
    ham = lambda x, y: bin(x ^ y).count("1")
    assert ham(a, b) < 12 < ham(a, c)


def test_rolling_fingerprint_deterministic():
    from spider_ray.pipelines.textops import rolling_fingerprint

    assert rolling_fingerprint(BASE) == rolling_fingerprint(BASE)
    assert rolling_fingerprint(BASE) != rolling_fingerprint(OTHER)


@pytest.mark.usefixtures("ray_session")
def test_lsh_topk_recall_vs_brute():
    from spider_ray.pipelines.ann import brute_topk, lsh_topk

    sf = "/root/testdata/sf0.001"
    exact = brute_topk(sf, k=10).to_pandas()["vec_id"].tolist()
    narrow = lsh_topk(sf, k=10, probe_hamming=1)["vec_id"].tolist()
    wide = lsh_topk(sf, k=10, probe_hamming=3)["vec_id"].tolist()
    # random near-orthogonal embeddings are LSH's worst case — require the
    # query itself (cos=1) always found, moderate recall, and recall
    # monotone in probe width
    r_narrow = len(set(exact) & set(narrow)) / 10
    r_wide = len(set(exact) & set(wide)) / 10
    assert exact[0] == 0 and narrow[0] == 0 and wide[0] == 0
    assert r_wide >= max(r_narrow, 0.4)


@pytest.mark.usefixtures("ray_session")
def test_ivf_topk_recall_vs_brute():
    from spider_ray.pipelines.ann import brute_topk, ivf_topk

    sf = "/root/testdata/sf0.001"
    exact = brute_topk(sf, k=10).to_pandas()["vec_id"].tolist()
    narrow = ivf_topk(sf, k=10, nprobe=2)["vec_id"].tolist()
    wide = ivf_topk(sf, k=10, nprobe=8)["vec_id"].tolist()
    # the query's own cluster is always probed → rank-1 is always found;
    # recall grows with nprobe (nprobe == n_clusters/2 scans half the data)
    assert exact[0] == 0 and narrow[0] == 0 and wide[0] == 0
    r_narrow = len(set(exact) & set(narrow)) / 10
    r_wide = len(set(exact) & set(wide)) / 10
    assert r_wide >= max(r_narrow, 0.5)


def test_fake_decoder_smoke():
    import pyarrow as pa

    from spider_ray.pipelines.multimodal import FakeDecoder, decode_image

    d = FakeDecoder()
    out = d(pa.table({"doc_id": [1], "payload": [b"abc"]}))
    assert out.column("payload_bytes").to_pylist() == [3]
    assert out.column("width").to_pylist()[0] >= 1
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


@pytest.mark.usefixtures("ray_session")
def test_embedding_near_dup_lsh_recall_and_precision():
    import duckdb

    from spider_ray.pipelines.ann import embedding_near_dup_lsh

    sf = "/root/testdata/sf0.001"
    got = embedding_near_dup_lsh(sf, threshold_pct=40).to_pandas()
    got_pairs = {(a, b) for a, b in zip(got["vec_a"], got["vec_b"])}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')"
    )
    exact = con.execute(
        "SELECT a.vec_id, b.vec_id FROM embeddings a, embeddings b "
        "WHERE a.vec_id < b.vec_id "
        "AND list_cosine_similarity(a.embedding, b.embedding)*100 >= 40"
    ).fetchall()
    exact_pairs = set(map(tuple, exact))

    # precision is EXACT by construction (every candidate re-verified)
    assert got_pairs <= exact_pairs or all(
        # float64-vs-duckdb boundary pairs are the only tolerated deltas
        abs(
            con.execute(
                "SELECT list_cosine_similarity(a.embedding, b.embedding)*100 "
                "FROM embeddings a, embeddings b WHERE a.vec_id=? AND b.vec_id=?",
                [pa, pb],
            ).fetchone()[0]
            - 40
        )
        < 1e-6
        for (pa, pb) in got_pairs - exact_pairs
    )
    # recall: 4-plane × 8-table signed-random-projection at cos≥0.4
    if exact_pairs:
        recall = len(got_pairs & exact_pairs) / len(exact_pairs)
        assert recall >= 0.5, recall


@pytest.mark.usefixtures("ray_session")
def test_embedding_near_dup_lsh_verify_paths_equal():
    """The broadcast-gram verify path (small vectors table, default) and the
    attach_payload verify path (beyond verify_broadcast_limit — the 100 TB
    route) must produce identical pair sets."""
    from spider_ray.pipelines.ann import embedding_near_dup_lsh

    sf = "/root/testdata/sf0.001"

    def canon(df):
        return sorted(map(tuple, df[["vec_a", "vec_b"]].itertuples(index=False)))

    bc = canon(embedding_near_dup_lsh(sf).to_pandas())
    at = canon(embedding_near_dup_lsh(sf, verify_broadcast_limit=0).to_pandas())
    assert bc == at and len(bc) >= 1


@pytest.mark.usefixtures("ray_session")
def test_simhash_near_dup_pairs_vs_oracle_and_exact_dups():
    """Pigeonhole banding: recall is exactly 1 by construction, so the
    all-pairs hamming SQL must match bit-for-bit; byte-identical docs
    (hamming 0) must always appear."""
    import duckdb

    from spider_ray.pipelines.dedup import simhash_near_dup_pairs

    sf = "/root/testdata/sf0.001"
    got = simhash_near_dup_pairs(sf).to_pandas()
    got_pairs = set(map(tuple, got[["doc_a", "doc_b"]].itertuples(index=False)))

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    from spider_ray.pipelines.registry import ORACLE_SQL

    exact = set(map(tuple, con.execute(ORACLE_SQL["simhash_near_dup_pairs"]).fetchall()))
    assert got_pairs == exact and len(exact) > 0

    # identical text → identical simhash → hamming 0 → must be present
    byte_dups = set(
        map(
            tuple,
            con.execute(
                "SELECT a.doc_id, b.doc_id FROM documents a JOIN documents b "
                "ON a.doc_id < b.doc_id AND a.text = b.text"
            ).fetchall(),
        )
    )
    assert byte_dups <= got_pairs

    # partition-count invariance (the shard fan-out is a parallelism knob)
    p2 = simhash_near_dup_pairs(sf, num_partitions=3).to_pandas()
    assert set(map(tuple, p2[["doc_a", "doc_b"]].itertuples(index=False))) == exact


@pytest.mark.usefixtures("ray_session")
def test_minhash_dedup_clusters_transitive_chain(tmp_path):
    """a~b and b~c above threshold with a~c BELOW it: the component is
    still {a,b,c} (transitive closure), rep = min id; untouched docs are
    absent from the output."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spider_ray.pipelines.dedup import minhash_dedup_clusters

    words = [f"w{i:03d}" for i in range(120)]
    texts = [
        " ".join(words[0:100]),    # J(0,1) ≈ 0.81 ≥ 0.8
        " ".join(words[10:110]),   # J(1,2) ≈ 0.81 ≥ 0.8
        " ".join(words[20:120]),   # J(0,2) ≈ 0.66 < 0.8
        "completely unrelated text about nothing shared at all here",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    out = minhash_dedup_clusters(str(tmp_path)).to_pandas()
    got = dict(zip(out["doc_id"], out["rep_id"]))
    assert got == {0: 0, 1: 0, 2: 0}


@pytest.mark.usefixtures("ray_session")
def test_cluster_branches_equal_on_planted_graph():
    """The distributed min-label-propagation branch must equal the driver
    union-find on a planted multi-component graph that exceeds the gate:
    a chain (propagation takes diameter iterations), a star, a triangle
    with a redundant edge, and an isolated pair."""
    import pyarrow as pa
    import ray

    from spider_ray.pipelines.dedup import (
        _clusters_label_propagation,
        _clusters_union_find,
    )

    edges = (
        [(i, i + 1) for i in range(10, 19)]          # chain 10..19 → rep 10
        + [(100, x) for x in (101, 102, 103)]        # star → rep 100
        + [(200, 201), (201, 202), (200, 202)]       # triangle + redundant
        + [(300, 301)]                               # isolated pair
    )
    tbl = pa.table(
        {
            "doc_a": pa.array([a for a, _ in edges], pa.int64()),
            "doc_b": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    want = _clusters_union_find(tbl.to_pandas()).to_pandas()
    got = _clusters_label_propagation(
        ray.data.from_arrow(tbl), num_shards=3
    ).to_pandas()
    assert got.equals(want)
    assert set(got[got.doc_id >= 10][got.doc_id < 20]["rep_id"]) == {10}


@pytest.mark.usefixtures("ray_session")
def test_minhash_dedup_clusters_gate_forced_low(tmp_path):
    """Forcing driver_pair_limit=0 (every pair set 'too large') must route
    through label propagation and produce the identical cluster table."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spider_ray.pipelines.dedup import minhash_dedup_clusters

    words = [f"w{i:03d}" for i in range(120)]
    texts = [
        " ".join(words[0:100]),
        " ".join(words[10:110]),
        " ".join(words[20:120]),
        " ".join(words[0:100]),  # byte dup of doc 0
        "completely unrelated text about nothing shared at all here",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    base = minhash_dedup_clusters(str(tmp_path)).to_pandas()
    forced = minhash_dedup_clusters(str(tmp_path), driver_pair_limit=0).to_pandas()
    assert forced.equals(base)
    assert dict(zip(base["doc_id"], base["rep_id"])) == {0: 0, 1: 0, 2: 0, 3: 0}


@pytest.mark.usefixtures("ray_session")
def test_simhash_pairs_two_level_merge_equal(monkeypatch):
    """Pipeline-level pin for final_merge's threshold guard: forcing the
    intermediate repartition(cpus) merge level must not change the
    simhash near-dup answer (VERDICT r3 item 7 done-condition)."""
    import functools

    import spider_ray.blockutil as B
    from spider_ray.pipelines.dedup import simhash_near_dup_pairs

    sf = "/root/testdata/sf0.001"
    base = simhash_near_dup_pairs(sf).to_pandas()
    orig = B.final_merge
    monkeypatch.setattr(
        B, "final_merge", functools.partial(orig, threshold_rows=1)
    )
    forced = simhash_near_dup_pairs(sf).to_pandas()
    key = ["doc_a", "doc_b"]
    assert base.sort_values(key).reset_index(drop=True).equals(
        forced.sort_values(key).reset_index(drop=True)
    )
    assert len(base) > 0
