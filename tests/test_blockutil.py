"""drop_empty_blocks: the join-input sanitizer (see blockutil docstring for
the ray 2.49 shuffle schema-broadcast race it guards against)."""

import pyarrow as pa
import pytest


@pytest.mark.usefixtures("ray_session")
def test_drop_empty_blocks_removes_empties_keeps_rows():
    import ray

    from spider_ray.blockutil import drop_empty_blocks

    t = pa.table({"a": pa.array([1, 2, 3], pa.int64())})
    empty = pa.table({"a": pa.array([], pa.int64())})
    ds = ray.data.from_arrow([empty, t, empty])
    out = drop_empty_blocks(ds)
    assert out.count() == 3
    for bundle in out.materialize().iter_internal_ref_bundles():
        for meta in bundle.metadata:
            assert meta.num_rows > 0


@pytest.mark.usefixtures("ray_session")
def test_drop_empty_blocks_all_empty_keeps_schema():
    import ray

    from spider_ray.blockutil import drop_empty_blocks

    schema = pa.schema([("a", pa.int64()), ("b", pa.string())])
    ds = ray.data.from_arrow(schema.empty_table())
    out = drop_empty_blocks(ds, schema)
    assert out.count() == 0
    assert [f for f in out.schema().base_schema] == list(schema)


@pytest.mark.usefixtures("ray_session")
def test_attach_payload_inner_join_semantics():
    """attach_payload == inner equi-join: matched keys gain the payload,
    unmatched pair rows drop, payload-only keys never surface."""
    import numpy as np
    import pandas as pd
    import ray

    from spider_ray.blockutil import attach_payload

    pairs = ray.data.from_pandas(
        pd.DataFrame({"a": [1, 2, 9, 3], "b": [10, 20, 90, 30]})
    ).repartition(3)
    payload = ray.data.from_pandas(
        pd.DataFrame({"pk": [1, 2, 3, 4], "pv": [b"x1", b"x2", b"x3", b"x4"]})
    ).repartition(2)
    out = attach_payload(
        pairs,
        payload,
        pairs_key="a",
        payload_key="pk",
        payload_col="pv",
        out_col="v",
        pair_cols={"a": np.int64(0), "b": np.int64(0)},
        num_shards=4,
    ).to_pandas()
    got = {(r.a, r.b, bytes(r.v)) for r in out.itertuples()}
    # key 9 has no payload (dropped); key 4's payload has no pair (dropped)
    assert got == {(1, 10, b"x1"), (2, 20, b"x2"), (3, 30, b"x3")}


@pytest.mark.usefixtures("ray_session")
def test_attach_payload_dedup_on_is_global():
    """dedup_on containing pairs_key dedups GLOBALLY: every copy of a pair
    hashes to the same shard regardless of which input block it came from."""
    import numpy as np
    import pandas as pd
    import ray

    from spider_ray.blockutil import attach_payload

    # the same (a, b) pair repeated across 4 separate input blocks
    dup = pd.DataFrame({"a": [7], "b": [70]})
    pairs = ray.data.from_pandas([dup, dup, dup, dup])
    payload = ray.data.from_pandas(pd.DataFrame({"pk": [7], "pv": [b"p"]}))
    out = attach_payload(
        pairs,
        payload,
        pairs_key="a",
        payload_key="pk",
        payload_col="pv",
        out_col="v",
        pair_cols={"a": np.int64(0), "b": np.int64(0)},
        num_shards=3,
        dedup_on=["a", "b"],
    ).to_pandas()
    assert len(out) == 1


@pytest.mark.usefixtures("ray_session")
def test_aggregate_then_join_with_empty_partitions():
    """The original failure shape: multi-block input → hash aggregate
    (emits zero-column blocks for empty partitions) → join."""
    import ray
    from ray.data.aggregate import Count

    from spider_ray.blockutil import drop_empty_blocks

    base = pa.table(
        {"k": pa.array([1, 2, 1], pa.int64()), "v": pa.array([2, 3, 2], pa.int64())}
    )
    right = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3], pa.int64()), "p": pa.array([b"x", b"y", b"z"])})
    )
    agg = (
        ray.data.from_arrow(base)
        .repartition(3)
        .groupby(["k", "v"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )
    cleaned = drop_empty_blocks(agg, pa.schema([("k", pa.int64()), ("v", pa.int64())]))
    j = cleaned.join(right, join_type="inner", num_partitions=4, on=("k",))
    assert len(j.to_pandas()) == 2
