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
