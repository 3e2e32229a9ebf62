"""Block-level utilities for working around Ray Data block-schema gaps."""

from __future__ import annotations

import pyarrow as pa
import ray
from ray.data import Dataset


def strip_schema_metadata(ds: Dataset) -> Dataset:
    """Zero-copy per-block pass dropping schema-level metadata.

    Parquet written via pandas carries a ``b'pandas'`` schema-metadata blob;
    ``hash(pa.Schema)`` RAISES on such schemas (the embedded dict), which
    makes every downstream block-coalescing step log ``Failed to hash the
    schemas (for deduplication)`` and fall back to the slow unify path.
    Apply directly after ``read_parquet`` of pandas-written files
    (``batch_size=None`` = one batch per block, so this pass itself never
    coalesces)."""
    return ds.map_batches(
        lambda t: t.replace_schema_metadata(None),
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
    )


def drop_empty_blocks(ds: Dataset, empty_schema: pa.Schema | None = None) -> Dataset:
    """Materialize ``ds`` and rebuild it from its non-empty block refs only
    (block METADATA is inspected, blocks are never fetched to the driver).

    EVERY ``Dataset.join`` input must pass through here (ray 2.49): the
    hash-shuffle operator broadcasts each input's schema to the aggregators
    via empty blocks piggybacked on the FIRST submitted shuffle task
    (hash_shuffle.py:584 ``send_empty_blocks=should_broadcast_schemas``),
    but a shuffle task whose input block is empty returns early WITHOUT
    sending anything (hash_shuffle.py:223) — so when an empty block happens
    to be the first one submitted, partitions that receive no data rows get
    ZERO-COLUMN tables and Arrow's join raises ``No match or multiple
    matches for key field reference``. Block arrival order is
    load-dependent, which made this a flake. Related: the hash-aggregate
    itself emits zero-column blocks for empty output partitions, and
    ``map_batches`` skips empty blocks entirely, so they cannot be
    normalized by a downstream transform — dropping the blocks is the only
    reliable fix."""
    mds = ds.materialize()
    refs = []
    for bundle in mds.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            if meta.num_rows:
                refs.append(ref)
    if not refs:
        if empty_schema is None:
            base = getattr(mds.schema(), "base_schema", None)
            empty_schema = base if isinstance(base, pa.Schema) else pa.schema([])
        return ray.data.from_arrow(empty_schema.empty_table())
    return ray.data.from_arrow_refs(refs)


def default_join_partitions(floor: int = 4, cap: int = 256) -> int:
    """Join/aggregate fan-out scaled to the cluster: ~one hash partition per
    CPU, floored and capped. A hard-coded ``num_partitions=4`` is right at
    sf0.1 on one node but funnels every shuffle of a 256-node cluster
    through 4 reducers; deriving it from ``cluster_resources`` keeps reducer
    parallelism proportional to the machine."""
    return max(floor, min(cap, int(ray.cluster_resources().get("CPU", 4))))


def read_clean_parquet(path, columns: list[str] | None = None, **kwargs) -> Dataset:
    """``read_parquet`` with the file's schema passed EXPLICITLY, minus
    metadata. Pandas-written parquet carries a ``b'pandas'`` schema-metadata
    blob whose embedded dict makes ``hash(pa.Schema)`` raise, so every
    block-coalescing step (``SplitBlocks``, unions, shuffles) inside the
    READ op itself logs ``Failed to hash the schemas (for deduplication)``
    and falls back to the slow unify path — a downstream
    ``strip_schema_metadata`` map can't reach those. Stripping at the read
    means blocks never carry the blob at all. When ``columns`` is given the
    schema must describe exactly the selected columns (ray 2.49 contract)."""
    import glob
    import os

    import pyarrow.parquet as pq

    probe = path
    if isinstance(path, (list, tuple)):
        probe = path[0]
    if os.path.isdir(probe):
        probe = sorted(glob.glob(os.path.join(probe, "**", "*.parquet"), recursive=True))[0]
    full = pq.read_schema(probe).remove_metadata()
    schema = pa.schema([full.field(c) for c in columns]) if columns else full
    return ray.data.read_parquet(path, columns=columns, schema=schema, **kwargs)
