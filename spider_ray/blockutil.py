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


def drop_empty_blocks(ds: Dataset, empty_schema: pa.Schema) -> Dataset:
    """Materialize ``ds`` and rebuild it from its non-empty block refs only
    (block METADATA is inspected, blocks are never fetched to the driver).

    Needed because Ray's hash-aggregate represents empty output partitions
    as ZERO-COLUMN blocks, ``map_batches`` skips empty blocks entirely (so
    they cannot be normalized downstream), and Arrow's join raises on a
    columnless partition. Any aggregate output that feeds a ``Dataset.join``
    must pass through here."""
    mds = ds.materialize()
    refs = []
    for bundle in mds.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            if meta.num_rows:
                refs.append(ref)
    if not refs:
        return ray.data.from_arrow(empty_schema.empty_table())
    return ray.data.from_arrow_refs(refs)
