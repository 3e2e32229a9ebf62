"""Block-level utilities for working around Ray Data block-schema gaps."""

from __future__ import annotations

import pyarrow as pa
import ray
from ray.data import Dataset


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
