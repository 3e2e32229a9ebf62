"""Dense global rank assignment (distributed zip-with-index).

Ray Data has no native row-index operator, and a dense, gap-free
``discovery_rank`` is the engine's crawl-ordering contract (SURVEY.md §3.1:
first claim wins, canonical order = sort by ``(depth, discovery_rank)``).
This is the one place the engine drops to raw Ray tasks — the Dataset API
cannot express "number the rows of this sorted dataset" without a barrier
anyway, and the frontier being ranked is per-round metadata (url + a few
ints), orders of magnitude smaller than the page data, so materializing it
is safe at any scale the object store survives.

Mechanism: materialize the sorted dataset, read per-block row counts from
block METADATA only (no block fetch), prefix-sum the offsets on the driver,
then launch one tiny task per block that appends ``offset + arange(n)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset
from ray.data.block import BlockAccessor


@ray.remote
def _add_rank_block(block, offset: int, col: str, post_fn):
    tbl = BlockAccessor.for_block(block).to_arrow()
    ranks = pa.array(np.arange(offset, offset + tbl.num_rows, dtype=np.int64))
    tbl = tbl.append_column(col, ranks)
    return post_fn(tbl) if post_fn is not None else tbl


def assign_ranks(
    ds_sorted: Dataset, offset: int, col: str = "rank", post_fn=None
) -> tuple[Dataset | None, int]:
    """Append a dense int64 ``col`` numbering the rows of ``ds_sorted`` in
    dataset order, starting at ``offset``, then apply ``post_fn`` (an
    Arrow-table transform) inside the same per-block task — fusing any
    decode/projection step into the rank pass instead of paying another
    execution. Returns ``(dataset, n_rows)``; dataset is None when empty."""
    mds = ds_sorted.materialize()
    tasks = []
    n = 0
    for bundle in mds.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            rows = meta.num_rows
            assert rows is not None, "materialized block metadata must have num_rows"
            if rows == 0:
                continue
            tasks.append(_add_rank_block.remote(ref, offset + n, col, post_fn))
            n += rows
    if not tasks:
        return None, 0
    return ray.data.from_arrow_refs(tasks), n
