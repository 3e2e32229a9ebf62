#!/usr/bin/env python
"""Pruned-read evidence for ``fetch_mode="partitioned"`` (BASELINE.md round 5).

For a one-host frontier slice, count the parquet row-groups/bytes that
survive the partitioned fetch's range+isin predicate via parquet
STATISTICS (``fragment.split_by_row_group``) against the whole corpus —
deterministic pruning evidence with no page-cache noise, the same
file/row-group pruning ``pyarrow.dataset`` applies inside
``stages.fetch.fetch_partitioned``.

Usage: python tools/pruned_probe.py [corpus_dir] [host] [n_urls]
(defaults match the bench corpus at /tmp/spider_ray_bench/corpus_p3000000).
"""
import json
import sys

import pyarrow.compute as pc
import pyarrow.dataset as pads

CORPUS = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spider_ray_bench/corpus_p3000000"
HOST = sys.argv[2] if len(sys.argv) > 2 else "h7"
N_URLS = int(sys.argv[3]) if len(sys.argv) > 3 else 1000

dset = pads.dataset(CORPUS)

total_rgs = 0
total_bytes = 0
for frag in dset.get_fragments():
    frag.ensure_complete_metadata()
    for rg in frag.row_groups:
        total_rgs += 1
        total_bytes += rg.total_byte_size

# an N-url frontier slice on one cold host (the per-round unit the
# partitioned fetch groups by)
urls = sorted(f"https://{HOST}.example/p{j}" for j in range(0, N_URLS * 5, 5))
flt = (
    (pc.field("url") >= urls[0])
    & (pc.field("url") <= urls[-1])
    & pc.field("url").isin(urls)
)
kept_rgs = 0
kept_bytes = 0
files = 0
for frag in dset.get_fragments(filter=flt):
    sub = frag.split_by_row_group(flt)
    n = 0
    for piece in sub:
        for rg in piece.row_groups:
            n += 1
            kept_bytes += rg.total_byte_size
    if n:
        files += 1
    kept_rgs += n

print(
    json.dumps(
        {
            "frontier_urls": len(urls),
            "corpus_row_groups": total_rgs,
            "corpus_bytes": total_bytes,
            "surviving_row_groups": kept_rgs,
            "surviving_bytes": kept_bytes,
            "surviving_files": files,
            "bytes_fraction": round(kept_bytes / total_bytes, 6),
        }
    )
)
