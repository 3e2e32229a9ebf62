#!/usr/bin/env python
"""Bloom seen-mode evidence run (BASELINE.md round 5): one exact crawl and one
bloom crawl over the 3M bench corpus; compare crawled counts, seen counts
and an order-independent store checksum (equal ⇔ zero urls dropped by bloom
false positives), and record per-shard stats for the bloom run."""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

if not ray.is_initialized():
    ray.init(
        address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR"
    )
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from spider_ray.pipelines.crawl import crawl, read_store

CORPUS = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spider_ray_bench/corpus_p3000000"
SEEDS = [f"https://h{k}.example/p0" for k in range(64)]


def store_checksum(out_dir: str) -> int:
    ds = read_store(out_dir, columns=["url", "depth", "discovery_rank"])

    def part(b: pa.Table) -> pa.Table:
        h = pd.util.hash_array(np.asarray(b.column("url").to_pylist(), dtype=object))
        mix = h ^ (b.column("depth").to_numpy().astype(np.uint64) << np.uint64(48)) ^ (
            b.column("discovery_rank").to_numpy().astype(np.uint64)
        )
        # wraparound sum — order-independent
        return pa.table({"s": pa.array([int(mix.sum(dtype=np.uint64))], pa.uint64())})

    parts = ds.map_batches(part, batch_format="pyarrow", batch_size=None)
    tot = np.uint64(0)
    for r in parts.take_all():
        tot = tot + np.uint64(r["s"])
    return int(tot)


results = {}
for mode in ("exact", "bloom"):
    out = f"/tmp/spider_ray_bench/out_bloomeq_{mode}"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.perf_counter()
    res = crawl(
        CORPUS,
        SEEDS,
        out,
        max_depth=7,
        seen_shards=32,
        seen_mode=mode,
        bloom_bits=1 << 27,
        collect_shard_stats=True,
    )
    el = time.perf_counter() - t0
    results[mode] = {
        "sec": round(el, 2),
        "crawled": res.crawled,
        "total_calls": res.total_calls,
        "seen_count": res.seen_count,
        "checksum": store_checksum(out),
        "shard_stats": res.shard_stats,
    }

ex, bl = results["exact"], results["bloom"]
summary = {
    "crawled_equal": ex["crawled"] == bl["crawled"],
    "calls_equal": ex["total_calls"] == bl["total_calls"],
    "seen_equal": ex["seen_count"] == bl["seen_count"],
    "checksum_equal": ex["checksum"] == bl["checksum"],
    "dropped_urls": ex["seen_count"] - bl["seen_count"],
    "exact_sec": ex["sec"],
    "bloom_sec": bl["sec"],
    "exact_crawled": ex["crawled"],
    "bloom_crawled": bl["crawled"],
    "exact_shard_state_bytes_max": max(s["state_bytes"] for s in ex["shard_stats"]),
    "bloom_shard_state_bytes_max": max(s["state_bytes"] for s in bl["shard_stats"]),
    "exact_shard_rss_max": max(s["rss_bytes"] for s in ex["shard_stats"]),
    "bloom_shard_rss_max": max(s["rss_bytes"] for s in bl["shard_stats"]),
    "exact_items_max": max(s["n_items"] for s in ex["shard_stats"]),
    "bloom_items_max": max(s["n_items"] for s in bl["shard_stats"]),
}
print(json.dumps(summary))
ray.shutdown()
