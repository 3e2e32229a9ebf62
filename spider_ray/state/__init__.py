from spider_ray.state.seen import (
    BloomSeen,
    ExactSeen,
    UrlSeenShard,
    iter_shard_groups,
    route_sentinel,
    shard_ids_batch,
    shard_of,
)

__all__ = [
    "BloomSeen",
    "ExactSeen",
    "UrlSeenShard",
    "iter_shard_groups",
    "route_sentinel",
    "shard_ids_batch",
    "shard_of",
]
