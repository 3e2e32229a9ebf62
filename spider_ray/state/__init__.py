from spider_ray.state.seen import BloomSeen, ExactSeen, UrlSeenShard, shard_of

__all__ = ["BloomSeen", "ExactSeen", "UrlSeenShard", "shard_of"]
