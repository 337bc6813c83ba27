from .seen import BloomFilter, ExactSet, SeenShard, ShardedSeen  # noqa: F401
