"""Multi-chip parallelism: spatial sharding with halo exchange (shard_map)."""
