from .checkpoint import ShardManifest, completed_shards, write_shard_atomic  # noqa: F401
