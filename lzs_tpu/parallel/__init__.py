"""Device-mesh parallelism for the LZS codec (jax.sharding / shard_map)."""

from .dist import (DistributedCodec, make_block_mesh, encode_sharded,
                   decode_sharded, initialize_distributed)

__all__ = ["DistributedCodec", "make_block_mesh", "encode_sharded",
           "decode_sharded", "initialize_distributed"]
