"""lzs_tpu — a TPU-native LZS (ANSI X3.241-1994) compression framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
LZS implementation (cmcqueen/lzs-compression): bit-exact LZS round-trip,
block-parallel encode/decode on TPU, streaming/incremental APIs with carried
window state, generalized offset/length coders, a native C++ host runtime,
and multi-chip scaling via jax.sharding.

Layering (mirrors SURVEY.md section 1):
  spec.py        wire-format constants (L1)
  reference.py   executable NumPy specification / oracle (L2 spec)
  coders.py      generalized pluggable offset/length coders (P4/P5 parity)
  lzcm.py        generalized LZ coder pipeline (P6 parity)
  ops/           XLA/Pallas compute path: match search, tokenize, bitpack,
                 encode, decode (L2 TPU)
  blocks.py      multi-block batch API on one chip (L3)
  stream.py      incremental/streaming API with carried state (L3)
  parallel/      device-mesh sharding and collectives
  utils/         bit utilities, native C++ bindings
  cli.py         file-to-file compress/decompress (L4)
"""

from .spec import LzsConfig, DEFAULT_CONFIG, compressed_max
from .reference import lzs_compress, lzs_decompress

__version__ = "0.1.0"

__all__ = [
    "LzsConfig",
    "DEFAULT_CONFIG",
    "compressed_max",
    "lzs_compress",
    "lzs_decompress",
]
