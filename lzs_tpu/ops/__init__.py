"""XLA/Pallas compute path for the LZS codec.

Pipeline stages (each stage is a pure, jittable function over fixed shapes):

  match.py     per-position best-match table (offset, capped score, full run)
  tokenize.py  greedy token chain via pointer doubling; per-position
               emission units and bit widths
  bitpack.py   MSB-first bit packing via prefix-summed offsets + scatter
  encode.py    full encode pipeline (bytes -> LZS stream)
  decode.py    bit-parse scan + pointer-doubling copy expansion
"""

from .encode import encode_block, make_encoder
from .decode import decode_block, make_decoder

__all__ = ["encode_block", "make_encoder", "decode_block", "make_decoder"]
