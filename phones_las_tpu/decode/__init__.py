"""Decoding: jit-compiled greedy and vectorized beam search.

Replaces the reference's ``GreedyEmbeddingHelper`` / ``BeamSearchDecoder``
+ ``tile_batch`` ``dynamic_decode`` while-loops (SURVEY.md §4.2/§4.3 hot
loops) with static-shape ``lax.scan`` loops: a fixed step cap proportional
to the encoder length, finished-row masking instead of dynamic exit, and
beams vectorized as an extra batch axis (PAPERS.md: arXiv:1811.04568).
"""

from phones_las_tpu.decode.greedy import greedy_decode  # noqa: F401
from phones_las_tpu.decode.beam import beam_decode  # noqa: F401
