"""CTC decoders: on-device greedy (jit) + host beam search (C++/Python).

Decode strategy (SURVEY.md §7.3 item 1): training-time sequence extraction
is the batched on-device :func:`aptai_tpu.ops.ctc.greedy_decode`; evaluation
PER uses the lexicon-free beam search here — C++ when the native library is
available (built from ``native/``), bit-identical pure Python otherwise.
"""

from aptai_tpu.ops.ctc import greedy_decode
from aptai_tpu.decode.beam import beam_search, BeamHypothesis
from aptai_tpu.decode.native import (
    edit_distance,
    native_available,
    beam_search_native,
)

__all__ = [
    "greedy_decode",
    "beam_search",
    "BeamHypothesis",
    "edit_distance",
    "native_available",
    "beam_search_native",
]
