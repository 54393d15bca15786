"""CTC decoders: on-device greedy + on-device beam (jit) + host beam (C++/Python).

Decode strategy (SURVEY.md §7.3 item 1): training-time sequence extraction
is the batched on-device :func:`aptai_tpu.ops.ctc.greedy_decode`; true beam
search is available both ON DEVICE (:func:`beam_decode_device`, jit-compatible
batched prefix search — usable inside train/predict steps) and on the host
(:func:`beam_search` — C++ when the native library is available, built from
``native/``; bit-identical pure Python otherwise).  The device and host beams
produce identical sequences and timesteps (tests/test_device_beam.py).
"""

from aptai_tpu.ops.ctc import greedy_decode
from aptai_tpu.decode.beam import beam_search, beam_decode_padded, BeamHypothesis
from aptai_tpu.decode.device import beam_decode_device
from aptai_tpu.decode.native import (
    edit_distance,
    native_available,
    beam_search_native,
)

__all__ = [
    "greedy_decode",
    "beam_search",
    "beam_decode_padded",
    "beam_decode_device",
    "BeamHypothesis",
    "edit_distance",
    "native_available",
    "beam_search_native",
]
