"""aptai_tpu — a TPU-native (JAX / XLA / Pallas / pjit) speech framework.

A ground-up rebuild of the capabilities of the reference ``tobwei/APTAI``
(Interspeech 2024: speaker- and text-independent estimation of articulatory
movements and phoneme alignments from speech):

* a wav2vec2-style acoustic stack (conv feature extractor + 24-layer
  transformer encoder) written in Flax, running bf16 on the MXU with a
  Pallas flash-attention kernel,
* multi-task heads: CTC phoneme recognition (``W2V2PR``), frame-level
  phoneme classification + 9-dim articulatory tract-variable regression
  (``APTAI``), and the cross-attention forced-alignment variant
  (``ForceAPTAI``),
* a device-side audio front-end (resample / mel / FIR smoothing /
  interpolation) expressed as XLA ops,
* a shared training harness with data-parallel + tensor-parallel
  ``jax.sharding`` over a device mesh, and
* batched, real-time-factor-optimized inference entry points.

Layout
------
``aptai_tpu.ops``       numerical primitives (CTC, ForwardSum, FIR, signal DSP,
                        attention incl. Pallas flash kernel, LSTM scan)
``aptai_tpu.models``    Flax model definitions + HF weight conversion
``aptai_tpu.parallel``  mesh construction and sharding rules
``aptai_tpu.data``      corpora, manifests, batching, offline HPRC prep
``aptai_tpu.train``     config, LR schedule, metrics, harness, LOSO driver
``aptai_tpu.decode``    greedy (on-device) and beam (C++/Python) CTC decoders
``aptai_tpu.infer``     user-facing inference APIs incl. long-audio streaming
"""

__version__ = "0.2.0"  # keep in sync with pyproject.toml

TV_ORDER = ("LA", "LP", "JA", "TTCL", "TTCD", "TMCL", "TMCD", "TBCL", "TBCD")
"""Canonical ordering of the 9 articulatory tract variables.

Matches the stacking order of the reference (reference models/aptai.py:67-70
and models/force_aptai.py:90-93): lip aperture, lip protrusion, jaw aperture,
tongue tip constriction location/degree, tongue mid ditto, tongue body ditto.
"""

BLANK_ID = 0
"""CTC blank index. The reference fixes blank = 0 everywhere
(reference train/train_phoneme_recognizer.py:344)."""

FRAME_RATE_HZ = 49
"""Nominal encoder output frame rate for 16 kHz input with conv strides
[5,2,2,2,2,2] (20 ms hop) — reference train/train_phoneme_recognizer.py:161-164."""

SAMPLE_RATE = 16_000
"""All audio is resampled to 16 kHz (reference data/dataset_commonphone.py:31-33)."""

AUDIO_PAD_VALUE = 0.0
PHONEME_FRAME_PAD_ID = 0      # also the CE ignore_index (reference models/aptai.py:98)
TV_PAD_VALUE = -100.0         # MSE mask sentinel (reference models/aptai.py:72)
CTC_LABEL_PAD_ID = -100       # CTC label padding (reference train/train_phoneme_recognizer.py:237)
