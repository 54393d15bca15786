"""Data layer: corpora, manifests, host-side IO, batching.

Host side stays NumPy/pandas (manifest handling, wav IO, bucketing); every
per-sample numeric transform shares the exact kernels of ``aptai_tpu.ops``
so that offline prep and on-device paths agree bit-for-bit.
"""

from aptai_tpu.data.vocab import (
    build_vocab,
    load_vocab,
    save_vocab,
    phonemes_to_ids,
    ids_to_phonemes,
)
from aptai_tpu.data.audio_io import load_wav_16k
from aptai_tpu.data.textgrid import parse_textgrid, textgrid_phonemes
from aptai_tpu.data.commonphone import CommonPhoneDataset
from aptai_tpu.data.hprc import HPRCDataset, HPRC_SPEAKERS, speaker_onehot
from aptai_tpu.data.batching import (
    collate_ctc,
    collate_tv,
    BucketedLoader,
    PrefetchLoader,
)
from aptai_tpu.data.synthetic import (
    make_synthetic_commonphone,
    make_synthetic_hprc,
)

__all__ = [
    "build_vocab",
    "load_vocab",
    "save_vocab",
    "phonemes_to_ids",
    "ids_to_phonemes",
    "load_wav_16k",
    "parse_textgrid",
    "textgrid_phonemes",
    "CommonPhoneDataset",
    "HPRCDataset",
    "HPRC_SPEAKERS",
    "speaker_onehot",
    "collate_ctc",
    "collate_tv",
    "BucketedLoader",
    "PrefetchLoader",
    "make_synthetic_commonphone",
    "make_synthetic_hprc",
]
