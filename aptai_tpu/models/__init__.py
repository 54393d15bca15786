"""Flax model definitions + HF checkpoint conversion."""

from aptai_tpu.models.configs import Wav2Vec2Config, tiny_config
from aptai_tpu.models.wav2vec2 import Wav2Vec2Encoder
from aptai_tpu.models.w2v2_pr import W2V2PR
from aptai_tpu.models.aptai import APTAI
from aptai_tpu.models.force_aptai import ForceAPTAI
from aptai_tpu.models.hf_convert import (
    convert_wav2vec2_encoder,
    convert_w2v2_pr,
    load_torch_state_dict,
)

__all__ = [
    "Wav2Vec2Config",
    "tiny_config",
    "Wav2Vec2Encoder",
    "W2V2PR",
    "APTAI",
    "ForceAPTAI",
    "convert_wav2vec2_encoder",
    "convert_w2v2_pr",
    "load_torch_state_dict",
]
