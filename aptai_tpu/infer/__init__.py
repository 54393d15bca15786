"""User-facing inference APIs: the reference's eager batch-1 helpers
rebuilt as jit-compiled, batched TPU predictors, plus long-audio streaming."""

from aptai_tpu.infer.api import (
    APTAIPredictor,
    ForceAPTAIPredictor,
    W2V2PRPredictor,
    fetch_outputs,
)
from aptai_tpu.infer.streaming import (StreamingAPTAI, StreamingForceAPTAI,
                                       StreamingPredictor, StreamingW2V2PR)
from aptai_tpu.infer.server import MicroBatcher
from aptai_tpu.infer.serve import ServingApp, build_app, make_server
from aptai_tpu.infer.export import (ServingBundle, load_serving_bundle,
                                    save_serving_bundle)
from aptai_tpu.infer.loader import load_model, load_predictor

__all__ = [
    "load_model",
    "load_predictor",
    "APTAIPredictor",
    "ForceAPTAIPredictor",
    "W2V2PRPredictor",
    "StreamingAPTAI",
    "StreamingForceAPTAI",
    "StreamingPredictor",
    "StreamingW2V2PR",
    "MicroBatcher",
    "ServingApp",
    "build_app",
    "make_server",
    "fetch_outputs",
    "ServingBundle",
    "load_serving_bundle",
    "save_serving_bundle",
]
