"""Analytic FLOPs counter (utils/flops.py) vs XLA's own cost analysis.

The MFU numbers in bench.py are only as good as the FLOPs count: pin the
analytic formulas against ``Compiled.cost_analysis()['flops']`` — XLA's
per-HLO count of the *same* program — on the tiny topology, and pin the
closed-form terms exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aptai_tpu.models import APTAI, Wav2Vec2Config, tiny_config
from aptai_tpu.utils.flops import (aptai_forward_flops, conv_fe_flops,
                                   device_peak_tflops, encoder_flops, mfu,
                                   pr_forward_flops, training_step_flops)


def test_conv_fe_flops_closed_form():
    cfg = tiny_config()
    samples = 800
    # layer-by-layer by hand: (10,5) 1->16, (3,2) 16->16, (3,2) 16->16
    t1 = (800 - 10) // 5 + 1       # 159
    t2 = (159 - 3) // 2 + 1        # 79
    t3 = (79 - 3) // 2 + 1         # 39
    expect = (2 * t1 * 10 * 1 * 16 + 2 * t2 * 3 * 16 * 16
              + 2 * t3 * 3 * 16 * 16)
    assert conv_fe_flops(cfg, samples) == expect
    assert encoder_flops(cfg, samples)["frames"] == t3


def test_encoder_layer_terms_closed_form():
    cfg = tiny_config()
    e = encoder_flops(cfg, 800)
    t, h, f = e["frames"], cfg.hidden_size, cfg.intermediate_size
    assert e["attention_projections"] == cfg.num_hidden_layers * 8 * t * h * h
    assert e["attention_scores"] == cfg.num_hidden_layers * 4 * t * t * h
    assert e["ffn"] == cfg.num_hidden_layers * 4 * t * h * f
    assert e["total"] == sum(v for k, v in e.items()
                             if k not in ("frames", "total"))


def test_training_step_flops_rules():
    # MFU accounting is remat-blind (ADVICE r4): always 3x forward
    assert training_step_flops(100) == 300
    assert training_step_flops(100, remat_policy="full") == 300
    assert training_step_flops(100, remat_policy="none") == 300
    # the remat re-forward belongs to the HFU figure
    from aptai_tpu.utils.flops import training_step_hfu_flops
    assert training_step_hfu_flops(100, remat_policy="full") == 400
    assert training_step_hfu_flops(100, remat_policy="none") == 300


def test_analytic_matches_xla_cost_analysis():
    """Analytic total within 15% of XLA's HLO flop count for the same
    predict program (XLA additionally counts elementwise/LN/softmax work
    and mask arithmetic, so it sits slightly ABOVE the analytic GEMM
    count — assert the band rather than equality)."""
    cfg = tiny_config()
    model = APTAI(cfg, num_phonemes=11)
    samples = 1600
    audio = jnp.zeros((2, samples), jnp.float32)
    lengths = jnp.full((2,), samples, jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), audio, lengths,
                           method="predict")

    def fwd(params, audio, lengths):
        return model.apply({"params": params}, audio, lengths,
                           method="predict")

    compiled = (jax.jit(fwd)
                .lower(variables["params"], audio, lengths).compile())
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    xla_flops = float(cost["flops"])
    analytic = 2 * aptai_forward_flops(cfg, samples, num_phonemes=11)
    assert analytic <= xla_flops * 1.05, (analytic, xla_flops)
    assert analytic >= xla_flops * 0.70, (analytic, xla_flops)


def test_pr_forward_flops_adds_ctc_head():
    cfg = tiny_config()
    e = encoder_flops(cfg, 800)
    assert (pr_forward_flops(cfg, 800)
            == e["total"] + 2 * e["frames"] * cfg.hidden_size
            * cfg.vocab_size)
    assert (pr_forward_flops(cfg, 800, vocab_size=7)
            == e["total"] + 2 * e["frames"] * cfg.hidden_size * 7)


def test_production_topology_flops_scale():
    """Sanity-pin the production number's order of magnitude: a 10 s
    utterance through the 24L/1024 encoder is ~0.33 TFLOPs forward."""
    cfg = Wav2Vec2Config()
    total = aptai_forward_flops(cfg, 160_000)
    assert 0.2e12 < total < 0.5e12, total


class _FakeDev:
    def __init__(self, kind):
        self.device_kind = kind


def test_device_peak_table_longest_prefix():
    assert device_peak_tflops(_FakeDev("TPU v5 lite")) == 197.0
    assert device_peak_tflops(_FakeDev("TPU v5")) == 459.0
    assert device_peak_tflops(_FakeDev("TPU v4")) == 275.0
    assert device_peak_tflops(_FakeDev("cpu")) is None


def test_mfu_math_and_unknown_peak():
    assert mfu(197e12, 2.0, 197.0) == pytest.approx(0.5)
    assert mfu(1e12, 1.0, None) is None
    assert mfu(1e12, 0.0, 197.0) is None
