"""Checkpoint-dir → predictor loading (infer/loader.py) and the
``python -m aptai_tpu.infer`` CLI (infer/__main__.py)."""

import dataclasses
import json

import jax
import numpy as np
import pytest

from aptai_tpu.data.audio_io import save_wav
from aptai_tpu.infer import (
    APTAIPredictor,
    W2V2PRPredictor,
    load_model,
    load_predictor,
)
from aptai_tpu.infer.__main__ import main as cli_main
from aptai_tpu.models import APTAI, ForceAPTAI, W2V2PR, tiny_config
from aptai_tpu.train.checkpoints import save_json, save_pytree

VOCAB = {f"p{i}": i for i in range(11)}


def _save_ckpt(tmp_path, name, kind, params, extra=None):
    d = tmp_path / name / "best-model-ckpt"
    save_pytree(d / "params.msgpack", params)
    cfg = {"backbone": dataclasses.asdict(tiny_config()), "vocab": VOCAB,
           "kind": kind}
    cfg.update(extra or {})
    save_json(d / "model_cfg.json", cfg)
    return tmp_path / name


@pytest.fixture(scope="module")
def ckpts(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("ckpts")
    cfg = tiny_config()
    audio = np.zeros((1, 3200), np.float32)
    lens = np.array([3200], np.int32)

    aptai = APTAI(cfg, num_phonemes=11)
    ap = aptai.init(jax.random.PRNGKey(1), audio, lens,
                    method="predict")["params"]
    force = ForceAPTAI(cfg, vocab_size=11)
    fp = force.init(jax.random.PRNGKey(2), audio, lens,
                    method="predict")["params"]
    pr = W2V2PR(cfg)
    pp = pr.init(jax.random.PRNGKey(3), audio, lens,
                 method="encode")["params"]

    return {
        "aptai": (_save_ckpt(tmp_path, "aptai_run", "aptai", ap),
                  aptai, ap),
        "force": (_save_ckpt(tmp_path, "force_run", "force_aptai", fp,
                             {"decode_method": "greedy"}), force, fp),
        "pr": (_save_ckpt(tmp_path, "pr_run", "w2v2_pr", pp), pr, pp),
    }


def test_load_predictor_matches_direct(ckpts, rng):
    wav = rng.standard_normal(5000).astype(np.float32) * 0.1
    for key, direct_cls in (("aptai", APTAIPredictor),
                            ("pr", W2V2PRPredictor)):
        exp_dir, model, params = ckpts[key]
        loaded = load_predictor(exp_dir)          # experiment dir form
        direct = (direct_cls(model, params, VOCAB) if key == "pr"
                  else direct_cls(model, params))
        if key == "aptai":
            a = loaded.predict_batch([wav])
            b = direct.predict_batch([wav])
            np.testing.assert_allclose(np.asarray(a["tvs_pred"]),
                                       np.asarray(b["tvs_pred"]), atol=1e-6)
        else:
            a = loaded.encode_batch([wav])
            b = direct.encode_batch([wav])
            np.testing.assert_allclose(np.asarray(a["phoneme_logits"]),
                                       np.asarray(b["phoneme_logits"]),
                                       atol=1e-6)


def test_load_model_kinds_and_vocab(ckpts):
    exp_dir, _, _ = ckpts["force"]
    kind, model, params, vocab = load_model(exp_dir / "best-model-ckpt")
    assert kind == "force_aptai"
    assert model.decode_method == "greedy"
    assert vocab == VOCAB
    assert "w2v2_pr" in params


def test_load_predictor_missing_dir(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_predictor(tmp_path)


@pytest.mark.parametrize("key,expect_keys", [
    ("aptai", {"tvs_pred", "pred_frame_phns", "pred_frame_phns_ipa"}),
    ("force", {"tvs_pred", "pred_frame_phns", "pred_ctc_phn_seq",
               "pred_ctc_phn_seq_ipa"}),
    ("pr", {"phn_seq_idx", "phn_seq_ipa", "phn_seq_dur"}),
])
def test_cli_writes_json_per_wav(ckpts, tmp_path, rng, key, expect_keys):
    exp_dir, _, _ = ckpts[key]
    wavs = []
    for i in range(2):
        p = tmp_path / f"utt{i}.wav"
        save_wav(p, rng.standard_normal(4000).astype(np.float32) * 0.1,
                 16_000)
        wavs.append(str(p))
    out_dir = tmp_path / "out"
    rc = cli_main([str(exp_dir), *wavs, "--out", str(out_dir),
                   "--batch_size", "2"])
    assert rc == 0
    for i in range(2):
        payload = json.loads((out_dir / f"utt{i}.json").read_text())
        assert expect_keys <= set(payload)
        if "tvs_pred" in payload:
            assert set(payload["tvs_pred"]) == {
                "LA", "LP", "JA", "TTCL", "TTCD", "TMCL", "TMCD",
                "TBCL", "TBCD"}


def test_cli_alignment_task(ckpts, tmp_path, rng):
    exp_dir, _, _ = ckpts["force"]
    p = tmp_path / "utt.wav"
    save_wav(p, rng.standard_normal(4000).astype(np.float32) * 0.1, 16_000)
    out_dir = tmp_path / "out"
    rc = cli_main([str(exp_dir), str(p), "--task", "alignment",
                   "--out", str(out_dir)])
    assert rc == 0
    payload = json.loads((out_dir / "utt.json").read_text())
    att = np.asarray(payload["alignment"])
    assert att.ndim == 2

    # alignment on a non-FORCE checkpoint is a usage error
    rc = cli_main([str(ckpts["aptai"][0]), str(p), "--task", "alignment",
                   "--out", str(out_dir)])
    assert rc == 2
