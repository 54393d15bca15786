"""AOT serving bundles (infer/export.py): a predictor forward frozen to
disk (StableHLO + weights + metadata) must reload WITHOUT the model object
and reproduce the live predictor's outputs."""

import numpy as np
import jax
import pytest

from aptai_tpu.infer import (APTAIPredictor, load_serving_bundle,
                             save_serving_bundle)
from aptai_tpu.models import APTAI, tiny_config


@pytest.fixture(scope="module")
def aptai_model():
    import jax.numpy as jnp

    cfg = tiny_config()
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((1, 3200)).astype(np.float32))
    lens = jnp.asarray(np.array([3200], np.int32))
    model = APTAI(cfg, num_phonemes=11)
    variables = model.init(jax.random.PRNGKey(0), audio, lens,
                           method="predict")
    return model, variables["params"]


def test_bundle_round_trip_matches_live_predictor(aptai_model, tmp_path,
                                                  rng):
    model, params = aptai_model
    fields = ("tvs_pred", "phn_fc_pred")
    bundle_dir = save_serving_bundle(
        tmp_path / "bundle", model, params,
        batch=2, seconds=0.5, fields=fields, platforms=("cpu",))
    assert (bundle_dir / "forward.stablehlo").exists()
    assert (bundle_dir / "params.npz").exists()

    bundle = load_serving_bundle(bundle_dir)
    # 3 wavs with batch=2 exercises the chunking path
    wavs = [rng.standard_normal(3200 + 800 * i).astype(np.float32) * 0.1
            for i in range(3)]
    got = bundle.predict_batch(wavs)
    assert set(got) == set(fields) | {"frame_lengths"}
    assert all(v.shape[0] == 3 for v in got.values())

    # live predictor reference on the raw wavs: both paths mask by the
    # true length, and valid-frame outputs are pad-width invariant
    live = APTAIPredictor(model, params)
    for i, w in enumerate(wavs):
        ref = live.predict_batch([w], fields=fields)
        n = int(got["frame_lengths"][i])
        assert n == int(ref["frame_lengths"][0])
        np.testing.assert_allclose(
            np.asarray(got["tvs_pred"])[i, :n],
            np.asarray(ref["tvs_pred"])[0, :n], rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(
            np.asarray(got["phn_fc_pred"])[i, :n],
            np.asarray(ref["phn_fc_pred"])[0, :n])


def test_bundle_rejects_overlong_input(aptai_model, tmp_path, rng):
    model, params = aptai_model
    bundle = load_serving_bundle(save_serving_bundle(
        tmp_path / "b2", model, params, batch=1, seconds=0.25,
        platforms=("cpu",)))
    with pytest.raises(ValueError, match="re-export"):
        bundle.predict_batch([rng.standard_normal(16000).astype(np.float32)])


def test_bundle_int16_transfer(aptai_model, tmp_path, rng):
    model, params = aptai_model
    pcm = rng.integers(-2000, 2000, size=4000).astype(np.int16)
    wav = pcm.astype(np.float32) / 32768.0
    f32 = load_serving_bundle(save_serving_bundle(
        tmp_path / "f32", model, params, batch=1, seconds=0.5,
        platforms=("cpu",))).predict_batch([wav])
    i16 = load_serving_bundle(save_serving_bundle(
        tmp_path / "i16", model, params, batch=1, seconds=0.5,
        transfer_dtype="int16", platforms=("cpu",))).predict_batch([wav])
    for k in f32:
        np.testing.assert_array_equal(f32[k], i16[k], err_msg=k)


def test_bundle_unknown_field_raises(aptai_model, tmp_path):
    model, params = aptai_model
    with pytest.raises(ValueError, match="unknown output field"):
        save_serving_bundle(tmp_path / "bad", model, params, batch=1,
                            seconds=0.25, fields=("nope",),
                            platforms=("cpu",))


def test_export_rejects_beam_host_model(aptai_model, tmp_path):
    from aptai_tpu.models import ForceAPTAI, tiny_config

    _, params = aptai_model
    cfg = tiny_config()
    beam_model = ForceAPTAI(cfg, vocab_size=cfg.vocab_size,
                            decode_method="beam_host")
    with pytest.raises(ValueError, match="beam"):
        save_serving_bundle(tmp_path / "beam", beam_model, params,
                            batch=1, seconds=0.25, platforms=("cpu",))


def test_bundle_rejects_empty_request(aptai_model, tmp_path):
    model, params = aptai_model
    bundle = load_serving_bundle(save_serving_bundle(
        tmp_path / "b3", model, params, batch=1, seconds=0.25,
        platforms=("cpu",)))
    with pytest.raises(ValueError, match="at least one"):
        bundle.predict_batch([])


def test_bundle_mulaw_transfer(aptai_model, tmp_path, rng):
    """mu-law bundles run end-to-end from the artifact; outputs track the
    float32 bundle within the lossy-codec tolerance."""
    model, params = aptai_model
    wav = (rng.standard_normal(4000) * 0.1).astype(np.float32)
    f32 = load_serving_bundle(save_serving_bundle(
        tmp_path / "f32m", model, params, batch=1, seconds=0.5,
        platforms=("cpu",))).predict_batch([wav])
    mu = load_serving_bundle(save_serving_bundle(
        tmp_path / "mu", model, params, batch=1, seconds=0.5,
        transfer_dtype="uint8_mulaw", platforms=("cpu",))).predict_batch(
        [wav])
    assert mu["tvs_pred"].shape == f32["tvs_pred"].shape
    d = np.abs(np.asarray(mu["tvs_pred"], np.float32)
               - np.asarray(f32["tvs_pred"], np.float32))
    assert float(d.max()) < 0.2, float(d.max())


def test_export_cli_then_serve_bundle(aptai_model, tmp_path, rng):
    """The full deployment path: checkpoint dir → ``aptai-export`` CLI →
    ``aptai-serve``'s build_app detects the bundle and serves it with the
    per-family schema — no model object on the serving side."""
    import dataclasses
    import json

    from aptai_tpu.infer.export import main as export_main
    from aptai_tpu.infer.serve import build_app
    from aptai_tpu.train.checkpoints import save_json, save_pytree

    model, params = aptai_model
    ckpt = tmp_path / "run" / "best-model-ckpt"
    save_pytree(ckpt / "params.msgpack", params)
    save_json(ckpt / "model_cfg.json",
              {"backbone": dataclasses.asdict(tiny_config()),
               "vocab": {f"p{i}": i for i in range(11)}, "kind": "aptai"})

    bundle = tmp_path / "bundle"
    rc = export_main([str(tmp_path / "run"), str(bundle),
                      "--batch", "2", "--seconds", "0.5",
                      "--platforms", "cpu"])
    assert rc == 0
    meta = json.loads((bundle / "meta.json").read_text())
    assert meta["kind"] == "aptai" and meta["vocab"]["p3"] == 3

    app = build_app(str(bundle), warmup=False)
    try:
        assert app.kind == "aptai" and app.streamer is None
        assert app.max_seconds == pytest.approx(0.5)
        wav = (rng.standard_normal(3200).astype(np.float32) * 0.1)
        status, body, ctype = app.handle(
            "POST", "/v1/predict", {}, wav.tobytes())
        assert status == 200 and ctype == "application/json"
        payload = json.loads(body)
        assert payload["frames"] > 0
        assert len(payload["tvs_pred"]) == 9

        # live-model reference for the same wav
        live = APTAIPredictor(model, params).predict_batch([wav])
        n = payload["frames"]
        np.testing.assert_allclose(
            np.asarray(payload["tvs_pred"]["LA"], np.float32),
            np.asarray(live["tvs_pred"][0, :n, 0], np.float32), atol=1e-5)

        # the exported shape cap is enforced with a 400, not a 500
        status, body, _ = app.handle(
            "POST", "/v1/predict", {},
            np.zeros(16000, np.float32).tobytes())
        assert status == 400
        assert "serving cap" in json.loads(body)["error"]
    finally:
        app.batcher.stop()


def test_export_cli_beam_host_is_usage_error(tmp_path, capsys):
    """aptai-export on a beam_host FORCE checkpoint: one stderr line and
    rc 2, not a traceback (the in-jit host callback cannot serialize)."""
    import dataclasses

    from aptai_tpu.infer.export import main as export_main
    from aptai_tpu.models import ForceAPTAI
    from aptai_tpu.train.checkpoints import save_json, save_pytree

    cfg = tiny_config()
    model = ForceAPTAI(cfg, vocab_size=11, decode_method="beam_host")
    params = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 3200), np.float32), np.array([3200], np.int32),
        method="predict")["params"]
    ckpt = tmp_path / "run" / "best-model-ckpt"
    save_pytree(ckpt / "params.msgpack", params)
    save_json(ckpt / "model_cfg.json",
              {"backbone": dataclasses.asdict(cfg),
               "vocab": {f"p{i}": i for i in range(11)},
               "kind": "force_aptai", "decode_method": "beam_host"})
    rc = export_main([str(tmp_path / "run"), str(tmp_path / "bundle"),
                      "--batch", "1", "--seconds", "0.25",
                      "--platforms", "cpu"])
    assert rc == 2
    assert "beam_host" in capsys.readouterr().err


def test_bundle_single_chunk_outputs_stay_lazy(aptai_model, tmp_path, rng):
    """Single-chunk predict_batch must NOT materialize to numpy: the
    MicroBatcher fetches on its worker pool, and a synchronous fetch in
    the dispatch loop would serialize the serving pipeline."""
    model, params = aptai_model
    bundle = load_serving_bundle(save_serving_bundle(
        tmp_path / "lazy", model, params, batch=2, seconds=0.5,
        platforms=("cpu",)))
    out = bundle.predict_batch(
        [rng.standard_normal(3200).astype(np.float32) * 0.1])
    assert all(not isinstance(v, np.ndarray) for v in out.values()), {
        k: type(v) for k, v in out.items()}
    assert all(v.shape[0] == 1 for v in out.values())


def test_serve_warns_on_ignored_bundle_flags():
    from aptai_tpu.infer.serve import build_parser, bundle_ignored_flags

    parser = build_parser()
    args = parser.parse_args(["--checkpoint", "b/", "--max_seconds", "5",
                              "--fields", "tvs_pred"])
    assert set(bundle_ignored_flags(args, parser)) == {"--max_seconds",
                                                       "--fields"}
    assert bundle_ignored_flags(
        parser.parse_args(["--checkpoint", "b/"]), parser) == []


def test_bundle_without_kind_rejected_by_serve(aptai_model, tmp_path):
    """Bundles exported through the library without a family stamp can't
    serve (the app needs the response schema) — clear error, not KeyError."""
    from aptai_tpu.infer.serve import build_app_from_bundle

    model, params = aptai_model
    out = save_serving_bundle(tmp_path / "nk", model, params,
                              batch=1, seconds=0.3, platforms=("cpu",))
    with pytest.raises(ValueError, match="aptai-export"):
        build_app_from_bundle(out, warmup=False)
