"""FORCE-APTAI in-step decode paths (VERDICT r2 #5).

The beam_host training path is split: device encode → host beam decode on
the MAIN thread → device head step.  An XLA host callback embedded in the
jitted step deadlocks against any other live Python thread (the
PrefetchLoader producer — reproduced deterministically on CPU-JAX), so the
trainers never run the in-jit callback variant.  These tests pin:

  * the split path is numerically identical to the in-jit callback path;
  * the beam_host trainer completes WITH prefetch enabled (the regression
    would hang, which pytest surfaces as a timeout);
  * the blank-collapse guard warns and (configurably) falls back to
    beam_host mid-run, resuming from the last checkpoint.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aptai_tpu.models import ForceAPTAI, tiny_config


@pytest.fixture(scope="module")
def beam_setup():
    cfg = tiny_config()
    model = ForceAPTAI(cfg, vocab_size=cfg.vocab_size,
                       decode_method="beam_host",
                       allow_host_callback_decode=True)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((2, 3200)).astype(np.float32))
    lengths = jnp.asarray(np.array([3200, 2400], np.int32))
    t = int(cfg.feat_extract_output_lengths(np.asarray(3200)))
    tvs = jnp.asarray(rng.standard_normal((2, t, 9)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), audio, lengths, tvs)
    return model, variables["params"], audio, lengths, tvs


def test_beam_host_forward_gated_behind_explicit_flag(beam_setup):
    """The in-jit host-callback decode deadlocks against any live Python
    thread (VERDICT r3 weak #4): the default model must REFUSE to build
    that program — init still works (greedy-substituted trace), but the
    full forward raises until allow_host_callback_decode=True."""
    model, params, audio, lengths, tvs = beam_setup
    gated = ForceAPTAI(model.pr_cfg, vocab_size=model.vocab_size,
                       decode_method="beam_host")
    # init path stays usable (builders init the full __call__)
    variables = gated.init(jax.random.PRNGKey(0), audio, lengths, tvs)
    assert jax.tree.structure(variables["params"]) == jax.tree.structure(
        params)
    with pytest.raises(ValueError, match="allow_host_callback_decode"):
        gated.apply({"params": params}, audio, lengths, tvs)
    # split halves remain available on the gated model
    enc = gated.apply({"params": params}, audio, lengths,
                      method="encode_frozen")
    assert np.isfinite(np.asarray(enc["ctc_log_probs"])).all()


def test_split_beam_path_matches_in_jit_callback(beam_setup):
    """encode_frozen → host beam_decode_padded → train_from_encoded must
    equal __call__ with decode_method='beam_host' (same params, same
    inputs, deterministic)."""
    from aptai_tpu.decode.beam import beam_decode_padded

    model, params, audio, lengths, tvs = beam_setup
    want = model.apply({"params": params}, audio, lengths, tvs)

    enc = model.apply({"params": params}, audio, lengths,
                      method="encode_frozen")
    seqs, lens, trunc = beam_decode_padded(
        np.asarray(enc["ctc_log_probs"]), np.asarray(enc["frame_lengths"]),
        model.max_phn_seq_len,
    )
    got = model.apply({"params": params}, enc["frame_embs"],
                      enc["frame_lengths"], seqs, lens, trunc, tvs,
                      method="train_from_encoded")

    np.testing.assert_array_equal(np.asarray(want["pred_ctc_phn_seq"]), seqs)
    np.testing.assert_array_equal(np.asarray(want["phn_seq_lengths"]), lens)
    np.testing.assert_allclose(float(want["loss"]), float(got["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(want["tvs_pred"]),
                               np.asarray(got["tvs_pred"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(want["pred_frame_phns"]),
                                  np.asarray(got["pred_frame_phns"]))


def test_beam_host_predictor_uses_split_path(beam_setup):
    """ForceAPTAIPredictor on a beam_host model must (a) never jit the host
    callback — it runs the split encode → host-decode → head path — and
    (b) match the in-jit callback forward numerically (predict AND
    alignment schemas)."""
    from aptai_tpu.infer.api import ForceAPTAIPredictor, _prepare

    model, params, audio, lengths, tvs = beam_setup
    wavs = [np.asarray(audio[0]), np.asarray(audio[1][:2400])]

    pred = ForceAPTAIPredictor(model, params)
    assert pred._split_beam
    got = pred.predict_batch(wavs)

    a, l = _prepare(wavs)  # identical bucketed device inputs
    want = model.apply({"params": params}, a, l, method="predict")
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(
            np.asarray(want[k])[:2], np.asarray(got[k]),
            rtol=1e-5, atol=1e-5, err_msg=k)

    # int16 transfer goes through the same split path
    got16 = ForceAPTAIPredictor(model, params,
                                transfer_dtype="int16").predict_batch(wavs)
    assert np.isfinite(np.asarray(got16["tvs_pred"], np.float32)).all()

    # alignment schema (single utterance): (phn × frames) slice parity
    got_al = pred.get_alignment(wavs[1])
    a1, l1 = _prepare([wavs[1]])
    want_al = model.apply({"params": params}, a1, l1,
                          method="get_alignment")
    n = int(want_al["frame_lengths"][0])
    s = int(want_al["phn_seq_lengths"][0])
    np.testing.assert_allclose(
        np.asarray(want_al["alignment"])[0, :n, :s].T,
        got_al["alignment"], rtol=1e-5, atol=1e-5)


def test_beam_decoded_batches_augments_and_drops_audio(beam_setup):
    from aptai_tpu.train.train_force_aptai import BeamDecodedBatches

    model, params, audio, lengths, tvs = beam_setup
    batches = [{"audio": np.asarray(audio), "audio_lengths": np.asarray(lengths),
                "tv_targets": np.asarray(tvs),
                "phoneme_labels": np.zeros((2, 4), np.int32)}]

    class L:
        def __len__(self):
            return 1

        def __iter__(self):
            return iter(batches)

    out = list(BeamDecodedBatches(L(), model, params))[0]
    assert "audio" not in out  # tower outputs replace the waveform
    assert out["frame_embs"].shape[0] == 2
    assert out["phn_pred_seq"].shape == (2, model.max_phn_seq_len)
    assert "phoneme_labels" in out  # passthrough keys preserved


@pytest.fixture(scope="module")
def force_corpus(tmp_path_factory):
    from aptai_tpu.data import make_synthetic_hprc

    root = tmp_path_factory.mktemp("force_decode")
    hprc_csv = make_synthetic_hprc(root / "hprc", utts_per_speaker=2,
                                   cfg=tiny_config())
    return hprc_csv


def _force_cfg(exp, hprc_csv, **kw):
    from aptai_tpu.train.config import ForceAPTAIConfig

    return ForceAPTAIConfig(
        exp_dir=str(exp / "run"),
        hprc_csv_path=str(hprc_csv),
        vocab_path=str(exp / "missing.json"),
        pr_model_path=str(exp / "no-pr-ckpt"),  # random frozen tower
        laptop=True,
        batch_size=2,
        learning_rate=1e-4,
        train_val_rate="both",
        mesh_data=1,
        **kw,
    ).finalize("FORCE_APTAI")


def test_beam_host_trainer_runs_with_prefetch(force_corpus, tmp_path_factory):
    """End-to-end beam_host fold with PrefetchLoader ACTIVE (the round-2
    deadlock scenario).  Completion is the assertion.  The frozen-encoding
    cache is disabled so the per-epoch BeamDecodedBatches path stays
    pinned (with the cache — the default — the decode runs once at cache
    build instead)."""
    from aptai_tpu.train import train_force_aptai

    exp = tmp_path_factory.mktemp("exp_beam")
    cfg = _force_cfg(exp, force_corpus, decode_method="beam_host",
                     cache_frozen_encodings=False)
    mean, _, per_spk = train_force_aptai.run(cfg, tiny_backbone=tiny_config(),
                                             speakers=["M01"])
    assert np.isfinite(mean["test_N_mean_rmse"])
    assert mean["decode_fallback"] == 0


def test_collapse_guard_falls_back_to_beam(force_corpus, tmp_path_factory,
                                           capsys):
    """Injected collapse (threshold 0 ⇒ any PER trips it, patience 1):
    the guard must warn, switch to beam_host, resume, and finish."""
    from aptai_tpu.train import train_force_aptai

    exp = tmp_path_factory.mktemp("exp_collapse")
    cfg = _force_cfg(exp, force_corpus,
                     collapse_per_threshold=0.0, collapse_patience=1,
                     collapse_fallback=True)
    mean, _, per_spk = train_force_aptai.run(cfg, tiny_backbone=tiny_config(),
                                             speakers=["M01"])
    out = capsys.readouterr().out
    assert "decode collapsed" in out
    assert "beam_host" in out
    assert mean["decode_fallback"] == 1
    assert np.isfinite(mean["test_N_mean_rmse"])


def test_collapse_guard_warns_without_fallback(force_corpus,
                                               tmp_path_factory, capsys):
    from aptai_tpu.train import train_force_aptai

    exp = tmp_path_factory.mktemp("exp_warn")
    cfg = _force_cfg(exp, force_corpus,
                     collapse_per_threshold=0.0, collapse_patience=1,
                     collapse_fallback=False)
    mean, _, _ = train_force_aptai.run(cfg, tiny_backbone=tiny_config(),
                                       speakers=["M01"])
    out = capsys.readouterr().out
    assert "decode collapsed" in out
    assert mean["decode_fallback"] == 0


def test_beam_decode_padded_out_rows():
    """out_rows > B pads the decoded batch with zero-length sequences (the
    serving path decodes only real rows; pad rows keep the static shape)."""
    from aptai_tpu.decode.beam import beam_decode_padded

    rng = np.random.default_rng(3)
    lp = np.log(rng.dirichlet(np.ones(5), size=(2, 7)).astype(np.float32))
    fl = np.array([7, 5], np.int32)
    seqs, lens, trunc = beam_decode_padded(lp, fl, max_len=6, out_rows=4)
    assert seqs.shape == (4, 6) and lens.shape == (4,)
    base_seqs, base_lens, _ = beam_decode_padded(lp, fl, max_len=6)
    np.testing.assert_array_equal(seqs[:2], base_seqs)
    np.testing.assert_array_equal(lens[:2], base_lens)
    assert (lens[2:] == 0).all() and (seqs[2:] == 0).all()
    assert (trunc[2:] == 0).all()


def test_beam_host_predictor_skips_pad_row_decode(beam_setup, monkeypatch):
    """With 3 wavs the device batch buckets to 4 rows; the host beam search
    (the split path's serial bottleneck) must only see the 3 real rows, and
    the real outputs must be unchanged."""
    import aptai_tpu.decode.beam as beam_mod
    from aptai_tpu.infer.api import ForceAPTAIPredictor

    model, params, audio, lengths, tvs = beam_setup
    rng = np.random.default_rng(11)
    wavs = [np.asarray(audio[0]), np.asarray(audio[1][:2400]),
            rng.standard_normal(3000).astype(np.float32)]

    seen_rows = []
    orig = beam_mod.beam_decode_padded

    def spy(log_probs, frame_lengths, max_len, out_rows=None):
        seen_rows.append(np.asarray(log_probs).shape[0])
        return orig(log_probs, frame_lengths, max_len, out_rows=out_rows)

    monkeypatch.setattr(beam_mod, "beam_decode_padded", spy)
    pred = ForceAPTAIPredictor(model, params)
    got = pred.predict_batch(wavs)
    assert seen_rows == [3]  # not 4: the bucketing pad row is never decoded
    assert all(np.asarray(v).shape[0] == 3 for v in got.values())
    # per-item parity: each wav alone gives the same prediction
    for i, w in enumerate(wavs):
        one = pred.predict_batch([w])
        n = int(one["frame_lengths"][0])
        np.testing.assert_allclose(
            np.asarray(got["tvs_pred"])[i, :n],
            np.asarray(one["tvs_pred"])[0, :n], rtol=1e-5, atol=1e-5)


def test_beam_decoded_batches_on_mesh(beam_setup):
    """The batch adapter's frozen-tower encode runs sharded when given a
    mesh (multi-chip beam_host training); outputs must match the unsharded
    adapter exactly."""
    from aptai_tpu.parallel import make_mesh
    from aptai_tpu.train.train_force_aptai import BeamDecodedBatches

    model, params, audio, lengths, tvs = beam_setup
    batches = [{"audio": np.asarray(audio),
                "audio_lengths": np.asarray(lengths),
                "tv_targets": np.asarray(tvs)}]

    class L:
        def __len__(self):
            return 1

        def __iter__(self):
            return iter(batches)

    single = list(BeamDecodedBatches(L(), model, params))[0]
    mesh = make_mesh(data=2, model=1)
    sharded = list(BeamDecodedBatches(L(), model, params, mesh=mesh))[0]
    np.testing.assert_array_equal(np.asarray(single["phn_pred_seq"]),
                                  np.asarray(sharded["phn_pred_seq"]))
    np.testing.assert_allclose(np.asarray(single["frame_embs"]),
                               np.asarray(sharded["frame_embs"]),
                               rtol=1e-5, atol=1e-6)


def test_micro_batcher_skips_pad_row_decode(beam_setup, monkeypatch):
    """MicroBatcher(pad_to_max=True) extends the request list with
    serving-shape silence rows; the split beam_host predictor must
    host-decode only the REAL rows (the real_rows protocol)."""
    import aptai_tpu.decode.beam as beam_mod
    from aptai_tpu.infer import MicroBatcher
    from aptai_tpu.infer.api import ForceAPTAIPredictor

    model, params, audio, lengths, tvs = beam_setup
    seen_rows = []
    orig = beam_mod.beam_decode_padded

    def spy(log_probs, frame_lengths, max_len, out_rows=None):
        seen_rows.append(np.asarray(log_probs).shape[0])
        return orig(log_probs, frame_lengths, max_len, out_rows=out_rows)

    monkeypatch.setattr(beam_mod, "beam_decode_padded", spy)
    pred = ForceAPTAIPredictor(model, params)
    mb = MicroBatcher(pred.predict_batch, max_batch_size=4, pad_to_max=True)
    results = mb.run_batch([np.asarray(audio[0])])
    assert len(results) == 1
    assert seen_rows == [1]  # not 4: pad_to_max silence rows never decoded
    assert np.isfinite(np.asarray(results[0]["tvs_pred"],
                                  np.float32)).all()


def test_cache_flag_spelling_parses():
    """The documented opt-out is --no-cache_frozen_encodings
    (argparse.BooleanOptionalAction's spelling)."""
    from aptai_tpu.train.config import ForceAPTAIConfig, parse_config

    cfg = parse_config(ForceAPTAIConfig, "FORCE_APTAI",
                       ["--no-cache_frozen_encodings"])
    assert cfg.cache_frozen_encodings is False
    cfg = parse_config(ForceAPTAIConfig, "FORCE_APTAI", [])
    assert cfg.cache_frozen_encodings is True
