"""On-device CTC prefix beam search (decode/device.py).

Pins that the jit-compatible batched search is EXACT against the host
decoder (decode/beam.py — itself C++-twinned and reference-contract,
torchaudio ``ctc_decoder`` semantics): same tokens, same lengths, same
emission timesteps (including the dict-insertion-order tie-break for merged
hypotheses), across peaked and flat (merge-heavy) posteriors and
zero-length inputs; plus the integration points — ForceAPTAI
``decode_method='beam_device'``, the frozen-encoding cache, and
``validate_pr(decode='beam_device')``.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aptai_tpu.decode.beam import beam_search, beam_decode_padded
from aptai_tpu.decode.device import beam_decode_device


def _random_log_probs(rng, b, t, v, scale):
    logits = rng.standard_normal((b, t, v)).astype(np.float32) * scale
    return np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))


@pytest.mark.parametrize("scale", [2.5, 1.0])
def test_device_beam_matches_host_exactly(scale):
    """Tokens, lengths AND timesteps equal the host search — peaked
    (scale 2.5) and flat/merge-heavy (scale 1.0) posteriors, variable
    lengths including 0."""
    rng = np.random.default_rng(0 if scale > 2 else 1)
    b, t, v = 6, 40, 12
    for trial in range(4):
        lp = _random_log_probs(rng, b, t, v, scale)
        lens = rng.integers(0, t + 1, b).astype(np.int32)
        seqs, out_lens, trunc, times = jax.jit(
            lambda x, l: beam_decode_device(x, l, return_times=True)
        )(jnp.asarray(lp), jnp.asarray(lens))
        seqs, out_lens, times = map(np.asarray, (seqs, out_lens, times))
        assert (np.asarray(trunc) == 0).all()  # cap defaults to T
        for i in range(b):
            host = beam_search(lp[i, : lens[i]])[0]
            assert list(host.tokens) == seqs[i, : out_lens[i]].tolist(), \
                (trial, i)
            assert list(host.timesteps) == times[i, : out_lens[i]].tolist(), \
                (trial, i)


def test_device_beam_matches_host_on_ctc_like_posteriors():
    """Realistic regime: blank-dominated posteriors with emission bursts at
    production-like length/vocab (T=200, V=46) — exact token agreement."""
    rng = np.random.default_rng(5)
    b, t, v = 3, 200, 46
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    logits[..., 0] += 6.0
    for i in range(b):
        n_emit = rng.integers(20, 45)
        frames = np.sort(rng.choice(t, n_emit, replace=False))
        toks = rng.integers(1, v, n_emit)
        logits[i, frames, toks] += 10.0
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    seqs, lens, trunc = beam_decode_device(
        jnp.asarray(lp), jnp.full((b,), t, jnp.int32), max_output_length=60)
    seqs, lens = np.asarray(seqs), np.asarray(lens)
    assert (np.asarray(trunc) == 0).all()
    for i in range(b):
        host = beam_search(lp[i])[0]
        assert list(host.tokens) == seqs[i, : lens[i]].tolist()


def test_device_beam_zero_length_is_empty():
    lp = _random_log_probs(np.random.default_rng(2), 1, 8, 5, 2.0)
    seqs, lens, trunc = beam_decode_device(
        jnp.asarray(lp), jnp.asarray([0], np.int32))
    assert int(lens[0]) == 0 and int(trunc[0]) == 0
    assert (np.asarray(seqs) == 0).all()


def test_device_beam_truncation_contract():
    """``max_output_length`` below the decoded length: stored tokens cap,
    ``truncated`` counts the overflow — the beam_decode_padded contract
    (reference force_aptai.py:109-115 pads to 60 and asserts below it)."""
    # peaked alternating emissions => unambiguous decode of length 6
    t, v = 12, 5
    lp = np.full((1, t, v), -12.0, np.float32)
    seq = [1, 2, 3, 1, 2, 3]
    for k, tok in enumerate(seq):
        lp[0, 2 * k, tok] = -0.01      # emission frame
        lp[0, 2 * k + 1, 0] = -0.01    # blank separator
    lens = np.array([t], np.int32)
    host_seqs, host_lens, host_trunc = beam_decode_padded(
        jax.nn.log_softmax(jnp.asarray(lp), -1), lens, max_len=4)
    seqs, out_lens, trunc = beam_decode_device(
        jax.nn.log_softmax(jnp.asarray(lp), -1), jnp.asarray(lens),
        max_output_length=4)
    np.testing.assert_array_equal(np.asarray(seqs), host_seqs)
    assert int(out_lens[0]) == int(host_lens[0]) == 4
    assert int(trunc[0]) == int(host_trunc[0]) == 2


def test_device_beam_overcap_regime_matches_host_on_peaked_posteriors():
    """The over-cap REGIME itself (VERDICT r3 weak #5): when decoded
    sequences overflow ``max_output_length``, the stored tokens (up to the
    cap), lengths and truncated counts must still match the host search on
    peaked posteriors — the regime the cap's score inexactness note
    (decode/device.py capacity semantics) says remains exact.  Includes
    repeated tokens straddling the cap boundary, the repeat/doubling
    hazard the past-cap approximation cannot consult the last token for."""
    rng = np.random.default_rng(7)
    v, cap = 6, 5
    seqs_true = [
        [1, 2, 3, 4, 5, 1, 2, 3],          # plain overflow (+3)
        [1, 2, 3, 1, 1, 4, 5, 2, 3],       # repeat at positions cap-1/cap
        [2, 2, 2, 2, 2, 2, 2],             # all-repeats, blank-separated
        list(rng.integers(1, v, size=10)),  # random overflow (+5)
    ]
    t = 2 * max(len(s) for s in seqs_true) + 2
    lp = np.full((len(seqs_true), t, v), -14.0, np.float32)
    lens = np.zeros(len(seqs_true), np.int32)
    for b, seq in enumerate(seqs_true):
        for k, tok in enumerate(seq):
            lp[b, 2 * k, tok] = -0.01
            lp[b, 2 * k + 1, 0] = -0.01
        lens[b] = 2 * len(seq) + 1
        lp[b, 2 * len(seq), 0] = -0.01
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(lp), -1))

    host_seqs, host_lens, host_trunc = beam_decode_padded(
        logp, lens, max_len=cap)
    seqs, out_lens, trunc = beam_decode_device(
        jnp.asarray(logp), jnp.asarray(lens), max_output_length=cap)

    np.testing.assert_array_equal(np.asarray(seqs), host_seqs)
    np.testing.assert_array_equal(np.asarray(out_lens), host_lens)
    np.testing.assert_array_equal(np.asarray(trunc), host_trunc)
    # and the host itself decoded the constructed truth up to the cap
    for b, seq in enumerate(seqs_true):
        assert host_seqs[b, :cap].tolist() == list(seq[:cap])
        assert int(host_trunc[b]) == len(seq) - cap


@pytest.fixture(scope="module")
def force_pair():
    from aptai_tpu.models import ForceAPTAI, tiny_config

    cfg = tiny_config()
    kw = dict(vocab_size=cfg.vocab_size)
    host_m = ForceAPTAI(cfg, decode_method="beam_host",
                        allow_host_callback_decode=True, **kw)
    dev_m = ForceAPTAI(cfg, decode_method="beam_device", **kw)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((2, 3200)).astype(np.float32))
    lengths = jnp.asarray(np.array([3200, 2400], np.int32))
    t = int(cfg.feat_extract_output_lengths(np.asarray(3200)))
    tvs = jnp.asarray(rng.standard_normal((2, t, 9)).astype(np.float32))
    params = host_m.init(jax.random.PRNGKey(0), audio, lengths, tvs)["params"]
    return host_m, dev_m, params, audio, lengths, tvs


def test_force_beam_device_matches_beam_host_forward(force_pair):
    """decode_method='beam_device' must reproduce the beam_host training
    forward exactly (same decoded sequences ⇒ same losses/outputs) while
    staying a single jittable XLA program (no host callback)."""
    host_m, dev_m, params, audio, lengths, tvs = force_pair
    want = host_m.apply({"params": params}, audio, lengths, tvs)
    got = jax.jit(lambda p, a, l, tv: dev_m.apply(
        {"params": p}, a, l, tv))(params, audio, lengths, tvs)
    np.testing.assert_array_equal(np.asarray(want["pred_ctc_phn_seq"]),
                                  np.asarray(got["pred_ctc_phn_seq"]))
    np.testing.assert_array_equal(np.asarray(want["phn_seq_lengths"]),
                                  np.asarray(got["phn_seq_lengths"]))
    np.testing.assert_allclose(float(want["loss"]), float(got["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(want["tvs_pred"]),
                               np.asarray(got["tvs_pred"]),
                               rtol=1e-5, atol=1e-6)


def test_force_beam_device_frozen_cache_matches_beam_host(force_pair):
    """The frozen-encoding cache pass decodes beam_device models on device;
    its cached sequences must equal the beam_host cache's host-decoded
    ones."""
    from aptai_tpu.train.frozen_cache import FrozenEncodedLoader

    host_m, dev_m, params, audio, lengths, tvs = force_pair
    batch = {"audio": np.asarray(audio),
             "audio_lengths": np.asarray(lengths),
             "tv_targets": np.asarray(tvs),
             "phoneme_labels": np.full((2, 4), -100, np.int32)}

    class L:
        batch_size = 2

        def __len__(self):
            return 1

        def __iter__(self):
            return iter([batch])

    items_host = FrozenEncodedLoader(L(), host_m, params).dataset.items
    items_dev = FrozenEncodedLoader(L(), dev_m, params).dataset.items
    for ih, idv in zip(items_host, items_dev):
        np.testing.assert_array_equal(ih["phn_pred_seq"],
                                      idv["phn_pred_seq"])
        assert ih["phn_seq_length"] == idv["phn_seq_length"]
        assert ih["phn_seq_truncated"] == idv["phn_seq_truncated"]


def test_force_beam_device_predictor_plain_jit(force_pair):
    """beam_device predictors take the plain jit path (no split, no host
    callback) and match the model forward."""
    from aptai_tpu.infer.api import ForceAPTAIPredictor, _prepare

    _, dev_m, params, audio, lengths, tvs = force_pair
    wavs = [np.asarray(audio[0]), np.asarray(audio[1][:2400])]
    pred = ForceAPTAIPredictor(dev_m, params)
    assert not pred._split_beam
    got = pred.predict_batch(wavs)
    a, l = _prepare(wavs)
    want = dev_m.apply({"params": params}, a, l, method="predict")
    np.testing.assert_array_equal(np.asarray(want["pred_ctc_phn_seq"])[:2],
                                  np.asarray(got["pred_ctc_phn_seq"]))
    np.testing.assert_allclose(np.asarray(want["tvs_pred"])[:2],
                               np.asarray(got["tvs_pred"]),
                               rtol=1e-5, atol=1e-6)


def test_validate_pr_beam_device_equals_host_beam():
    """validate_pr(decode='beam_device') must produce the host-beam PER."""
    from aptai_tpu.train.evaluate import validate_pr

    rng = np.random.default_rng(7)
    b, t, v = 4, 30, 10
    lp = _random_log_probs(rng, b, t, v, 2.0)
    fl = rng.integers(5, t + 1, b).astype(np.int32)
    labels = np.full((b, 6), -100, np.int64)
    for i in range(b):
        n = rng.integers(1, 6)
        labels[i, :n] = rng.integers(1, v, n)
    batch = {"phoneme_labels": labels}

    def fwd(_):
        return {"loss": jnp.float32(0.5), "log_probs": jnp.asarray(lp),
                "frame_lengths": jnp.asarray(fl)}

    host = validate_pr(fwd, [batch], decode="beam")
    dev = validate_pr(fwd, [batch], decode="beam_device")
    assert dev["mean_val_per"] == pytest.approx(host["mean_val_per"])
