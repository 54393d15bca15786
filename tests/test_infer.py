"""Inference predictors: output schemas (reference contract), batched vs
single consistency, streaming stitching."""

import numpy as np
import jax
import pytest

from aptai_tpu import TV_ORDER
from aptai_tpu.infer import (
    APTAIPredictor,
    ForceAPTAIPredictor,
    StreamingAPTAI,
    W2V2PRPredictor,
)
from aptai_tpu.models import APTAI, ForceAPTAI, W2V2PR, tiny_config


@pytest.fixture(scope="module")
def models():
    import jax.numpy as jnp

    cfg = tiny_config()
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((1, 3200)).astype(np.float32))
    lens = jnp.asarray(np.array([3200], np.int32))

    aptai = APTAI(cfg, num_phonemes=11)
    av = aptai.init(jax.random.PRNGKey(0), audio, lens, method="predict")

    pr = W2V2PR(cfg)
    pv = pr.init(jax.random.PRNGKey(0), audio, lens, method="encode")

    force = ForceAPTAI(cfg, vocab_size=cfg.vocab_size)
    fv = force.init(jax.random.PRNGKey(0), audio, lens, method="predict")
    return (aptai, av["params"]), (pr, pv["params"]), (force, fv["params"])


def test_aptai_output_schema(models, rng):
    (aptai, ap), _, _ = models
    pred = APTAIPredictor(aptai, ap)
    wav = rng.standard_normal(5000).astype(np.float32)
    out = pred.get_aptai_output(wav)
    t = out["phn_fc_logits"].shape[0]
    assert out["phn_fc_probs"].shape == (11, t)  # transposed like reference
    assert out["phn_fc_pred"].shape == (t,)
    assert set(out["tvs_pred"]) == set(TV_ORDER)
    assert len(out["tvs_pred"]["LA"]) == t
    # only the true frames are returned despite bucketing
    expected_t = int(aptai.cfg.feat_extract_output_lengths(np.asarray(5000)))
    assert t == expected_t


def test_aptai_batch_matches_single(models, rng):
    (aptai, ap), _, _ = models
    pred = APTAIPredictor(aptai, ap)
    wavs = [rng.standard_normal(4000).astype(np.float32),
            rng.standard_normal(6500).astype(np.float32)]
    batch = pred.predict_batch(wavs)
    single = pred.get_aptai_output(wavs[0])
    n0 = int(batch["frame_lengths"][0])
    np.testing.assert_allclose(
        np.asarray(batch["phn_fc_logits"])[0, :n0],
        single["phn_fc_logits"], rtol=1e-4, atol=1e-5,
    )


def test_pr_predictor_contracts(models, rng):
    _, (pr, pp), _ = models
    vocab = {"(blank)": 0, "(...)": 1, **{c: i + 2 for i, c in
                                          enumerate("abcdefghi")}}
    pred = W2V2PRPredictor(pr, pp, vocab)
    wav = rng.standard_normal(4800).astype(np.float32)

    logits = pred.get_ctc_logits(wav)
    t = int(pr.cfg.feat_extract_output_lengths(np.asarray(4800)))
    assert logits.shape == (t, pr.cfg.vocab_size)

    emb = pred.get_embeddings([wav, wav])
    assert emb["last_transf_hidden"].shape[0] == 2
    assert emb["last_transf_hidden"].shape[1] == pr.cfg.hidden_size  # (B,H,T)
    assert emb["phoneme_logits"].shape[1] == pr.cfg.vocab_size
    assert len(emb["phn_pred_seq_idx"]) == 2
    np.testing.assert_array_equal(emb["frame_seq_lens"], [t, t])

    dur = pred.predict_phonemes_durations(wav)
    assert len(dur["phn_seq_idx"]) == len(dur["phn_seq_dur"])
    assert dur["phn_seq_ipa"] is None or len(dur["phn_seq_ipa"]) == len(
        dur["phn_seq_idx"])
    for d in dur["phn_seq_dur"]:
        assert 0 <= d <= len(wav) / 16000 + 0.1

    seq = pred.pred_phn_seq(wav)
    np.testing.assert_array_equal(seq["phn_seq_idx"], dur["phn_seq_idx"])


def test_force_predictor_contracts(models, rng):
    _, _, (force, fp) = models
    pred = ForceAPTAIPredictor(force, fp)
    wav = rng.standard_normal(5600).astype(np.float32)
    out = pred.get_faptai_output(wav)
    t = len(out["pred_frame_phns"])
    assert set(out["tvs_pred"]) == set(TV_ORDER)
    assert len(out["tvs_pred"]["TBCD"]) == t
    align = pred.get_alignment(wav)
    n_phn = len(out["pred_ctc_phn_seq"])
    assert align["alignment"].shape == (n_phn, t)
    # rows are log-probs over phonemes: exp sums to 1 along phoneme axis
    col = np.exp(align["alignment"][:, 0])
    assert col.sum() == pytest.approx(1.0, abs=1e-3)


def test_streaming_tiling_is_exact(models):
    """Stitched segments tile the absolute frame axis exactly: frame counts
    line up with the closed-form length, and each retained segment equals
    the per-chunk forward of its window (stitching machinery correctness —
    context-dependent attention means cross-chunk values legitimately differ
    from a single full-context forward)."""
    (aptai, ap), _, _ = models
    rng = np.random.default_rng(1)
    wav = rng.standard_normal(16000 * 7).astype(np.float32) * 0.1

    stream = StreamingAPTAI(aptai, ap, chunk_seconds=3.0, overlap_seconds=1.0)
    out_s = stream.predict(wav)

    t_stream = len(out_s["phn_fc_pred"])
    # total frames: last chunk end = offset(last) + frames(last chunk)
    frame_hop = int(np.prod(aptai.cfg.conv_stride))
    starts = list(range(0, len(wav) - stream.overlap, stream.hop))
    last_t = int(aptai.cfg.feat_extract_output_lengths(
        np.asarray(len(wav) - starts[-1])))
    expect = starts[-1] // frame_hop + last_t
    assert t_stream == expect

    # first chunk's retained prefix must equal its standalone forward
    pred = APTAIPredictor(aptai, ap)
    chunk0 = pred.get_aptai_output(wav[: stream.chunk])
    keep = len(out_s["tvs_pred"]["LA"]) and (
        int(aptai.cfg.feat_extract_output_lengths(np.asarray(stream.chunk)))
        - int(aptai.cfg.feat_extract_output_lengths(np.asarray(stream.overlap)))
        // 2
    )
    la_s = np.asarray(out_s["tvs_pred"]["LA"][:keep])
    la_c = np.asarray(chunk0["tvs_pred"]["LA"][:keep])
    np.testing.assert_allclose(la_s, la_c, rtol=1e-4, atol=1e-5)


def test_streaming_upload_ahead_is_numerically_identical(models):
    """upload_ahead=True only reorders host→device transfers (a side
    thread forces each window's upload ahead of the compute fetches);
    stitched outputs must equal the default path bit-for-bit, incl. with
    a quantized transfer dtype and a partial last group."""
    (aptai, ap), _, _ = models
    rng = np.random.default_rng(3)
    wav = rng.standard_normal(16000 * 9).astype(np.float32) * 0.1
    for dt in ("float32", "int16"):
        base = StreamingAPTAI(aptai, ap, chunk_seconds=3.0,
                              overlap_seconds=1.0, chunk_batch=2,
                              transfer_dtype=dt)
        ahead = StreamingAPTAI(aptai, ap, chunk_seconds=3.0,
                               overlap_seconds=1.0, chunk_batch=2,
                               transfer_dtype=dt, upload_ahead=True)
        a, b = base.predict(wav), ahead.predict(wav)
        np.testing.assert_array_equal(a["phn_fc_pred"], b["phn_fc_pred"])
        for k in a["tvs_pred"]:
            np.testing.assert_array_equal(a["tvs_pred"][k],
                                          b["tvs_pred"][k])


def test_streaming_short_audio_passthrough(models):
    (aptai, ap), _, _ = models
    wav = np.random.default_rng(2).standard_normal(8000).astype(np.float32)
    stream = StreamingAPTAI(aptai, ap, chunk_seconds=3.0, overlap_seconds=1.0)
    out = stream.predict(wav)
    t = int(aptai.cfg.feat_extract_output_lengths(np.asarray(8000)))
    assert len(out["phn_fc_pred"]) == t


def test_micro_batcher(models):
    from aptai_tpu.infer import MicroBatcher

    (aptai, ap), _, _ = models
    pred = APTAIPredictor(aptai, ap)
    mb = MicroBatcher(pred.predict_batch, max_batch_size=4)
    rng = np.random.default_rng(3)
    wavs = [rng.standard_normal(3200 + 800 * i).astype(np.float32)
            for i in range(3)]
    # synchronous core
    results = mb.run_batch(wavs)
    assert len(results) == 3
    for i, r in enumerate(results):
        t = int(aptai.cfg.feat_extract_output_lengths(np.asarray(len(wavs[i]))))
        assert r["tvs_pred"].shape == (t, 9)
    # request/response path
    mb.start()
    futs = [mb.submit(w) for w in wavs]
    outs = [f.result(timeout=60) for f in futs]
    mb.stop()
    np.testing.assert_allclose(outs[0]["tvs_pred"], results[0]["tvs_pred"],
                               rtol=1e-4, atol=1e-5)


def test_aptai_predictor_on_mesh(models):
    """Data-parallel batched inference over the 8-device CPU mesh."""
    from aptai_tpu.parallel import make_mesh

    (aptai, ap), _, _ = models
    mesh = make_mesh(data=8, model=1)
    pred_mesh = APTAIPredictor(aptai, ap, mesh=mesh)
    pred_single = APTAIPredictor(aptai, ap)
    rng = np.random.default_rng(4)
    wavs = [rng.standard_normal(4000).astype(np.float32) for _ in range(8)]
    out_m = pred_mesh.predict_batch(wavs)
    out_s = pred_single.predict_batch(wavs)
    np.testing.assert_allclose(
        np.asarray(out_m["tvs_pred"]), np.asarray(out_s["tvs_pred"]),
        rtol=1e-4, atol=1e-5,
    )


def test_pr_and_force_predictors_on_mesh(models):
    """All three predictor families accept ``mesh=``: DP outputs must match
    single-device, including the beam_host split path (sharded encode →
    host decode → sharded head)."""
    from aptai_tpu.models import ForceAPTAI, tiny_config
    from aptai_tpu.parallel import make_mesh

    _, (pr, pp), (force, fp) = models
    mesh = make_mesh(data=8, model=1)
    rng = np.random.default_rng(6)
    wavs = [rng.standard_normal(4000).astype(np.float32) for _ in range(8)]

    out_m = W2V2PRPredictor(pr, pp, mesh=mesh).encode_batch(wavs)
    out_s = W2V2PRPredictor(pr, pp).encode_batch(wavs)
    np.testing.assert_allclose(
        np.asarray(out_m["phoneme_logits"]),
        np.asarray(out_s["phoneme_logits"]), rtol=1e-4, atol=1e-5)

    fm = ForceAPTAIPredictor(force, fp, mesh=mesh).predict_batch(wavs)
    fs = ForceAPTAIPredictor(force, fp).predict_batch(wavs)
    np.testing.assert_allclose(np.asarray(fm["tvs_pred"]),
                               np.asarray(fs["tvs_pred"]),
                               rtol=1e-4, atol=1e-5)

    beam = ForceAPTAI(tiny_config(), vocab_size=force.vocab_size,
                      decode_method="beam_host")
    bm = ForceAPTAIPredictor(beam, fp, mesh=mesh).predict_batch(wavs)
    bs = ForceAPTAIPredictor(beam, fp).predict_batch(wavs)
    np.testing.assert_array_equal(np.asarray(bm["pred_ctc_phn_seq"]),
                                  np.asarray(bs["pred_ctc_phn_seq"]))
    np.testing.assert_allclose(np.asarray(bm["tvs_pred"]),
                               np.asarray(bs["tvs_pred"]),
                               rtol=1e-4, atol=1e-5)


def test_streaming_chunk_parallel_on_mesh(models):
    """Sequence parallelism for one long file: chunk-batched streaming over
    the mesh matches sequential streaming exactly."""
    from aptai_tpu.parallel import make_mesh

    (aptai, ap), _, _ = models
    rng = np.random.default_rng(5)
    wav = rng.standard_normal(16000 * 9).astype(np.float32) * 0.1

    seq = StreamingAPTAI(aptai, ap, chunk_seconds=2.0, overlap_seconds=0.5)
    mesh = make_mesh(data=4, model=1)
    par = StreamingAPTAI(aptai, ap, chunk_seconds=2.0, overlap_seconds=0.5,
                         mesh=mesh, chunk_batch=4)
    out_s = seq.predict(wav)
    out_p = par.predict(wav)
    assert len(out_s["phn_fc_pred"]) == len(out_p["phn_fc_pred"])
    np.testing.assert_allclose(
        np.asarray(out_s["tvs_pred"]["LA"]),
        np.asarray(out_p["tvs_pred"]["LA"]), rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_array_equal(out_s["phn_fc_pred"], out_p["phn_fc_pred"])


def test_streaming_force_aptai(models):
    """FORCE streaming (VERDICT r1 weak #9): stitched frame phonemes + TVs
    over a long file, first-chunk prefix equal to the standalone forward."""
    from aptai_tpu.infer import StreamingForceAPTAI

    _, _, (force, fp) = models
    rng = np.random.default_rng(6)
    wav = rng.standard_normal(16000 * 7).astype(np.float32) * 0.1

    stream = StreamingForceAPTAI(force, fp, chunk_seconds=3.0,
                                 overlap_seconds=1.0)
    out = stream.predict(wav)

    frame_hop = int(np.prod(force.pr_cfg.conv_stride))
    starts = list(range(0, len(wav) - stream.overlap, stream.hop))
    last_t = int(force.pr_cfg.feat_extract_output_lengths(
        np.asarray(len(wav) - starts[-1])))
    expect = starts[-1] // frame_hop + last_t
    assert len(out["pred_frame_phns"]) == expect
    assert set(out["tvs_pred"]) == set(TV_ORDER)
    assert len(out["tvs_pred"]["LA"]) == expect

    # first chunk's retained prefix equals its standalone forward
    pred = ForceAPTAIPredictor(force, fp)
    chunk0 = pred.get_faptai_output(wav[: stream.chunk])
    t0 = int(force.pr_cfg.feat_extract_output_lengths(
        np.asarray(stream.chunk)))
    keep = t0 - int(force.pr_cfg.feat_extract_output_lengths(
        np.asarray(stream.overlap))) // 2
    np.testing.assert_array_equal(out["pred_frame_phns"][:keep],
                                  np.asarray(chunk0["pred_frame_phns"])[:keep])
    np.testing.assert_allclose(
        np.asarray(out["tvs_pred"]["LA"][:keep]),
        np.asarray(chunk0["tvs_pred"]["LA"][:keep]), rtol=1e-4, atol=1e-5)


def test_streaming_force_on_mesh(models):
    from aptai_tpu.infer import StreamingForceAPTAI
    from aptai_tpu.parallel import make_mesh

    _, _, (force, fp) = models
    rng = np.random.default_rng(7)
    wav = rng.standard_normal(16000 * 9).astype(np.float32) * 0.1
    seq = StreamingForceAPTAI(force, fp, chunk_seconds=2.0,
                              overlap_seconds=0.5)
    par = StreamingForceAPTAI(force, fp, chunk_seconds=2.0,
                              overlap_seconds=0.5,
                              mesh=make_mesh(data=4, model=1), chunk_batch=4)
    out_s = seq.predict(wav)
    out_p = par.predict(wav)
    np.testing.assert_array_equal(out_s["pred_frame_phns"],
                                  out_p["pred_frame_phns"])
    np.testing.assert_allclose(np.asarray(out_s["tvs_pred"]["LA"]),
                               np.asarray(out_p["tvs_pred"]["LA"]),
                               rtol=1e-4, atol=1e-5)


def test_micro_batcher_pad_to_max_matches_unpadded(models):
    """Serving-shape padding (pad_to_max) must not change any request's
    result, and fields= must select exactly the served outputs."""
    from aptai_tpu.infer import MicroBatcher

    (aptai, ap), _, _ = models
    pred = APTAIPredictor(aptai, ap)
    rng = np.random.default_rng(5)
    wavs = [rng.standard_normal(3200 + 1600 * i).astype(np.float32)
            for i in range(3)]

    padded = MicroBatcher(pred.predict_batch, max_batch_size=8,
                          pad_to_max=True).run_batch(wavs)
    plain = MicroBatcher(pred.predict_batch, max_batch_size=8,
                         pad_to_max=False).run_batch(wavs)
    assert len(padded) == len(plain) == 3
    for a, b in zip(padded, plain):
        np.testing.assert_allclose(a["tvs_pred"], b["tvs_pred"],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(a["phn_fc_pred"], b["phn_fc_pred"])

    # field-selective serving: only the requested heads leave the model
    import functools

    slim = MicroBatcher(
        functools.partial(pred.predict_batch,
                          fields=("tvs_pred", "phn_fc_pred")),
        max_batch_size=8,
    ).run_batch(wavs)
    for a, b in zip(slim, padded):
        np.testing.assert_allclose(a["tvs_pred"], b["tvs_pred"],
                                   rtol=1e-4, atol=1e-5)
        assert "phn_fc_probs" not in a and "phn_fc_logits" not in a


def test_get_embeddings_row_count_contract(models):
    """Batch-dim outputs match the input count (no serving-shape pad rows
    leak through the reference get_embeddings contract)."""
    _, (pr, pp), _ = models
    pred = W2V2PRPredictor(pr, pp)
    rng = np.random.default_rng(6)
    wavs = [rng.standard_normal(3200).astype(np.float32) for _ in range(3)]
    out = pred.get_embeddings(wavs)
    assert out["phoneme_logits"].shape[0] == 3
    assert out["last_transf_hidden"].shape[0] == 3
    assert len(out["phn_pred_seq_idx"]) == 3
    assert len(out["frame_seq_lens"]) == 3


def test_predict_batch_strips_pad_rows(models, rng):
    """Public contract: every predict_batch/encode_batch output has leading
    dim == len(wavs), even though the device batch is bucketed to the next
    power of two (3 wavs → device batch 4)."""
    (aptai, ap), (pr, pp), (force, fp) = models
    wavs = [rng.standard_normal(3200 + 800 * i).astype(np.float32)
            for i in range(3)]
    for out in (APTAIPredictor(aptai, ap).predict_batch(wavs),
                ForceAPTAIPredictor(force, fp).predict_batch(wavs),
                W2V2PRPredictor(pr, pp).encode_batch(wavs)):
        for k, v in out.items():
            assert np.asarray(v).shape[0] == 3, (k, np.asarray(v).shape)


def test_predict_batch_unknown_field_raises(models, rng):
    (aptai, ap), _, _ = models
    pred = APTAIPredictor(aptai, ap)
    wav = [rng.standard_normal(3200).astype(np.float32)]
    with pytest.raises(ValueError, match="tvs_predd"):
        pred.predict_batch(wav, fields=("tvs_predd",))


def test_micro_batcher_fields_kwarg(models, rng):
    """fields= on the MicroBatcher itself (the serving default) restricts
    outputs like a partial over predict_batch does."""
    from aptai_tpu.infer import MicroBatcher

    (aptai, ap), _, _ = models
    pred = APTAIPredictor(aptai, ap)
    wavs = [rng.standard_normal(4000).astype(np.float32)]
    res = MicroBatcher(pred.predict_batch, max_batch_size=2,
                       fields=("tvs_pred",)).run_batch(wavs)[0]
    assert "tvs_pred" in res and "frame_lengths" in res
    assert "phn_fc_probs" not in res


def test_int16_transfer_lossless_for_pcm_audio(models, rng):
    """transfer_dtype="int16" halves the host→device upload; for audio on
    the 16-bit PCM grid (every real corpus file) the round trip is exact,
    so predictions are bit-identical to the float32 transfer."""
    (aptai, ap), _, _ = models
    # audio ON the int16 grid, like anything decoded from a PCM wav
    pcm = rng.integers(-32768, 32768, size=4000).astype(np.int16)
    wav = pcm.astype(np.float32) / 32768.0

    f32 = APTAIPredictor(aptai, ap).predict_batch([wav])
    i16 = APTAIPredictor(aptai, ap,
                         transfer_dtype="int16").predict_batch([wav])
    for k in f32:
        np.testing.assert_array_equal(np.asarray(f32[k]),
                                      np.asarray(i16[k]), err_msg=k)


def test_streaming_int16_matches_f32(models, rng):
    from aptai_tpu.infer import StreamingAPTAI

    (aptai, ap), _, _ = models
    pcm = rng.integers(-2000, 2000, size=16000 * 3).astype(np.int16)
    wav = pcm.astype(np.float32) / 32768.0
    kw = dict(chunk_seconds=1.0, overlap_seconds=0.2, chunk_batch=2)
    a = StreamingAPTAI(aptai, ap, **kw).predict(wav)
    b = StreamingAPTAI(aptai, ap, transfer_dtype="int16", **kw).predict(wav)
    np.testing.assert_array_equal(a["phn_fc_pred"], b["phn_fc_pred"])
    for k in a["tvs_pred"]:
        np.testing.assert_array_equal(a["tvs_pred"][k], b["tvs_pred"][k])


def test_streaming_int16_on_mesh_matches_f32(models, rng):
    """The mesh (chunk-parallel) path must honor transfer_dtype="int16"
    exactly like the single-device window path (round-3 advisor fix)."""
    from aptai_tpu.infer import StreamingAPTAI
    from aptai_tpu.parallel import make_mesh

    (aptai, ap), _, _ = models
    pcm = rng.integers(-2000, 2000, size=16000 * 5).astype(np.int16)
    wav = pcm.astype(np.float32) / 32768.0
    mesh = make_mesh(data=4, model=1)
    kw = dict(chunk_seconds=1.0, overlap_seconds=0.2, chunk_batch=4,
              mesh=mesh)
    a = StreamingAPTAI(aptai, ap, **kw).predict(wav)
    b = StreamingAPTAI(aptai, ap, transfer_dtype="int16", **kw).predict(wav)
    np.testing.assert_array_equal(a["phn_fc_pred"], b["phn_fc_pred"])
    for k in a["tvs_pred"]:
        np.testing.assert_array_equal(a["tvs_pred"][k], b["tvs_pred"][k])


def test_streaming_rejects_beam_host_model(models):
    """A beam_host FORCE model embeds a host-callback beam search in its
    jitted predict — deadlock-prone under the streaming fetch threads, so
    the streamer must refuse it loudly at construction."""
    from aptai_tpu.infer import StreamingForceAPTAI
    from aptai_tpu.models import ForceAPTAI, tiny_config

    _, _, (_, fp) = models
    cfg = tiny_config()
    beam_model = ForceAPTAI(cfg, vocab_size=cfg.vocab_size,
                            decode_method="beam_host")
    with pytest.raises(ValueError, match="beam"):
        StreamingForceAPTAI(beam_model, fp, chunk_seconds=2.0,
                            overlap_seconds=0.5)


def test_fetch_outputs_pipelined_pass(models, rng):
    """fetch_outputs converts a mixed dict (device arrays, host lists,
    numpy) to host numpy with values identical to per-field np.asarray."""
    import jax.numpy as jnp

    from aptai_tpu.infer import fetch_outputs

    out = {
        "dev": jnp.arange(12.0).reshape(3, 4),
        "host_list": [1, 2, 3],
        "np": np.ones((2, 2), np.float32),
    }
    host = fetch_outputs(out)
    for k in out:
        got = host[k]
        assert isinstance(got, np.ndarray)
        np.testing.assert_array_equal(got, np.asarray(out[k]))


def test_mulaw_transfer_codec():
    """G.711 mu-law round trip: >30 dB SNR on speech-level audio, exact
    zero, symmetric, and full-scale endpoints recovered within one step."""
    import jax.numpy as jnp

    from aptai_tpu.infer.api import dequantize_mulaw, quantize_mulaw

    t = np.arange(16000, dtype=np.float32) / 16000.0
    x = (0.1 * np.sin(2 * np.pi * 220 * t)
         + 0.05 * np.sin(2 * np.pi * 1333 * t)).astype(np.float32)
    q = quantize_mulaw(x)
    assert q.dtype == np.uint8
    y = np.asarray(dequantize_mulaw(jnp.asarray(q)))
    snr_db = 10 * np.log10(np.mean(x ** 2) / np.mean((x - y) ** 2))
    assert snr_db > 30.0, snr_db

    # exact zero and symmetry
    z = np.asarray(dequantize_mulaw(jnp.asarray(quantize_mulaw(
        np.zeros(4, np.float32)))))
    np.testing.assert_allclose(z, 0.0, atol=1e-7)
    pm = np.asarray(dequantize_mulaw(jnp.asarray(quantize_mulaw(
        np.asarray([0.5, -0.5], np.float32)))))
    np.testing.assert_allclose(pm[0], -pm[1], atol=1e-6)
    # full scale clamps, round-trips near +-1
    fs = np.asarray(dequantize_mulaw(jnp.asarray(quantize_mulaw(
        np.asarray([1.0, -1.0, 2.0], np.float32)))))
    np.testing.assert_allclose(fs, [1.0, -1.0, 1.0], atol=1e-5)


def test_mulaw_predictor_smoke_and_unknown_dtype_raises(models, rng):
    (aptai, ap), _, _ = models
    wav = (rng.standard_normal(3200) * 0.1).astype(np.float32)
    f32 = APTAIPredictor(aptai, ap).predict_batch([wav])
    mu = APTAIPredictor(aptai, ap,
                        transfer_dtype="uint8_mulaw").predict_batch([wav])
    assert np.asarray(mu["tvs_pred"]).shape == np.asarray(
        f32["tvs_pred"]).shape
    np.testing.assert_array_equal(np.asarray(mu["frame_lengths"]),
                                  np.asarray(f32["frame_lengths"]))
    # lossy but small: TV trajectories track the float32 path closely on
    # a ~38 dB-SNR input perturbation
    d = np.abs(np.asarray(mu["tvs_pred"], np.float32)
               - np.asarray(f32["tvs_pred"], np.float32))
    assert float(d.max()) < 0.2, float(d.max())

    with pytest.raises(ValueError, match="transfer_dtype"):
        APTAIPredictor(aptai, ap,
                       transfer_dtype="int8").predict_batch([wav])


def test_streaming_per_file_fetch_is_numerically_identical(models):
    """fetch_mode='per_file' only changes HOW outputs leave the device
    (one concatenated fetch instead of per-group fetches); stitched
    outputs must equal the pipelined path bit-for-bit — including with a
    partial last group (bucketed concat slices surplus rows away), a
    chunk_batch > 1, and on the mesh path."""
    (aptai, ap), _, _ = models
    rng = np.random.default_rng(5)
    wav = rng.standard_normal(16000 * 11).astype(np.float32) * 0.1
    for kw in ({"chunk_batch": 1}, {"chunk_batch": 2}):
        base = StreamingAPTAI(aptai, ap, chunk_seconds=3.0,
                              overlap_seconds=1.0, **kw)
        single = StreamingAPTAI(aptai, ap, chunk_seconds=3.0,
                                overlap_seconds=1.0, fetch_mode="per_file",
                                **kw)
        a, b = base.predict(wav), single.predict(wav)
        np.testing.assert_array_equal(a["phn_fc_pred"], b["phn_fc_pred"])
        for k in a["tvs_pred"]:
            np.testing.assert_array_equal(a["tvs_pred"][k],
                                          b["tvs_pred"][k])

    # mesh path: chunk-parallel across devices with the single drain
    from aptai_tpu.parallel import make_mesh

    mesh = make_mesh(data=4, model=1)
    base_m = StreamingAPTAI(aptai, ap, chunk_seconds=3.0,
                            overlap_seconds=1.0, mesh=mesh, chunk_batch=4)
    single_m = StreamingAPTAI(aptai, ap, chunk_seconds=3.0,
                              overlap_seconds=1.0, mesh=mesh, chunk_batch=4,
                              fetch_mode="per_file")
    a, b = base_m.predict(wav), single_m.predict(wav)
    np.testing.assert_array_equal(a["phn_fc_pred"], b["phn_fc_pred"])


def test_load_model_quant_override(models, tmp_path):
    """load_model(quant=...) turns on the int8 GEMM path on any saved
    checkpoint (the param tree is quant-invariant) — the serving-side
    entry for W8A8 (aptai-serve --quant)."""
    (aptai, ap), _, _ = models
    from aptai_tpu.train.checkpoints import save_json, save_pytree
    from aptai_tpu.infer.loader import load_model
    import dataclasses as dc

    d = tmp_path / "best-model-ckpt"
    save_pytree(d / "params.msgpack", ap)
    save_json(d / "model_cfg.json",
              {"backbone": dc.asdict(aptai.cfg),
               "vocab": {f"p{i}": i for i in range(11)},
               "kind": "aptai"})
    import jax.numpy as jnp

    kind, m, params, _ = load_model(tmp_path, quant="w8a8_ffn")
    assert m.cfg.quant == "w8a8_ffn"
    wav = np.zeros((1, 3200), np.float32)
    out = m.apply({"params": params}, jnp.asarray(wav),
                  jnp.asarray([3200], np.int32), method="predict")
    assert np.isfinite(np.asarray(out["tvs_pred"])).all()
