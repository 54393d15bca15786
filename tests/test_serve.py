"""HTTP serving front end (infer/serve.py): wire protocol, per-family
response shaping, request validation — over a real socket for the APTAI
family, transport-free for the PR family."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aptai_tpu import TV_ORDER
from aptai_tpu.infer import APTAIPredictor, W2V2PRPredictor
from aptai_tpu.infer.api import quantize_mulaw
from aptai_tpu.infer.server import MicroBatcher
from aptai_tpu.infer.serve import (
    ServingApp,
    _mulaw_expand_host,
    decode_binary,
    decode_wire_audio,
    encode_binary,
    jsonify,
    make_server,
)
from aptai_tpu.models import APTAI, W2V2PR, tiny_config


@pytest.fixture(scope="module")
def aptai_server():
    from aptai_tpu.infer import StreamingAPTAI

    cfg = tiny_config()
    model = APTAI(cfg, num_phonemes=11)
    audio = jnp.zeros((1, 3200), jnp.float32)
    lens = jnp.asarray(np.array([3200], np.int32))
    variables = model.init(jax.random.PRNGKey(0), audio, lens,
                           method="predict")
    pred = APTAIPredictor(model, variables["params"])
    batcher = MicroBatcher(pred.predict_batch, max_batch_size=2,
                           max_wait_ms=5.0,
                           fields=("tvs_pred", "phn_fc_pred")).start()
    streamer = StreamingAPTAI(model, variables["params"],
                              chunk_seconds=2.0, overlap_seconds=0.5,
                              chunk_batch=2)
    app = ServingApp(batcher, "aptai", max_seconds=5.0, streamer=streamer,
                     max_stream_seconds=60.0)
    srv = make_server(app, "127.0.0.1", 0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", model, app
    srv.shutdown()
    batcher.stop()


def _request(url, body=None, headers=None, method=None):
    req = urllib.request.Request(url, data=body, headers=headers or {},
                                 method=method or ("POST" if body is not None
                                                   else "GET"))
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _wav(n=5000, seed=0):
    return (np.random.default_rng(seed).standard_normal(n)
            .astype(np.float32) * 0.1)


def test_healthz(aptai_server):
    base, _, _ = aptai_server
    status, payload = _request(f"{base}/healthz")
    assert status == 200
    assert payload["status"] == "ok"
    assert payload["model"] == "aptai"
    assert payload["fields"] == ["tvs_pred", "phn_fc_pred"]


def test_predict_float32_octet_stream(aptai_server):
    base, model, _ = aptai_server
    wav = _wav()
    status, payload = _request(f"{base}/v1/predict", wav.tobytes())
    assert status == 200
    t = int(model.cfg.feat_extract_output_lengths(np.asarray(len(wav))))
    assert payload["frames"] == t
    assert set(payload["tvs_pred"]) == set(TV_ORDER)
    assert len(payload["tvs_pred"]["LA"]) == t
    assert len(payload["phn_fc_pred"]) == t
    assert all(isinstance(p, int) for p in payload["phn_fc_pred"])


def test_predict_json_body_matches_binary(aptai_server):
    base, _, _ = aptai_server
    wav = _wav()
    s1, p1 = _request(f"{base}/v1/predict", wav.tobytes())
    s2, p2 = _request(
        f"{base}/v1/predict",
        json.dumps({"audio": wav.tolist()}).encode(),
        headers={"Content-Type": "application/json"},
    )
    assert (s1, s2) == (200, 200)
    assert p1["frames"] == p2["frames"]
    np.testing.assert_allclose(p1["tvs_pred"]["LA"], p2["tvs_pred"]["LA"],
                               rtol=1e-4, atol=1e-5)


def test_predict_wire_codecs(aptai_server):
    """int16 and uint8_mulaw wire encodings serve successfully and keep
    the frame geometry; mu-law is lossy so values only match loosely."""
    base, _, _ = aptai_server
    wav = _wav()
    _, ref = _request(f"{base}/v1/predict", wav.tobytes())
    i16 = np.clip(np.rint(wav * 32768.0), -32768, 32767).astype("<i2")
    status, p = _request(f"{base}/v1/predict", i16.tobytes(),
                         headers={"X-Audio-Encoding": "int16"})
    assert status == 200 and p["frames"] == ref["frames"]
    ulaw = quantize_mulaw(wav)
    status, p = _request(f"{base}/v1/predict", ulaw.tobytes(),
                         headers={"X-Audio-Encoding": "uint8_mulaw"})
    assert status == 200 and p["frames"] == ref["frames"]


def test_fields_filter_and_validation(aptai_server):
    base, _, _ = aptai_server
    wav = _wav()
    status, p = _request(f"{base}/v1/predict?fields=tvs_pred",
                         wav.tobytes())
    assert status == 200
    assert set(p) == {"frames", "tvs_pred"}
    status, p = _request(f"{base}/v1/predict?fields=nope", wav.tobytes())
    assert status == 400 and "nope" in p["error"]


def test_request_validation(aptai_server):
    base, _, _ = aptai_server
    wav = _wav()
    status, p = _request(f"{base}/v1/predict", wav.tobytes(),
                         headers={"X-Audio-Encoding": "opus"})
    assert status == 400 and "opus" in p["error"]
    status, p = _request(f"{base}/v1/predict", wav.tobytes(),
                         headers={"X-Sample-Rate": "44100"})
    assert status == 400 and "16000" in p["error"]
    status, p = _request(f"{base}/v1/predict", b"")
    assert status == 400 and "empty" in p["error"]
    # longer than the app's max_seconds=5 cap
    status, p = _request(f"{base}/v1/predict",
                         np.zeros(16_000 * 6, np.float32).tobytes())
    assert status == 400 and "cap" in p["error"]
    status, p = _request(f"{base}/nope", wav.tobytes())
    assert status == 404


def test_persistent_connection_reuse(aptai_server):
    """HTTP/1.1 keep-alive: two requests over ONE socket both succeed —
    the server must send Content-Length and not close between them."""
    import http.client

    base, _, _ = aptai_server
    host, port = base.removeprefix("http://").split(":")
    conn = http.client.HTTPConnection(host, int(port), timeout=120)
    try:
        for seed in (0, 1):
            conn.request("POST", "/v1/predict?fields=tvs_pred",
                         body=_wav(seed=seed).tobytes())
            r = conn.getresponse()
            payload = json.loads(r.read())
            assert r.status == 200 and "tvs_pred" in payload
            # same socket both times — reuse, not reconnect
            assert r.version == 11
            assert r.getheader("Content-Length") is not None
    finally:
        conn.close()


def test_pr_family_response_shape():
    """w2v2_pr serving: logits are decoded host-side into the reference's
    sequence + durations contract (models/w2v2_pr.py:191-235), no socket."""
    cfg = tiny_config()
    model = W2V2PR(cfg)
    audio = jnp.zeros((1, 3200), jnp.float32)
    lens = jnp.asarray(np.array([3200], np.int32))
    variables = model.init(jax.random.PRNGKey(0), audio, lens,
                           method="encode")
    vocab = {"(blank)": 0, "(...)": 1,
             **{c: i + 2 for i, c in enumerate("abcdefghi")}}
    pred = W2V2PRPredictor(model, variables["params"], vocab)
    batcher = MicroBatcher(pred.encode_batch, max_batch_size=2,
                           max_wait_ms=5.0,
                           fields=("phoneme_logits",)).start()
    try:
        app = ServingApp(batcher, "w2v2_pr", vocab=vocab)
        wav = _wav(4800)
        status, payload = app.predict(wav.tobytes(), "", {}, {})
        payload = jsonify(payload)  # direct calls return arrays; the
        # transport boundary converts (serve.py _Handler._send)
        assert status == 200
        assert payload["frames"] == int(
            cfg.feat_extract_output_lengths(np.asarray(4800)))
        assert isinstance(payload["phn_seq_idx"], list)
        assert len(payload["phn_seq_dur"]) == len(payload["phn_seq_idx"])
        assert len(payload["phn_seq_ipa"]) == len(payload["phn_seq_idx"])
        # durations are seconds within the utterance
        assert all(0.0 <= d <= 0.35 for d in payload["phn_seq_dur"])
    finally:
        batcher.stop()


def test_decode_wire_audio_mulaw_roundtrip():
    wav = _wav(2000, seed=3)
    back = decode_wire_audio(quantize_mulaw(wav).tobytes(), "",
                             "uint8_mulaw", None, 10.0)
    snr = 10 * np.log10(np.mean(wav ** 2) /
                        (np.mean((wav - back) ** 2) + 1e-12))
    assert snr > 25.0  # G.711 speech-level SNR
    np.testing.assert_allclose(
        back, _mulaw_expand_host(quantize_mulaw(wav)), atol=0)


def test_stream_endpoint_matches_direct_streamer(aptai_server):
    """POST /v1/stream on a recording LONGER than the predict cap returns
    the stitched full-recording outputs, equal to calling the streamer
    directly; /v1/predict's cap error now points at the stream route."""
    base, _, app = aptai_server
    wav = _wav(16_000 * 8, seed=7)  # 8 s > max_seconds=5

    status, p = _request(f"{base}/v1/predict", wav.tobytes())
    assert status == 400 and "/v1/stream" in p["error"]

    status, p = _request(f"{base}/v1/stream", wav.tobytes())
    assert status == 200
    direct = app.streamer.predict(wav)
    assert p["frames"] == len(direct["phn_fc_pred"])
    assert p["phn_fc_pred"] == [int(x) for x in direct["phn_fc_pred"]]
    np.testing.assert_allclose(p["tvs_pred"]["LA"],
                               np.asarray(direct["tvs_pred"]["LA"]),
                               rtol=1e-4, atol=1e-5)
    # wire codecs + fields filter apply to the stream route too
    i16 = np.clip(np.rint(wav * 32768.0), -32768, 32767).astype("<i2")
    status, p16 = _request(f"{base}/v1/stream?fields=tvs_pred",
                           i16.tobytes(),
                           headers={"X-Audio-Encoding": "int16"})
    assert status == 200 and set(p16) == {"frames", "tvs_pred"}
    assert p16["frames"] == p["frames"]
    # beyond max_stream_seconds is still rejected
    status, p = _request(
        f"{base}/v1/stream",
        np.zeros(16_000 * 61, np.float32).tobytes())
    assert status == 400 and "cap" in p["error"]


def test_metrics_endpoint(aptai_server):
    base, _, app = aptai_server
    _request(f"{base}/v1/predict", _wav().tobytes())  # ensure >=1 success
    status, m = _request(f"{base}/metrics")
    assert status == 200
    assert m["requests_total"] >= 1
    assert m["audio_seconds_total"] > 0
    assert m["latency_window"] >= 1 and m["latency_p50_ms"] > 0
    if m["stream_requests_total"]:
        assert m["stream_rtf"] > 0


def test_streaming_disabled_is_404():
    cfg = tiny_config()
    model = APTAI(cfg, num_phonemes=11)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3200), jnp.float32),
        jnp.asarray(np.array([3200], np.int32)), method="predict")
    pred = APTAIPredictor(model, variables["params"])
    batcher = MicroBatcher(pred.predict_batch, max_batch_size=2,
                           max_wait_ms=5.0, fields=("tvs_pred",)).start()
    try:
        app = ServingApp(batcher, "aptai")  # no streamer
        status, p = app.stream(_wav().tobytes(), "", {}, {})
        assert status == 404 and "not enabled" in p["error"]
    finally:
        batcher.stop()


def test_pr_stream_decodes_long_recording():
    """w2v2_pr /v1/stream: stitched CTC logits decode host-side into one
    sequence with absolute timestamps (transport-free)."""
    from aptai_tpu.infer import StreamingW2V2PR

    cfg = tiny_config()
    model = W2V2PR(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3200), jnp.float32),
        jnp.asarray(np.array([3200], np.int32)), method="encode")
    vocab = {"(blank)": 0, "(...)": 1,
             **{c: i + 2 for i, c in enumerate("abcdefghi")}}
    pred = W2V2PRPredictor(model, variables["params"], vocab)
    batcher = MicroBatcher(pred.encode_batch, max_batch_size=2,
                           max_wait_ms=5.0,
                           fields=("phoneme_logits",)).start()
    streamer = StreamingW2V2PR(model, variables["params"],
                               chunk_seconds=2.0, overlap_seconds=0.5)
    try:
        app = ServingApp(batcher, "w2v2_pr", vocab=vocab, max_seconds=3.0,
                         streamer=streamer, max_stream_seconds=60.0)
        wav = _wav(16_000 * 7, seed=11)
        status, p = app.stream(wav.tobytes(), "", {}, {})
        assert status == 200
        t = int(cfg.feat_extract_output_lengths(np.asarray(len(wav))))
        # stitching reproduces the full-recording frame count exactly
        assert p["frames"] == t
        assert len(p["phn_seq_dur"]) == len(p["phn_seq_idx"])
        assert len(p["phn_seq_ipa"]) == len(p["phn_seq_idx"])
        assert all(0.0 <= d <= 7.05 for d in p["phn_seq_dur"])
    finally:
        batcher.stop()


def _request_binary(url, body, headers=None):
    req = urllib.request.Request(url, data=body, headers=headers or {},
                                 method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers["Content-Type"] == "application/x-aptai-bin"
        return r.status, decode_binary(r.read())


def test_binary_response_matches_json(aptai_server):
    """?format=binary ships arrays as raw little-endian buffers; decoded,
    it equals the JSON payload exactly (same floats, float32 both ways)."""
    base, _, _ = aptai_server
    wav = _wav()
    _, pj = _request(f"{base}/v1/predict", wav.tobytes())
    status, pb = _request_binary(f"{base}/v1/predict?format=binary",
                                 wav.tobytes())
    assert status == 200
    assert pb["frames"] == pj["frames"]
    assert set(pb["tvs_pred"]) == set(pj["tvs_pred"])
    for k in pj["tvs_pred"]:
        assert pb["tvs_pred"][k].dtype == np.float32
        np.testing.assert_array_equal(
            pb["tvs_pred"][k], np.asarray(pj["tvs_pred"][k], np.float32))
    np.testing.assert_array_equal(pb["phn_fc_pred"],
                                  np.asarray(pj["phn_fc_pred"]))
    # header alias + errors stay JSON
    status, p = _request(f"{base}/v1/predict?format=binary", b"")
    assert status == 400 and "empty" in p["error"]
    status, p = _request(f"{base}/v1/predict?format=nope", wav.tobytes())
    assert status == 400 and "nope" in p["error"]


def test_binary_response_on_stream(aptai_server):
    base, _, _ = aptai_server
    wav = _wav(16_000 * 8, seed=7)
    _, pj = _request(f"{base}/v1/stream", wav.tobytes())
    status, pb = _request_binary(f"{base}/v1/stream", wav.tobytes(),
                                 headers={"X-Response-Format": "binary"})
    assert status == 200 and pb["frames"] == pj["frames"]
    np.testing.assert_array_equal(pb["phn_fc_pred"],
                                  np.asarray(pj["phn_fc_pred"]))
    np.testing.assert_array_equal(
        pb["tvs_pred"]["LA"], np.asarray(pj["tvs_pred"]["LA"], np.float32))


def test_binary_codec_roundtrip_unit():
    payload = {
        "frames": 7,
        "tvs_pred": {"LA": np.arange(7, dtype=np.float32),
                     "LP": np.linspace(-1, 1, 7).astype(np.float32)},
        "phn_fc_pred": np.asarray([1, 2, 2, 0, 3, 3, 3], np.int32),
        "ipa": ["a", "b"],
        "empty": np.zeros((0,), np.float32),
    }
    back = decode_binary(encode_binary(payload))
    assert back["frames"] == 7 and back["ipa"] == ["a", "b"]
    np.testing.assert_array_equal(back["tvs_pred"]["LA"],
                                  payload["tvs_pred"]["LA"])
    np.testing.assert_array_equal(back["tvs_pred"]["LP"],
                                  payload["tvs_pred"]["LP"])
    np.testing.assert_array_equal(back["phn_fc_pred"],
                                  payload["phn_fc_pred"])
    assert back["empty"].size == 0
    with pytest.raises(ValueError):
        decode_binary(b"JSON{}...")


def test_oversized_content_length_rejected_before_read(aptai_server):
    """A hostile Content-Length must be 413'd BEFORE the body is buffered
    (one request could otherwise OOM the host); connection closes since the
    unread body poisons keep-alive."""
    import http.client

    base, _, app = aptai_server
    port = int(base.rsplit(":", 1)[1])
    old = app.max_body_bytes
    app.max_body_bytes = 1024
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        body = b"\x00" * 4096  # > cap, well under max_seconds
        conn.request("POST", "/v1/predict", body=body)
        r = conn.getresponse()
        raw = r.read()
        assert r.status == 413
        assert json.loads(raw) == {"error": "request body too large"}
        assert r.getheader("Connection") == "close"
        conn.close()
    finally:
        app.max_body_bytes = old


def test_bad_content_length_is_400(aptai_server):
    """Malformed Content-Length → 400 without reading the socket."""
    import socket

    base, _, _ = aptai_server
    port = int(base.rsplit(":", 1)[1])
    s = socket.create_connection(("127.0.0.1", port), timeout=30)
    s.sendall(b"POST /v1/predict HTTP/1.1\r\nHost: x\r\n"
              b"Content-Length: zzz\r\n\r\n")
    data = s.recv(65536).decode("latin-1")
    s.close()
    assert " 400 " in data.split("\r\n")[0]
    assert "bad Content-Length" in data


def test_invalid_format_is_counted(aptai_server):
    """?format=bogus → 400 AND counted (requests_total + errors_total, no
    audio seconds) — the native fast lane counts the same way."""
    base, _, app = aptai_server
    with app._stats_lock:
        before = dict(app._stats)
    status, payload = _request(f"{base}/v1/predict?format=bogus",
                               _wav(2000, seed=11).tobytes())
    assert status == 400 and "unknown response format" in payload["error"]
    with app._stats_lock:
        after = dict(app._stats)
    assert after["requests_total"] == before["requests_total"] + 1
    assert after["errors_total"] == before["errors_total"] + 1
    assert after["audio_seconds_total"] == before["audio_seconds_total"]
