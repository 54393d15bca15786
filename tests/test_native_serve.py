"""Native (C++ epoll) HTTP transport: wire parity with the Python
transport, fast/slow lane routing, error semantics, keep-alive.

The native front end (native/http_server.cpp + infer/native_transport.py)
must be transparent: same endpoints, same payloads, same validation
messages as the stdlib ``http.server`` transport — the only difference is
where the socket work happens.  Both servers here are bound to the SAME
ServingApp/MicroBatcher, so any payload difference is transport-caused by
construction.
"""

import http.client
import json
import threading

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aptai_tpu.infer import APTAIPredictor
from aptai_tpu.infer.api import quantize_transfer
from aptai_tpu.infer.serve import ServingApp, decode_binary, make_server
from aptai_tpu.infer.server import MicroBatcher
from aptai_tpu.models import APTAI, tiny_config

pytestmark = pytest.mark.skipif(
    not __import__("aptai_tpu.infer.native_transport",
                   fromlist=["native_transport_available"]
                   ).native_transport_available(),
    reason="native transport unavailable (no C++ toolchain)")


@pytest.fixture(scope="module")
def servers():
    """One ServingApp behind BOTH transports (+ a streamer for /v1/stream)."""
    from aptai_tpu.infer import StreamingAPTAI
    from aptai_tpu.infer.native_transport import make_native_server

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
    native = make_native_server(app, "127.0.0.1", 0, fast_max_seconds=4.0)
    pysrv = make_server(app, "127.0.0.1", 0)
    threading.Thread(target=pysrv.serve_forever, daemon=True).start()
    yield native.port, pysrv.server_address[1], app
    native.shutdown()
    pysrv.shutdown()
    batcher.stop()


def _post(port, path, body, headers=None, method="POST"):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request(method, path, body=body, headers=headers or {})
    r = conn.getresponse()
    raw = r.read()
    ctype = r.getheader("Content-Type")
    conn.close()
    return r.status, raw, ctype


def _wav(n=5000, seed=0):
    return (np.random.default_rng(seed).standard_normal(n)
            .astype(np.float32) * 0.1)


def test_healthz_and_metrics_slow_lane(servers):
    nport, _, _ = servers
    status, raw, ctype = _post(nport, "/healthz", None, method="GET")
    assert status == 200 and ctype == "application/json"
    payload = json.loads(raw)
    assert payload["status"] == "ok" and payload["model"] == "aptai"
    status, raw, _ = _post(nport, "/metrics", None, method="GET")
    assert status == 200
    assert "requests_total" in json.loads(raw)


@pytest.mark.parametrize("wire", ["float32", "int16", "uint8_mulaw"])
def test_fast_lane_matches_python_transport(servers, wire):
    """Same app, same audio, both transports, every wire codec → identical
    response payloads (binary format: byte-identical arrays)."""
    nport, pport, _ = servers
    wav = _wav(4000)
    body = quantize_transfer(wav, wire).tobytes()
    hdr = {"X-Audio-Encoding": wire}
    path = "/v1/predict?format=binary"
    s1, raw1, ct1 = _post(nport, path, body, hdr)
    s2, raw2, ct2 = _post(pport, path, body, hdr)
    assert (s1, ct1) == (200, "application/x-aptai-bin")
    assert (s1, ct1) == (s2, ct2)
    p1, p2 = decode_binary(raw1), decode_binary(raw2)
    assert p1["frames"] == p2["frames"] > 0
    assert sorted(p1["tvs_pred"]) == sorted(p2["tvs_pred"])
    for k in p1["tvs_pred"]:
        np.testing.assert_array_equal(p1["tvs_pred"][k], p2["tvs_pred"][k])
    np.testing.assert_array_equal(p1["phn_fc_pred"], p2["phn_fc_pred"])


def test_fast_lane_json_format_and_fields(servers):
    nport, _, _ = servers
    wav = _wav(3000, seed=1)
    status, raw, ctype = _post(
        nport, "/v1/predict?fields=tvs_pred", wav.tobytes())
    assert status == 200 and ctype == "application/json"
    payload = json.loads(raw)
    assert set(payload) == {"frames", "tvs_pred"}
    assert len(payload["tvs_pred"]) == 9


def test_fast_lane_header_response_format(servers):
    nport, _, _ = servers
    wav = _wav(3000, seed=2)
    status, raw, ctype = _post(nport, "/v1/predict", wav.tobytes(),
                               {"X-Response-Format": "binary"})
    assert status == 200 and ctype == "application/x-aptai-bin"
    assert raw[:4] == b"ATB1"


def test_json_body_routes_slow_lane(servers):
    """application/json bodies can't fast-path (C++ doesn't parse JSON);
    they must still be served, via ServingApp.predict."""
    nport, _, _ = servers
    wav = _wav(2500, seed=3)
    status, raw, _ = _post(nport, "/v1/predict",
                           json.dumps({"audio": wav.tolist()}).encode(),
                           {"Content-Type": "application/json"})
    assert status == 200
    assert json.loads(raw)["frames"] > 0


def test_error_semantics_match_python(servers):
    """Validation errors ride the slow lane → same messages as the stdlib
    transport (same ServingApp code paths)."""
    nport, pport, _ = servers
    too_long = np.zeros(16000 * 6, np.float32).tobytes()  # > max_seconds=5
    s1, raw1, _ = _post(nport, "/v1/predict", too_long)
    s2, raw2, _ = _post(pport, "/v1/predict", too_long)
    assert s1 == s2 == 400
    assert json.loads(raw1) == json.loads(raw2)

    bad_enc = {"X-Audio-Encoding": "pcm24"}
    s1, raw1, _ = _post(nport, "/v1/predict", b"\x00" * 64, bad_enc)
    s2, raw2, _ = _post(pport, "/v1/predict", b"\x00" * 64, bad_enc)
    assert s1 == s2 == 400
    assert json.loads(raw1) == json.loads(raw2)

    s1, raw1, _ = _post(nport, "/v1/oops", b"", {})
    s2, raw2, _ = _post(pport, "/v1/oops", b"", {})
    assert s1 == s2 == 404
    assert json.loads(raw1) == json.loads(raw2)

    s1, _, _ = _post(nport, "/v1/predict", b"")  # empty body → slow lane
    assert s1 == 400


def test_stream_endpoint_native(servers):
    nport, _, _ = servers
    wav = _wav(16000 * 6, seed=4)  # beyond predict cap, within stream cap
    status, raw, _ = _post(nport, "/v1/stream?format=binary",
                           wav.tobytes())
    assert status == 200
    payload = decode_binary(raw)
    assert payload["frames"] == len(payload["phn_fc_pred"])


def test_keep_alive_reuses_connection(servers):
    nport, _, _ = servers
    conn = http.client.HTTPConnection("127.0.0.1", nport, timeout=120)
    wav = _wav(2000, seed=5)
    frames = []
    for _ in range(3):  # three requests on ONE socket
        conn.request("POST", "/v1/predict", body=wav.tobytes())
        r = conn.getresponse()
        assert r.status == 200
        assert r.getheader("Connection") == "keep-alive"
        frames.append(json.loads(r.read())["frames"])
    conn.close()
    assert frames[0] == frames[1] == frames[2]


def test_connection_close_honored(servers):
    nport, _, _ = servers
    status, raw, _ = _post(nport, "/healthz", None,
                           {"Connection": "close"}, method="GET")
    assert status == 200  # http.client handles the close-after-response

def test_metrics_count_fast_lane(servers):
    nport, _, app = servers
    before = app._stats["requests_total"]
    _post(nport, "/v1/predict", _wav(2000, seed=6).tobytes())
    assert app._stats["requests_total"] == before + 1
    assert app._stats["audio_seconds_total"] > 0


def test_invalid_format_metrics_match_python(servers):
    """?format=bogus is rejected pre-compute on BOTH transports with the
    same message and the same counter deltas (+1 request, +1 error, no
    audio seconds)."""
    nport, pport, app = servers
    wav = _wav(2000, seed=7)
    for port in (nport, pport):
        with app._stats_lock:
            before = dict(app._stats)
        status, raw, _ = _post(port, "/v1/predict?format=bogus",
                               wav.tobytes())
        assert status == 400
        assert "unknown response format" in json.loads(raw)["error"]
        # fast lane resolves asynchronously only for 200s; the 400 is
        # responded inline, but give the counter a beat anyway
        with app._stats_lock:
            after = dict(app._stats)
        assert after["requests_total"] == before["requests_total"] + 1
        assert after["errors_total"] == before["errors_total"] + 1
        assert (after["audio_seconds_total"]
                == before["audio_seconds_total"])


def test_large_headers_reach_handler_untruncated(servers):
    """A slow-lane request with ~40 KB of padding headers must keep the
    headers that FOLLOW the padding (the ctypes buffers are sized to the
    C++ 64 KiB cap — silent truncation would decode the JSON body as
    octet-stream garbage)."""
    nport, _, _ = servers
    wav = _wav(2500, seed=8)
    headers = {"X-Pad": "a" * 40000,
               "Content-Type": "application/json"}
    status, raw, _ = _post(nport, "/v1/predict",
                           json.dumps({"audio": wav.tolist()}).encode(),
                           headers)
    assert status == 200
    assert json.loads(raw)["frames"] > 0


def test_headers_over_64k_rejected(servers):
    """Header blocks over the authoritative 64 KiB cap → 431, even when
    the whole block arrives in one burst."""
    import socket

    nport, _, _ = servers
    s = socket.create_connection(("127.0.0.1", nport), timeout=30)
    s.sendall(b"GET /healthz HTTP/1.1\r\nHost: x\r\nX-Pad: "
              + b"a" * 70000 + b"\r\n\r\n")
    data = s.recv(65536).decode("latin-1")
    s.close()
    assert " 431 " in data.split("\r\n")[0]


def test_informat_param_does_not_mask_header_format(servers):
    """A query param merely ENDING in 'format' (informat=x) must not stop
    X-Response-Format folding — both transports serve binary."""
    nport, pport, _ = servers
    wav = _wav(2000, seed=9)
    hdr = {"X-Response-Format": "binary"}
    for port in (nport, pport):
        status, raw, ctype = _post(port, "/v1/predict?informat=x",
                                   wav.tobytes(), hdr)
        assert status == 200 and ctype == "application/x-aptai-bin"
        assert raw[:4] == b"ATB1"


def test_fast_lane_sheds_on_request_timeout(servers):
    """request_timeout_s is enforced on the native fast lane: queue wait
    beyond it → 503 before any device work (the Python transport's
    fut.result(timeout=...) contract)."""
    nport, _, app = servers
    old = app.request_timeout_s
    app.request_timeout_s = 1e-9  # any queue wait exceeds this
    try:
        status, raw, _ = _post(nport, "/v1/predict",
                               _wav(2000, seed=10).tobytes())
        assert status == 503
        assert "timed out" in json.loads(raw)["error"]
    finally:
        app.request_timeout_s = old


def test_stream_does_not_starve_slow_lane(servers):
    """Two concurrent /v1/stream requests (serialized on the app's stream
    lock) must not consume the slow workers: /healthz stays responsive
    while both streams are in flight."""
    import time as _time

    nport, _, app = servers
    real_predict = app.streamer.predict

    def slow_predict(wav):
        _time.sleep(2.0)
        return real_predict(wav)

    app.streamer.predict = slow_predict
    try:
        wav = _wav(16000 * 2, seed=12).tobytes()
        threads = [threading.Thread(
            target=_post, args=(nport, "/v1/stream", wav), daemon=True)
            for _ in range(2)]
        for t in threads:
            t.start()
        _time.sleep(0.3)  # both streams admitted (one running, one queued)
        t0 = _time.monotonic()
        status, _, _ = _post(nport, "/healthz", None, method="GET")
        dt = _time.monotonic() - t0
        assert status == 200
        assert dt < 1.5, f"/healthz blocked {dt:.1f}s behind streams"
        for t in threads:
            t.join(timeout=120)
    finally:
        app.streamer.predict = real_predict
