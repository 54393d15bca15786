"""Transport fuzz: malformed/garbage requests must never kill the serving
process — every case gets an error response (or a clean close) and the
server still answers ``/healthz`` afterwards.

Complements test_native_serve's targeted error-parity cases with seeded
random garbage over raw sockets, against BOTH transports bound to one
ServingApp (the native C++ lane is skipped when the toolchain is absent).
"""

import http.client
import json
import socket
import threading

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aptai_tpu.infer import APTAIPredictor
from aptai_tpu.infer.serve import ServingApp, make_server
from aptai_tpu.infer.server import MicroBatcher
from aptai_tpu.models import APTAI, tiny_config


@pytest.fixture(scope="module")
def app():
    model = APTAI(tiny_config(), num_phonemes=11)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 3200), jnp.float32),
                           jnp.asarray(np.array([3200], np.int32)),
                           method="predict")
    pred = APTAIPredictor(model, variables["params"])
    batcher = MicroBatcher(pred.predict_batch, max_batch_size=2,
                           max_wait_ms=5.0,
                           fields=("tvs_pred", "phn_fc_pred")).start()
    a = ServingApp(batcher, "aptai", max_seconds=5.0)
    yield a
    batcher.stop()


def _ports(app):
    ports = []
    pysrv = make_server(app, "127.0.0.1", 0)
    threading.Thread(target=pysrv.serve_forever, daemon=True).start()
    ports.append(("python", pysrv.server_address[1], pysrv))
    try:
        from aptai_tpu.infer.native_transport import (
            make_native_server, native_transport_available)

        if native_transport_available():
            native = make_native_server(app, "127.0.0.1", 0)
            ports.append(("native", native.port, native))
    except Exception:
        pass
    return ports


def _raw(port: int, payload: bytes) -> bytes:
    # short recv timeout: many garbage requests legitimately leave the
    # connection open (keep-alive after an error response); the contract
    # under test is server survival, not the response bytes
    s = socket.create_connection(("127.0.0.1", port), timeout=15)
    try:
        s.sendall(payload)
        s.settimeout(3)
        chunks = []
        try:
            while True:
                b = s.recv(65536)
                if not b:
                    break
                chunks.append(b)
                if len(chunks) > 64:
                    break
        except socket.timeout:
            pass
        return b"".join(chunks)
    finally:
        s.close()


def _healthy(port: int) -> bool:
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    try:
        conn.request("GET", "/healthz")
        r = conn.getresponse()
        body = r.read()
        return r.status == 200 and json.loads(body).get("status") == "ok"
    finally:
        conn.close()


def _garbage_cases(seed: int = 0):
    rng = np.random.default_rng(seed)
    cases = []
    # complete-but-garbage request heads (always CRLF-terminated so no
    # parser sits waiting for more bytes)
    for _ in range(8):
        n = int(rng.integers(1, 200))
        junk = bytes(rng.integers(32, 127, n).astype(np.uint8))
        cases.append(junk + b"\r\n\r\n")
    # binary noise in the request line and headers
    for _ in range(8):
        n = int(rng.integers(1, 120))
        junk = bytes(rng.integers(0, 256, n).astype(np.uint8))
        cases.append(junk.replace(b"\r", b"").replace(b"\n", b"")
                     + b"\r\n\r\n")
    # syntactically valid HTTP, nonsense semantics
    cases += [
        b"FROB /v1/predict HTTP/1.1\r\nHost: x\r\n\r\n",
        b"GET \x00\x01 HTTP/1.1\r\n\r\n",
        b"POST /v1/predict HTTP/1.1\r\nContent-Length: 0\r\n\r\n",
        b"POST /v1/predict HTTP/1.1\r\nContent-Length: 7\r\n"
        b"X-Audio-Encoding: nope\r\n\r\n1234567",
        # body length not a multiple of the float32 item size
        b"POST /v1/predict HTTP/1.1\r\nContent-Length: 5\r\n\r\nabcde",
        b"POST /v1/predict?fields=;;;drop HTTP/1.1\r\n"
        b"Content-Length: 4\r\n\r\n\x00\x00\x80\x3f",
        b"POST /nope HTTP/1.1\r\nContent-Length: 2\r\n\r\nhi",
        b"GET /metrics HTTP/1.0\r\n\r\n",
        # header soup
        b"POST /v1/predict HTTP/1.1\r\n" + b"X-A: b\r\n" * 50
        + b"Content-Length: 4\r\n\r\nabcd",
    ]
    return cases


def test_garbage_requests_never_kill_the_server(app):
    for name, port, server in _ports(app):
        try:
            for i, payload in enumerate(_garbage_cases()):
                _raw(port, payload)  # response content is free-form;
                # survival + health is the contract
                assert _healthy(port), (name, i, payload[:60])
        finally:
            server.shutdown()


def test_half_open_connection_is_survived(app):
    """A client that connects and immediately disconnects (and one that
    sends only half a request head) must not wedge either transport."""
    for name, port, server in _ports(app):
        try:
            s = socket.create_connection(("127.0.0.1", port), timeout=10)
            s.close()
            s = socket.create_connection(("127.0.0.1", port), timeout=10)
            s.sendall(b"POST /v1/pre")
            s.close()
            assert _healthy(port), name
        finally:
            server.shutdown()
