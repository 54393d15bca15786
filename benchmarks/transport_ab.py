"""Interleaved HTTP-transport A/B: stdlib http.server vs the C++ epoll
front end, same process, same ServingApp/MicroBatcher, alternating legs.

Single runs of benchmarks/serving.py disagree run-to-run because the axon
tunnel's load swings more than the transport difference (observed same-day:
python 157→323 a-s/s across two runs).  Here both servers are bound to ONE
app and the load alternates native/python per rep, so tunnel drift hits
both legs equally; the per-rep ratio is the honest statistic.

    python benchmarks/transport_ab.py --reps 5 --clients 16 --seconds 2
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def run_leg(port, wavs, clients, wire, response_format):
    import http.client

    from aptai_tpu.infer.serve import decode_binary
    from aptai_tpu.infer.api import quantize_transfer

    path = ("/v1/predict?fields=tvs_pred,phn_fc_pred"
            + ("&format=binary" if response_format == "binary" else ""))
    local = threading.local()

    def one(w):
        conn = getattr(local, "conn", None)
        if conn is None:
            conn = local.conn = http.client.HTTPConnection(
                "127.0.0.1", port, timeout=600)
        body = quantize_transfer(w, wire).tobytes()
        t0 = time.perf_counter()
        conn.request("POST", path, body=body,
                     headers={"X-Audio-Encoding": wire})
        raw = conn.getresponse().read()
        (decode_binary if response_format == "binary" else json.loads)(raw)
        return time.perf_counter() - t0

    one(wavs[0])  # connection warm (per-thread conns build lazily below)
    t0 = time.perf_counter()
    with ThreadPoolExecutor(clients) as ex:
        lat = np.sort(np.asarray(list(ex.map(one, wavs))))
    wall = time.perf_counter() - t0
    return {
        "p50_ms": round(1000 * float(lat[len(lat) // 2]), 1),
        "p95_ms": round(1000 * float(lat[int(len(lat) * 0.95)]), 1),
        "audio_s_per_s": round(
            len(wavs) * len(wavs[0]) / 16000 / wall, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--n_requests", type=int, default=128)
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--max_batch", type=int, default=16)
    ap.add_argument("--transfer_dtype", default="int16")
    ap.add_argument("--response_format", default="binary",
                    choices=["json", "binary"])
    args = ap.parse_args()

    sys.path.insert(0, ".")
    from aptai_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from aptai_tpu.infer import APTAIPredictor, MicroBatcher
    from aptai_tpu.infer.native_transport import make_native_server
    from aptai_tpu.infer.serve import ServingApp, make_server
    from aptai_tpu.models import APTAI, Wav2Vec2Config

    backend = jax.default_backend()
    cfg = Wav2Vec2Config(dtype="bfloat16" if backend == "tpu" else "float32")
    model = APTAI(cfg, num_phonemes=46)
    rng = np.random.default_rng(0)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = jax.jit(
            lambda k: model.init(
                k, jnp.zeros((1, 16000), jnp.float32),
                jnp.full((1,), 16000, jnp.int32), method="predict",
            ), backend="cpu")(jax.random.PRNGKey(0))
    params = jax.device_put(variables["params"], jax.devices()[0])
    pred = APTAIPredictor(model, params, transfer_dtype=args.transfer_dtype)

    mb = MicroBatcher(pred.predict_batch, max_batch_size=args.max_batch,
                      max_wait_ms=5.0, fields=("tvs_pred", "phn_fc_pred"))
    mb.warmup(seconds=args.seconds)
    mb.start()
    app = ServingApp(mb, "aptai")
    native = make_native_server(app, "127.0.0.1", 0)
    pysrv = make_server(app, "127.0.0.1", 0)
    threading.Thread(target=pysrv.serve_forever, daemon=True).start()
    ports = {"native": native.port, "python": pysrv.server_address[1]}

    n_samples = int(args.seconds * 16000)
    wavs = [rng.standard_normal(n_samples).astype(np.float32) * 0.1
            for _ in range(args.n_requests)]

    # warm both legs (first-burst transfer-path init)
    for port in ports.values():
        run_leg(port, wavs[: args.clients], args.clients,
                args.transfer_dtype, args.response_format)

    results = {"native": [], "python": []}
    for rep in range(args.reps):
        for leg in ("native", "python") if rep % 2 == 0 else ("python",
                                                              "native"):
            r = run_leg(ports[leg], wavs, args.clients,
                        args.transfer_dtype, args.response_format)
            results[leg].append(r)
            print(f"rep {rep} {leg}: {r}", file=sys.stderr)

    def med(leg, key):
        v = sorted(x[key] for x in results[leg])
        return v[len(v) // 2]

    ratios = sorted(n["audio_s_per_s"] / p["audio_s_per_s"]
                    for n, p in zip(results["native"], results["python"]))
    print(json.dumps({
        "metric": "transport_ab",
        "reps": args.reps,
        "clients": args.clients,
        "n_requests": args.n_requests,
        "audio_seconds_per_request": args.seconds,
        "wire_encoding": args.transfer_dtype,
        "response_format": args.response_format,
        "native": {k: med("native", k)
                   for k in ("p50_ms", "p95_ms", "audio_s_per_s")},
        "python": {k: med("python", k)
                   for k in ("p50_ms", "p95_ms", "audio_s_per_s")},
        "throughput_ratio_median": round(ratios[len(ratios) // 2], 2),
    }))
    native.shutdown()
    pysrv.shutdown()
    mb.stop()


if __name__ == "__main__":
    main()
