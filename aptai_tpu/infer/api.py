"""Inference predictors with the reference's output dict schemas.

Each predictor wraps (model, params) in a jitted forward with bucketed
static shapes; single-utterance entry points keep the exact output contracts
of the reference (SURVEY.md §3.4) while ``*_batch`` variants deliver the
≥20×-real-time batched throughput path:

  * :class:`APTAIPredictor.get_aptai_output`   ← models/aptai.py:125-179
  * :class:`ForceAPTAIPredictor.get_faptai_output` / ``get_alignment``
                                               ← models/force_aptai.py:188-322
  * :class:`W2V2PRPredictor.get_embeddings` / ``get_ctc_logits`` /
    ``predict_phonemes_durations`` / ``pred_phn_seq``
                                               ← models/w2v2_pr.py:124-277
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from aptai_tpu import SAMPLE_RATE, TV_ORDER
from aptai_tpu.data.vocab import ids_to_phonemes
from aptai_tpu.train.evaluate import decode_best
from aptai_tpu.decode.beam import beam_search
from aptai_tpu.decode.native import beam_search_native

AUDIO_BUCKET = 16_000


def _bucket(n: int, bucket: int = AUDIO_BUCKET) -> int:
    return max(int(math.ceil(n / bucket)) * bucket, bucket)


def _batch_bucket(n: int) -> int:
    """Next power of two ≥ n: keeps the set of compiled batch shapes to
    log2(max) (a fresh jit compile per distinct batch size is minutes of
    full-model compilation — the round-2 serving benchmark measured 43 s
    p50 latency from exactly this) and keeps batches divisible by any
    power-of-two mesh data axis."""
    return 1 << max(0, (n - 1)).bit_length()


def quantize_i16(audio: np.ndarray) -> np.ndarray:
    """float waveform → int16 for the host→device transfer (half the
    bytes).  Lossless for audio decoded from 16-bit PCM (the universal
    case: the reference corpora are 16-bit wavs and ``load_wav_16k``
    divides by 32768) — ``round(f · 32768)`` recovers the original sample
    exactly; :func:`dequantize_i16` inverts it on device."""
    # f32 math suffices: |f·32768| ≤ 2^15 is exactly representable and
    # rint ties resolve identically (measured equal to the f64 path, 10×
    # cheaper on the host)
    return np.clip(np.rint(np.asarray(audio, np.float32)
                           * np.float32(32768.0)),
                   -32768, 32767).astype(np.int16)


def dequantize_i16(audio):
    return audio.astype(jnp.float32) * (1.0 / 32768.0)


def quantize_mulaw(audio: np.ndarray) -> np.ndarray:
    """float waveform → 8-bit μ-law (G.711 continuous form, μ=255) for the
    host→device transfer (quarter the float32 bytes).  Unlike
    :func:`quantize_i16` this is LOSSY (~38 dB SNR on speech-level
    signals — the standard telephony encoding), so it ships opt-in
    (``transfer_dtype="uint8_mulaw"``) for links where the audio upload
    dominates end-to-end latency (benchmarks/PERF.md round 3: serving
    uploads run at ~40 MB/s on the tunnel).  Stored biased by +128 so the
    wire dtype is uint8; :func:`dequantize_mulaw` inverts on device."""
    x = np.clip(np.asarray(audio, np.float32), -1.0, 1.0)
    mu = np.float32(255.0)
    y = np.sign(x) * np.log1p(mu * np.abs(x)) / np.log1p(mu)
    q = np.clip(np.rint(y * 127.0), -127, 127) + 128.0
    return q.astype(np.uint8)


def dequantize_mulaw(audio):
    y = (audio.astype(jnp.float32) - 128.0) * (1.0 / 127.0)
    mu = jnp.float32(255.0)
    return jnp.sign(y) * (jnp.expm1(jnp.abs(y) * jnp.log1p(mu)) / mu)


_QUANTIZERS = {"int16": quantize_i16, "uint8_mulaw": quantize_mulaw}


def quantize_transfer(audio: np.ndarray, transfer_dtype: str) -> np.ndarray:
    """Encode a host float waveform for upload per ``transfer_dtype``
    ("float32" passes through; "int16" lossless for PCM sources;
    "uint8_mulaw" lossy, quarter bytes)."""
    if transfer_dtype == "float32":
        return np.asarray(audio, np.float32)
    try:
        return _QUANTIZERS[transfer_dtype](audio)
    except KeyError:
        raise ValueError(
            f"unknown transfer_dtype {transfer_dtype!r}; expected one of "
            f"'float32', {sorted(_QUANTIZERS)}") from None


def dequantize_transfer(audio):
    """Device-side inverse of :func:`quantize_transfer`, keyed on dtype
    (trace-time static): int16 → /32768, uint8 → μ-law expand, float
    passes through."""
    if audio.dtype == jnp.int16:
        return dequantize_i16(audio)
    if audio.dtype == jnp.uint8:
        return dequantize_mulaw(audio)
    return audio


def _prepare(wavs: Sequence[np.ndarray], transfer_dtype: str = "float32"):
    lengths = np.asarray([len(w) for w in wavs], np.int32)
    width = _bucket(int(lengths.max()))
    rows = _batch_bucket(len(wavs))
    audio = np.zeros((rows, width), np.float32)
    for i, w in enumerate(wavs):
        audio[i, : len(w)] = np.asarray(w, np.float32)
    # pad rows are full-length silence: numerically safe (a zero-length row
    # would send 0 through the conv length formula) and discarded by every
    # caller, which slices by the original item count
    lengths = np.concatenate(
        [lengths, np.full(rows - len(wavs), width, np.int32)]
    )
    audio = quantize_transfer(audio, transfer_dtype)
    return jnp.asarray(audio), jnp.asarray(lengths)


def fetch_outputs(out: Dict) -> Dict[str, np.ndarray]:
    """Fetch a dict of device arrays to host numpy with ONE pipelined pass.

    ``np.asarray`` per value is one *blocking* device→host round trip per
    field — on the tunnel (~30 ms RTT) a three-field output dict costs
    three RTTs serially.  Starting every transfer first
    (``copy_to_host_async``) lets the fetches share the link in flight, so
    the dict costs ~one round trip regardless of field count.  Values that
    are not device arrays (host lists from split-beam decode, ints) pass
    through ``np.asarray`` unchanged."""
    for v in out.values():
        try:
            v.copy_to_host_async()
        except AttributeError:
            pass
    return {k: np.asarray(v) for k, v in out.items()}


def _tv_dict(tvs: np.ndarray) -> Dict[str, List[float]]:
    """(T, 9) → per-TV dict of lists (reference models/aptai.py:152-172)."""
    return {k: tvs[:, i].tolist() for i, k in enumerate(TV_ORDER)}


def _strip_pad_rows(out: Dict, n: int) -> Dict:
    """Slice every (batch-leading) output back to the caller's item count.

    The device-side batch dim is bucketed to the next power of two (see
    :func:`_prepare`), so the raw forward returns silence pad rows.  The
    public contract is ``leading dim == len(wavs)`` for every value; the
    slice happens device-side (lazy), so a subsequent fetch marshals only
    real rows."""
    return {k: v[:n] for k, v in out.items()}


def _sharded_call(mesh, fn, params, *args):
    """Run a jitted forward, optionally over a ``jax.sharding.Mesh``:
    batch args shard over the data axis (params are already placed by
    ``shard_tree`` at predictor construction)."""
    if mesh is None:
        return fn(params, *args)
    from aptai_tpu.parallel import shard_batch

    args = shard_batch(mesh, args)
    with mesh:
        return fn(params, *args)


def check_fields(requested, available, owner: str) -> None:
    """Raise at the call site when ``fields=`` names outputs the forward
    does not produce (shared by the live predictors and the AOT export)."""
    unknown = set(requested) - set(available)
    if unknown:
        raise ValueError(
            f"unknown output field(s) {sorted(unknown)}; "
            f"{owner} produces {sorted(available)}"
        )


def _log_softmax_host(logits: np.ndarray) -> np.ndarray:
    """Numerically stable log-softmax on host numpy — the logits are
    already fetched, so re-uploading them to the device for
    ``jax.nn.log_softmax`` would cost a full (B, T, V) round trip over
    the link for a few MFLOPs of vector work."""
    shifted = logits - logits.max(axis=-1, keepdims=True)
    return shifted - np.log(np.exp(shifted).sum(axis=-1, keepdims=True))


def _decode_with_times(log_probs: np.ndarray):
    nat = beam_search_native(log_probs)
    if nat is not None:
        return nat
    hyp = beam_search(log_probs)[0]
    return list(hyp.tokens), list(hyp.timesteps)


class APTAIPredictor:
    def __init__(self, model, params, mesh=None,
                 transfer_dtype: str = "float32"):
        """``mesh``: optional ``jax.sharding.Mesh`` — batches shard over the
        data axis and tensor-parallel parameters over the model axis
        (multi-chip serving; single-chip when None).  ``transfer_dtype``:
        "int16" halves the host→device audio upload (lossless for 16-bit
        PCM sources — see :func:`quantize_i16`), "uint8_mulaw" quarters it
        (G.711 μ-law, lossy — :func:`quantize_mulaw`); the upload is the
        dominant serving cost on a slow link (benchmarks/PERF.md round 3)."""
        self.model = model
        self.mesh = mesh
        self.transfer_dtype = transfer_dtype
        if mesh is not None:
            from aptai_tpu.parallel import shard_tree

            params = shard_tree(mesh, params)
        self.params = params
        self._fwd_for = _selective_jit(model, "predict")

    def predict_batch(self, wavs: Sequence[np.ndarray],
                      fields: Optional[Sequence[str]] = None,
                      real_rows: Optional[int] = None) -> Dict:
        """Batched forward; every returned array has leading dim
        ``len(wavs)`` (the device-side batch bucketing pad rows are sliced
        off before returning).  ``fields`` (e.g. ``("tvs_pred",
        "phn_fc_pred")``) restricts the outputs computed and fetched:
        XLA dead-code-eliminates unserved heads (e.g. the (B, T, V)
        softmax when only TVs are served) and — on the axon tunnel, where
        every fetched byte rides a ~30 ms-RTT link — the per-request
        marshaling shrinks to what the caller actually consumes.
        ``real_rows`` (the MicroBatcher protocol): the first N wavs are
        real, the rest serving-shape padding — accepted on every predictor
        so batchers can pass it uniformly; here pad rows only cost device
        FLOPs (one static shape), so it is ignored."""
        del real_rows
        fwd = self._fwd_for(fields)
        audio, lengths = _prepare(wavs, self.transfer_dtype)
        out = _sharded_call(self.mesh, fwd, self.params, audio, lengths)
        return _strip_pad_rows(out, len(wavs))

    def get_aptai_output(self, wav) -> Dict:
        """Single-utterance dict, schema of reference models/aptai.py:174-179
        (probs transposed to (V, T) like the reference's ``.T``)."""
        out = self.predict_batch([np.asarray(wav, np.float32)])
        host = fetch_outputs({k: out[k] for k in (
            "frame_lengths", "phn_fc_probs", "phn_fc_logits",
            "phn_fc_pred", "tvs_pred")})
        n = int(host["frame_lengths"][0])
        probs = host["phn_fc_probs"][0, :n]
        logits = host["phn_fc_logits"][0, :n]
        pred = host["phn_fc_pred"][0, :n]
        tvs = host["tvs_pred"][0, :n]
        return {
            "phn_fc_probs": probs.T,
            "phn_fc_logits": logits,
            "phn_fc_pred": pred,
            "tvs_pred": _tv_dict(tvs),
        }


def _selective_jit(model, method: str):
    """Per-``fields`` cache of jitted forwards returning only those outputs
    (+frame_lengths) — see :meth:`APTAIPredictor._fwd_for`.

    int16 audio (the reduced-bytes transfer encoding, see
    :func:`quantize_i16`) is dequantized on device.  Unknown field names
    raise ``ValueError`` at trace time (the first call with that
    ``fields`` tuple) instead of surfacing as a distant KeyError in the
    caller."""
    cache: Dict = {}

    def get(fields):
        key = None if fields is None else tuple(fields)
        if key not in cache:
            def fwd(p, *args):
                args = (dequantize_transfer(args[0]),) + args[1:]
                out = model.apply({"params": p}, *args, method=method)
                if key is None:
                    return out
                check_fields(key, out, f"{type(model).__name__}.{method}")
                keep = set(key) | {"frame_lengths"}
                return {k: v for k, v in out.items() if k in keep}

            cache[key] = jax.jit(fwd)
        return cache[key]

    return get


class ForceAPTAIPredictor:
    """``decode_method='beam_host'`` models run SPLIT at inference: jitted
    frozen encode → host beam decode on the *calling* thread → jitted head
    (models/force_aptai.py:predict_from_encoded).  No jitted program embeds
    the host callback, so the predictor is safe under multi-threaded serving
    (``MicroBatcher`` workers) — the in-jit callback variant
    (models/force_aptai.py:_host_beam_decode) remains model-level
    experiment code only."""

    def __init__(self, model, params, mesh=None,
                 transfer_dtype: str = "float32"):
        self.model = model
        self.mesh = mesh
        if mesh is not None:
            from aptai_tpu.parallel import shard_tree

            params = shard_tree(mesh, params)
        self.params = params
        self.transfer_dtype = transfer_dtype
        self._split_beam = model.decode_method == "beam_host"
        if self._split_beam:
            def encode(p, a, l):
                return model.apply({"params": p}, dequantize_transfer(a), l,
                                   method="encode_frozen")

            self._encode = jax.jit(encode)
            self._head_for = _selective_jit(model, "predict_from_encoded")
            self._align_head = jax.jit(
                lambda p, *e: model.apply({"params": p}, *e,
                                          method="alignment_from_encoded"))
        else:
            self._fwd_for = _selective_jit(model, "predict")

            def align(p, a, l):
                return model.apply({"params": p}, dequantize_transfer(a), l,
                                   method="get_alignment")

            self._align = jax.jit(align)

    def _encode_and_decode(self, audio, lengths, n: Optional[int] = None):
        """First half of the split beam_host path: device encode, then the
        host beam search on this thread (the CTC log-prob fetch it implies
        is inherent to beam_host — the reference round-trips the same array
        every step, w2v2_pr.py:144-155).

        ``n`` = the caller's real item count: only those rows are fetched
        and beam-decoded (the batch dim is bucketed to a power of two, so
        decoding the full-length silence pad rows would nearly double the
        serial host-search time); pad rows get zero-length sequences, which
        keeps the head's static batch shape."""
        from aptai_tpu.decode.beam import beam_decode_padded

        enc = _sharded_call(self.mesh, self._encode, self.params,
                            audio, lengths)
        rows = enc["ctc_log_probs"].shape[0]
        n = rows if n is None else min(n, rows)
        # device-side slice: the host fetch inside beam_decode_padded then
        # marshals only the real rows over the tunnel
        seqs, lens, trunc = beam_decode_padded(
            enc["ctc_log_probs"][:n], enc["frame_lengths"][:n],
            self.model.max_phn_seq_len, out_rows=rows,
        )
        return (enc["frame_embs"], enc["frame_lengths"],
                jnp.asarray(seqs), jnp.asarray(lens), jnp.asarray(trunc))

    def predict_batch(self, wavs: Sequence[np.ndarray],
                      fields: Optional[Sequence[str]] = None,
                      real_rows: Optional[int] = None) -> Dict:
        """Batched forward; leading dim of every output is ``len(wavs)``
        (bucketing pad rows sliced off device-side).  ``real_rows`` (the
        MicroBatcher protocol): only the first N wavs are real — the split
        beam_host path then host-decodes ONLY those, so serving-shape
        padding (``pad_to_max``) does not multiply the serial host beam
        search."""
        audio, lengths = _prepare(wavs, self.transfer_dtype)
        if self._split_beam:
            n = len(wavs) if real_rows is None else min(real_rows, len(wavs))
            enc = self._encode_and_decode(audio, lengths, n=n)
            out = _sharded_call(self.mesh, self._head_for(fields),
                                self.params, *enc)
        else:
            out = _sharded_call(self.mesh, self._fwd_for(fields),
                                self.params, audio, lengths)
        return _strip_pad_rows(out, len(wavs))

    def get_faptai_output(self, wav) -> Dict:
        """Schema of reference models/force_aptai.py:316-322."""
        out = self.predict_batch([np.asarray(wav, np.float32)])
        host = fetch_outputs({k: out[k] for k in (
            "frame_lengths", "phn_seq_lengths", "tvs_pred",
            "pred_frame_phns", "pred_ctc_phn_seq", "hidden_alignment",
            "hidden_tvs")})
        n = int(host["frame_lengths"][0])
        s = int(host["phn_seq_lengths"][0])
        return {
            "tvs_pred": _tv_dict(host["tvs_pred"][0, :n]),
            "pred_frame_phns": host["pred_frame_phns"][0, :n].tolist(),
            "pred_ctc_phn_seq": host["pred_ctc_phn_seq"][0, :s].tolist(),
            "hidden_alignment": host["hidden_alignment"][0, :n],
            "hidden_tvs": host["hidden_tvs"][0, :n],
        }

    def get_alignment(self, wav) -> Dict:
        """(phonemes × frames) log-softmax alignment
        (reference models/force_aptai.py:188-236)."""
        audio, lengths = _prepare([np.asarray(wav, np.float32)],
                                  self.transfer_dtype)
        if self._split_beam:
            enc = self._encode_and_decode(audio, lengths, n=1)
            out = _sharded_call(self.mesh, self._align_head,
                                self.params, *enc)
        else:
            out = _sharded_call(self.mesh, self._align,
                                self.params, audio, lengths)
        host = fetch_outputs({k: out[k] for k in (
            "frame_lengths", "phn_seq_lengths", "alignment")})
        n = int(host["frame_lengths"][0])
        s = int(host["phn_seq_lengths"][0])
        return {"alignment": host["alignment"][0, :n, :s].T}


class W2V2PRPredictor:
    def __init__(self, model, params, vocab: Optional[Dict[str, int]] = None,
                 mesh=None, transfer_dtype: str = "float32"):
        self.model = model
        self.mesh = mesh
        if mesh is not None:
            from aptai_tpu.parallel import shard_tree

            params = shard_tree(mesh, params)
        self.params = params
        self.vocab = vocab
        self.transfer_dtype = transfer_dtype
        self._encode_for = _selective_jit(model, "encode")

    def encode_batch(self, wavs: Sequence[np.ndarray],
                     fields: Optional[Sequence[str]] = None,
                     real_rows: Optional[int] = None) -> Dict:
        """Batched encode; leading dim of every output is ``len(wavs)``
        (bucketing pad rows sliced off device-side).  ``real_rows``:
        accepted for the MicroBatcher protocol; no host-side per-row work
        here, so it is ignored."""
        del real_rows
        audio, lengths = _prepare(wavs, self.transfer_dtype)
        out = _sharded_call(self.mesh, self._encode_for(fields),
                            self.params, audio, lengths)
        return _strip_pad_rows(out, len(wavs))

    def get_embeddings(self, wavs: Sequence[np.ndarray]) -> Dict:
        """Reference models/w2v2_pr.py:124-167 contract: conv features,
        final hidden (B, H, T), logits (B, V, T), beam-decoded sequences,
        frame lengths.  Decoding is the host beam search at eval time."""
        out = fetch_outputs(self.encode_batch(wavs))
        frame_lengths = out["frame_lengths"]
        logits = np.asarray(out["phoneme_logits"], np.float32)
        log_probs = _log_softmax_host(logits)
        seqs = [
            decode_best(log_probs[b, : frame_lengths[b]])
            for b in range(len(wavs))
        ]
        n = len(wavs)  # == row count: encode_batch strips pad rows
        return {
            "features_hidden":
                out["features_hidden"][:n].transpose(0, 2, 1),
            "last_transf_hidden":
                out["last_transf_hidden"][:n].transpose(0, 2, 1),
            "phoneme_logits": logits[:n].transpose(0, 2, 1),
            "phn_pred_seq_idx": [np.asarray(s) for s in seqs],
            "frame_seq_lens": frame_lengths[:n],
        }

    def get_ctc_logits(self, wav) -> np.ndarray:
        """Reference models/w2v2_pr.py:170-188: (T, V) logits."""
        out = fetch_outputs(self.encode_batch(
            [np.asarray(wav, np.float32)], fields=("phoneme_logits",)))
        n = int(out["frame_lengths"][0])
        return np.asarray(out["phoneme_logits"][0, :n])

    def predict_phonemes_durations(self, wav, vocab=None) -> Dict:
        """Reference models/w2v2_pr.py:191-235: beam tokens + IPA + start
        times in seconds via ``frame_sec_ratio = len(wav)/T/16000``."""
        vocab = vocab or self.vocab
        wav = np.asarray(wav, np.float32)
        out = fetch_outputs(self.encode_batch(
            [wav], fields=("phoneme_logits",)))
        n = int(out["frame_lengths"][0])
        logits = np.asarray(out["phoneme_logits"][0, :n], np.float32)
        tokens, times = _decode_with_times(_log_softmax_host(logits))
        frame_sec_ratio = len(wav) / n / SAMPLE_RATE
        return {
            "phn_seq_idx": np.asarray(tokens),
            "phn_seq_ipa": ids_to_phonemes(vocab, tokens) if vocab else None,
            "phn_seq_dur": [t * frame_sec_ratio for t in times],
        }

    def pred_phn_seq(self, wav, vocab=None) -> Dict:
        """Reference models/w2v2_pr.py:238-277."""
        out = self.predict_phonemes_durations(wav, vocab)
        return {"phn_seq_idx": out["phn_seq_idx"],
                "phn_seq_ipa": out["phn_seq_ipa"]}
