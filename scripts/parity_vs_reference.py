#!/usr/bin/env python
"""One-command numerical-parity harness: aptai_tpu vs the reference torch
stack (VERDICT r2 missing #1).

For each model family the same weights are loaded into BOTH implementations
(ours: Flax/JAX; reference-shaped: torch + HF ``transformers``) and the
same audio is pushed through both, comparing the reference's own metrics
(EMA-trajectory Pearson r, PER, FER, losses).  Torch appears here ONLY as a
golden comparison target — never in the framework itself.

Offline self-check (no network, no real data — runs in this container):

    python scripts/parity_vs_reference.py --out /tmp/parity.json

    Builds a tiny random torch backbone, converts it, and optionally
    round-trips a *trained* synthetic-corpus PR checkpoint through torch
    (--train_pr_epochs N trains one first; or point --pr_exp_dir at an
    existing run of aptai_tpu.train.train_pr).

Real-data invocation (with an HF checkpoint + prepared HPRC corpus):

    python scripts/parity_vs_reference.py \
        --hf_checkpoint /ckpts/wav2vec2-large-robust/pytorch_model.bin \
        --num_layers 24 \
        --hprc_csv /data/HPRC_prep/hprc.csv \
        --pr_exp_dir experiments/phoneme_recognizer/<run> \
        --out parity_verdict.json

Exit code 0 iff every check passes; the JSON verdict lists per-family
metrics (reference contracts: models/aptai.py:58-115, models/w2v2_pr.py:40-88,
models/force_aptai.py:80-178).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TINY = dict(
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=48,
    conv_dim=(16, 16, 16),
    conv_kernel=(10, 3, 3),
    conv_stride=(5, 2, 2),
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
)


# ---------------------------------------------------------------------------
# torch reference replicas (line-faithful; golden targets only)
# ---------------------------------------------------------------------------

def torch_lowpass(y, fir):
    """reference models/modules.py:46-61 (per-channel double conv)."""
    import torch

    y = y.double()
    B, L, C = y.shape
    out = torch.zeros(B, L, C)
    for i in range(C):
        traj = y[:, :, i].view(B, 1, L)
        sm = torch.nn.functional.conv1d(traj, fir, padding="same")
        out[:, :, i] = sm.view(B, L)
    return out.float()


def build_torch_backbone(jax_cfg, hf_state_dict=None, seed=0):
    """A torch ``transformers.Wav2Vec2Model`` matching ``jax_cfg``; loads
    ``hf_state_dict`` when given, else random-initializes (seeded)."""
    import torch
    import transformers

    torch.manual_seed(seed)
    hf_cfg = transformers.Wav2Vec2Config(
        hidden_size=jax_cfg.hidden_size,
        num_hidden_layers=jax_cfg.num_hidden_layers,
        num_attention_heads=jax_cfg.num_attention_heads,
        intermediate_size=jax_cfg.intermediate_size,
        conv_dim=list(jax_cfg.conv_dim),
        conv_kernel=list(jax_cfg.conv_kernel),
        conv_stride=list(jax_cfg.conv_stride),
        num_feat_extract_layers=len(jax_cfg.conv_dim),
        num_conv_pos_embeddings=jax_cfg.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=jax_cfg.num_conv_pos_embedding_groups,
        do_stable_layer_norm=True, feat_extract_norm="layer", conv_bias=True,
        hidden_act="gelu", hidden_dropout=0.0, activation_dropout=0.0,
        attention_dropout=0.0, feat_proj_dropout=0.0, final_dropout=0.0,
        layerdrop=0.0, apply_spec_augment=False,
        mask_time_prob=0.0, mask_feature_prob=0.0,
    )
    tm = transformers.Wav2Vec2Model(hf_cfg)
    if hf_state_dict is not None:
        import torch as _t

        tensors = {k: _t.as_tensor(np.asarray(v))
                   for k, v in hf_state_dict.items()}
        missing, unexpected = tm.load_state_dict(tensors, strict=False)
        # weight-norm naming differs across torch versions and
        # masked_spec_embed is eval-inert — both are tolerable gaps
        real_missing = [k for k in missing if "parametrizations" not in k
                        and "weight_g" not in k and "weight_v" not in k
                        and k != "masked_spec_embed"]
        if real_missing:
            raise ValueError(f"state_dict missing keys: {real_missing[:5]}")
    tm.eval()
    return tm


def torch_hidden_states(tm, audio, lengths, layer):
    import torch

    attn = torch.zeros(audio.shape, dtype=torch.long)
    for b, n in enumerate(lengths):
        attn[b, :n] = 1
    with torch.no_grad():
        out = tm(torch.tensor(audio), attention_mask=attn, return_dict=True,
                 output_hidden_states=True)
    return out.hidden_states[layer].numpy()


# ---------------------------------------------------------------------------
# checks
# ---------------------------------------------------------------------------

def make_audio(args, rng):
    """Eval audio: real utterances from an HPRC manifest when given, else
    synthetic (the harness is then a pure implementation-parity check)."""
    if args.hprc_csv:
        import pandas as pd

        from aptai_tpu.data.audio_io import load_wav_16k

        df = pd.read_csv(args.hprc_csv)
        wavs = [np.asarray(load_wav_16k(p), np.float32)
                for p in df.path_wav.head(args.n_utts)]
        width = max(len(w) for w in wavs)
        audio = np.zeros((len(wavs), width), np.float32)
        for i, w in enumerate(wavs):
            audio[i, : len(w)] = w
        lengths = np.asarray([len(w) for w in wavs], np.int32)
        return audio, lengths
    b = args.n_utts
    audio = (0.1 * rng.standard_normal((b, 16000))).astype(np.float32)
    lengths = np.full((b,), 16000, np.int32)
    lengths[-1] = 12000
    audio[-1, 12000:] = 0.0
    return audio, lengths


def check_w2v2_pr(jax_cfg, enc_params, audio, lengths, rng,
                  pr_params=None, vocab_size=11):
    """C1 parity: CTC logits + greedy sequences + PER-between-decodes
    (reference models/w2v2_pr.py:40-88,124-167).  When ``pr_params`` is an
    aptai_tpu-trained checkpoint, IT is the source of truth and is exported
    to torch (the trained-checkpoint round-trip)."""
    import jax.numpy as jnp
    import torch

    from aptai_tpu.models import W2V2PR
    from aptai_tpu.models.hf_convert import export_w2v2_pr
    from aptai_tpu.ops.ctc import greedy_decode
    from aptai_tpu.decode.native import edit_distance

    if pr_params is not None:
        params = pr_params
        vocab_size = np.asarray(params["pr_head"]["bias"]).shape[0]
    else:
        head_kernel = (rng.standard_normal(
            (jax_cfg.hidden_size, vocab_size)) * 0.05).astype(np.float32)
        head_bias = np.zeros((vocab_size,), np.float32)
        params = {"encoder": enc_params,
                  "pr_head": {"kernel": head_kernel, "bias": head_bias}}
    jax_cfg = dataclasses.replace(jax_cfg, vocab_size=vocab_size)

    model = W2V2PR(jax_cfg)
    out = model.apply({"params": params}, jnp.asarray(audio),
                      jnp.asarray(lengths), method="encode")
    ours_logits = np.asarray(out["phoneme_logits"], np.float32)
    frame_lengths = np.asarray(out["frame_lengths"])

    # torch side: export OUR params into the reference's Wav2Vec2_PR layout
    sd = export_w2v2_pr(params, jax_cfg.num_hidden_layers)
    backbone_sd = {k[len("wav2vec2."):]: v for k, v in sd.items()
                   if k.startswith("wav2vec2.")}
    tm = build_torch_backbone(jax_cfg, backbone_sd)
    hidden = torch_hidden_states(tm, audio, lengths,
                                 jax_cfg.num_hidden_layers)
    w = torch.tensor(sd["pr_head.weight"])
    b_ = torch.tensor(sd["pr_head.bias"])
    theirs_logits = (torch.tensor(hidden) @ w.T + b_).numpy()

    diffs, margins, per_edits, per_len, seq_match = [], [], 0, 0, 0
    seqs_ours, _ = greedy_decode(jnp.asarray(ours_logits),
                                 jnp.asarray(frame_lengths), blank=0,
                                 max_output_length=120)
    seqs_ours = np.asarray(seqs_ours)
    for i in range(len(audio)):
        n = frame_lengths[i]
        diffs.append(float(np.max(np.abs(ours_logits[i, :n]
                                         - theirs_logits[i, :n]))))
        top2 = np.sort(theirs_logits[i, :n], axis=-1)[:, -2:]
        margins.extend((top2[:, 1] - top2[:, 0]).tolist())
        ids = np.argmax(theirs_logits[i, :n], axis=-1)
        collapsed = [int(t) for j, t in enumerate(ids)
                     if t != 0 and (j == 0 or t != ids[j - 1])]
        ours_seq = [int(t) for t in seqs_ours[i] if t != 0]
        per_edits += edit_distance(collapsed, ours_seq)
        per_len += max(len(collapsed), 1)
        seq_match += int(collapsed == ours_seq)

    scale = float(np.median(np.abs(theirs_logits))) or 1.0
    max_diff = float(np.max(diffs))
    # the decoded-sequence criterion only means something when (almost) no
    # frame's argmax is decided by less than the cross-implementation noise
    # (random weights ⇒ near-uniform logits ⇒ a handful of near-tie frames
    # flip and change the collapsed sequence); a trained checkpoint has
    # peaked logits and IS held to it
    margins = np.asarray(margins)
    unstable_frac = float(np.mean(margins < 1000 * max_diff))
    seq_check_applicable = unstable_frac < 1e-3
    return {
        "logit_max_abs_diff": max_diff,
        "logit_scale": scale,
        "decode_margin_median": float(np.median(margins)),
        "decode_unstable_frame_frac": unstable_frac,
        "greedy_seq_agreement": seq_match / len(audio),
        "per_between_impls": per_edits / per_len,
        "seq_check_applicable": bool(seq_check_applicable),
        "round_tripped_trained_ckpt": pr_params is not None,
        "pass": bool(max_diff < 5e-3 * max(scale, 1.0)
                     and (not seq_check_applicable
                          or per_edits / per_len < 0.02)),
    }


def check_aptai(jax_cfg, enc_params, audio, lengths, rng, num_phonemes=11,
                aptai_params=None):
    """C2 parity: per-TV Pearson r + FER between impls + loss agreement
    (reference models/aptai.py:58-115; metric defs utility.py:393-444).

    ``aptai_params``: a TRAINED APTAI checkpoint's params — its encoder AND
    heads are exported to torch instead of the seeded random heads, pinning
    trained-full-size export fidelity (VERDICT r3 next #7)."""
    import jax.numpy as jnp
    import torch
    from scipy.stats import pearsonr

    from aptai_tpu import TV_PAD_VALUE
    from aptai_tpu.models import APTAI
    from aptai_tpu.ops.fir import lowpass_fir_taps

    h = jax_cfg.hidden_size
    if aptai_params is not None:
        enc_params = aptai_params["encoder"]
        tv_kernel = np.asarray(aptai_params["tv_linear"]["kernel"],
                               np.float32)
        tv_bias = np.asarray(aptai_params["tv_linear"]["bias"], np.float32)
        phn_kernel = np.asarray(aptai_params["phn_linear"]["kernel"],
                                np.float32)
        phn_bias = np.asarray(aptai_params["phn_linear"]["bias"], np.float32)
        num_phonemes = phn_kernel.shape[1]
    else:
        tv_kernel = (rng.standard_normal((h, 9)) * 0.1).astype(np.float32)
        tv_bias = np.zeros((9,), np.float32)
        phn_kernel = (rng.standard_normal((h, num_phonemes)) * 0.1).astype(
            np.float32)
        phn_bias = np.zeros((num_phonemes,), np.float32)

    model = APTAI(jax_cfg, num_phonemes=num_phonemes, tv_drop=0.0,
                  phn_drop=0.0)
    params = {"encoder": enc_params,
              "tv_linear": {"kernel": tv_kernel, "bias": tv_bias},
              "phn_linear": {"kernel": phn_kernel, "bias": phn_bias}}

    t = int(jax_cfg.feat_extract_output_lengths(np.asarray(audio.shape[1])))
    phn_t = rng.integers(1, num_phonemes, (len(audio), t)).astype(np.int32)
    tv_t = rng.standard_normal((len(audio), t, 9)).astype(np.float32)
    for i, n in enumerate(lengths):
        tn = int(jax_cfg.feat_extract_output_lengths(np.asarray(n)))
        phn_t[i, tn:] = 0
        tv_t[i, tn:] = TV_PAD_VALUE

    got = model.apply({"params": params}, jnp.asarray(audio),
                      jnp.asarray(lengths), jnp.asarray(phn_t),
                      jnp.asarray(tv_t))

    # torch side (reference models/aptai.py:42-102, eval mode)
    from aptai_tpu.models.hf_convert import export_wav2vec2_encoder

    tm = build_torch_backbone(jax_cfg, export_wav2vec2_encoder(
        enc_params, jax_cfg.num_hidden_layers))
    hidden = torch.tensor(torch_hidden_states(
        tm, audio, lengths, jax_cfg.num_hidden_layers))
    tvs_t = hidden.tanh() @ torch.tensor(tv_kernel) + torch.tensor(tv_bias)
    fir = torch.tensor(lowpass_fir_taps(10, 49),
                       dtype=torch.float64).view(1, 1, -1)
    tvs_t = torch_lowpass(tvs_t, fir).numpy()
    logits_t = (torch.nn.functional.leaky_relu(hidden)
                @ torch.tensor(phn_kernel) + torch.tensor(phn_bias)).numpy()

    ours_tvs = np.asarray(got["tvs_pred"])
    pccs, fer_num, fer_den = [], 0, 0
    for i, n in enumerate(lengths):
        tn = int(jax_cfg.feat_extract_output_lengths(np.asarray(n)))
        for c in range(9):
            pccs.append(pearsonr(ours_tvs[i, :tn, c], tvs_t[i, :tn, c])[0])
        a = np.argmax(np.asarray(got["phn_logits"])[i, :tn], -1)
        b = np.argmax(logits_t[i, :tn], -1)
        fer_num += int(np.sum(a != b))
        fer_den += tn
    return {
        "tv_pearson_min": float(np.min(pccs)),
        "fer_between_impls": fer_num / fer_den,
        "loss_ours": float(got["loss"]),
        "pass": bool(np.min(pccs) > 0.999 and fer_num / fer_den < 0.01),
    }


def check_force(jax_cfg, enc_params, audio, lengths, rng, vocab_size=11,
                model=None, params=None):
    """C3 parity: the FORCE head (cross-attention → ForwardSum + BiLSTM →
    FIR) fed identical frozen-tower embeddings + decoded sequences in both
    implementations (reference models/force_aptai.py:80-178,
    modules.py:65-153,190-235).

    With ``model``/``params`` supplied (a TRAINED checkpoint loaded via
    infer.loader.load_model, f32 path), the same torch replica runs with
    the trained weights — the trained-at-size FORCE *head* export cell
    (VERDICT r4 missing #4); otherwise a fresh init + random PR head."""
    import jax
    import jax.numpy as jnp
    import torch
    from scipy.stats import pearsonr

    from aptai_tpu.models import ForceAPTAI
    from aptai_tpu.models.modules import sinusoidal_positional_encoding
    from aptai_tpu.ops.fir import lowpass_fir_taps

    t = None
    if model is None:
        cfg = dataclasses.replace(jax_cfg, vocab_size=vocab_size)
        model = ForceAPTAI(cfg, vocab_size=vocab_size)
        t = int(cfg.feat_extract_output_lengths(np.asarray(audio.shape[1])))
        tvs = rng.standard_normal((len(audio), t, 9)).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(audio),
                               jnp.asarray(lengths), jnp.asarray(tvs))
        params = dict(variables["params"])
        params["w2v2_pr"] = {
            "encoder": enc_params,
            "pr_head": {
                "kernel": (rng.standard_normal(
                    (cfg.hidden_size, vocab_size)) * 0.3).astype(np.float32),
                "bias": np.zeros((vocab_size,), np.float32),
            },
        }
    else:
        cfg = model.pr_cfg
        t = int(cfg.feat_extract_output_lengths(np.asarray(audio.shape[1])))
        tvs = rng.standard_normal((len(audio), t, 9)).astype(np.float32)

    want = model.apply({"params": params}, jnp.asarray(audio),
                       jnp.asarray(lengths), jnp.asarray(tvs))
    enc = model.apply({"params": params}, jnp.asarray(audio),
                      jnp.asarray(lengths), method="encode_frozen")
    frame_embs = np.asarray(enc["frame_embs"], np.float32)
    frame_lengths = np.asarray(enc["frame_lengths"])
    seqs = np.asarray(want["pred_ctc_phn_seq"])
    seq_lens = np.asarray(want["phn_seq_lengths"])

    # ---- torch replica of the head, loaded with OUR params
    p = params
    emb_w = torch.tensor(np.asarray(p["phn_encoder"]["embed"]["embedding"]))
    pe = torch.tensor(sinusoidal_positional_encoding(
        model.max_phn_seq_len, model.phn_hidden_dim))
    frame_w = torch.tensor(np.asarray(p["frame_lin"]["kernel"]))
    frame_b = torch.tensor(np.asarray(p["frame_lin"]["bias"]))
    q_w = torch.tensor(np.asarray(p["xatt"]["q"]["kernel"]))
    q_b = torch.tensor(np.asarray(p["xatt"]["q"]["bias"]))
    k_w = torch.tensor(np.asarray(p["xatt"]["k"]["kernel"]))
    k_b = torch.tensor(np.asarray(p["xatt"]["k"]["bias"]))
    ln_s = torch.tensor(np.asarray(p["xatt"]["layer_norm"]["scale"]))
    ln_b = torch.tensor(np.asarray(p["xatt"]["layer_norm"]["bias"]))

    lstm = torch.nn.LSTM(2 * model.att_hidden_dim, 2 * model.att_hidden_dim,
                         batch_first=True, bidirectional=True)
    with torch.no_grad():
        for direction, suffix in (("fwd", ""), ("bwd", "_reverse")):
            getattr(lstm, f"weight_ih_l0{suffix}").copy_(
                torch.tensor(np.asarray(p["rnn"][f"w_ih_{direction}"])))
            getattr(lstm, f"weight_hh_l0{suffix}").copy_(
                torch.tensor(np.asarray(p["rnn"][f"w_hh_{direction}"])))
            getattr(lstm, f"bias_ih_l0{suffix}").copy_(
                torch.tensor(np.asarray(p["rnn"][f"b_ih_{direction}"])))
            getattr(lstm, f"bias_hh_l0{suffix}").copy_(
                torch.tensor(np.asarray(p["rnn"][f"b_hh_{direction}"])))
    l0_w = torch.tensor(np.asarray(p["rnn"]["linear_0"]["kernel"]))
    l0_b = torch.tensor(np.asarray(p["rnn"]["linear_0"]["bias"]))
    l1_w = torch.tensor(np.asarray(p["rnn"]["linear_1"]["kernel"]))
    l1_b = torch.tensor(np.asarray(p["rnn"]["linear_1"]["bias"]))
    fir = torch.tensor(lowpass_fir_taps(10, 49),
                       dtype=torch.float64).view(1, 1, -1)

    with torch.no_grad():
        seq_t = torch.tensor(seqs.astype(np.int64))
        phn_embs = torch.nn.functional.embedding(seq_t, emb_w,
                                                 padding_idx=0)
        phn_embs = phn_embs + pe[None, : seqs.shape[1]]
        frames = torch.tensor(frame_embs) @ frame_w + frame_b
        q = frames @ q_w + q_b
        k = phn_embs @ k_w + k_b
        energy = torch.einsum("bta,bna->btn", q, k)
        mask = (seq_t != 0).float()
        energy_m = energy + (1 - mask[:, None, :]) * -1000.0
        if model.energy_temperature != 1.0:
            # mirror the model's alignment-path temperature (the att_out
            # path keeps the unscaled CrossAttention softmax, as in jax)
            energy_lsm_in = energy / model.energy_temperature \
                + (1 - mask[:, None, :]) * -1000.0
        else:
            energy_lsm_in = energy_m
        att = torch.softmax(energy_m, dim=-1)
        att_out = torch.cat([torch.einsum("btn,bna->bta", att, k), q], -1)
        att_out = torch.nn.functional.layer_norm(
            att_out, att_out.shape[-1:], ln_s, ln_b)
        # packed-sequence BiLSTM (reference modules.py:203-214)
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            att_out, torch.tensor(frame_lengths), batch_first=True,
            enforce_sorted=False)
        out_p, _ = lstm(packed)
        out, _ = torch.nn.utils.rnn.pad_packed_sequence(
            out_p, batch_first=True, total_length=att_out.shape[1])
        tv_out = torch.tanh(out @ l0_w + l0_b) @ l1_w + l1_b
        tv_out = torch_lowpass(tv_out, fir).numpy()
        # ForwardSum (reference modules.py:65-126): blank column at the
        # model's blank_logprob, optional off-diagonal Gaussian prior
        # (modules.py:119-126), CTC over the monotonic target
        att_lsm = torch.log_softmax(energy_lsm_in, dim=-1)
        losses = []
        for i in range(len(audio)):
            tl = int(seq_lens[i])
            ml = int(frame_lengths[i])
            lp = att_lsm[i, :ml, : tl]
            lp = torch.cat(
                [torch.full((ml, 1), float(model.blank_logprob)), lp],
                dim=1)
            if model.off_diag_prior:
                N, T, g_p = tl + 1, ml, model.prior_g
                n_i = torch.arange(N)[None, :].repeat(T, 1)
                t_i = torch.arange(T)[:, None].repeat(1, N)
                W = torch.exp(-((n_i / N - t_i / T) ** 2) / (2 * g_p**2))
                lp = lp + torch.log_softmax(W, dim=-1)
            lp = torch.log_softmax(lp, dim=1)
            target = torch.arange(1, tl + 1)[None]
            losses.append(torch.nn.functional.ctc_loss(
                lp.unsqueeze(1), target,
                torch.tensor([ml]), torch.tensor([tl]),
                blank=0, zero_infinity=True))
        align_loss_t = float(torch.stack(losses).mean())

    ours_tvs = np.asarray(want["tvs_pred"])
    pccs = []
    for i in range(len(audio)):
        ml = int(frame_lengths[i])
        for c in range(9):
            if np.std(tv_out[i, :ml, c]) > 1e-8:
                pccs.append(pearsonr(ours_tvs[i, :ml, c],
                                     tv_out[i, :ml, c])[0])
    align_ours = float(want["align_loss"])
    rel = abs(align_ours - align_loss_t) / max(abs(align_loss_t), 1e-6)
    return {
        "tv_pearson_min": float(np.min(pccs)),
        "align_loss_ours": align_ours,
        "align_loss_torch": align_loss_t,
        "align_loss_rel_diff": rel,
        "pass": bool(np.min(pccs) > 0.999 and rel < 0.01),
    }


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def run(args) -> dict:
    import jax

    if args.platform != "auto":
        jax.config.update("jax_platforms", args.platform)

    from aptai_tpu.models import Wav2Vec2Config
    from aptai_tpu.models.hf_convert import (convert_wav2vec2_encoder,
                                             load_torch_state_dict)

    rng = np.random.default_rng(args.seed)

    if args.hf_checkpoint:
        sd = load_torch_state_dict(args.hf_checkpoint)
        jax_cfg = Wav2Vec2Config(num_hidden_layers=args.num_layers,
                                 apply_spec_augment=False,
                                 hidden_dropout=0.0, activation_dropout=0.0,
                                 attention_dropout=0.0, feat_proj_dropout=0.0)
        enc_params = convert_wav2vec2_encoder(sd, args.num_layers)
    else:
        jax_cfg = Wav2Vec2Config(**TINY, apply_spec_augment=False,
                                 hidden_dropout=0.0, activation_dropout=0.0,
                                 attention_dropout=0.0, feat_proj_dropout=0.0)
        tm = build_torch_backbone(jax_cfg, None, seed=args.seed)
        enc_params = convert_wav2vec2_encoder(tm.state_dict(),
                                              jax_cfg.num_hidden_layers)

    audio, lengths = make_audio(args, rng)

    pr_params = None
    pr_exp_dir = args.pr_exp_dir
    if args.train_pr_epochs and not pr_exp_dir:
        pr_exp_dir = _train_synthetic_pr(args)
    if pr_exp_dir:
        from flax import serialization

        ckpt = Path(pr_exp_dir) / "best-model-ckpt" / "params.msgpack"
        cfg_json = json.loads(
            (Path(pr_exp_dir) / "best-model-ckpt" / "model_cfg.json")
            .read_text())
        bk = {k: tuple(v) if isinstance(v, list) else v
              for k, v in cfg_json["backbone"].items()}
        # force the f32 parity path: TPU-trained checkpoints record their
        # run-local compute dtype (bfloat16 + tanh GELU), but torch here is
        # f32 + exact erf — comparing across compute dtypes measures the
        # bf16 tax, not conversion fidelity (params are stored f32 anyway)
        jax_cfg = Wav2Vec2Config(**{**bk, "apply_spec_augment": False,
                                    "dtype": "float32"})
        import jax.numpy as jnp  # noqa: F401

        from aptai_tpu.models import W2V2PR

        model = W2V2PR(jax_cfg)
        import jax as _jax

        v = model.init(_jax.random.PRNGKey(0),
                       np.zeros((1, 3200), np.float32),
                       np.full((1,), 3200, np.int32),
                       np.full((1, 4), -100, np.int32))
        pr_params = serialization.from_bytes(v["params"], ckpt.read_bytes())
        enc_params = pr_params["encoder"]

    verdict = {
        "mode": ("hf_checkpoint" if args.hf_checkpoint else
                 "trained_synthetic_ckpt" if pr_params is not None else
                 "synthetic_random"),
        "audio": ("hprc" if args.hprc_csv else "synthetic"),
        "n_utts": int(len(audio)),
    }
    verdict["w2v2_pr"] = check_w2v2_pr(jax_cfg, enc_params, audio, lengths,
                                       rng, pr_params=pr_params)
    aptai_params, aptai_cfg = None, jax_cfg
    if getattr(args, "aptai_exp_dir", None):
        from aptai_tpu.infer.loader import load_model

        kind, am, aptai_params, _ = load_model(args.aptai_exp_dir,
                                               dtype="float32")
        if kind != "aptai":
            raise SystemExit(f"--aptai_exp_dir holds a {kind!r} checkpoint")
        aptai_cfg = dataclasses.replace(am.cfg, apply_spec_augment=False)
        verdict["mode"] += "+trained_aptai_ckpt"
    verdict["aptai"] = check_aptai(aptai_cfg, enc_params, audio, lengths,
                                   rng, aptai_params=aptai_params)
    verdict["force"] = check_force(jax_cfg, enc_params, audio, lengths, rng)
    if getattr(args, "force_exp_dir", None):
        from aptai_tpu.infer.loader import load_model

        kind, fm, force_params, _ = load_model(args.force_exp_dir,
                                               dtype="float32")
        if kind != "force_aptai":
            raise SystemExit(f"--force_exp_dir holds a {kind!r} checkpoint")
        verdict["mode"] += "+trained_force_ckpt"
        verdict["force_trained"] = check_force(
            fm.pr_cfg, None, audio, lengths, rng, model=fm,
            params=force_params)
    verdict["overall_pass"] = bool(all(
        verdict[k]["pass"] for k in ("w2v2_pr", "aptai", "force")
        + (("force_trained",) if "force_trained" in verdict else ())))
    return verdict


def _train_synthetic_pr(args) -> str:
    """Train a tiny PR on the synthetic corpus so the harness can round-trip
    a genuinely *trained* checkpoint through torch."""
    import tempfile

    from aptai_tpu.data import make_synthetic_commonphone
    from aptai_tpu.models import tiny_config
    from aptai_tpu.train import train_pr
    from aptai_tpu.train.config import PRConfig

    work = Path(tempfile.mkdtemp(prefix="parity_pr_"))
    cp_csv = make_synthetic_commonphone(work / "cp", 24, 4, 4)
    cfg = PRConfig(
        exp_dir=str(work / "pr"), cp_csv_path=str(cp_csv), hprc_csv_path="",
        num_epochs=args.train_pr_epochs, num_warmup_epochs=1,
        num_static_epochs=max(args.train_pr_epochs - 2, 1),
        batch_size=4, samples_per_epoch=48, learning_rate=3e-4, mesh_data=1,
    ).finalize("phoneme_recognizer")
    train_pr.run(cfg, tiny_backbone=tiny_config())
    return cfg.exp_dir


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--hf_checkpoint", default=None,
                    help="HF wav2vec2 torch .bin (full-size real-data mode)")
    ap.add_argument("--num_layers", type=int, default=24)
    ap.add_argument("--hprc_csv", default=None,
                    help="prepared HPRC manifest for real eval audio")
    ap.add_argument("--pr_exp_dir", default=None,
                    help="an aptai_tpu train_pr run dir: round-trip its "
                         "best checkpoint through torch")
    ap.add_argument("--train_pr_epochs", type=int, default=0,
                    help="train a tiny synthetic-corpus PR first and "
                         "round-trip it (offline self-check)")
    ap.add_argument("--force_exp_dir", default=None,
                    help="trained FORCE-APTAI run dir (e.g. a stage-C "
                         "best-model-ckpt-<spk>): round-trips the TRAINED "
                         "head (xatt/PE/BiLSTM/FIR + ForwardSum with the "
                         "run's alignment knobs) through the torch replica")
    ap.add_argument("--aptai_exp_dir", default=None,
                    help="an aptai_tpu train_aptai run/checkpoint dir: "
                         "export its TRAINED encoder + heads to torch and "
                         "compare forwards (full-size trained-weight "
                         "export fidelity)")
    ap.add_argument("--n_utts", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default="cpu",
                    help="jax platform for the comparison (torch is CPU)")
    ap.add_argument("--out", default=None, help="write the JSON verdict here")
    args = ap.parse_args(argv)

    verdict = run(args)
    text = json.dumps(verdict, indent=2)
    print(text)
    if args.out:
        Path(args.out).write_text(text)
    return 0 if verdict["overall_pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
