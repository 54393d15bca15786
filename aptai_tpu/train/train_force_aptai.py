"""FORCE-APTAI trainer CLI — LOSO loop over the frozen-PR alignment model
(rebuild of reference train/train_force_aptai.py; same harness as the APTAI
trainer plus the CTC-sequence PER metric of the decoded phoneme path).

The PR backbone is *actually* frozen: besides the model-side
``stop_gradient``, the ``w2v2_pr`` subtree is excluded from the optimizer
(``optax.masked``), so the ~315 M backbone params carry no Adam moments on
HBM and can never be weight-decayed — matching the reference's
``requires_grad=False`` (models/force_aptai.py:76-78) where only the
~0.5 M-param head trains.
"""

from __future__ import annotations

import functools
from pathlib import Path

import jax
import numpy as np
import pandas as pd

from aptai_tpu.data import (BucketedLoader, HPRCDataset, PrefetchLoader,
                            collate_tv, load_vocab)
from aptai_tpu.data.hprc import loso_split
from aptai_tpu.data.vocab import build_vocab
from aptai_tpu.decode.native import edit_distance
from aptai_tpu.train.builders import build_force_model
from aptai_tpu.train.checkpoints import CheckpointManager, save_json
from aptai_tpu.train.config import ForceAPTAIConfig, parse_config
from aptai_tpu.train.evaluate import test_tv, validate_tv
from aptai_tpu.train.harness import make_engine
from aptai_tpu.train.loop import fit
from aptai_tpu.utils.logging import RunLogger
from aptai_tpu.train.metrics import aggregate_mean_std, dict_to_csv


def force_loss_fn(model):
    def loss_fn(params, batch, rngs):
        out = model.apply(
            {"params": params}, batch["audio"], batch["audio_lengths"],
            batch["tv_targets"], deterministic=False, rngs=rngs,
        )
        return out["loss"], {"tv_loss": out["tv_loss"],
                             "align_loss": out["align_loss"]}

    return loss_fn


def make_eval_forward(model):
    @jax.jit
    def fwd(params, audio, audio_lengths, tv_targets):
        return model.apply({"params": params}, audio, audio_lengths,
                           tv_targets)

    def forward(params, batch):
        out = fwd(params, batch["audio"], batch["audio_lengths"],
                  batch["tv_targets"])
        return {k: out[k] for k in (
            "loss", "tvs_pred", "pred_frame_phns", "pred_ctc_phn_seq",
            "phn_seq_lengths", "phn_seq_truncated",
        )}

    return forward


def ctc_seq_per(forward_fn, batches, max_batches=None,
                log_fn=None) -> float:
    """PER of the decoded CTC phoneme sequence against the ground-truth
    phoneme labels — the extra metric of the FORCE trainer
    (reference train/train_force_aptai.py adds a CTC-seq PER on top of the
    APTAI metric set).  Also surfaces 60-token decode truncations (the
    reference asserts ``len < 60``, force_aptai.py:111; here overflow is
    observable instead of fatal)."""
    edits = lengths = truncated = 0
    for i, batch in enumerate(batches):
        if max_batches is not None and i >= max_batches:
            break
        out = forward_fn(batch)
        seqs = np.asarray(out["pred_ctc_phn_seq"])
        lens = np.asarray(out["phn_seq_lengths"])
        trunc = np.asarray(out.get("phn_seq_truncated",
                                   np.zeros(len(seqs), np.int32)))
        mask = batch.get("batch_pad_mask", np.ones(len(seqs), bool))
        for b in range(len(seqs)):
            if not mask[b]:
                continue
            labels = batch["phoneme_labels"][b]
            gt = labels[labels >= 0].tolist()
            pred = seqs[b, : int(lens[b])].tolist()
            edits += edit_distance(gt, pred)
            lengths += len(gt)
            truncated += int(trunc[b] > 0)
    if truncated and log_fn is not None:
        log_fn(f"WARNING: {truncated} utterances lost phonemes to the "
               "60-token decode cap (reference force_aptai.py:111 asserts)")
    return edits / max(lengths, 1)


def _loader(df, vocab, batch_size, shuffle, seed=0):
    return BucketedLoader(
        HPRCDataset(df, vocab, rate="both"), batch_size=batch_size,
        collate_fn=collate_tv, shuffle=shuffle, seed=seed,
    )


def run_speaker(cfg, hprc_df, vocab, test_spk, model, params, model_cfg,
                eval_fwd, engine):
    exp_dir = Path(cfg.exp_dir)
    train_df, valid_df, test_n_df, test_f_df = loso_split(
        hprc_df, test_spk, cfg.train_val_rate, seed=cfg.seed
    )
    eval_bs = cfg.eval_batch_size or cfg.batch_size
    train_dl = _loader(train_df, vocab, cfg.batch_size, True, cfg.seed)
    if cfg.decode_method != "beam_host":
        # beam_host embeds a pure_callback in the train step; combined with
        # the prefetch producer thread this deadlocks the process (all
        # threads futex-wait — reproduced deterministically on CPU-JAX,
        # round 2).  The experiment path trades prefetch overlap for
        # liveness; the greedy default keeps it.
        train_dl = PrefetchLoader(train_dl)
    valid_dl = _loader(valid_df, vocab, eval_bs, False)
    test_n_dl = _loader(test_n_df, vocab, eval_bs, False)
    test_f_dl = _loader(test_f_df, vocab, eval_bs, False)

    max_b = 5 if cfg.laptop else None

    def validate(params_dev, epoch):
        fwd = functools.partial(eval_fwd, params_dev)
        logs = validate_tv(fwd, valid_dl, max_batches=max_b)
        logs["val_ctc_seq_per"] = ctc_seq_per(fwd, valid_dl, max_b,
                                              log_fn=print)
        return logs

    ckpt = CheckpointManager(
        exp_dir / f"best-model-ckpt-{test_spk}", cfg.target_metric,
        bigger_is_better=cfg.target_metric_bigger_better,
    )
    logger = RunLogger(Path(cfg.exp_dir), "FORCE_APTAI",
                       run_name=f"{cfg.prefix}_{test_spk}",
                       use_wandb=cfg.logging)
    final_params, history = fit(
        cfg, None, params, train_dl, validate, ckpt,
        model_cfg=model_cfg, logger=logger, engine=engine,
    )

    best = jax.device_put(ckpt.restore_best(final_params))
    fwd = functools.partial(eval_fwd, best)
    results = {}
    tmax = 1 if cfg.laptop else None
    results.update(test_tv(fwd, test_n_dl, "N", max_batches=tmax))
    results.update(test_tv(fwd, test_f_dl, "F", max_batches=tmax))
    results["test_N_ctc_seq_per"] = ctc_seq_per(fwd, test_n_dl, tmax,
                                                log_fn=print)
    results["test_F_ctc_seq_per"] = ctc_seq_per(fwd, test_f_dl, tmax,
                                                log_fn=print)
    metrics_dir = exp_dir / "test_metrics"
    metrics_dir.mkdir(parents=True, exist_ok=True)
    dict_to_csv(results, metrics_dir / f"{test_spk}.csv")
    return results


def run(cfg: ForceAPTAIConfig, tiny_backbone=None, speakers=None):
    exp_dir = Path(cfg.exp_dir)
    exp_dir.mkdir(parents=True, exist_ok=True)
    save_json(exp_dir / "experiment_args.json", cfg)

    if not Path(cfg.hprc_csv_path).exists():
        raise SystemExit(
            f"manifest not found: {cfg.hprc_csv_path} "
            "(build it with aptai_tpu.data.hprc_prep.build_hprc_csv or "
            "aptai_tpu.data.make_synthetic_hprc)"
        )
    hprc_df = pd.read_csv(cfg.hprc_csv_path)
    if Path(cfg.vocab_path).exists():
        vocab = load_vocab(cfg.vocab_path)
    else:
        vocab = build_vocab(hprc_df.phoneme_labels)
    speakers = speakers or hprc_df["speaker"].unique().tolist()

    # one model + compiled step/eval for all folds; fresh params per fold;
    # the frozen PR tower is masked out of the optimizer entirely
    model, params, model_cfg = build_force_model(
        cfg, vocab, cfg.pr_model_path, tiny=tiny_backbone
    )
    eval_fwd = make_eval_forward(model)
    engine = make_engine(cfg, force_loss_fn(model),
                         frozen_prefixes=("w2v2_pr",))

    per_speaker = []
    for fold, test_spk in enumerate(speakers):
        print(f"=== LOSO fold: held-out speaker {test_spk} ===")
        if fold > 0:
            _, params, _ = build_force_model(
                cfg, vocab, cfg.pr_model_path, tiny=tiny_backbone,
                seed=cfg.seed + fold,
            )
        per_speaker.append(
            run_speaker(cfg, hprc_df, vocab, test_spk, model, params,
                        model_cfg, eval_fwd, engine)
        )
    mean, std = aggregate_mean_std(per_speaker)
    dict_to_csv(mean, exp_dir / "loso_mean.csv")
    dict_to_csv(std, exp_dir / "loso_std.csv")
    return mean, std, per_speaker


def main(argv=None):
    cfg = parse_config(ForceAPTAIConfig, "FORCE_APTAI", argv)
    return run(cfg)


if __name__ == "__main__":
    main()
