"""APTAI trainer CLI — 8-speaker LOSO loop (rebuild of reference
train/train_aptai.py).

Per held-out speaker (reference __main__:851-996): text-disjoint 90/10
train/val split over the remaining speakers, rate filtering, train with the
shared engine, 10-metric validation per epoch, best checkpoint by
``val_mean_rmse``, then N- and F-rate test metric dicts → per-speaker CSVs
and a LOSO mean±std aggregate (reference :998-1033).

TPU deviations from the reference harness (deliberate):
  * model + jitted step/eval closures are built ONCE and shared by all 8
    folds (full-size compiles cost minutes through the tunnel; the
    reference rebuilds per fold, train_aptai.py:872-996) — each fold still
    gets a fresh parameter init (seed + fold);
  * validation/test run at the training batch size through the bucketed
    loader (the reference evaluates at batch 1, train_aptai.py:74-76).
"""

from __future__ import annotations

import functools
from pathlib import Path

import jax
import pandas as pd

from aptai_tpu.data import (BucketedLoader, HPRCDataset, PrefetchLoader,
                            collate_tv, load_vocab)
from aptai_tpu.data.hprc import loso_split
from aptai_tpu.data.vocab import build_vocab
from aptai_tpu.train.builders import build_aptai_model
from aptai_tpu.train.checkpoints import CheckpointManager, save_json
from aptai_tpu.train.config import APTAIConfig, parse_config
from aptai_tpu.train.evaluate import test_tv, validate_tv
from aptai_tpu.train.harness import make_engine
from aptai_tpu.train.loop import fit
from aptai_tpu.utils.logging import RunLogger
from aptai_tpu.train.metrics import aggregate_mean_std, dict_to_csv


def aptai_loss_fn(model, from_features: bool = False):
    """``from_features``: the batch carries cached frozen conv-FE outputs
    (train/fe_cache.py) instead of raw audio — identical numerics, minus
    the per-step FE forward the reference re-runs on frozen weights."""
    if from_features:
        def loss_fn(params, batch, rngs):
            out = model.apply(
                {"params": params}, batch["fe_features"],
                batch["audio_lengths"], batch["phn_frames"],
                batch["tv_targets"], deterministic=False, rngs=rngs,
                method="train_from_features",
            )
            return out["loss"], {"mse_loss": out["mse_loss"],
                                 "ce_loss": out["ce_loss"]}
    else:
        def loss_fn(params, batch, rngs):
            out = model.apply(
                {"params": params}, batch["audio"], batch["audio_lengths"],
                batch["phn_frames"], batch["tv_targets"],
                deterministic=False, rngs=rngs,
            )
            return out["loss"], {"mse_loss": out["mse_loss"],
                                 "ce_loss": out["ce_loss"]}

    return loss_fn


def make_eval_forward(model):
    @jax.jit
    def fwd(params, audio, audio_lengths, phn_frames, tv_targets):
        return model.apply({"params": params}, audio, audio_lengths,
                           phn_frames, tv_targets)

    def forward(params, batch):
        out = fwd(params, batch["audio"], batch["audio_lengths"],
                  batch["phn_frames"], batch["tv_targets"])
        return {k: out[k] for k in ("loss", "tvs_pred", "phn_fc_pred")}

    return forward


def _loader(df, vocab, batch_size, shuffle, seed=0):
    return BucketedLoader(
        HPRCDataset(df, vocab, rate="both"), batch_size=batch_size,
        collate_fn=collate_tv, shuffle=shuffle, seed=seed,
    )


def run_speaker(cfg, hprc_df, vocab, test_spk, model, params, model_cfg,
                eval_fwd, engine):
    """One LOSO fold; returns the test metric dict for this speaker."""
    exp_dir = Path(cfg.exp_dir)
    train_df, valid_df, test_n_df, test_f_df = loso_split(
        hprc_df, test_spk, cfg.train_val_rate, seed=cfg.seed
    )
    eval_bs = cfg.eval_batch_size or cfg.batch_size
    if getattr(cfg, "cache_frozen_fe", False):
        # the FE is frozen (reference models/aptai.py:39-40) and this
        # fold's FE weights are fixed at init — encode the corpus once
        from aptai_tpu.train.fe_cache import FECachedLoader

        fe_dl = FECachedLoader(
            _loader(train_df, vocab, cfg.batch_size, False),
            model.cfg, params["encoder"]["feature_extractor"],
            mesh=engine.mesh, seed=cfg.seed)
        print(f"frozen-FE cache: {len(fe_dl.dataset)} utterances, "
              f"{fe_dl.cache_bytes / 1e6:.1f} MB host")
        train_dl = PrefetchLoader(fe_dl)
    else:
        train_dl = PrefetchLoader(
            _loader(train_df, vocab, cfg.batch_size, True, cfg.seed))
    valid_dl = _loader(valid_df, vocab, eval_bs, False)
    test_n_dl = _loader(test_n_df, vocab, eval_bs, False)
    test_f_dl = _loader(test_f_df, vocab, eval_bs, False)

    max_b = 5 if cfg.laptop else None

    def validate(params_dev, epoch):
        return validate_tv(functools.partial(eval_fwd, params_dev),
                           valid_dl, max_batches=max_b)

    ckpt = CheckpointManager(
        exp_dir / f"best-model-ckpt-{test_spk}", cfg.target_metric,
        bigger_is_better=cfg.target_metric_bigger_better,
    )
    logger = RunLogger(Path(cfg.exp_dir), "APTAI",
                       run_name=f"{cfg.prefix}_{test_spk}",
                       use_wandb=cfg.logging)
    final_params, history = fit(
        cfg, None, params, train_dl, validate, ckpt,
        model_cfg=model_cfg, logger=logger, engine=engine,
    )

    best = jax.device_put(ckpt.restore_best(final_params))
    fwd = functools.partial(eval_fwd, best)
    results = {}
    results.update(test_tv(fwd, test_n_dl, "N",
                           max_batches=1 if cfg.laptop else None))
    results.update(test_tv(fwd, test_f_dl, "F",
                           max_batches=1 if cfg.laptop else None))
    metrics_dir = exp_dir / "test_metrics"
    metrics_dir.mkdir(parents=True, exist_ok=True)
    dict_to_csv(results, metrics_dir / f"{test_spk}.csv")
    return results


def run(cfg: APTAIConfig, tiny_backbone=None, speakers=None):
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
    # is_file(), not exists(): an empty --vocab_path resolves to "." (a
    # directory) and must fall through to the manifest-derived vocab
    if cfg.vocab_path and Path(cfg.vocab_path).is_file():
        vocab = load_vocab(cfg.vocab_path)
    else:  # fall back to manifest-derived vocab (synthetic / smoke runs)
        vocab = build_vocab(hprc_df.phoneme_labels)
    speakers = speakers or hprc_df["speaker"].unique().tolist()

    # one model + compiled step/eval for all folds; fresh params per fold
    model, params, model_cfg = build_aptai_model(cfg, vocab,
                                                 tiny=tiny_backbone)
    eval_fwd = make_eval_forward(model)
    engine = make_engine(
        cfg, aptai_loss_fn(
            model, from_features=getattr(cfg, "cache_frozen_fe", False)))

    per_speaker = []
    for fold, test_spk in enumerate(speakers):
        print(f"=== LOSO fold: held-out speaker {test_spk} ===")
        if fold > 0:
            _, params, _ = build_aptai_model(cfg, vocab, tiny=tiny_backbone,
                                             seed=cfg.seed + fold)
        per_speaker.append(
            run_speaker(cfg, hprc_df, vocab, test_spk, model, params,
                        model_cfg, eval_fwd, engine)
        )

    mean, std = aggregate_mean_std(per_speaker)
    dict_to_csv(mean, exp_dir / "loso_mean.csv")
    dict_to_csv(std, exp_dir / "loso_std.csv")
    print("LOSO mean:", {k: round(v, 4) for k, v in mean.items()
                         if k.endswith(("mean_rmse", "mean_pcc", "mean_FER"))})
    return mean, std, per_speaker


def main(argv=None):
    cfg = parse_config(APTAIConfig, "APTAI", argv)
    return run(cfg)


if __name__ == "__main__":
    main()
