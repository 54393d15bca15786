"""CTC phoneme-recognizer trainer CLI (rebuild of reference
train/train_phoneme_recognizer.py).

Stages (reference __main__:633-725): config → split CommonPhone manifest →
vocab → model/optimizer/schedule → epoch loop with random sample subsets,
per-epoch beam-decode PER validation, best/last checkpoints → final test on
the CommonPhone test split and the HPRC N / F rate sets.

Usage:
  python -m aptai_tpu.train.train_pr --cp_csv_path ... [--laptop] ...
"""

from __future__ import annotations

import functools
from pathlib import Path

import jax
import numpy as np
import pandas as pd

from aptai_tpu.data import (
    BucketedLoader,
    PrefetchLoader,
    CommonPhoneDataset,
    HPRCDataset,
    build_vocab,
    collate_ctc,
    save_vocab,
)
from aptai_tpu.train.builders import build_pr_model
from aptai_tpu.train.checkpoints import CheckpointManager, save_json
from aptai_tpu.train.config import PRConfig, parse_config
from aptai_tpu.train.evaluate import validate_pr
from aptai_tpu.train.harness import make_engine
from aptai_tpu.train.loop import fit
from aptai_tpu.utils.logging import init_logger


def make_loaders(cfg, df, vocab):
    if "split" in df:
        train_df = df[df.split == "train"]
        valid_df = df[df.split == "val"]
        test_df = df[df.split == "test"]
    else:
        raise NotImplementedError("manifest must carry a split column")
    train_ds = CommonPhoneDataset(train_df, vocab, cropping=cfg.cropping,
                                  seed=cfg.seed)
    valid_ds = CommonPhoneDataset(valid_df, vocab)
    test_ds = CommonPhoneDataset(test_df, vocab)
    mk = functools.partial(BucketedLoader, collate_fn=collate_ctc)
    eval_bs = cfg.eval_batch_size or cfg.batch_size
    return (
        PrefetchLoader(mk(train_ds, batch_size=cfg.batch_size, seed=cfg.seed)),
        mk(valid_ds, batch_size=eval_bs, shuffle=False),
        mk(test_ds, batch_size=eval_bs, shuffle=False),
        (train_df, valid_df, test_df),
    )


def pr_loss_fn(model, from_features: bool = False):
    """``from_features``: batches carry cached frozen conv-FE outputs
    (train/fe_cache.py; valid under --freeze_feature_extractor with
    cropping off) instead of raw audio."""
    if from_features:
        def loss_fn(params, batch, rngs):
            out = model.apply(
                {"params": params}, batch["fe_features"],
                batch["audio_lengths"], batch["phoneme_labels"],
                deterministic=False, rngs=rngs,
                method="train_from_features",
            )
            return out["loss"], {}
    else:
        def loss_fn(params, batch, rngs):
            out = model.apply(
                {"params": params}, batch["audio"], batch["audio_lengths"],
                batch["phoneme_labels"], deterministic=False, rngs=rngs,
            )
            return out["loss"], {}

    return loss_fn


def make_eval_forward(model):
    @jax.jit
    def fwd(params, audio, audio_lengths, phoneme_labels):
        return model.apply({"params": params}, audio, audio_lengths,
                           phoneme_labels)

    def forward(params, batch):
        out = fwd(params, batch["audio"], batch["audio_lengths"],
                  batch["phoneme_labels"])
        return {k: out[k] for k in ("loss", "log_probs", "frame_lengths")}

    return forward


def run(cfg: PRConfig, tiny_backbone=None):
    exp_dir = Path(cfg.exp_dir)
    exp_dir.mkdir(parents=True, exist_ok=True)
    save_json(exp_dir / "experiment_args.json", cfg)

    if not Path(cfg.cp_csv_path).exists():
        raise SystemExit(
            f"manifest not found: {cfg.cp_csv_path} "
            "(build it with aptai_tpu.data.commonphone.commonphone_csv or "
            "aptai_tpu.data.make_synthetic_commonphone)"
        )
    df = pd.read_csv(cfg.cp_csv_path)
    vocab = build_vocab(df.phonemes)
    save_vocab(vocab, exp_dir / "vocab.json")
    train_dl, valid_dl, test_dl, splits = make_loaders(cfg, df, vocab)
    for name, part in zip(("train", "valid", "test"), splits):
        part.to_csv(exp_dir / f"{name}.csv", index=False)

    model, params, model_cfg = build_pr_model(cfg, vocab, tiny=tiny_backbone)
    eval_fwd = make_eval_forward(model)
    # FE cache precondition: frozen FE + constant per-utterance audio
    use_fe_cache = (getattr(cfg, "cache_frozen_fe", False)
                    and cfg.freeze_feature_extractor and not cfg.cropping)
    engine = make_engine(cfg, pr_loss_fn(model, from_features=use_fe_cache))
    if use_fe_cache:
        from aptai_tpu.train.fe_cache import FECachedLoader

        base = train_dl.loader if isinstance(train_dl, PrefetchLoader) \
            else train_dl
        fe_dl = FECachedLoader(base, model.cfg,
                               params["encoder"]["feature_extractor"],
                               mesh=engine.mesh, seed=cfg.seed)
        print(f"frozen-FE cache: {len(fe_dl.dataset)} utterances, "
              f"{fe_dl.cache_bytes / 1e6:.1f} MB host")
        train_dl = PrefetchLoader(fe_dl)

    def validate(params_dev, epoch):
        return validate_pr(
            functools.partial(eval_fwd, params_dev), valid_dl,
            max_batches=1 if cfg.laptop else None,
            decode=cfg.val_decode,
        )

    ckpt = CheckpointManager(
        exp_dir, cfg.target_metric,
        bigger_is_better=cfg.target_metric_bigger_better,
        save_all_epochs=cfg.save_all_epochs,
    )
    logger = init_logger(cfg, "phoneme_recognizer")
    final_params, history = fit(
        cfg, None, params, train_dl, validate, ckpt,
        model_cfg=model_cfg,
        samples_per_epoch=cfg.samples_per_epoch,
        logger=logger, engine=engine,
    )

    # test: best checkpoint on CP-test + HPRC N/F (reference :687-725);
    # always beam-decoded, matching the reference's reported-PER protocol
    best_params = jax.device_put(ckpt.restore_best(final_params))
    results = {}
    fwd = functools.partial(eval_fwd, best_params)
    max_b = 1 if cfg.laptop else None
    results["mean_cp_test_per"] = validate_pr(fwd, test_dl, max_b)[
        "mean_val_per"]
    if cfg.hprc_csv_path and Path(cfg.hprc_csv_path).exists():
        hprc_df = pd.read_csv(cfg.hprc_csv_path)
        for rate in ("N", "F"):
            dl = BucketedLoader(
                HPRCDataset(hprc_df, vocab, rate=rate),
                batch_size=cfg.eval_batch_size or cfg.batch_size,
                collate_fn=collate_ctc, shuffle=False,
            )
            results[f"mean_hprc{rate}_per"] = validate_pr(fwd, dl, max_b)[
                "mean_val_per"]
    save_json(exp_dir / "test_results.json", results)
    print("TEST RESULTS:", results)
    return history, results


def main(argv=None):
    cfg = parse_config(PRConfig, "phoneme_recognizer", argv)
    return run(cfg)


if __name__ == "__main__":
    main()
