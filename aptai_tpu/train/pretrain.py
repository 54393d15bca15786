"""Self-supervised pretraining trainer CLI (wav2vec2 masked-contrastive).

The reference has NO pretraining path — its chain begins at
``Wav2Vec2Model.from_pretrained(...)`` (reference models/w2v2_pr.py:28-33),
an external artifact this framework could previously only *ingest*
(models/hf_convert.py).  This trainer manufactures that artifact: it
pretrains the shared :class:`~aptai_tpu.models.wav2vec2.Wav2Vec2Encoder`
on raw audio with the objective of models/pretrain.py, and its checkpoints
splice into any downstream trainer via ``--pretrained_checkpoint
<pretrain exp_dir>`` (train/builders.py grafts the ``encoder`` subtree).

    python -m aptai_tpu.train.pretrain \
        --audio_csv_path data/CommonPhone/commonphone.csv \
        --num_epochs 100 --batch_size 8 --learning_rate 3e-5

Input: any manifest with a wav-path column (CommonPhone's ``path`` or
HPRC's ``path_wav``; labels are ignored — the objective is
self-supervised).  Uses the shared fit() engine: 3-phase LR schedule,
best/last checkpointing on ``val_loss``, graceful preemption, DP/TP
meshes — all of it applies unchanged because the step is just another
``loss_fn`` under the harness.
"""

from __future__ import annotations

import dataclasses
import functools
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from aptai_tpu.data.audio_io import load_wav_16k
from aptai_tpu.data.batching import (AUDIO_BUCKET, BucketedLoader,
                                     PrefetchLoader, _pad_to, _round_up)
from aptai_tpu.models.pretrain import Wav2Vec2Pretrain
from aptai_tpu.models.wav2vec2 import _compute_time_mask
from aptai_tpu.train.builders import make_backbone_config
from aptai_tpu.train.checkpoints import CheckpointManager, save_json
from aptai_tpu.train.config import TrainConfig, parse_config
from aptai_tpu.train.harness import make_engine
from aptai_tpu.train.loop import fit
from aptai_tpu.utils.logging import RunLogger


@dataclasses.dataclass
class PretrainConfig(TrainConfig):
    """Pretraining flags (objective constants follow fairseq/HF defaults)."""

    audio_csv_path: str = "data/CommonPhone/commonphone.csv"
    # random-crop ceiling in seconds (0 = whole utterances); crops bound
    # the attention T while every file still contributes every epoch
    crop_seconds: float = 0.0
    # span masking: ~mask_prob·T/span spans of `span` frames (the fairseq
    # mask_prob=0.65 / mask_length=10 regime ⇒ ~half the frames masked)
    mask_prob: float = 0.65
    mask_span: int = 10
    mask_min_masks: int = 2
    num_negatives: int = 100
    # product quantizer (wav2vec2 base-scale defaults)
    codevector_groups: int = 2
    codevector_vars: int = 320
    codevector_dim: int = 256
    proj_codevector_dim: int = 256
    contrastive_temperature: float = 0.1
    diversity_weight: float = 0.1
    feature_penalty_weight: float = 10.0
    # Gumbel temperature: start · decay^epoch, floored at min (HF decays
    # per optimizer step; per-epoch is the same curve reparameterized)
    gumbel_temp_start: float = 2.0
    gumbel_temp_min: float = 0.5
    gumbel_temp_decay: float = 0.96
    val_fraction: float = 0.1
    target_metric: str = "val_loss"
    num_epochs: int = 100
    learning_rate: float = 3e-5
    batch_size: int = 8


class PretrainAudioDataset:
    """Raw-audio view over a manifest: {"audio", "audio_len"} items with an
    optional random crop (fresh offsets every epoch via the shared rng)."""

    def __init__(self, df: pd.DataFrame, crop_seconds: float = 0.0,
                 seed: int = 0):
        # CommonPhone manifests name the wav column ``path``, HPRC
        # manifests ``path_wav`` (data/commonphone.py, data/hprc.py)
        col = "path_wav" if "path_wav" in df.columns else "path"
        self.paths = list(df[col])
        self.crop = int(crop_seconds * 16000)
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i):
        audio = load_wav_16k(self.paths[i]).astype(np.float32)
        if self.crop and len(audio) > self.crop:
            off = int(self._rng.integers(0, len(audio) - self.crop + 1))
            audio = audio[off:off + self.crop]
        return {"audio": audio, "audio_len": len(audio)}


def collate_audio(items, bucket: bool = True):
    w = max(x["audio_len"] for x in items)
    if bucket:
        w = _round_up(w, AUDIO_BUCKET)
    return {
        "audio": np.stack([_pad_to(x["audio"], w, 0.0) for x in items]),
        "audio_lengths": np.asarray([x["audio_len"] for x in items],
                                    np.int32),
    }


class GumbelTemperatureLoader:
    """Per-epoch Gumbel temperature injected into every batch as a (B,)
    array (scalar per row so mesh batch-sharding stays uniform).  fit()
    iterates the train loader exactly once per epoch, so a simple counter
    tracks the epoch; on --exp_dir resume the counter restarts at the
    schedule top — the temperature floor makes this a bounded, transient
    deviation (documented)."""

    def __init__(self, loader, start: float, minimum: float, decay: float):
        self.loader = loader
        self.start, self.minimum, self.decay = start, minimum, decay
        self._epoch = 0

    def __len__(self):
        return len(self.loader)

    @property
    def temperature(self) -> float:
        return max(self.minimum, self.start * self.decay ** self._epoch)

    def __iter__(self):
        temp = np.float32(self.temperature)
        self._epoch += 1
        for batch in self.loader:
            b = len(batch["audio_lengths"])
            batch = dict(batch)
            batch["gumbel_temp"] = np.full((b,), temp, np.float32)
            yield batch


def pretrain_loss_fn(model: Wav2Vec2Pretrain, cfg: PretrainConfig):
    backbone = model.cfg

    def loss_fn(params, batch, rngs):
        audio, lengths = batch["audio"], batch["audio_lengths"]
        b = audio.shape[0]
        t_frames = int(backbone.feat_extract_output_lengths(
            np.asarray(audio.shape[1])))
        frame_lengths = backbone.feat_extract_output_lengths(lengths)
        time_mask = _compute_time_mask(
            rngs["specaugment"], b, t_frames, frame_lengths,
            cfg.mask_prob, cfg.mask_span, cfg.mask_min_masks)
        out = model.apply(
            {"params": params}, audio, lengths, time_mask,
            jnp.mean(batch["gumbel_temp"]), deterministic=False,
            rngs={"dropout": rngs["dropout"],
                  "gumbel": jax.random.fold_in(rngs["dropout"], 1),
                  "negatives": jax.random.fold_in(rngs["dropout"], 2)},
        )
        return out["loss"], {
            "contrastive_loss": out["contrastive_loss"],
            "diversity_loss": out["diversity_loss"],
            "codebook_perplexity": out["codebook_perplexity"],
            "contrastive_accuracy": out["contrastive_accuracy"],
        }

    return loss_fn


def make_eval_forward(model: Wav2Vec2Pretrain):
    """Deterministic masked-objective forward: fixed mask/negative rngs,
    no dropout, hard (argmax) quantization — a stable per-epoch yardstick."""
    backbone = model.cfg

    @jax.jit
    def fwd(params, audio, lengths):
        b = audio.shape[0]
        t_frames = int(backbone.feat_extract_output_lengths(
            np.asarray(audio.shape[1])))
        frame_lengths = backbone.feat_extract_output_lengths(lengths)
        time_mask = _compute_time_mask(
            jax.random.PRNGKey(123), b, t_frames, frame_lengths,
            0.5, 10, 2)
        return model.apply(
            {"params": params}, audio, lengths, time_mask,
            jnp.float32(1.0), deterministic=True,
            rngs={"negatives": jax.random.PRNGKey(7)},
        )

    return fwd


def build_pretrain_model(cfg: PretrainConfig, tiny=None, seed=None):
    backbone = tiny if tiny is not None else make_backbone_config(cfg, 1)
    backbone = dataclasses.replace(backbone, apply_spec_augment=True)
    model = Wav2Vec2Pretrain(
        backbone,
        num_groups=cfg.codevector_groups,
        num_vars=cfg.codevector_vars,
        codevector_dim=cfg.codevector_dim,
        proj_codevector_dim=cfg.proj_codevector_dim,
        num_negatives=cfg.num_negatives,
        contrastive_temperature=cfg.contrastive_temperature,
        diversity_weight=cfg.diversity_weight,
        feature_penalty_weight=cfg.feature_penalty_weight,
    )
    n = 3200
    audio = jnp.zeros((1, n), jnp.float32)
    lengths = jnp.full((1,), n, jnp.int32)
    t = int(backbone.feat_extract_output_lengths(np.asarray(n)))
    variables = model.init(
        {"params": jax.random.PRNGKey(cfg.seed if seed is None else seed),
         "gumbel": jax.random.PRNGKey(1),
         "negatives": jax.random.PRNGKey(2)},
        audio, lengths, jnp.zeros((1, t), bool), jnp.float32(2.0),
        deterministic=True,
    )
    model_cfg = {"backbone": dataclasses.asdict(backbone),
                 "kind": "w2v2_pretrain",
                 "quantizer": {"groups": cfg.codevector_groups,
                               "vars": cfg.codevector_vars,
                               "codevector_dim": cfg.codevector_dim,
                               "proj_codevector_dim":
                                   cfg.proj_codevector_dim}}
    return model, dict(variables["params"]), model_cfg


def run(cfg: PretrainConfig, tiny_backbone=None):
    exp_dir = Path(cfg.exp_dir)
    exp_dir.mkdir(parents=True, exist_ok=True)
    save_json(exp_dir / "experiment_args.json", cfg)

    if not Path(cfg.audio_csv_path).exists():
        raise SystemExit(
            f"manifest not found: {cfg.audio_csv_path} (any CSV with a "
            "wav-path column works — CommonPhone (path) or HPRC (path_wav))")
    df = pd.read_csv(cfg.audio_csv_path)
    if "split" in df.columns and (df.split == "valid").any():
        train_df, val_df = df[df.split == "train"], df[df.split == "valid"]
    else:
        n_val = max(int(len(df) * cfg.val_fraction), 1)
        val_df, train_df = df.iloc[:n_val], df.iloc[n_val:]
    print(f"pretrain corpus: {len(train_df)} train / {len(val_df)} val "
          "utterances")

    train_dl = GumbelTemperatureLoader(
        PrefetchLoader(BucketedLoader(
            PretrainAudioDataset(train_df, cfg.crop_seconds, cfg.seed),
            batch_size=cfg.batch_size, collate_fn=collate_audio,
            shuffle=True, seed=cfg.seed)),
        cfg.gumbel_temp_start, cfg.gumbel_temp_min, cfg.gumbel_temp_decay)
    val_dl = BucketedLoader(
        PretrainAudioDataset(val_df, 0.0),
        batch_size=cfg.eval_batch_size or cfg.batch_size,
        collate_fn=collate_audio, shuffle=False)

    model, params, model_cfg = build_pretrain_model(cfg, tiny=tiny_backbone)
    eval_fwd = make_eval_forward(model)
    engine = make_engine(cfg, pretrain_loss_fn(model, cfg))

    def validate(params_dev, epoch):
        keys = ("loss", "contrastive_loss", "diversity_loss",
                "codebook_perplexity", "contrastive_accuracy")
        sums = {k: 0.0 for k in keys}
        n = 0
        for bi, batch in enumerate(val_dl):
            if cfg.laptop and bi >= 1:
                break
            out = eval_fwd(params_dev, jnp.asarray(batch["audio"]),
                           jnp.asarray(batch["audio_lengths"]))
            for k in keys:
                sums[k] += float(out[k])
            n += 1
        return {f"val_{k}": sums[k] / max(n, 1) for k in keys}

    ckpt = CheckpointManager(
        exp_dir, cfg.target_metric,
        bigger_is_better=cfg.target_metric_bigger_better,
        save_all_epochs=cfg.save_all_epochs,
    )
    logger = RunLogger(exp_dir, "pretrain", run_name=cfg.prefix,
                       use_wandb=cfg.logging)
    final_params, history = fit(
        cfg, None, params, train_dl, validate, ckpt,
        model_cfg=model_cfg, logger=logger, engine=engine,
    )
    print("PRETRAIN DONE:", {k: round(v, 4) for k, v in history[-1].items()
                             if isinstance(v, float)})
    return history, final_params


def main(argv=None):
    cfg = parse_config(PretrainConfig, "pretrain", argv)
    return run(cfg)


if __name__ == "__main__":
    main()
