"""Experiment configuration: dataclasses + CLI, mirroring the reference's
argparse flag surface (reference train/train_phoneme_recognizer.py:50-202,
train/train_aptai.py:39-174, train/train_force_aptai.py:39-164) so that the
blessed launch scripts translate 1:1 (BASELINE.md).
"""

from __future__ import annotations

import argparse
import dataclasses
from datetime import datetime
from pathlib import Path
from typing import Optional


@dataclasses.dataclass
class TrainConfig:
    """Shared trainer options (flag names match the reference)."""

    exp_dir: Optional[str] = None
    cache_dir: str = ".cache"
    logging: bool = False
    laptop: bool = False
    prefix: str = ""

    num_epochs: int = 160
    num_warmup_epochs: int = 0
    num_static_epochs: int = 0
    # PER-CHIP batch size.  The blessed defaults (PR 2 / APTAI 5 / FORCE 5,
    # scripts/start_train_*.sh) reproduce the reference's exact protocol;
    # for production DP throughput the measured optimum on this chip is 16
    # per chip (+16% audio-s/s over 8×5 s at the same convergence shape —
    # benchmarks/train_step.py sweep, PERF.md "Training batch sweep"):
    #   --batch_size=16  [× mesh_data chips via DP]
    batch_size: int = 4
    # 0 → evaluate at the training batch size through the bucketed loader
    # (the reference evaluates at batch 1 — train_aptai.py:74-76 — which is
    # the worst case on TPU; batch_pad_mask keeps the metrics identical)
    eval_batch_size: int = 0
    learning_rate: float = 5e-4
    lr_decay: float = 0.96
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_epsilon: float = 1e-8
    adam_weight_decay: float = 0.0
    save_all_epochs: bool = False
    # gradient accumulation: split each batch into k equal microbatches,
    # accumulate grads in one lax.scan, apply ONE optimizer update —
    # effective-batch training whose activations exceed HBM (the
    # reference has no equivalent; its batch is what fits one GPU).
    grad_accum: int = 1
    # last-checkpoint cadence (epochs); improving epochs always write.
    # >1 skips the params+moments device→host fetch on quiet epochs —
    # minutes of wall clock per epoch over a remote-tunnel device.
    ckpt_every: int = 1
    # graceful preemption: SIGTERM/SIGUSR1 (and a first Ctrl-C) finish the
    # in-flight step, write a resumable last-checkpoint (params + Adam
    # moments + step), and exit 0; rerun with --exp_dir to continue.  The
    # reference loses everything since its last best-metric write.
    graceful_preemption: bool = True
    target_metric: str = "mean_val_per"
    target_metric_bigger_better: bool = False
    seed: int = 0
    detect_anomaly: bool = False  # per-step NaN/Inf guard (forces a sync)
    debug_nans: bool = False      # jax_debug_nans: NaN origin tracing

    # model
    num_hidden_layers: int = 24
    final_dropout: float = 0.0
    ten_ms: bool = False
    remat_policy: str = "none"    # "none" | "full" | "dots" (configs.py)
    huggingface_model_id: str = "facebook/wav2vec2-large-xlsr-53"
    pretrained_checkpoint: Optional[str] = None  # torch .bin to convert
    freeze_feature_extractor: bool = False
    # compute dtype (params/optimizer stay float32): "auto" = bfloat16 on
    # TPU — the MXU's native mode and what every benchmark measures —
    # float32 elsewhere; "--dtype float32" restores reference-exact
    # full-precision numerics (train/builders.py::resolve_dtype)
    dtype: str = "auto"

    # parallelism (new first-class scope; reference is single-device)
    mesh_data: int = -1
    mesh_model: int = 1
    # ZeRO-3-style fully-sharded data parallelism: params + Adam moments
    # shard over the data axis (parallel/mesh.py::param_shardings(fsdp=));
    # XLA inserts the all-gathers.  ~data-fold lower per-device state
    # memory, same numerics as DP — for backbones (or optimizer settings)
    # that outgrow one chip's HBM.
    fsdp: bool = False
    # backend selection: "auto" keeps the default (TPU when available);
    # "cpu" forces host execution — the analog of the reference's
    # cuda-else-cpu fallback (reference train_phoneme_recognizer.py:177)
    platform: str = "auto"
    # PRNG implementation for dropout/SpecAugment mask generation.
    # "rbg" drives XLA's RngBitGenerator (hardware-accelerated on TPU);
    # threefry mask bits cost 9.6 ms of VPU time per blessed-shape APTAI
    # step — ~14% of the step (benchmarks/train_profile.py, PERF.md
    # round 3).  "threefry" restores jax's default: bit-exact mask
    # reproducibility across topologies/backends at that cost.
    rng_impl: str = "rbg"

    # multi-process (multi-host) launch — parallel/multihost.py: one
    # coordinator, same command per host, jax.devices() becomes the global
    # list and the mesh spans hosts.  "auto" autodetects on TPU pods;
    # unset process_id/num_processes fall back to SLURM/MPI env vars.
    coordinator_address: str = ""
    num_processes: int = 0
    process_id: int = -1

    # derived
    date_time: str = ""
    exp_name: str = ""
    train_from_ckpt: bool = False

    def finalize(self, task: str) -> "TrainConfig":
        if self.platform and self.platform != "auto":
            import jax

            jax.config.update("jax_platforms", self.platform)
        if self.rng_impl and self.rng_impl != "threefry":
            import jax

            jax.config.update("jax_default_prng_impl", self.rng_impl)
        if self.coordinator_address:
            # must run before the first backend touch (jax.devices())
            from aptai_tpu.parallel import (init_distributed,
                                            process_env_defaults)

            env = process_env_defaults()
            if self.num_processes <= 0:
                self.num_processes = env.get("num_processes", 0)
            if self.process_id < 0:
                self.process_id = env.get("process_id", -1)
            init_distributed(self.coordinator_address,
                             self.num_processes, self.process_id)
        if self.debug_nans:
            # the deeper analog of the reference's always-on
            # torch.autograd.set_detect_anomaly (train_aptai.py:405):
            # XLA re-runs the offending op un-jitted and points at it
            import jax

            jax.config.update("jax_debug_nans", True)
        self.date_time = datetime.now().strftime("%Y-%m-%d_%H:%M:%S")
        if self.laptop:  # debug mode truncation (reference :186-189)
            self.num_epochs = 1
            self.num_warmup_epochs = 1
            self.num_static_epochs = 1
        if self.exp_dir is None:
            self.exp_dir = str(
                Path("experiments") / task
                / f"{self.date_time}_{self.exp_name or self.prefix}"
            )
            self.train_from_ckpt = False
        else:
            self.train_from_ckpt = Path(self.exp_dir).exists()
        return self


@dataclasses.dataclass
class PRConfig(TrainConfig):
    """Phoneme-recognizer trainer (reference train_phoneme_recognizer.py)."""

    cp_csv_path: str = "data/CommonPhone/commonphone.csv"
    hprc_csv_path: str = "data/HPRC_prep/hprc.csv"
    cropping: bool = False
    samples_per_epoch: int = 2000
    # per-epoch validation decode.  Default "beam_device": the reference's
    # beam-PER validation protocol (train_phoneme_recognizer.py:520-542)
    # with the search batched on device (decode/device.py) — beam quality
    # at near-greedy epoch cost (41× the host search, PERF.md).  "beam"
    # is the host-search mechanism (C++/Python, utterance-serial);
    # "greedy" is the cheapest loop (final test always beam-decodes
    # either way, preserving the reported-PER protocol).
    val_decode: str = "beam_device"
    # train from cached frozen conv-FE features (train/fe_cache.py);
    # effective only when --freeze_feature_extractor is set AND cropping
    # is off (the cache needs constant per-utterance audio)
    cache_frozen_fe: bool = True


@dataclasses.dataclass
class APTAIConfig(TrainConfig):
    """APTAI trainer (reference train_aptai.py)."""

    hprc_csv_path: str = "data/HPRC_prep/hprc.csv"
    vocab_path: str = "vocab.json"
    train_val_rate: str = "both"
    target_metric: str = "val_mean_rmse"
    tv_drop: float = 0.1
    phn_drop: float = 0.1
    num_epochs: int = 20
    learning_rate: float = 1e-5
    batch_size: int = 5
    # run the frozen conv feature extractor ONCE per utterance per fold and
    # train from cached FE features (train/fe_cache.py): the FE is frozen
    # by the reference's own default (models/aptai.py:39-40) and its
    # forward is the step's HBM-bound term (~13%, PERF.md round-4
    # roofline).  --no-cache_frozen_fe restores the per-step FE forward.
    cache_frozen_fe: bool = True


@dataclasses.dataclass
class ForceAPTAIConfig(TrainConfig):
    """FORCE-APTAI trainer (reference train_force_aptai.py)."""

    hprc_csv_path: str = "data/HPRC_prep/hprc.csv"
    pr_model_path: str = "experiments/phoneme_recognizer/best"
    vocab_path: str = "vocab.json"
    train_val_rate: str = "N"
    target_metric: str = "val_mean_rmse"
    num_epochs: int = 60
    learning_rate: float = 1e-5
    batch_size: int = 5
    # in-step CTC decode: "greedy" (on-device collapse, the TPU default),
    # "beam_device" (TRUE prefix beam search on device — the reference's
    # beam semantics with no host round trip, decode/device.py), or
    # "beam_host" (the reference's host beam round-trip per step,
    # models/force_aptai.py:97 — kept for quality comparison)
    decode_method: str = "greedy"
    # blank-collapse guard: a collapsed recognizer drives the greedy decode
    # to empty sequences (alignment FER → 1.0 silently).  When
    # val_ctc_seq_per ≥ threshold for `patience` consecutive epochs the
    # trainer warns loudly; with --collapse_fallback it additionally
    # resumes the fold with decode_method=beam_host (which still recovers
    # non-blank paths — benchmarks/PERF.md greedy-vs-beam part 2)
    collapse_per_threshold: float = 0.95
    collapse_patience: int = 3
    collapse_fallback: bool = False
    # --- alignment-quality knobs (VERDICT r4 #1; defaults reference-exact) ---
    # score of the ForwardSum blank column (reference modules.py:70: −1)
    blank_logprob: float = -1.0
    # off-diagonal Gaussian band prior on the alignment scores, the
    # reference's own (shipped-disabled) remedy for ForwardSum
    # silence/diagonal collapse (reference models/modules.py:108,119-126);
    # --off_diag_prior turns it on, --prior_g sets the band width
    off_diag_prior: bool = False
    prior_g: float = 0.2
    # temperature on the attention energies feeding the alignment
    # log-softmax (<1 sharpens; 1.0 = reference-exact)
    energy_temperature: float = 1.0
    # weight of the auxiliary frame-CE distilling the frozen tower's
    # per-frame CTC posterior argmax into the alignment (0 = off)
    aux_frame_ce: float = 0.0
    # tower hidden state feeding the frame path (-1 = final layer, the
    # reference-exact choice; see ForceAPTAI.frame_hidden_layer)
    frame_hidden_layer: int = -1
    # run the frozen tower (+ in-step decode) ONCE per utterance and train
    # the head from cached encodings (train/frozen_cache.py): the tower is
    # frozen and deterministic, so recomputing it every epoch — as the
    # reference does, train_force_aptai.py:403-429 — is pure waste
    # (~99.8% of step FLOPs).  --no-cache_frozen_encodings restores the
    # per-step tower forward (e.g. host-memory-constrained corpora).
    cache_frozen_encodings: bool = True


def _add_dataclass_args(parser: argparse.ArgumentParser, cls) -> None:
    for f in dataclasses.fields(cls):
        if f.name in ("date_time", "exp_name", "train_from_ckpt"):
            continue
        arg = f"--{f.name}"
        if f.type in ("bool", bool):
            parser.add_argument(arg, action=argparse.BooleanOptionalAction,
                                default=f.default)
        elif f.type in ("Optional[str]", "typing.Optional[str]"):
            parser.add_argument(arg, type=str, default=f.default)
        else:
            typ = {int: int, float: float, str: str}.get(
                {"int": int, "float": float, "str": str}.get(f.type, f.type),
                str,
            )
            parser.add_argument(arg, type=typ, default=f.default)


def parse_config(cls, task: str, argv=None):
    parser = argparse.ArgumentParser(description=f"aptai_tpu {task} trainer")
    _add_dataclass_args(parser, cls)
    ns = parser.parse_args(argv)
    cfg = cls(**{f.name: getattr(ns, f.name)
                 for f in dataclasses.fields(cls)
                 if hasattr(ns, f.name)})
    return cfg.finalize(task)
