"""The shared fit() engine — one epoch/validate/checkpoint loop for all
three workloads (replaces ~2,800 duplicated lines across the reference's
train scripts; SURVEY.md §7.1 step 4).

TPU performance discipline (the axon tunnel executes lazily and every host
fetch costs ~30 ms RTT):

  * the step loop never fetches — per-step losses stay on device as scalars
    and are pulled in ONE fetch at the end of the epoch, which is also what
    triggers the chained execution of every step (same methodology as
    ``bench.py``);
  * the persistent compilation cache is enabled before the first jit;
  * validation runs on the *device* params (no host round-trip of ~1.2 GB
    of weights per epoch); the checkpoint manager fetches weights/moments
    (pipelined) ONLY on epochs that write — ``--ckpt_every`` sets the
    last-checkpoint cadence, improving epochs always write;
  * ``detect_anomaly`` opts back into the per-step sync — that's its
    documented cost (the analog of the reference's always-on
    torch.autograd.set_detect_anomaly, train_aptai.py:405).
"""

from __future__ import annotations

import os
import signal
import threading
import time
import warnings
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from aptai_tpu.parallel import shard_batch, shard_tree
from aptai_tpu.train.checkpoints import CheckpointManager
from aptai_tpu.train.harness import Engine, create_train_state, make_engine
from aptai_tpu.train.schedule import epoch_learning_rate
from aptai_tpu.utils.jax_setup import enable_compilation_cache
from aptai_tpu.utils.trees import fetch_pytree


class Preempted(SystemExit):
    """Graceful-preemption exit (code 0): the resume checkpoint is on disk.

    A ``SystemExit`` subclass so it unwinds LOSO fold loops and trainer
    CLIs without each needing a handler; catchable by name in tests and
    schedulers that want to distinguish preemption from completion."""

    def __init__(self):
        super().__init__(0)


class _PreemptionGuard:
    """Scoped SIGTERM/SIGUSR1 (+ graceful-first SIGINT) handling for fit().

    Cloud TPU preemption delivers SIGTERM with a short grace window; the
    reference has no handling at all (a preempted run loses everything
    since its last best-metric write).  Here the first signal only sets a
    flag — fit() checks it at step and epoch boundaries, finishes the
    in-flight device work, writes a resumable last-checkpoint and raises
    :class:`Preempted`.  A second SIGINT restores die-now Ctrl-C.
    Handlers install only on the main thread (signal.signal's own
    constraint) and are restored on exit, so nested/LOSO fit() calls and
    test harnesses stay clean."""

    SIGNALS = ("SIGTERM", "SIGUSR1", "SIGINT")

    def __init__(self, log_fn, enabled: bool = True):
        self.log_fn = log_fn
        self.enabled = enabled
        self.triggered: Optional[int] = None
        self._prev = {}

    def _handler(self, signum, frame):
        if signum == signal.SIGINT and self.triggered is not None:
            raise KeyboardInterrupt
        self.triggered = signum
        # Async-signal-safe notice only: os.write is a raw syscall.  Calling
        # log_fn (print/logging, buffered) here can land mid-write inside the
        # main thread's own print and raise "reentrant call inside
        # _io.BufferedWriter", unwinding fit() BEFORE the resume checkpoint
        # is written.  The full message goes through log_fn at the next
        # step/epoch-boundary check of ``triggered``.
        msg = (f"received {signal.Signals(signum).name}: finishing the "
               "in-flight step, writing a resume checkpoint, then exiting"
               + (" (second Ctrl-C kills immediately)"
                  if signum == signal.SIGINT else "") + "\n")
        try:
            os.write(2, msg.encode())
        except OSError:
            pass

    def __enter__(self):
        if self.enabled and (
            threading.current_thread() is threading.main_thread()
        ):
            for name in self.SIGNALS:
                sig = getattr(signal, name, None)
                if sig is not None:
                    self._prev[sig] = signal.signal(sig, self._handler)
        return self

    def __exit__(self, *exc):
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)
        return False


def fit(
    cfg,
    loss_fn: Callable,
    params,
    train_loader,
    validate_fn: Callable[[object, int], Dict[str, float]],
    ckpt: CheckpointManager,
    model_cfg: Optional[Dict] = None,
    samples_per_epoch: Optional[int] = None,
    log_fn: Callable[[str], None] = print,
    logger=None,
    engine: Optional[Engine] = None,
):
    """Run the full training loop; returns (final_params, history).

    * optimizer: torch-parity Adam with the config's betas/eps/decay
      (reference train_phoneme_recognizer.py:360-366);
    * LR: 3-phase epoch schedule applied per step via the lr argument;
    * per-epoch random batch subset when ``samples_per_epoch`` is set
      (reference train_phoneme_recognizer.py:402-414);
    * validation + best/last checkpointing each epoch;
    * laptop mode truncates to 1 train batch / few val files
      (reference train_aptai.py:418-420);
    * ``engine``: a prebuilt :class:`~aptai_tpu.train.harness.Engine` so
      LOSO folds share one compiled step (built fresh when omitted).
    """
    enable_compilation_cache()
    if engine is None:
        engine = make_engine(cfg, loss_fn)
    mesh, step_fn = engine.mesh, engine.step_fn
    state = create_train_state(params, engine.optimizer)
    start_epoch = 0
    if getattr(cfg, "train_from_ckpt", False) and (
        ckpt.last_dir / "params.msgpack"
    ).exists():
        # full resume: params + optimizer moments + best-metric watermark
        # (the reference leaves this unimplemented for the APTAI trainers,
        # SURVEY.md §5.3; first-class here)
        r_params, r_opt, meta = ckpt.restore_last(state.params,
                                                  state.opt_state)
        state = state.replace(params=r_params,
                              opt_state=r_opt or state.opt_state,
                              step=jnp.asarray(meta["step"], jnp.int32))
        start_epoch = int(meta["epoch"]) + 1
        log_fn(f"resumed from epoch {meta['epoch']} "
               f"(best {ckpt.target_metric}={ckpt.best_value})")
    rng = jax.random.PRNGKey(cfg.seed)
    subset_rng = np.random.default_rng(cfg.seed)
    history = []

    # multi-process runs: every process executes the same SPMD program,
    # but host-side writes (checkpoints, metric logs) happen once — on
    # the primary (parallel/multihost.py).  Single-process: always True.
    from aptai_tpu.parallel import is_primary

    primary = is_primary()
    if jax.process_count() > 1 and getattr(cfg, "fsdp", False):
        warnings.warn(
            "FSDP + multi-process: checkpoint fetches read only "
            "process-addressable shards; primary-only checkpointing of an "
            "fsdp-sharded state is not supported — run DP (fsdp=False) or "
            "ckpt_every=0", stacklevel=2)

    guard = _PreemptionGuard(
        log_fn, enabled=getattr(cfg, "graceful_preemption", True))
    with mesh, guard:
        state = shard_tree(mesh, state, fsdp=getattr(cfg, "fsdp", False))

        for epoch in range(start_epoch, cfg.num_epochs):
            lr = epoch_learning_rate(
                cfg.learning_rate, epoch, cfg.num_warmup_epochs,
                cfg.num_static_epochs, cfg.lr_decay,
            )
            n_batches = len(train_loader)
            if samples_per_epoch is not None:
                epoch_steps = max(samples_per_epoch // cfg.batch_size, 1)
                chosen = set(
                    subset_rng.choice(n_batches,
                                      size=min(epoch_steps, n_batches),
                                      replace=False).tolist()
                )
            else:
                chosen = None

            t0 = time.perf_counter()
            step_losses = []  # device scalars — no per-step host sync

            def _selected():
                for bi, b in enumerate(train_loader):
                    if chosen is not None and bi not in chosen:
                        continue
                    b.pop("batch_pad_mask", None)
                    yield bi, b

            def _run_one(bi, sb):
                nonlocal state
                state, metrics = step_fn(state, sb, rng, jnp.float32(lr))
                if getattr(cfg, "detect_anomaly", False):
                    # opt-in per-step sync (forces execution + fetch)
                    loss_val = float(metrics["loss"])
                    if not np.isfinite(loss_val):
                        raise FloatingPointError(
                            f"non-finite loss {loss_val} at epoch {epoch} "
                            f"batch {bi}: "
                            + str({k: float(v) for k, v in metrics.items()})
                        )
                step_losses.append(metrics["loss"])

            # one-batch lookahead: batch i+1's host→device staging
            # (shard_batch) is issued BEFORE step i is dispatched, so the
            # transfer overlaps the device step instead of serializing
            # with it
            staged = None  # (batch_idx, sharded batch)
            stop = False
            for bi, b in _selected():
                sb = shard_batch(mesh, b)
                if staged is not None:
                    _run_one(*staged)
                    if guard.triggered is not None or (
                        cfg.laptop and len(step_losses) >= 1
                    ):
                        stop = True
                        break
                staged = (bi, sb)
            if staged is not None and not stop:
                _run_one(*staged)
            # ONE fetch: triggers the chained execution of the whole epoch
            losses = (np.asarray(jnp.stack(step_losses))
                      if step_losses else np.zeros((0,), np.float32))
            train_time = time.perf_counter() - t0
            if losses.size and not np.all(np.isfinite(losses)):
                bad = int(np.flatnonzero(~np.isfinite(losses))[0])
                raise FloatingPointError(
                    f"non-finite loss at epoch {epoch}, step {bad} of "
                    f"{losses.size} (re-run with --detect_anomaly to sync "
                    "per step, --debug_nans to trace the origin)"
                )

            if guard.triggered is not None:
                # mid-epoch preemption: skip validation (the grace window
                # is short), persist params + moments + step, repeat this
                # epoch on resume
                if primary:
                    ckpt.save_interrupt(epoch, state.params,
                                        opt_state=state.opt_state,
                                        step=int(state.step),
                                        model_cfg=model_cfg)
                log_fn(f"preempted during epoch {epoch + 1} after "
                       f"{losses.size} steps: resume checkpoint written; "
                       f"rerun with --exp_dir {ckpt.exp_dir} to continue")
                raise Preempted()

            # validate on the device-resident params (no host round-trip)
            t_val = time.perf_counter()
            val_logs = validate_fn(state.params, epoch)
            val_time = time.perf_counter() - t_val
            # device trees go to the manager as-is: it fetches (pipelined)
            # only on epochs that actually write — on a remote-tunnel
            # device the every-epoch params+moments fetch is minutes
            t_ckpt = time.perf_counter()
            ckpt_every = int(getattr(cfg, "ckpt_every", 1))
            final_epoch = epoch == cfg.num_epochs - 1
            want_last = (final_epoch
                         or ckpt_every > 0
                         and epoch % ckpt_every == ckpt_every - 1
                         or guard.triggered is not None)
            if ckpt_every == 0 and not final_epoch:
                # 0 → checkpoint only at the end (no mid-run model
                # selection: with the reference's ties-improve contract a
                # plateaued metric re-writes best EVERY epoch, and each
                # write is a full params fetch).  A preemption in this mode
                # writes ONLY the resume checkpoint (save_interrupt below),
                # never best.
                improved = False
                want_last = False
            elif primary:
                improved = ckpt.update(
                    epoch, val_logs, state.params,
                    opt_state=state.opt_state,
                    step=int(state.step), model_cfg=model_cfg,
                    save_last=want_last,
                )
            else:  # secondaries run the same epochs, never touch disk
                improved = False
            ckpt_time = time.perf_counter() - t_ckpt
            entry = {
                "epoch": epoch,
                "lr": lr,
                "mean_train_loss": float(np.mean(losses)) if losses.size
                else None,
                "train_seconds": train_time,
                "val_seconds": val_time,
                "ckpt_seconds": ckpt_time,
                "train_steps": int(losses.size),
                "improved": improved,
                **val_logs,
            }
            history.append(entry)
            if logger is not None and primary:
                logger.log(entry, step=int(state.step))
            log_fn(
                f"epoch {epoch + 1}/{cfg.num_epochs} lr={lr:.2e} "
                f"train_loss={entry['mean_train_loss']} "
                + " ".join(f"{k}={v:.4f}" for k, v in val_logs.items()
                           if isinstance(v, float))
                + (" *best*" if improved else "")
            )
            if guard.triggered is not None and not final_epoch:
                # epoch-boundary preemption (signal arrived during
                # validation/checkpointing): epoch is complete, resume at
                # the next one
                if primary and not (improved or want_last):
                    ckpt.save_interrupt(epoch + 1, state.params,
                                        opt_state=state.opt_state,
                                        step=int(state.step),
                                        model_cfg=model_cfg)
                log_fn(f"preempted after epoch {epoch + 1}: resume "
                       f"checkpoint written; rerun with --exp_dir "
                       f"{ckpt.exp_dir} to continue")
                raise Preempted()

    return fetch_pytree(state.params), history
