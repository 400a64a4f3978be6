"""Hook-driven trainer loop — the pointcept Trainer lifecycle, TPU-native.

Parity: ``pointcept/engines/train.py:42-224`` (hook lifecycle before/after
train|epoch|step, run_step) and hooks ``pointcept/engines/hooks/misc.py``
(IterationTimer :33, InformationWriter :81, CheckpointSaver :141-276,
RuntimeProfiler :339-490) + the lidm CUDACallback (main.py:418-438).

Differences by design: the step function is a single jitted SPMD program, so
there is no DDP wrap / scaler / autocast machinery — mixed precision lives in
the model dtypes and scaling comes from the mesh sharding of the batch.
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Dict, Iterable, List, Optional

import jax
import numpy as np


class HookBase:
    trainer: "Trainer" = None

    def before_train(self): ...
    def before_epoch(self): ...
    def before_step(self): ...
    def after_step(self, logs: Dict[str, Any]): ...
    def after_epoch(self): ...
    def after_train(self): ...


class IterationTimer(HookBase):
    """Average iter/data time (hooks/misc.py:33-79)."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: List[float] = []
        self._t0 = None

    def before_step(self):
        self._t0 = time.perf_counter()

    def after_step(self, logs):
        dt = time.perf_counter() - self._t0
        if self.trainer.global_step > self.warmup:
            self.times.append(dt)
        logs["iter_time"] = dt
        if self.times:
            logs["avg_iter_time"] = float(np.mean(self.times[-50:]))


class InformationWriter(HookBase):
    """Scalar logging to stdout + metrics.jsonl (hooks/misc.py:81-139)."""

    def __init__(self, log_every: int = 10):
        self.log_every = log_every

    def before_train(self):
        self.path = os.path.join(self.trainer.workdir, "metrics.jsonl")

    def after_step(self, logs):
        step = self.trainer.global_step
        has_val = any(k.startswith("val/") for k in logs)
        if step % self.log_every == 0 or has_val:
            scal = {k: float(v) for k, v in logs.items()
                    if np.ndim(v) == 0}
            with open(self.path, "a") as f:
                f.write(json.dumps({"step": step, **scal}) + "\n")
            msg = " ".join(f"{k}={v:.4g}" for k, v in sorted(scal.items())
                           if k in ("loss", "loss_simple", "rec_loss",
                                    "disc_loss", "iter_time"))
            print(f"[step {step}] {msg}", flush=True)


class CheckpointSaver(HookBase):
    """Periodic + final orbax checkpoints (hooks/misc.py:141-276)."""

    def __init__(self, every_steps: int = 1000, max_to_keep: int = 3):
        self.every_steps = every_steps
        self.max_to_keep = max_to_keep

    def after_step(self, logs):
        if self.trainer.global_step % self.every_steps == 0:
            self._save()

    def after_train(self):
        self._save()

    def _save(self):
        from .checkpoint import save_checkpoint

        save_checkpoint(os.path.join(self.trainer.workdir, "ckpt"),
                        self.trainer.global_step, self.trainer.state,
                        self.max_to_keep)


class ValidationHook(HookBase):
    """Periodic validation pass — the Lightning val loop the reference relies
    on for its checkpoint monitor (main.py:596-617, ddpm.py:882-895
    validation_step logs ``val/loss_simple_ema``).

    ``val_fn(state, batch, rng) -> dict`` is a jitted eval step (typically the
    training loss with EMA params and deterministic=True); metrics are averaged
    over ``val_batches_factory()`` and merged into the step logs under
    ``val/<name>``."""

    def __init__(self, val_fn: Callable, val_batches_factory: Callable,
                 every_steps: int = 1000, prefix: str = "val"):
        self.val_fn = val_fn
        self.val_batches_factory = val_batches_factory
        self.every_steps = every_steps
        self.prefix = prefix

    def after_step(self, logs):
        step = self.trainer.global_step
        if step % self.every_steps != 0 and step != self.trainer.max_steps:
            return
        import jax

        sums: Dict[str, float] = {}
        n = 0
        for batch in self.val_batches_factory():
            self.trainer.rng, sub = jax.random.split(self.trainer.rng)
            out = self.val_fn(self.trainer.state, batch, sub)
            for k, v in out.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
        if n == 0:
            return
        for k, v in sums.items():
            logs[f"{self.prefix}/{k}"] = v / n


class BestCheckpointSaver(HookBase):
    """Monitored top-k checkpointing — ModelCheckpoint(save_top_k, monitor)
    (main.py:596-617). Saves whenever ``monitor`` appears in the step logs;
    orbax keeps the ``top_k`` best by ``mode`` and garbage-collects the rest."""

    def __init__(self, monitor: str = "val/loss_simple", top_k: int = 3,
                 mode: str = "min", subdir: str = "ckpt_best"):
        self.monitor = monitor
        self.top_k = top_k
        self.mode = mode
        self.subdir = subdir
        self._mgr = None

    def before_train(self):
        import orbax.checkpoint as ocp

        options = ocp.CheckpointManagerOptions(
            max_to_keep=self.top_k, create=True,
            best_fn=lambda m: m[self.monitor], best_mode=self.mode)
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(os.path.join(self.trainer.workdir, self.subdir)),
            options=options)

    def after_step(self, logs):
        if self.monitor not in logs:
            return
        import orbax.checkpoint as ocp

        self._mgr.save(
            self.trainer.global_step,
            args=ocp.args.StandardSave(
                jax.tree.map(np.asarray, self.trainer.state)),
            metrics={self.monitor: float(logs[self.monitor])})

    def after_train(self):
        if self._mgr is not None:
            self._mgr.wait_until_finished()
            self._mgr.close()
            self._mgr = None


class RuntimeProfiler(HookBase):
    """jax.profiler trace for N steps -> perfetto/tensorboard dump
    (the RuntimeProfilerV2 equivalent, hooks/misc.py:339-490)."""

    def __init__(self, start_step: int = 10, num_steps: int = 5):
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self._active = False

    def before_step(self):
        if self.trainer.global_step == self.start_step and not self._active:
            jax.profiler.start_trace(os.path.join(self.trainer.workdir, "trace"))
            self._active = True

    def after_step(self, logs):
        if self._active and self.trainer.global_step >= self.stop_step:
            jax.profiler.stop_trace()
            self._active = False


class Trainer:
    """Generic loop: state = step_fn(state, batch, rng) with hook lifecycle."""

    def __init__(self, step_fn: Callable, state: Any,
                 data_iter: Iterable, workdir: str = "./runs/default",
                 max_steps: int = 1000, hooks: Optional[List[HookBase]] = None,
                 seed: int = 0):
        self.step_fn = step_fn
        self.state = state
        self.data_iter = iter(data_iter)
        self.workdir = workdir
        self.max_steps = max_steps
        self.global_step = 0
        self.rng = jax.random.key(seed)
        self.hooks = hooks or [IterationTimer(), InformationWriter()]
        for h in self.hooks:
            h.trainer = self
        os.makedirs(workdir, exist_ok=True)

    def _call(self, name, *a):
        for h in self.hooks:
            getattr(h, name)(*a)

    def _melk(self, *_):
        """Emergency checkpoint — the reference's melk() (main.py:729-754):
        registered on SIGUSR1 (save and keep training) and called on any
        training exception / interrupt before re-raising."""
        print("melk: saving emergency checkpoint", flush=True)
        from .checkpoint import save_checkpoint
        save_checkpoint(os.path.join(self.workdir, "ckpt_interrupt"),
                        self.global_step, self.state)

    def train(self):
        import signal

        prev_usr1 = None
        try:  # signal only works in the main thread; optional elsewhere
            prev_usr1 = signal.signal(signal.SIGUSR1, self._melk)
        except (ValueError, AttributeError):
            pass
        self._call("before_train")
        try:
            while self.global_step < self.max_steps:
                self._call("before_step")
                batch = next(self.data_iter)
                self.rng, sub = jax.random.split(self.rng)
                self.state, logs = self.step_fn(self.state, batch, sub)
                self.global_step += 1
                self._call("after_step", logs)
        except (KeyboardInterrupt, Exception):
            self._melk()
            raise
        finally:
            if prev_usr1 is not None:
                signal.signal(signal.SIGUSR1, prev_usr1)
        self._call("after_train")
        return self.state
