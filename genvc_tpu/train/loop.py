"""Generic training-loop harness (checkpoint/resume, logging, eval cadence).

Replaces the reference's external Coqui ``trainer`` package (SURVEY.md L0):
epoch loop → per-step jitted train_step → metrics averaging → periodic
checkpointing (orbax, keep-N) → per-epoch eval → rank-0-gated logging with
optional wandb. Metric names match the reference trainers so dashboards read
the same.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Optional

import jax


class MetricAverager:
    def __init__(self):
        self.sums = {}
        self.count = 0

    def update(self, metrics: dict):
        for k, v in metrics.items():
            self.sums[k] = self.sums.get(k, 0.0) + float(v)
        self.count += 1

    def averages(self) -> dict:
        if not self.count:
            return {}
        return {k: v / self.count for k, v in self.sums.items()}


class Logger:
    """Console + optional wandb, rank-0 only (reference gates on
    ``use_wandb and get_rank()==0``)."""

    def __init__(self, use_wandb=False, project="", run_name="",
                 out_dir: str | None = None):
        self.is_main = jax.process_index() == 0
        self.wandb = None
        if use_wandb and self.is_main:
            try:
                import wandb

                wandb.init(project=project, name=run_name)
                self.wandb = wandb
            except Exception:
                self.wandb = None
        self.jsonl = None
        if out_dir and self.is_main:
            os.makedirs(out_dir, exist_ok=True)
            self.jsonl = open(os.path.join(out_dir, "train_log.jsonl"), "a")

    def log(self, metrics: dict, step: int | None = None):
        if not self.is_main:
            return
        if self.wandb is not None:
            self.wandb.log(metrics)
        if self.jsonl is not None:
            rec = dict(metrics)
            if step is not None:
                rec["step"] = step
            self.jsonl.write(json.dumps(rec, default=float) + "\n")
            self.jsonl.flush()

    def print(self, msg: str):
        if self.is_main:
            print(msg, flush=True)

    def log_histograms(self, tree: dict, step: int | None = None,
                       prefix: str = "grad"):
        """Per-top-level-module value histograms of a pytree (gradients or
        params) — the full wandb.watch(model) surface of the reference
        (gpt_trainer.py:48). Costs a device->host fetch of the tree; call on
        a cadence (e.g. every 100 steps), not per step. Without wandb, logs
        per-module [min, max, l2] summaries to the jsonl."""
        if not self.is_main:
            return
        import numpy as np

        for mod, sub in tree.items():
            leaves = [np.asarray(x).ravel() for x in jax.tree.leaves(sub)]
            if not leaves:
                continue
            flat = np.concatenate(leaves)
            if self.wandb is not None:
                self.wandb.log({f"{prefix}/{mod}": self.wandb.Histogram(flat)},
                               step=step)
            if self.jsonl is not None:
                rec = {f"{prefix}/{mod}/min": float(flat.min()),
                       f"{prefix}/{mod}/max": float(flat.max()),
                       f"{prefix}/{mod}/l2": float(np.linalg.norm(flat))}
                if step is not None:
                    rec["step"] = step
                self.jsonl.write(json.dumps(rec) + "\n")
                self.jsonl.flush()


class CheckpointManager:
    """Keep-N orbax checkpoints with resume (reference: save_n_checkpoints /
    save_step / restore_path semantics)."""

    def __init__(self, directory: str, keep_n: int = 2):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=keep_n))

    def save(self, step: int, state):
        import orbax.checkpoint as ocp

        self.mngr.save(step, args=ocp.args.StandardSave(state))
        self.mngr.wait_until_finished()

    def latest_step(self):
        return self.mngr.latest_step()

    def restore(self, state_template, step: int | None = None):
        import orbax.checkpoint as ocp

        step = step if step is not None else self.mngr.latest_step()
        if step is None:
            return None, None
        restored = self.mngr.restore(
            step, args=ocp.args.StandardRestore(state_template))
        return restored, step


def fit(state, train_step: Callable, train_loader, *,
        epochs: int, logger: Logger, eval_step: Optional[Callable] = None,
        eval_loader=None, ckpt: Optional[CheckpointManager] = None,
        save_step: int = 5000, print_step: int = 50,
        to_device: Callable = lambda b: b, start_step: int = 0,
        on_epoch_end: Optional[Callable] = None,
        max_steps: Optional[int] = None,
        max_eval_batches: Optional[int] = None):
    """Run the training loop; returns the final state.

    max_steps caps TOTAL optimizer steps (incl. resumed ones) — training
    stops mid-epoch when reached. max_eval_batches caps the per-epoch eval
    pass (the reference runs its full 9k-line test metafile every epoch,
    which is an epoch-scale cost — cap it for production runs).
    """
    step = start_step
    done = max_steps is not None and step >= max_steps
    for epoch in range(epochs):
        if done:
            break
        avg = MetricAverager()
        t0 = time.time()
        for batch in train_loader:
            state, metrics = train_step(state, to_device(batch))
            step += 1
            avg.update(metrics)
            if step % print_step == 0:
                m = {k: round(float(v), 4) for k, v in metrics.items()}
                rate = print_step / max(time.time() - t0, 1e-9)
                t0 = time.time()
                logger.print(f"epoch {epoch} step {step} {m} "
                             f"({rate:.2f} it/s)")
                logger.log({**{k: float(v) for k, v in metrics.items()},
                            "steps_per_sec": rate}, step=step)
            if ckpt is not None and step % save_step == 0:
                ckpt.save(step, state)
            if max_steps is not None and step >= max_steps:
                done = True
                break
        if done:
            # epoch cut short by max_steps: skip the epoch-end eval pass and
            # on_epoch_end hook — they would advance epoch-keyed state
            # (loader epoch bump, epoch schedules) on a fractional epoch; the
            # final ckpt.save below still persists everything
            break
        train_avg = avg.averages()
        log = {f"avg_{k}": v for k, v in train_avg.items()}
        if eval_step is not None and eval_loader is not None:
            eavg = MetricAverager()
            for i, batch in enumerate(eval_loader):
                if max_eval_batches is not None and i >= max_eval_batches:
                    break
                eavg.update(eval_step(state, to_device(batch)))
            log.update({f"Eval_avg_{k}": v for k, v in eavg.averages().items()})
        log["epoch"] = epoch
        logger.log(log, step=step)
        logger.print(f"epoch {epoch} done: "
                     f"{ {k: round(v, 4) for k, v in log.items() if k != 'epoch'} }")
        if on_epoch_end is not None:
            on_epoch_end(state, epoch, step)
    if ckpt is not None:
        ckpt.save(step, state)
    return state
