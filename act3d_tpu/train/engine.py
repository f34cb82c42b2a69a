"""Training engine: jitted SPMD train/eval steps, checkpoints, logging.

TPU-native equivalent of the reference ``BaseTrainTester`` template
(reference: engine.py:18-244):

  reference (torch/DDP)                      this engine (JAX/SPMD)
  -----------------------------------------  -----------------------------------
  DistributedDataParallel + NCCL all-reduce  1-D dp mesh; XLA inserts psum
  DataLoader workers + pin_memory            host loader + async device_put
  model.train()/eval() global mode           deterministic flag on apply
  torch.save best/last .pth                  orbax / msgpack best+last
  SummaryWriter scalars                      JSONL + optional TensorBoard

The step functions are built once per (model, mesh) and jit-compiled with
donated state; batches arrive already sharded over ``dp``.
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from ..parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
    shard_params,
    state_shardings,
)
from .optim import make_optimizer

__all__ = ["TrainState", "Trainer", "MetricLogger", "GracefulShutdown"]


class GracefulShutdown:
    """SIGTERM/SIGINT → finish the in-flight step, checkpoint, exit clean.

    Preemptible TPU VMs deliver SIGTERM shortly before reclaim; the
    reference has no handling (a preempted run loses everything since the
    last val_freq checkpoint, engine.py:155-180).  Use as a context
    manager around the training loop and poll ``requested``:

        with GracefulShutdown() as stop:
            for step in ...:
                trainer.step(...)
                if stop.requested:
                    trainer.save_checkpoint(log_dir, last_only=True)
                    break
    """

    def __init__(self, signals=None):
        import signal as _signal

        self._signal = _signal
        self.signals = (
            signals
            if signals is not None
            else (_signal.SIGTERM, _signal.SIGINT)
        )
        self.requested = False
        self._prev = {}

    def _handler(self, signum, frame):
        self.requested = True

    def __enter__(self):
        for s in self.signals:
            self._prev[s] = self._signal.signal(s, self._handler)
        return self

    def __exit__(self, *exc):
        for s, prev in self._prev.items():
            self._signal.signal(s, prev)
        return False


@dataclasses.dataclass
class TrainState:
    """Minimal train state pytree (params + opt state + step)."""

    params: Any
    opt_state: Any
    step: jnp.ndarray

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, _, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten
)


class MetricLogger:
    """JSONL metric log + optional TensorBoard (torch's writer if present).

    Replaces the reference's rank-0 SummaryWriter usage (engine.py:28-29,
    main_keypose.py:232-234).
    """

    def __init__(self, log_dir: Path, use_tensorboard: bool = False):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.log_dir / "metrics.jsonl", "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=str(self.log_dir))
            except Exception:
                self._tb = None

    def log(self, step: int, metrics: Dict[str, float]):
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class Trainer:
    """Generic jitted trainer over a dp mesh.

    Args:
      loss_fn: (params, batch, rng) -> (scalar loss, aux dict).  Must be pure.
      metrics_fn: optional (params, batch, rng) -> dict of arrays for eval.
      lr / weight_decay: optimizer hyperparameters (reference defaults:
        lr 1e-4, wd 5e-4; engine.py:91-93).
    """

    def __init__(
        self,
        loss_fn: Callable,
        params: Any,
        *,
        metrics_fn: Optional[Callable] = None,
        lr: float = 1e-4,
        weight_decay: float = 5e-4,
        accumulate_grad_batches: int = 1,
        mesh=None,
        log_dir: Optional[Path] = None,
        use_tensorboard: bool = False,
        flat_optimizer: bool = True,
    ):
        self.mesh = mesh if mesh is not None else make_mesh()
        self.tx = make_optimizer(
            params, lr=lr, weight_decay=weight_decay, flatten=flat_optimizer
        )
        if accumulate_grad_batches > 1:
            self.tx = optax.MultiSteps(
                self.tx, every_k_schedule=accumulate_grad_batches
            )
        # Copy before replicating: the step function donates its state, and
        # device_put aliases already-on-device arrays — without the copy the
        # caller's params would be deleted by the first step.
        params = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        # fsdp policy: replicate on a pure-dp mesh, ZeRO-shard params and
        # optimizer moments over the fsdp axis on a 2-D mesh
        params = shard_params(params, self.mesh)
        opt_sh = state_shardings(
            self.mesh, jax.eval_shape(self.tx.init, params)
        )
        opt_state = jax.jit(self.tx.init, out_shardings=opt_sh)(params)
        self.state = TrainState(
            params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32)
        )
        self._state_sh = TrainState(
            params=state_shardings(self.mesh, params),
            opt_state=opt_sh,
            step=replicated_sharding(self.mesh),
        )
        self._loss_fn = loss_fn
        self._metrics_fn = metrics_fn
        self.logger = (
            MetricLogger(log_dir, use_tensorboard) if log_dir else None
        )
        self.best_loss: Optional[float] = None

        rep = replicated_sharding(self.mesh)
        bsh = batch_sharding(self.mesh)

        def train_step(state: TrainState, batch, rng):
            def compute(params):
                return loss_fn(params, batch, rng)

            (loss, aux), grads = jax.value_and_grad(compute, has_aux=True)(
                state.params
            )
            updates, opt_state = self.tx.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            new_state = TrainState(
                params=params, opt_state=opt_state, step=state.step + 1
            )
            return new_state, loss, aux

        self._train_step = jax.jit(
            train_step,
            in_shardings=(self._state_sh, bsh, rep),
            out_shardings=(self._state_sh, rep, rep),
            donate_argnums=(0,),
        )
        if metrics_fn is not None:
            self._eval_step = jax.jit(
                metrics_fn,
                in_shardings=(self._state_sh.params, bsh, rep),
                out_shardings=rep,
            )
        else:
            self._eval_step = None

    # ------------------------------------------------------------------
    def make_scanned_steps(self, n_steps: int):
        """A jitted function running n_steps optimizer steps as one
        lax.scan (one dispatch).  Used for benchmarking on high-latency
        device links and for tight inner loops; the batch is fixed across
        the scan (real training feeds fresh batches per step via the
        DeviceFeeder between dispatches)."""
        loss_fn = self._loss_fn
        tx = self.tx

        def run(state, batch, rngs):
            def body(state, rng):
                (loss, _), grads = jax.value_and_grad(
                    lambda p: loss_fn(p, batch, rng), has_aux=True
                )(state.params)
                updates, opt_state = tx.update(
                    grads, state.opt_state, state.params
                )
                params = optax.apply_updates(state.params, updates)
                return (
                    TrainState(
                        params=params, opt_state=opt_state, step=state.step + 1
                    ),
                    loss,
                )

            return jax.lax.scan(body, state, rngs)

        rep = replicated_sharding(self.mesh)
        bsh = batch_sharding(self.mesh)
        return jax.jit(
            run,
            in_shardings=(self._state_sh, bsh, rep),
            out_shardings=(self._state_sh, rep),
            donate_argnums=(0,),
        )

    def step(self, batch, rng) -> Dict[str, float]:
        batch = shard_batch(batch, self.mesh)
        self.state, loss, aux = self._train_step(self.state, batch, rng)
        out = {"loss": loss}
        out.update(aux or {})
        return out

    def evaluate(self, batches, rng) -> Dict[str, float]:
        """Average eval metrics over an iterable of batches."""
        if self._eval_step is None:
            raise ValueError("no metrics_fn provided")
        sums: Dict[str, float] = {}
        count = 0
        for batch in batches:
            rng, sub = jax.random.split(rng)
            batch = shard_batch(batch, self.mesh)
            metrics = jax.device_get(
                self._eval_step(self.state.params, batch, sub)
            )
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(np.mean(v))
            count += 1
        return {k: v / max(count, 1) for k, v in sums.items()}

    # ------------------------------------------------------- checkpointing
    def save_checkpoint(
        self,
        ckpt_dir: Path,
        new_loss: Optional[float] = None,
        *,
        last_only: bool = False,
    ):
        """best/last semantics of the reference (engine.py:214-230).

        ``last_only=True`` writes only the resumable ``last.msgpack``
        (the SIGTERM/preemption path): an arbitrary mid-training state
        must never replace the tracked best checkpoint.  ``new_loss=None``
        with ``last_only=False`` keeps the reference-degenerate
        always-overwrite mode (``best_checkpoint_metric=""``,
        reference main_keypose.py:281 keys on a never-emitted metric).
        """
        ckpt_dir = Path(ckpt_dir)
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        payload = {
            "params": serialization.to_state_dict(
                jax.device_get(self.state.params)
            ),
            "opt_state": serialization.to_state_dict(
                jax.device_get(self.state.opt_state)
            ),
            "step": int(self.state.step),
            "best_loss": self.best_loss,
        }
        blob = serialization.msgpack_serialize(
            jax.tree.map(np.asarray, _strip_nones(payload))
        )
        if not last_only and (
            new_loss is None
            or self.best_loss is None
            or new_loss <= self.best_loss
        ):
            self.best_loss = new_loss
            (ckpt_dir / "best.msgpack").write_bytes(blob)
        (ckpt_dir / "last.msgpack").write_bytes(blob)

    def load_checkpoint(self, path: Path):
        blob = Path(path).read_bytes()
        template = {
            "params": jax.device_get(self.state.params),
            "opt_state": jax.device_get(self.state.opt_state),
            "step": 0,
            "best_loss": 0.0,
        }
        payload = serialization.msgpack_restore(blob)
        params = serialization.from_state_dict(template["params"], payload["params"])
        try:
            opt_state = serialization.from_state_dict(
                template["opt_state"], payload["opt_state"]
            )
        except (KeyError, ValueError) as e:
            raise ValueError(
                f"Optimizer state in {path} does not match this trainer's "
                "layout. Checkpoints written with the per-leaf AdamW need "
                "--flat_optimizer 0 (and vice versa); see train/optim.py."
            ) from e
        self.state = TrainState(
            params=shard_params(params, self.mesh),
            opt_state=shard_params(opt_state, self.mesh),
            step=jnp.asarray(payload.get("step", 0), jnp.int32),
        )
        self.best_loss = payload.get("best_loss", None)


def _strip_nones(tree):
    if isinstance(tree, dict):
        return {k: _strip_nones(v) for k, v in tree.items() if v is not None}
    return tree
