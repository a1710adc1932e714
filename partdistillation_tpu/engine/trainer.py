"""Training engine: jitted train step over a device mesh + Orbax checkpoints.

Replaces the reference's detectron2 DefaultTrainer/SimpleTrainer hot loop
(base_trainer.py:55, SURVEY.md §3.1) with a functional TrainState and a single
pjit-compiled step: forward, criterion (matcher on device), backward, clipped
AdamW update — no Python in the loop body, no DDP wrapper (gradient averaging
is implicit in the global-batch loss under pjit).

Checkpointing uses Orbax with resume-if-exists semantics, mirroring
DetectionCheckpointer.resume_or_load's `last_checkpoint` protocol
(SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.mesh import tree_shardings
from .optim import OptimizerConfig, build_optimizer

__all__ = ["TrainState", "Trainer", "build_train_step"]

logger = logging.getLogger("partdistillation_tpu")


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jax.Array


def build_train_step(tx, loss_fn) -> Callable:
    """The (un-jitted) train-step body shared by Trainer and the AOT
    production-sharding checks (tests/test_aot_production_sharding.py):
    forward + criterion, backward, optimizer update, metrics."""

    def step(state: TrainState, batch):
        rng, key = jax.random.split(state.rng)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, key
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state, rng=rng
        )
        metrics = dict(metrics)
        metrics["total_loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return step


@dataclasses.dataclass
class Trainer:
    """Owns the compiled train step, state, and checkpointing for one stage."""

    loss_fn: Callable  # (params, batch, key) -> (loss, metrics)
    init_params: Any
    optimizer_cfg: OptimizerConfig
    mesh: Optional[Mesh] = None
    checkpoint_dir: Optional[str] = None
    seed: int = 0
    # (path_str, leaf) -> PartitionSpec over ``mesh`` for every TrainState
    # leaf (params AND optimizer state — Adam moments mirror the param paths).
    # None = fully replicated. See parallel.mesh.giant_head_rule for the
    # stage-5 model-axis sharding of the 176k-way part classifier.
    sharding_rules: Optional[Callable] = None
    # Optional jit-traced batch preprocessing applied INSIDE the compiled
    # step, before the loss: the wire-format hook (run.py packs boolean
    # masks 8x and uploads uint8 images; this unpacks/casts on device, so
    # host->device traffic shrinks ~7x with zero numerics change downstream).
    batch_prepare: Optional[Callable] = None
    # Donate the TrainState to the step (in-place buffer reuse). Safe to
    # keep True everywhere since round 4: the stage-5 donation kernel fault
    # was root-caused to the GATHER head's scatter-add gradient into the
    # unsharded 176k-column kernel under donation, and the production config
    # now uses the scatter-free onehot head slice there
    # (TransformerDecoderConfig.head_slice, tools/stage5_donation_harness.py).
    donate: bool = True

    def __post_init__(self):
        self.tx = build_optimizer(self.optimizer_cfg, self.init_params)
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=self.init_params,
            opt_state=self.tx.init(self.init_params),
            rng=jax.random.PRNGKey(self.seed),
        )
        self._state_shardings = None
        if self.mesh is not None:
            self._state_shardings = tree_shardings(
                self.mesh, self.state, self.sharding_rules)
            self.state = jax.device_put(self.state, self._state_shardings)
        self._step_fn = self._build_step()
        self._ckpt = None
        if self.checkpoint_dir:
            import orbax.checkpoint as ocp

            self._ckpt = ocp.CheckpointManager(
                os.path.abspath(self.checkpoint_dir),
                options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True),
            )

    def _build_step(self):
        base = build_train_step(self.tx, self.loss_fn)
        if self.batch_prepare is not None:
            prepare = self.batch_prepare

            def step(state, batch):
                return base(state, prepare(batch))
        else:
            step = base
        donate = (0,) if self.donate else ()
        if self.mesh is not None:
            batch_sh = NamedSharding(self.mesh, P("data"))
            repl = NamedSharding(self.mesh, P())
            return jax.jit(
                step,
                in_shardings=(self._state_shardings, batch_sh),
                out_shardings=(self._state_shardings, repl),
                donate_argnums=donate,
            )
        return jax.jit(step, donate_argnums=donate)

    def train_step(self, batch) -> Dict[str, float]:
        self.state, metrics = self._step_fn(self.state, batch)
        return metrics

    def compiled_hlo_text(self, batch) -> str:
        """Compiled-module text of the train step for the given batch shapes
        (profiler attribution: op metadata carries jax.named_scope paths).
        donate_argnums is dropped so lowering does not invalidate state."""
        import jax as _jax

        step = self._step_fn.__wrapped__
        return _jax.jit(step).lower(self.state, batch).compile().as_text()

    @property
    def step(self) -> int:
        return int(self.state.step)

    # --- checkpointing (resume-if-exists, last_checkpoint-style) ---

    def save(self):
        assert self._ckpt is not None
        import orbax.checkpoint as ocp

        self._ckpt.save(self.step, args=ocp.args.StandardSave(self.state))
        self._ckpt.wait_until_finished()

    def resume_or_load(self) -> bool:
        """Restore the latest checkpoint if one exists; returns True if resumed."""
        if self._ckpt is None:
            return False
        latest = self._ckpt.latest_step()
        if latest is None:
            return False
        import orbax.checkpoint as ocp

        self.state = self._ckpt.restore(
            latest, args=ocp.args.StandardRestore(self.state)
        )
        logger.info("resumed from checkpoint step %d", latest)
        return True
