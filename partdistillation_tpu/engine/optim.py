"""Optimizer construction: parity with the reference BaseTrainer
(base_trainer.py:64-148) in optax terms.

  * AdamW (or SGD), base LR, weight decay 0.05
  * backbone parameters at BACKBONE_MULTIPLIER x LR (0.1)
  * zero weight decay for norm scales/biases, relative-position tables,
    absolute position embeddings, and query/level embeddings
  * FREEZE_KEYS: parameters whose path contains a freeze key get zero updates
  * full-model gradient-norm clipping (CLIP_VALUE 0.01) applied before the
    optimizer (the reference wraps optimizer.step the same way)
  * schedules: multi-step decay with warmup (detectron2 WarmupMultiStepLR) and
    poly decay (WarmupPolyLR power 0.9) — SOLVER.STEPS / poly per config
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

__all__ = ["OptimizerConfig", "build_optimizer", "build_schedule"]


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    optimizer: str = "adamw"  # adamw | sgd
    base_lr: float = 1e-4
    weight_decay: float = 0.05
    backbone_multiplier: float = 0.1
    momentum: float = 0.9
    clip_norm: float = 0.01
    freeze_keys: Tuple[str, ...] = ()
    # schedule
    schedule: str = "multistep"  # multistep | poly
    max_iter: int = 50000
    steps: Tuple[int, ...] = (40000, 45000)
    gamma: float = 0.1
    warmup_iters: int = 10
    warmup_factor: float = 1.0
    poly_power: float = 0.9


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path).lower()


def _is_no_decay(path_s: str, leaf) -> bool:
    if leaf.ndim <= 1:  # biases and norm scales
        return True
    for kw in ("relative_position_bias_table", "absolute_pos_embed", "query_feat",
               "query_embed", "level_embed"):
        if kw in path_s:
            return True
    return False


def build_schedule(cfg: OptimizerConfig):
    if cfg.schedule == "poly":
        def sched(step):
            frac = jnp.clip(step / max(cfg.max_iter, 1), 0.0, 1.0)
            lr = cfg.base_lr * (1.0 - frac) ** cfg.poly_power
            warm = jnp.where(
                step < cfg.warmup_iters,
                cfg.warmup_factor + (1 - cfg.warmup_factor) * step / max(cfg.warmup_iters, 1),
                1.0,
            )
            return lr * warm
        return sched
    if cfg.schedule == "multistep":
        def sched(step):
            lr = cfg.base_lr
            mult = jnp.ones((), jnp.float32)
            for s in cfg.steps:
                mult = mult * jnp.where(step >= s, cfg.gamma, 1.0)
            warm = jnp.where(
                step < cfg.warmup_iters,
                cfg.warmup_factor + (1 - cfg.warmup_factor) * step / max(cfg.warmup_iters, 1),
                1.0,
            )
            return lr * mult * warm
        return sched
    raise ValueError(f"unknown schedule {cfg.schedule!r}")


def build_optimizer(cfg: OptimizerConfig, params) -> optax.GradientTransformation:
    """Label-partitioned optax chain mirroring the reference param groups."""
    sched = build_schedule(cfg)

    def label(path, leaf):
        path_s = _path_str(path)
        if any(k in path_s for k in cfg.freeze_keys):
            return "frozen"
        group = "backbone" if "backbone" in path_s else "head"
        decay = "nodecay" if _is_no_decay(path_s, leaf) else "decay"
        return f"{group}_{decay}"

    labels = jax.tree_util.tree_map_with_path(label, params)

    def make_opt(lr_mult: float, wd: float):
        if cfg.optimizer == "adamw":
            core = optax.adamw(
                learning_rate=lambda s: sched(s) * lr_mult, weight_decay=wd,
                b1=0.9, b2=0.999, eps=1e-8,
            )
        elif cfg.optimizer == "sgd":
            core = optax.chain(
                optax.add_decayed_weights(wd),
                optax.sgd(learning_rate=lambda s: sched(s) * lr_mult, momentum=cfg.momentum),
            )
        else:
            raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
        return core

    tx = optax.multi_transform(
        {
            "backbone_decay": make_opt(cfg.backbone_multiplier, cfg.weight_decay),
            "backbone_nodecay": make_opt(cfg.backbone_multiplier, 0.0),
            "head_decay": make_opt(1.0, cfg.weight_decay),
            "head_nodecay": make_opt(1.0, 0.0),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
    if cfg.clip_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.clip_norm), tx)
    return tx
