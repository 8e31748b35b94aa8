"""AdamW + polynomial decay/warmup with weight-decay exclusions.

Parity surface: the TFM optimization blocks registered by the reference
(``src/configs/pretraining_experiments.py:24-47``): AdamW with
``weight_decay_rate`` excluding params whose name contains
LayerNorm/layer_norm/bias; polynomial LR decay to 0; polynomial warmup.

TFM semantics notes:
* warmup multiplies in as ``lr * (step / warmup_steps) ** power`` before
  handing over to the decayed schedule at ``warmup_steps``.
* decay operates on the *global* step including warmup steps.
"""

from __future__ import annotations

from typing import Callable

import optax

from mmt_tpu.configs.optimization import OptimizationConfig


def create_learning_rate_fn(
    config: OptimizationConfig, train_steps: int
) -> Callable[[int], float]:
    lr_cfg = config.polynomial
    decay_steps = lr_cfg.decay_steps or train_steps
    base = optax.polynomial_schedule(
        init_value=lr_cfg.initial_learning_rate,
        end_value=lr_cfg.end_learning_rate,
        power=lr_cfg.power,
        transition_steps=decay_steps,
    )
    warmup_steps = config.warmup.warmup_steps
    if not warmup_steps:
        return base

    warmup_power = config.warmup.power

    def schedule(step):
        import jax.numpy as jnp

        step_f = jnp.asarray(step, jnp.float32)
        # TFM PolynomialWarmUp: ramp to the base schedule's value at the
        # handover point, then follow the base schedule (which counts the
        # global step including warmup).
        warm = base(warmup_steps) * (step_f / warmup_steps) ** warmup_power
        return jnp.where(step_f < warmup_steps, warm, base(step))

    return schedule


def _decay_mask(params) -> dict:
    """True for params that get weight decay (excludes LayerNorm/bias)."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    excluded = ("layer_norm", "layernorm", "bias", "scale")

    def keep(path):
        joined = "/".join(str(p) for p in path).lower()
        return not any(e in joined for e in excluded)

    mask = {path: keep(path) for path in flat}
    return flax.traverse_util.unflatten_dict(mask)


def create_optimizer(
    config: OptimizationConfig, train_steps: int
) -> optax.GradientTransformation:
    if config.optimizer_type != "adamw":
        raise ValueError(f"Unsupported optimizer {config.optimizer_type!r}")
    lr_fn = create_learning_rate_fn(config, train_steps)
    adamw_cfg = config.adamw
    tx = optax.adamw(
        learning_rate=lr_fn,
        b1=adamw_cfg.beta_1,
        b2=adamw_cfg.beta_2,
        eps=adamw_cfg.epsilon,
        weight_decay=adamw_cfg.weight_decay_rate,
        mask=_decay_mask,
    )
    if adamw_cfg.global_clipnorm > 0:
        tx = optax.chain(optax.clip_by_global_norm(adamw_cfg.global_clipnorm), tx)
    return tx
