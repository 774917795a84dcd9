"""BCVAE training: ELBO with cyclical β and velocity term.

Reference semantics (``script/train_vae.py:45-102,416-440``):
loss = 0.5·MSE_sum(reconst)/B + β·KLD + w_vel·0.5·MSE_sum(Δ)/B with the
cyclical linear β schedule (10 cycles), AdamW lr 1e-4 with 10% warmup,
grad-clip 1.0, EMA 0.99.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from said_tpu.models.vae import BCVAE
from said_tpu.train.ema import ema_update


@dataclasses.dataclass(frozen=True)
class VAETrainConfig:
    learning_rate: float = 1e-4
    warmup_steps: int = 0
    weight_vel: float = 1.0
    grad_clip: float = 1.0
    ema: bool = True
    ema_decay: float = 0.99


class VAETrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any


def make_optimizer(config: VAETrainConfig) -> optax.GradientTransformation:
    if config.warmup_steps > 0:
        schedule = optax.join_schedules(
            [
                optax.linear_schedule(0.0, config.learning_rate, config.warmup_steps),
                optax.constant_schedule(config.learning_rate),
            ],
            [config.warmup_steps],
        )
    else:
        schedule = optax.constant_schedule(config.learning_rate)
    return optax.chain(
        optax.clip_by_global_norm(config.grad_clip),
        optax.adamw(schedule, weight_decay=0.01),
    )


def create_train_state(config: VAETrainConfig, params, batch_stats) -> VAETrainState:
    tx = make_optimizer(config)
    return VAETrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.array, params) if config.ema else None,
    )


def elbo_loss(
    model: BCVAE,
    params,
    batch_stats,
    rng: jax.Array,
    coeffs: jnp.ndarray,
    std,
    config: VAETrainConfig,
    beta: jnp.ndarray,
    train: bool = True,
    use_noise: bool = True,  # False: z = mean (deterministic parity tests)
) -> Tuple[jnp.ndarray, Dict]:
    b = coeffs.shape[0]
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        out, mutated = model.apply(
            variables, coeffs, rng=rng, use_noise=use_noise, train=True,
            mutable=["batch_stats"],
        )
        new_stats = mutated["batch_stats"]
    else:
        out = model.apply(variables, coeffs, rng=rng, use_noise=use_noise, train=False)
        new_stats = batch_stats

    answer, pred = coeffs, out.coeffs_reconst
    if std is not None:
        inv = 1.0 / std.reshape(1, 1, -1)
        answer = answer * inv
        pred = pred * inv

    loss_reconst = 0.5 * jnp.sum((answer - pred) ** 2) / b
    loss_kld = 0.5 * jnp.mean(
        jnp.sum(out.mean**2 + jnp.exp(out.log_var) - out.log_var - 1.0, axis=1)
    )
    a_diff = answer[:, 1:] - answer[:, :-1]
    p_diff = pred[:, 1:] - pred[:, :-1]
    loss_vel = 0.5 * jnp.sum((a_diff - p_diff) ** 2) / b

    loss = loss_reconst + beta * loss_kld + config.weight_vel * loss_vel
    metrics = {
        "loss": loss,
        "loss_reconst": loss_reconst,
        "loss_kld": loss_kld,
        "loss_velocity": loss_vel,
    }
    return loss, (metrics, new_stats)


def make_train_step(model: BCVAE, config: VAETrainConfig):
    tx = make_optimizer(config)

    def train_step(state: VAETrainState, coeffs, std, beta, rng):
        def loss_fn(params):
            return elbo_loss(
                model, params, state.batch_stats, rng, coeffs, std, config, beta, True
            )

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = (
            ema_update(state.ema_params, new_params, config.ema_decay, state.step)
            if state.ema_params is not None
            else None
        )
        return (
            state.replace(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt,
                ema_params=new_ema,
            ),
            metrics,
        )

    return train_step


def make_eval_step(model: BCVAE, config: VAETrainConfig):
    def eval_step(params, batch_stats, coeffs, std, beta, rng):
        _, (metrics, _) = elbo_loss(
            model, params, batch_stats, rng, coeffs, std, config, beta, False
        )
        return metrics

    return eval_step
