"""The jitted, mesh-sharded training step.

TPU-native counterpart of the reference's estimator ``model_fn`` body
(SURVEY.md §3.1): the entire step — normalize, forward, target creation,
losses, L2, backward, optimizer update, BN stat update — is ONE compiled XLA
program under ``jax.jit`` over the mesh. The batch is sharded on the ``data``
axis, state is replicated, and SPMD partitioning inserts the gradient
all-reduce over ICI automatically. The train state buffer is donated so the
optimizer update happens in place (no 2x param memory).
"""

from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ssd_tpu.config import Config
from ssd_tpu.models.detector import Detector
from ssd_tpu.parallel import mesh as mesh_lib


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jnp.ndarray
    # Exponential moving average of params (None unless train.ema_decay>0).
    # Evaluation/export prefer these when present — standard detection-
    # training practice the reference lacks.
    ema_params: Any = None


def make_lr_schedule(cfg: Config) -> optax.Schedule:
    t = cfg.train
    if t.lr_schedule == "cosine":
        main = optax.cosine_decay_schedule(
            t.learning_rate, max(t.num_steps - t.warmup_steps, 1)
        )
    elif t.lr_schedule == "piecewise":
        main = optax.piecewise_constant_schedule(
            t.learning_rate,
            {b: t.lr_rates[i + 1] / t.lr_rates[i]
             for i, b in enumerate(t.lr_boundaries)},
        )
    else:
        raise ValueError(f"unknown lr_schedule: {t.lr_schedule}")
    if t.warmup_steps > 0:
        warmup = optax.linear_schedule(0.0, t.learning_rate, t.warmup_steps)
        return optax.join_schedules([warmup, main], [t.warmup_steps])
    return main


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    t = cfg.train
    lr = make_lr_schedule(cfg)
    if t.optimizer == "momentum":
        opt = optax.sgd(lr, momentum=t.momentum, nesterov=True)
    elif t.optimizer == "adam":
        opt = optax.adam(lr)
    else:
        raise ValueError(f"unknown optimizer: {t.optimizer}")
    chain = [opt]
    if t.gradient_clip_norm > 0:
        chain = [optax.clip_by_global_norm(t.gradient_clip_norm)] + chain
    tx = optax.chain(*chain)
    if t.freeze:
        # Fine-tuning with frozen subtrees (the importer/warm-start
        # companion: bring pretrained weights in, train only the rest).
        # Gradients for frozen top-level modules are zeroed BEFORE the
        # optimizer, so moments never accumulate for them and the params
        # stay bit-identical. BN running statistics keep tracking the new
        # data distribution (usually wanted under domain shift; use
        # norm="group" to remove running stats entirely).
        frozen = {m.strip() for m in t.freeze.split(",") if m.strip()}

        def mask_fn(params):
            return {k: (jax.tree_util.tree_map(lambda _: k in frozen, v)
                        if isinstance(v, dict) else k in frozen)
                    for k, v in params.items()}

        tx = optax.chain(
            optax.masked(optax.set_to_zero(), mask_fn), tx)
    return tx


def create_train_state(detector: Detector, rng: jax.Array,
                       tx: optax.GradientTransformation,
                       ema_decay: float = 0.0) -> TrainState:
    init_rng, state_rng = jax.random.split(rng)
    variables = detector.init(init_rng)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        rng=state_rng,
        ema_params=jax.tree_util.tree_map(jnp.copy, params)
        if ema_decay > 0 else None,
    )


def inference_variables(state: TrainState) -> dict:
    """The variables evaluation/export should serve: EMA when tracked."""
    params = state.ema_params if state.ema_params is not None else state.params
    return {"params": params, "batch_stats": state.batch_stats}


def make_train_step(
    detector: Detector, tx: optax.GradientTransformation,
    ema_decay: float = 0.0, grad_accum_steps: int = 1,
    teacher=None,
) -> Callable[[TrainState, dict], tuple[TrainState, dict]]:
    """Returns ``(state, batch) -> (state, metrics)`` — pure, jit-ready.

    ``grad_accum_steps > 1``: the global batch is split into that many
    microbatches processed sequentially under ``lax.scan`` (activation
    memory drops ~1/accum), gradients are averaged, and ONE optimizer
    update is applied. Microbatches are STRIDED slices (``batch[a::n]``)
    so each stays evenly sharded over the full ``data`` mesh axis — a
    contiguous split would serialize the devices. Standard accumulation
    semantics: each microbatch uses its OWN loss normalizer
    (num_positives) and its own BN batch statistics, so the averaged
    gradient equals the full-batch gradient exactly when those agree
    (tested for a norm="group" model in test_train_step); BN running
    stats EMA-update once per microbatch.

    ``teacher``: optional ``(model, variables)`` pair for knowledge
    distillation — the teacher forward runs gradient-free inside the same
    compiled step; its variables enter the program as (replicated)
    constants, so no train-state or sharding plumbing changes.
    """

    def loss_fn(params, batch_stats, batch):
        variables = {"params": params, "batch_stats": batch_stats}
        total, (metrics, new_state) = detector.loss(
            variables, batch, train=True, teacher=teacher
        )
        return total, (metrics, new_state)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def full_batch_grads(state: TrainState, batch: dict):
        (_, (metrics, new_model_state)), grads = grad_fn(
            state.params, state.batch_stats, batch)
        return grads, metrics, new_model_state

    def accumulated_grads(state: TrainState, batch: dict):
        n = grad_accum_steps
        # (B, ...) -> (n, B//n, ...) microbatches, STRIDED on dim 0: the
        # reshape keeps the original batch sharding on the B//n dim, so
        # every microbatch spans the whole data axis.
        micro = jax.tree_util.tree_map(
            lambda x: jnp.moveaxis(
                x.reshape((x.shape[0] // n, n) + x.shape[1:]), 1, 0),
            batch,
        )
        first = jax.tree_util.tree_map(lambda x: x[0], micro)
        rest = jax.tree_util.tree_map(lambda x: x[1:], micro)

        # first microbatch seeds the carry structure (metrics pytree is
        # model-defined); the remaining n-1 run under scan
        (_, (metrics0, model_state0)), grads0 = grad_fn(
            state.params, state.batch_stats, first)

        def micro_step(carry, mb):
            batch_stats, gsum, msum = carry
            (_, (metrics, model_state)), grads = grad_fn(
                state.params, batch_stats, mb)
            gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
            msum = jax.tree_util.tree_map(jnp.add, msum, metrics)
            return (model_state.get("batch_stats", batch_stats),
                    gsum, msum), None

        (final_stats, gsum, msum), _ = jax.lax.scan(
            micro_step,
            (model_state0.get("batch_stats", state.batch_stats),
             grads0, dict(metrics0)),
            rest,
        )
        inv = 1.0 / n
        grads = jax.tree_util.tree_map(lambda g: g * inv, gsum)
        metrics = jax.tree_util.tree_map(lambda m: m * inv, msum)
        return grads, metrics, {"batch_stats": final_stats}

    def step_fn(state: TrainState, batch: dict):
        if grad_accum_steps > 1:
            grads, metrics, new_model_state = accumulated_grads(state, batch)
        else:
            grads, metrics, new_model_state = full_batch_grads(state, batch)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)

        new_ema = state.ema_params
        if new_ema is not None:
            d = jnp.float32(ema_decay)
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                new_ema, new_params,
            )

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_model_state.get("batch_stats", state.batch_stats),
            opt_state=new_opt_state,
            rng=jax.random.fold_in(state.rng, 1),
            ema_params=new_ema,
        )
        return new_state, metrics

    return step_fn


def jit_train_step(step_fn, mesh, state_shardings=None) -> Callable:
    """Shard the step over the mesh: batch on ``data``, state buffers donated.

    ``state_shardings`` is an optional sharding pytree for the TrainState
    (e.g. :func:`mesh.model_sharded` for channel-TP kernels); default is
    fully replicated state — pure DP.
    """
    repl = mesh_lib.replicated(mesh)
    data = mesh_lib.batch_sharding(mesh)
    state_s = repl if state_shardings is None else state_shardings
    return jax.jit(
        step_fn,
        in_shardings=(state_s, data),
        out_shardings=(state_s, repl),
        donate_argnums=(0,),
    )


def make_eval_step(detector: Detector) -> Callable:
    """Jittable predict step for evaluation: batch -> detections."""

    def eval_fn(state: TrainState, images):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        return detector.predict(variables, images)

    return eval_fn
