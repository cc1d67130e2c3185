"""Jitted train steps: image codecs and STEM sequence training, data-parallel.

Replaces the reference's single-device Python loops (stem/trainSTEM.py:164-262,
compressai_examples/train.py:119-175) with pure jitted steps:

  * the per-frame recurrence is a ``lax.scan`` with a stop-gradient carry
    (matching ``stem(y_cur, y_condition.detach())``, trainSTEM.py:199-209),
  * main and aux gradients are computed in the same step and applied through
    the masked optimizer pair (utils.py:104-135 split),
  * data parallelism: jit with the batch sharded over the mesh's "data" axis
    and params replicated — GSPMD inserts the gradient psums.
"""

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..training.losses import em_loss, rate_distortion_loss
from ..training.optimizers import OptimizerPair
from .mesh import batch_sharded, replicated


class TrainState(NamedTuple):
    params: Any
    main_opt_state: Any
    aux_opt_state: Any
    step: jnp.ndarray


def init_train_state(params, optimizers: OptimizerPair) -> TrainState:
    return TrainState(
        params=params,
        main_opt_state=optimizers.main.init(params),
        aux_opt_state=optimizers.aux.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def _apply_both(optimizers, state, g_main, g_aux):
    upd_main, main_st = optimizers.main.update(g_main, state.main_opt_state,
                                               state.params)
    params = optax.apply_updates(state.params, upd_main)
    upd_aux, aux_st = optimizers.aux.update(g_aux, state.aux_opt_state, params)
    params = optax.apply_updates(params, upd_aux)
    return TrainState(params, main_st, aux_st, state.step + 1)


def make_image_train_step(
    module,
    optimizers: OptimizerPair,
    lmbda: float = 1e-2,
) -> Callable:
    """Train step for an image codec: λ·255²·MSE + bpp, plus aux loss
    (compressai_examples/train.py:119-156)."""

    def loss_fn(params, x, rng):
        out = module.apply({"params": params}, x, train=True, rngs={"noise": rng})
        losses = rate_distortion_loss(out, x, lmbda)
        return losses["loss"], losses

    def aux_fn(params):
        return module.apply({"params": params}, method="aux_loss")

    def step(state: TrainState, batch, rng):
        (_, metrics), g_main = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        aux, g_aux = jax.value_and_grad(aux_fn)(state.params)
        metrics = dict(metrics, aux_loss=aux)
        return _apply_both(optimizers, state, g_main, g_aux), metrics

    return step


def make_stem_train_step(
    module,
    optimizers: OptimizerPair,
) -> Callable:
    """Train step for a STEM P-frame model over a latent sequence.

    batch: (B, T, h, w, M) latents (T >= 2); frame 0 is the *quantized*
    conditioning latent (used only as the initial carry — the reference's
    ``_, y_condition = getY(images[0])``) and frames 1..T-1 are *raw*
    latents used as coding targets (``y_cur, _ = getY(images[t])``,
    trainSTEM.py:199-207). The scan carry is the stop-gradiented
    previous reconstruction (trainSTEM.py:199-218); the per-sequence loss is
    the mean of per-frame EM losses and a single optimizer step is taken
    (the deferred-stepping recipe of train_stem_roi.py:628-631; the
    reference's per-frame stepping is the `per_frame` loop in
    training/train_stem.py).
    """

    def seq_loss(params, frames, rng):
        y_cond0 = frames[:, 0]
        xs = jnp.moveaxis(frames[:, 1:], 1, 0)  # (T-1, B, h, w, M)
        keys = jax.random.split(rng, xs.shape[0])

        def body(carry, inputs):
            y_cond = carry
            y_cur, key = inputs
            out = module.apply(
                {"params": params},
                y_cur,
                jax.lax.stop_gradient(y_cond),
                train=True,
                rngs={"noise": key},
            )
            losses = em_loss(out, y_cur)
            return out["y_hat"], (losses["loss"], losses["y_bpp_loss"],
                                  losses["z_bpp_loss"])

        _, (loss, y_bpp, z_bpp) = jax.lax.scan(body, y_cond0, (xs, keys))
        return jnp.mean(loss), {
            "loss": jnp.mean(loss),
            "y_bpp_loss": jnp.mean(y_bpp),
            "z_bpp_loss": jnp.mean(z_bpp),
        }

    def aux_fn(params):
        return module.apply({"params": params}, method="aux_loss")

    def step(state: TrainState, batch, rng):
        (_, metrics), g_main = jax.value_and_grad(seq_loss, has_aux=True)(
            state.params, batch, rng
        )
        aux, g_aux = jax.value_and_grad(aux_fn)(state.params)
        metrics = dict(metrics, aux_loss=aux)
        return _apply_both(optimizers, state, g_main, g_aux), metrics

    return step


def make_stem_eval_step(module) -> Callable:
    """Deterministic eval loss over a latent sequence (validation loop of
    trainSTEM.py:265-295): mean per-frame EM loss, dequantize quantization."""

    def step(params, frames):
        y_cond0 = frames[:, 0]
        xs = jnp.moveaxis(frames[:, 1:], 1, 0)

        def body(carry, y_cur):
            out = module.apply(
                {"params": params}, y_cur, carry, train=False
            )
            losses = em_loss(out, y_cur)
            return out["y_hat"], losses["loss"]

        _, losses = jax.lax.scan(body, y_cond0, xs)
        return jnp.mean(losses)

    return step


def make_stem_frame_step(
    module,
    optimizers: OptimizerPair,
) -> Callable:
    """Single-P-frame train step with per-frame optimizer stepping — the
    faithful trainSTEM recipe (trainSTEM.py:199-218: one grad step per frame,
    stop-gradient carry). Returns (state, metrics, y_hat) so the caller loops
    frames carrying y_hat.
    """

    def loss_fn(params, y_cur, y_cond, rng):
        out = module.apply(
            {"params": params},
            y_cur,
            jax.lax.stop_gradient(y_cond),
            train=True,
            rngs={"noise": rng},
        )
        losses = em_loss(out, y_cur)
        return losses["loss"], (losses, out["y_hat"])

    def aux_fn(params):
        return module.apply({"params": params}, method="aux_loss")

    def step(state: TrainState, y_cur, y_cond, rng):
        (_, (metrics, y_hat)), g_main = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, y_cur, y_cond, rng)
        aux, g_aux = jax.value_and_grad(aux_fn)(state.params)
        metrics = dict(metrics, aux_loss=aux)
        return _apply_both(optimizers, state, g_main, g_aux), metrics, y_hat

    return step


def data_parallel_step(step_fn: Callable, mesh) -> Callable:
    """Shard a (state, batch, rng) -> (state, metrics) step over the mesh:
    batch on the "data" axis, everything else replicated."""
    repl = replicated(mesh)
    data = batch_sharded(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
