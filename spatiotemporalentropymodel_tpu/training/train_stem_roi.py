"""Joint I+P training: single-rate baseline and variable-rate ROI recipes.

Parity: stem_roi/train_stem_roi.py —
  * mode="baseline" (:109-391): mbt2018-mean I-codec + stem_baselinev2 P-codec,
    RateDistortionLoss at one λ;
  * mode="roi" (:394-716): stem_roi_i + stem_roi with a synthesized Qmap and
    PixelwiseRateDistortionLoss (λ-map = quality2lambda(Qmap)).

Both recipes condition each P-frame on the previous *reconstruction* without
detaching (:548-550) and accumulate gradients over the septuplet with a single
optimizer step (deferred stepping, :628-631), skipping frames whose loss is
NaN/Inf/> threshold (:526-529, 554-557; a bad frame *breaks* the GOP — later
frames contribute nothing).

JAX formulation: per-frame gradients are taken inside one jitted step with the
history rematerialized (the cost torch pays via retain_graph), masked by the
running validity flag, and summed — numerically the reference's accumulated
backwards. ``guard="none"`` switches to a single whole-sequence gradient
(fastest; use when training is stable).
"""

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import StemBaselineModule, StemROIModule
from ..models.priors import MeanScaleHyperpriorModule
from ..parallel import TrainState, init_train_state
from ..training.losses import (
    pixelwise_rate_distortion_loss,
    quality2lambda,
    rate_distortion_loss,
)
from ..utils.config import TrainStemRoiConfig
from .checkpoints import CheckpointManager
from .logging import MetricsLogger
from .optimizers import configure_optimizers


def _tree_add(a, b):
    return jax.tree_util.tree_map(jnp.add, a, b)


def _tree_scale(tree, s):
    return jax.tree_util.tree_map(lambda x: x * s, tree)


def _sanitize(tree):
    return jax.tree_util.tree_map(jnp.nan_to_num, tree)


def make_joint_sequence_step(
    i_module,
    p_module,
    optimizers_i,
    optimizers_p,
    mode: str = "roi",
    loss_threshold: float = 3.0,
    guard: str = "per_frame",
    lmbda: float = 1e-2,
):
    """(state_i, state_p, frames (B,T,H,W,3), qmap (B,H,W,1), rng) →
    (state_i, state_p, metrics). ``lmbda`` applies in baseline (single-rate)
    mode; ROI mode derives the λ-map from the Qmap."""

    use_qmap = mode == "roi"

    def run_sequence(params_i, params_p, frames, qmap, rng, upto: int):
        """Losses of frames 0..upto with the reconstruction carry."""
        keys = jax.random.split(rng, frames.shape[1] + 1)
        lmbdamap = quality2lambda(qmap) if use_qmap else None

        if use_qmap:
            out_i = i_module.apply(
                {"params": params_i}, frames[:, 0], qmap, train=True,
                rngs={"noise": keys[0]},
            )
            li = pixelwise_rate_distortion_loss(out_i, frames[:, 0], lmbdamap)
        else:
            out_i = i_module.apply(
                {"params": params_i}, frames[:, 0], train=True,
                rngs={"noise": keys[0]},
            )
            li = rate_distortion_loss(out_i, frames[:, 0], lmbda)
        losses = [li]
        x_cond = out_i["x_hat"]
        for t in range(1, upto + 1):
            args = (frames[:, t], x_cond, qmap) if use_qmap else (
                frames[:, t], x_cond)
            out_p = p_module.apply(
                {"params": params_p}, *args, train=True,
                rngs={"noise": keys[t]},
            )
            if use_qmap:
                lp = pixelwise_rate_distortion_loss(out_p, frames[:, t], lmbdamap)
            else:
                lp = rate_distortion_loss(out_p, frames[:, t], lmbda)
            losses.append(lp)
            x_cond = out_p["x_hat"]
        return losses

    def frame_loss(params_i, params_p, frames, qmap, rng, t):
        losses = run_sequence(params_i, params_p, frames, qmap, rng, t)
        return losses[t]["loss"], losses[t]

    def aux_i(params_i):
        return i_module.apply({"params": params_i}, method="aux_loss")

    def aux_p(params_p):
        return p_module.apply({"params": params_p}, method="aux_loss")

    def step(state_i: TrainState, state_p: TrainState, frames, qmap, rng):
        T = frames.shape[1]
        zero_i = _tree_scale(state_i.params, 0.0)
        zero_p = _tree_scale(state_p.params, 0.0)
        g_i, g_p = zero_i, zero_p
        valid = jnp.float32(1.0)
        metrics = {}

        if guard == "per_frame":
            for t in range(T):
                (lt, lt_all), (gt_i, gt_p) = jax.value_and_grad(
                    frame_loss, argnums=(0, 1), has_aux=True
                )(state_i.params, state_p.params, frames, qmap, rng, t)
                ok = jnp.isfinite(lt) & (lt <= loss_threshold)
                valid = valid * ok.astype(jnp.float32)
                g_i = _tree_add(g_i, _tree_scale(_sanitize(gt_i), valid))
                g_p = _tree_add(g_p, _tree_scale(_sanitize(gt_p), valid))
                if t == T - 1:
                    metrics = {
                        "loss": lt,
                        "bpp_loss": lt_all["bpp_loss"],
                        "mse_loss": lt_all["mse_loss"],
                        "valid_frames": valid * T,
                    }
        else:
            def total(params_i, params_p):
                losses = run_sequence(params_i, params_p, frames, qmap, rng,
                                      T - 1)
                tot = sum(l["loss"] for l in losses)
                return tot, losses[-1]

            (tot, last), (g_i, g_p) = jax.value_and_grad(
                total, argnums=(0, 1), has_aux=True
            )(state_i.params, state_p.params)
            metrics = {
                "loss": last["loss"],
                "bpp_loss": last["bpp_loss"],
                "mse_loss": last["mse_loss"],
                "total_loss": tot,
            }

        _, ga_i = jax.value_and_grad(aux_i)(state_i.params)
        _, ga_p = jax.value_and_grad(aux_p)(state_p.params)

        from ..parallel.train_step import _apply_both

        state_i = _apply_both(optimizers_i, state_i, g_i, ga_i)
        state_p = _apply_both(optimizers_p, state_p, g_p, ga_p)
        return state_i, state_p, metrics

    return step


EVAL_LEVELS = (0, 25, 50, 75, 100)  # train_stem_roi.py:452-457


def make_joint_eval_step(i_module, p_module, mode: str = "roi"):
    """Deterministic joint eval loss at a fixed uniform Qmap level
    (the reference's 5-level validation, train_stem_roi.py:658-716)."""

    use_qmap = mode == "roi"

    def step(params_i, params_p, frames, qmap):
        lmbdamap = quality2lambda(qmap) if use_qmap else None
        if use_qmap:
            out_i = i_module.apply({"params": params_i}, frames[:, 0], qmap,
                                   train=False)
            total = pixelwise_rate_distortion_loss(
                out_i, frames[:, 0], lmbdamap
            )["loss"]
        else:
            out_i = i_module.apply({"params": params_i}, frames[:, 0],
                                   train=False)
            total = rate_distortion_loss(out_i, frames[:, 0])["loss"]
        x_cond = out_i["x_hat"]
        for t in range(1, frames.shape[1]):
            args = (frames[:, t], x_cond, qmap) if use_qmap else (
                frames[:, t], x_cond)
            out_p = p_module.apply({"params": params_p}, *args, train=False)
            if use_qmap:
                total += pixelwise_rate_distortion_loss(
                    out_p, frames[:, t], lmbdamap
                )["loss"]
            else:
                total += rate_distortion_loss(out_p, frames[:, t])["loss"]
            x_cond = out_p["x_hat"]
        return total / frames.shape[1]

    return step


def train_stem_roi(config: TrainStemRoiConfig, max_steps: Optional[int] = None):
    rng = jax.random.PRNGKey(config.seed)
    ebc, m = config.entropy_bottleneck_channels, config.in_channels
    cs = config.cropsize

    if config.mode == "roi":
        i_module = StemROIModule(ebc, m, conditional=False, decoder_sft=True)
        p_module = StemROIModule(ebc, m, conditional=True, decoder_sft=True)
    else:
        i_module = MeanScaleHyperpriorModule(128, 192)
        p_module = StemBaselineModule(ebc, m, separate_condition_encoder=True)

    x = jnp.zeros((1, cs, cs, 3))
    q = jnp.zeros((1, cs, cs, 1))
    rng, k1, k2 = jax.random.split(rng, 3)
    if config.mode == "roi":
        params_i = i_module.init({"params": k1, "noise": k1}, x, q, train=True)[
            "params"
        ]
        params_p = p_module.init({"params": k2, "noise": k2}, x, x, q,
                                 train=True)["params"]
    else:
        params_i = i_module.init({"params": k1, "noise": k1}, x, train=True)[
            "params"
        ]
        params_p = p_module.init({"params": k2, "noise": k2}, x, x, train=True)[
            "params"
        ]

    opt_i = configure_optimizers(params_i, config.learning_rate,
                                 config.aux_learning_rate, config.clip_max_norm)
    opt_p = configure_optimizers(params_p, config.learning_rate,
                                 config.aux_learning_rate, config.clip_max_norm)
    state_i = init_train_state(params_i, opt_i)
    state_p = init_train_state(params_p, opt_p)

    step = make_joint_sequence_step(
        i_module, p_module, opt_i, opt_p, mode=config.mode,
        loss_threshold=config.loss_skip_threshold, lmbda=config.lmbda,
    )
    step_jit = jax.jit(step)

    logger = MetricsLogger(config.workdir)
    ckpt = CheckpointManager(os.path.join(config.workdir, "ckpt"), "stem_roi")

    import random as pyrandom_mod

    from ..data import VimeoSepTuplet, batch_iterator, synthesize_qmap

    pyrandom = pyrandom_mod.Random(config.seed)
    if config.data_root:
        dataset = VimeoSepTuplet(config.data_root, True, cs, rng=pyrandom)
        batches = batch_iterator(dataset, config.batch_size, seed=config.seed)
    else:
        nprng = np.random.default_rng(config.seed)

        def synth():
            while True:
                yield nprng.random((config.batch_size, 3, cs, cs, 3), np.float32)

        batches = synth()

    eval_step = jax.jit(make_joint_eval_step(i_module, p_module, config.mode))

    def validate(eval_batch) -> dict:
        """Per-level eval losses at the reference's 5 uniform Qmap levels."""
        out = {}
        for level in EVAL_LEVELS:
            q = jnp.full((eval_batch.shape[0], cs, cs, 1), level / 100.0)
            out[f"eval_loss_l{level}"] = float(
                eval_step(state_i.params, state_p.params,
                          jnp.asarray(eval_batch), q)
            )
        return out

    total = max_steps if max_steps is not None else (
        config.epochs * (config.steps_per_epoch or 10**9)
    )
    iteration = 0
    metrics = {}
    eval_batch = None
    for batch in batches:
        if iteration >= total:
            break
        if eval_batch is None:
            eval_batch = np.asarray(batch)  # held-out-ish fixed probe batch
        qmap = np.stack(
            [synthesize_qmap(cs, rng=pyrandom) for _ in range(batch.shape[0])]
        )
        rng, k = jax.random.split(rng)
        state_i, state_p, metrics = step_jit(
            state_i, state_p, jnp.asarray(batch), jnp.asarray(qmap), k
        )
        iteration += 1
        if iteration % 100 == 0:
            logger.log(iteration, **{k_: float(v) for k_, v in metrics.items()})
        if iteration % 10000 == 0 and eval_batch is not None:
            logger.log(iteration, **validate(eval_batch))

    ckpt.save(
        {
            "train_state_i": tuple(state_i),
            "train_state_p": tuple(state_p),
            "counters": {"iteration": np.asarray(iteration)},
        },
        metric=float(metrics.get("loss", np.inf)),
    )
    logger.close()
    return (state_i, state_p), metrics


def main(argv=None):
    from ..utils.config import parse_config

    train_stem_roi(parse_config(TrainStemRoiConfig, argv))


if __name__ == "__main__":
    main()
