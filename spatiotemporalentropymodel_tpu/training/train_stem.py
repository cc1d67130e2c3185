"""STEM single-rate training loop (stem/trainSTEM.py:100-295 parity).

Recipe: frozen pretrained I-frame model provides latents via getY; the STEM
entropy model trains with the rate-only EMLoss; frame 0 conditions frame 1..k
with a stop-gradient carry; random temporal subsampling per batch
(trainSTEM.py:176-182); main/aux Adam split with grad clip; plateau LR
schedule; best-checkpoint bookkeeping every ``eval_every`` iterations.

``step_mode="per_frame"`` is the faithful per-frame optimizer stepping;
``"per_sequence"`` uses the fused lax.scan step (one update per septuplet —
the deferred recipe of train_stem_roi.py:628-631) which is the TPU-efficient
default for data-parallel runs.

Runs on synthetic data when ``config.data_root`` is None (the reference's
fake-backend testing strategy, compressai_tests/test_train.py).
"""

import os
import random
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import VimeoSepTuplet, batch_iterator, subsample_frames
from ..models import STEMModule
from ..parallel import (
    TrainState,
    data_parallel_step,
    init_train_state,
    make_mesh,
    make_stem_eval_step,
    make_stem_frame_step,
    make_stem_train_step,
    replicate,
    shard_batch,
)
from ..utils.config import TrainStemConfig
from ..zoo import create_model
from .checkpoints import CheckpointManager
from .logging import MetricsLogger
from .optimizers import (
    ReduceLROnPlateau,
    configure_optimizers,
    set_main_learning_rate,
)


def _synthetic_batches(config, rng_seed=0) -> Iterator[np.ndarray]:
    rng = np.random.default_rng(rng_seed)
    while True:
        yield rng.random(
            (config.batch_size, 7, config.cropsize, config.cropsize, 3),
            np.float32,
        )


def build_i_model(config):
    """Frozen I-frame codec; getY provides latents (trainSTEM.py:104-121)."""
    model = create_model(config.i_model, config.i_quality)
    example = jnp.zeros((1, config.cropsize, config.cropsize, 3), jnp.float32)
    model.init(example)
    if config.i_checkpoint:
        from .checkpoints import load_checkpoint

        model.load_state_dict(load_checkpoint(config.i_checkpoint)["model"])
    return model


def latents_fn(i_model):
    """Jitted (B, T, H, W, 3) images → (B, T, h, w, M) latent sequences.

    Matches the reference's getY usage exactly (trainSTEM.py:199-207): the
    frame-0 conditioning carry is the *quantized* latent
    (``_, y_condition = getY(images[0])``) while P-frame coding targets are
    the *raw* latents (``y_cur, _ = getY(images[t])``). Frame 0 of the
    returned sequence is therefore the quantized latent and frames 1..T-1
    are raw — the train/eval steps use frame 0 only as the carry.
    """

    def fn(params, frames, rng, train):
        b, t = frames.shape[0], frames.shape[1]
        flat = frames.reshape((b * t,) + frames.shape[2:])
        y, y_q = i_model.module.apply(
            {"params": params}, flat, train=train, method="get_y",
            rngs={"noise": rng},
        )
        y = y.reshape((b, t) + y.shape[1:])
        y_q = y_q.reshape((b, t) + y_q.shape[1:])
        return jnp.concatenate([y_q[:, :1], y[:, 1:]], axis=1)

    return jax.jit(fn, static_argnums=(3,))


def train_stem(config: TrainStemConfig, max_steps: Optional[int] = None,
               i_model=None, module=None):
    """Run training; returns (state, final metrics). max_steps for tests.
    `i_model`: optional pre-built frozen I-frame codec (overrides the zoo
    lookup — e.g. a just-trained CPU-sized model in the RD-sweep tooling).
    `module`: optional flax module overriding the STEMModule build — any
    P-frame entropy module with the (y_cur, y_cond, train) call signature
    and {"y_hat", "likelihoods"} output rides the same harness (e.g.
    charm's ChannelARSTEMModule in tools/bakeoff.py)."""
    rng = jax.random.PRNGKey(config.seed)
    pyrandom = random.Random(config.seed)

    if i_model is None:
        i_model = build_i_model(config)
    get_latents = latents_fn(i_model)

    stem = module if module is not None else STEMModule(
        variant=config.variant,
        entropy_bottleneck_channels=config.entropy_bottleneck_channels,
        in_channels=config.in_channels,
    )

    # init stem params from one latent batch
    dummy = jnp.zeros(
        (1, config.cropsize // 16, config.cropsize // 16, config.in_channels)
    )
    rng, k = jax.random.split(rng)
    params = stem.init({"params": k, "noise": k}, dummy, dummy, train=True)[
        "params"
    ]

    optimizers = configure_optimizers(
        params, config.learning_rate, config.aux_learning_rate,
        config.clip_max_norm,
    )
    state = init_train_state(params, optimizers)

    if config.step_mode == "per_sequence":
        seq_step = make_stem_train_step(stem, optimizers)
        if config.data_parallel:
            mesh = make_mesh()
            seq_step = data_parallel_step(seq_step, mesh)
            state = replicate(state, mesh)
        else:
            mesh = None
            seq_step = jax.jit(seq_step, donate_argnums=(0,))
        frame_step = None
    else:
        frame_step = jax.jit(make_stem_frame_step(stem, optimizers))
        seq_step = mesh = None

    if config.data_root:
        dataset = VimeoSepTuplet(config.data_root, True, config.cropsize,
                                 rng=pyrandom)
        batches = batch_iterator(dataset, config.batch_size, seed=config.seed)
        eval_dataset = VimeoSepTuplet(config.data_root, False, config.cropsize)
        eval_batches = lambda: batch_iterator(  # noqa: E731
            eval_dataset, config.batch_size, shuffle=False, epochs=1
        )
    else:
        batches = _synthetic_batches(config, config.seed)
        eval_batches = lambda: iter(  # noqa: E731
            [next(_synthetic_batches(config, config.seed + 10**6))]
        )

    eval_step = jax.jit(make_stem_eval_step(stem))

    def validate(params, rng, max_batches: int = 4) -> float:
        total, n = 0.0, 0
        for eb in eval_batches():
            if n >= max_batches:
                break
            rng, k = jax.random.split(rng)
            lat = get_latents(
                i_model.params, jnp.asarray(np.asarray(eb)), k, False
            )
            total += float(eval_step(params, lat))
            n += 1
        return total / max(n, 1)

    logger = MetricsLogger(config.workdir)
    ckpt = CheckpointManager(os.path.join(config.workdir, "ckpt"), "stem")
    scheduler = ReduceLROnPlateau()

    iteration = 0
    metrics = {}
    if config.resume:
        restored = ckpt.restore_latest()
        if restored is not None:
            state = TrainState(*restored["train_state"])
            iteration = int(restored["counters"]["iteration"])
            scheduler.load_state_dict(
                jax.tree_util.tree_map(float, restored["scheduler"])
            )

    total = max_steps if max_steps is not None else (
        config.epochs * (config.steps_per_epoch or 10**9)
    )

    for batch in batches:
        if iteration >= total:
            break
        batch = subsample_frames(np.asarray(batch), pyrandom)
        rng, k_lat, k_step = jax.random.split(rng, 3)
        latents = get_latents(i_model.params, jnp.asarray(batch), k_lat, True)

        if config.step_mode == "per_sequence":
            if mesh is not None:
                latents = shard_batch(latents, mesh)
            state, metrics = seq_step(state, latents, k_step)
        else:
            # faithful per-frame stepping with a detached carry
            y_cond = latents[:, 0]
            for t in range(1, latents.shape[1]):
                rng, k_f = jax.random.split(rng)
                state, metrics, y_cond = frame_step(
                    state, latents[:, t], y_cond, k_f
                )
        iteration += 1

        if iteration % 100 == 0:
            logger.log(iteration, **{k: float(v) for k, v in metrics.items()})
        if iteration % max(1, config.eval_every) == 0 or iteration >= total:
            rng, k_eval = jax.random.split(rng)
            loss = validate(state.params, k_eval)
            logger.log(iteration, eval_loss=loss)
            scale = scheduler.step(loss)
            state = state._replace(
                main_opt_state=set_main_learning_rate(
                    state.main_opt_state, config.learning_rate * scale
                )
            )
            ckpt.save(
                {
                    "train_state": tuple(state),
                    "counters": {"iteration": np.asarray(iteration)},
                    "scheduler": scheduler.state_dict(),
                },
                metric=loss,
            )

    logger.close()
    return state, metrics


def main(argv=None):
    from ..utils.config import parse_config

    config = parse_config(TrainStemConfig, argv)
    train_stem(config)


if __name__ == "__main__":
    main()
