"""Image-codec training loop (compressai_examples/train.py:119-399 parity).

RD loss (λ·255²·MSE + bpp), main/aux Adam split, grad clip, periodic test
epoch, best-checkpoint on eval loss. Synthetic data when data_root is None
(the reference's seeded 1-image fake-dataset regression, test_train.py).
"""

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import ImageFolder, batch_iterator
from ..parallel import (
    data_parallel_step,
    init_train_state,
    make_image_train_step,
    make_mesh,
    replicate,
    shard_batch,
)
from ..utils.config import TrainImageConfig
from ..zoo import create_model
from .checkpoints import CheckpointManager
from .logging import MetricsLogger
from .optimizers import configure_optimizers


def _synthetic_batches(config, seed=0):
    rng = np.random.default_rng(seed)
    while True:
        yield rng.random(
            (config.batch_size, config.cropsize, config.cropsize, 3), np.float32
        )


def train_image(config: TrainImageConfig, max_steps: Optional[int] = None,
                model=None):
    """`model`: optional pre-built CompressionModel (overrides the zoo
    lookup — e.g. CPU-sized nets for the RD-sweep artifact tooling)."""
    rng = jax.random.PRNGKey(config.seed)

    if model is None:
        model = create_model(config.model, config.quality)
    example = jnp.zeros((1, config.cropsize, config.cropsize, 3))
    if model.params is None:
        model.init(example)
    # else: warm start — a pre-built model with loaded params fine-tunes
    # from them (tools/bakeoff.py hero --i-init, the low-rate RD recipe)
    params = model.params
    module = model.module

    optimizers = configure_optimizers(
        params, config.learning_rate, config.aux_learning_rate,
        config.clip_max_norm,
    )
    state = init_train_state(params, optimizers)
    step = make_image_train_step(module, optimizers, config.lmbda)
    if config.data_parallel:
        mesh = make_mesh()
        step = data_parallel_step(step, mesh)
        state = replicate(state, mesh)
    else:
        mesh = None
        step = jax.jit(step, donate_argnums=(0,))

    if config.data_root:
        dataset = ImageFolder(config.data_root, "train", config.cropsize)
        batches = batch_iterator(dataset, config.batch_size, seed=config.seed)
    else:
        batches = _synthetic_batches(config, config.seed)

    logger = MetricsLogger(config.workdir)
    ckpt = CheckpointManager(os.path.join(config.workdir, "ckpt"), "image")

    total = max_steps if max_steps is not None else (
        config.epochs * (config.steps_per_epoch or 10**9)
    )
    iteration = 0
    metrics = {}
    for batch in batches:
        if iteration >= total:
            break
        rng, k = jax.random.split(rng)
        x = jnp.asarray(batch)
        if mesh is not None:
            x = shard_batch(x, mesh)
        state, metrics = step(state, x, k)
        iteration += 1
        if iteration % 100 == 0:
            logger.log(iteration, **{k_: float(v) for k_, v in metrics.items()})

    ckpt.save(
        {
            "train_state": tuple(state),
            "counters": {"iteration": np.asarray(iteration)},
        },
        metric=float(metrics.get("loss", np.inf)),
    )
    logger.close()
    model.params = state.params if mesh is None else jax.device_get(
        state.params
    )
    return state, metrics


def main(argv=None):
    from ..utils.config import parse_config

    train_image(parse_config(TrainImageConfig, argv))


if __name__ == "__main__":
    main()
