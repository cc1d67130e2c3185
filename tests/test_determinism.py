"""Seeded-run determinism regression (the reference pins a golden training
log, compressai_tests/test_train.py:25-73; here: two identical seeded runs
must produce bit-identical metrics, and a changed seed must not)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatiotemporalentropymodel_tpu.models import STEMModule
from spatiotemporalentropymodel_tpu.parallel import (
    init_train_state,
    make_stem_train_step,
)
from spatiotemporalentropymodel_tpu.training import configure_optimizers


def _run(seed: int, steps: int = 3):
    module = STEMModule(variant="res", entropy_bottleneck_channels=8,
                        in_channels=8)
    rng = jax.random.PRNGKey(seed)
    batch = jax.random.normal(rng, (2, 3, 8, 8, 8))
    params = module.init(
        {"params": rng, "noise": rng}, batch[:, 1], batch[:, 0], train=True
    )["params"]
    optimizers = configure_optimizers(params)
    step = jax.jit(make_stem_train_step(module, optimizers))
    state = init_train_state(params, optimizers)
    losses = []
    for i in range(steps):
        state, metrics = step(state, batch, jax.random.PRNGKey(seed + i + 1))
        losses.append(float(metrics["loss"]))
    return losses


def test_same_seed_identical():
    assert _run(0) == _run(0)


def test_different_seed_differs():
    assert _run(0) != _run(7)
