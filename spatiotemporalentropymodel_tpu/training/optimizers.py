"""Main/aux optimizer split.

Parity: configure_optimizers (root utils.py:104-135 of the reference and its
duplicate in compressai_examples/train.py:85-116): the auxiliary Adam trains
only parameters named ``quantiles`` (the EntropyBottleneck tail trackers); the
main Adam trains everything else. Implemented as two optax.masked transforms
over one param pytree — functional, shardable, no parameter-set surgery.
"""

from typing import NamedTuple

import jax
import optax


def _is_quantiles(path) -> bool:
    return any(getattr(k, "key", None) == "quantiles" for k in path)


def quantiles_mask(params):
    """Pytree of bools: True on every `quantiles` leaf."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _is_quantiles(path), params
    )


def main_mask(params):
    return jax.tree_util.tree_map_with_path(
        lambda path, _: not _is_quantiles(path), params
    )


class OptimizerPair(NamedTuple):
    main: optax.GradientTransformation
    aux: optax.GradientTransformation


def configure_optimizers(
    params,
    learning_rate: float = 1e-4,
    aux_learning_rate: float = 1e-3,
    max_grad_norm: float = 1.0,
) -> OptimizerPair:
    """Build (main, aux) optimizers with the reference's split and the
    trainSTEM grad clip (trainSTEM.py:213-214).

    Both transforms accept the FULL gradient pytree; masking zeroes the other
    partition's updates, so a single train step can apply both. The main Adam
    is wrapped in ``inject_hyperparams`` so the learning rate is runtime state
    (required by the plateau schedule — see :func:`set_main_learning_rate`).
    """
    main = optax.masked(
        optax.chain(
            optax.clip_by_global_norm(max_grad_norm),
            optax.inject_hyperparams(optax.adam)(learning_rate=learning_rate),
        ),
        main_mask(params),
    )
    aux = optax.masked(optax.adam(aux_learning_rate), quantiles_mask(params))
    return OptimizerPair(main=main, aux=aux)


def set_main_learning_rate(main_opt_state, learning_rate: float):
    """Return a main-optimizer state with the injected Adam LR replaced."""
    import jax.numpy as jnp

    clip_state, inject_state = main_opt_state.inner_state
    hp = dict(inject_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(learning_rate, jnp.float32)
    inject_state = inject_state._replace(hyperparams=hp)
    return main_opt_state._replace(inner_state=(clip_state, inject_state))


def get_main_learning_rate(main_opt_state) -> float:
    _, inject_state = main_opt_state.inner_state
    return float(inject_state.hyperparams["learning_rate"])


class MovingAverage:
    """Windowed running mean (root utils.py:77-94 parity; used by the joint
    training recipes to smooth loss scales)."""

    def __init__(self, size: int):
        from collections import deque

        self.queue = deque()
        self.max_size = size

    def next(self, val: float) -> float:
        self.queue.append(val)
        if len(self.queue) > self.max_size:
            self.queue.popleft()
        return float(sum(self.queue)) / len(self.queue)


class ReduceLROnPlateau:
    """Host-side LR schedule mirroring torch.optim.lr_scheduler.ReduceLROnPlateau
    as used by trainSTEM.py:123 (mode='min', default patience/factor).

    Emits a scale factor consumed via optax.scale_by_learning_rate(lr * scale)
    — in practice we rebuild the optimizer on change, or inject via
    optax.inject_hyperparams; here the train loop multiplies the base lr.
    """

    def __init__(self, factor: float = 0.1, patience: int = 10,
                 threshold: float = 1e-4):
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.best = float("inf")
        self.num_bad = 0
        self.scale = 1.0

    def step(self, metric: float) -> float:
        if metric < self.best * (1 - self.threshold):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.scale *= self.factor
                self.num_bad = 0
        return self.scale

    def state_dict(self):
        return {
            "best": self.best,
            "num_bad": self.num_bad,
            "scale": self.scale,
        }

    def load_state_dict(self, state):
        self.best = state["best"]
        self.num_bad = state["num_bad"]
        self.scale = state["scale"]
