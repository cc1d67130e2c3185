"""Lower-bound op with the pass-through gradient rule.

Equivalent capability to the reference's ``LowerBound`` autograd Function
(compressai/ops/bound_ops.py:19-53): forward is ``max(x, bound)``; the backward
passes the incoming gradient iff ``x >= bound`` OR the gradient would push ``x``
upward (``grad_output < 0``). Implemented as a ``jax.custom_vjp`` so it works
under jit/vmap/grad with no Python control flow.
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def lower_bound(x, bound: float):
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound: float):
    return jnp.maximum(x, bound), x


def _lower_bound_bwd(bound: float, x, g):
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0),)


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


def upper_bound(x, bound: float):
    """Symmetric counterpart: min(x, bound) with pass-through-if rule."""
    return -lower_bound(-x, -bound)
