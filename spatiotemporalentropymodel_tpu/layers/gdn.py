"""Generalized Divisive Normalization, NHWC / MXU-friendly.

Parity: compressai/layers/gdn.py:22-96. The reference computes
``norm = conv1x1(x**2, gamma) + beta`` then ``x * rsqrt(norm)`` (or
``x * sqrt(norm)`` for IGDN). A 1x1 conv over channels is a plain matmul in
NHWC, which XLA maps straight onto the MXU — so GDN here is
``einsum('...i,io->...o')`` on x², with the norm computed in float32 even for
bf16 activations (rsqrt of small sums is precision-sensitive).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.parametrizers import NonNegativeParametrizer


class GDN(nn.Module):
    """y[o] = x[o] / sqrt(beta[o] + sum_i gamma[o,i] * x[i]^2)  (inverse: *sqrt).

    On TPU the forward runs as the fused Pallas kernel
    (ops/pallas_kernels.gdn_fused): one VMEM pass for x², the channel matmul
    (MXU), the (r)sqrt and the scale — no HBM intermediates.
    """

    channels: int
    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1

    @nn.compact
    def __call__(self, x, return_weights: bool = False):
        c = self.channels
        beta_reparam = NonNegativeParametrizer(minimum=self.beta_min)
        gamma_reparam = NonNegativeParametrizer()

        # Parameters stored in sqrt space; gamma is (out, in) like the torch
        # conv weight (so checkpoint conversion is copy-through).
        beta = self.param("beta", lambda _: beta_reparam.init(jnp.ones((c,))))
        gamma = self.param(
            "gamma", lambda _: gamma_reparam.init(self.gamma_init * jnp.eye(c))
        )

        beta_v = beta_reparam(beta)
        gamma_v = gamma_reparam(gamma)
        if return_weights:  # for fused consumers (Sequential's IGDN→deconv
            return beta_v, gamma_v  # peephole); params identical either way

        from ..ops import pallas_kernels as pk

        out = pk.gdn_fused(x, gamma_v.T, beta_v, self.inverse, False)
        return out.astype(x.dtype)


class GDN1(nn.Module):
    """Simplified GDN: |x| instead of x², no sqrt (gdn.py:70-96)."""

    channels: int
    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1

    @nn.compact
    def __call__(self, x):
        c = self.channels
        beta_reparam = NonNegativeParametrizer(minimum=self.beta_min)
        gamma_reparam = NonNegativeParametrizer()
        beta = self.param("beta", lambda _: beta_reparam.init(jnp.ones((c,))))
        gamma = self.param(
            "gamma", lambda _: gamma_reparam.init(self.gamma_init * jnp.eye(c))
        )
        beta_v = beta_reparam(beta)
        gamma_v = gamma_reparam(gamma)

        x32 = x.astype(jnp.float32)
        norm = jnp.einsum("...i,oi->...o", jnp.abs(x32), gamma_v) + beta_v
        if not self.inverse:
            norm = 1.0 / norm
        return (x32 * norm).astype(x.dtype)
