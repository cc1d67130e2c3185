"""Production video-codec pipeline: minimal-dispatch P-frame serving.

Remote/accelerator hosts pay a fixed RPC/launch cost per device dispatch
(tens of ms through a tunnel; ~10 µs locally, still worth batching). This
pipeline composes the I-model transforms and the STEM fused codec expressions
into the minimum number of jitted calls per frame:

  encode: ONE dispatch  (g_a → HE → EB-quantize → entropy params → symbol
                         planes, packed byte buffer out) + host rANS
  decode: TWO dispatches (params-from-ẑ; reconstruct → g_s) + host rANS

versus five-plus when calling the generic model APIs. The conditioning latent
stays device-resident across frames (GOP recurrence, stem/evalSTEM.py:93-153).
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..entropy import base as entropy_base


class StemVideoPipeline:
    """(i_model: MeanScaleHyperprior-like, stem: parallel STEM variant).

    Construct AFTER the models' final params and ``update()`` — the jitted
    stages capture both at build time; rebuild the pipeline if they change.
    """

    def __init__(self, i_model, stem):
        if stem.use_spm:
            raise ValueError(
                "StemVideoPipeline drives the parallel (non-SPM) codec path; "
                "use the model's wavefront codec for SPM variants"
            )
        self.i_model = i_model
        self.stem = stem
        stem._require_tables()

        def encode_fn(x, y_cond):
            y_cur = i_model._apply(x, method="analysis")[0]
            return y_cur, stem.fused_encode_expr(y_cur, y_cond)

        def analysis_fn(x):
            return i_model._apply(x, method="analysis")[0]

        def params_fn(z_sym, y_cond):
            return stem.fused_params_expr(z_sym, y_cond)

        def finish_fn(y_sym, means, y_cond):
            y_hat = stem.fused_reconstruct_expr(y_sym, means, y_cond)
            return y_hat, i_model._apply(y_hat, method="get_x")

        self._encode = jax.jit(encode_fn)
        self._analysis = jax.jit(analysis_fn)
        self._params = jax.jit(params_fn)
        self._finish = jax.jit(finish_fn)

    # -- encoder side ---------------------------------------------------------

    def encode_frame(self, x, y_cond) -> Tuple[dict, jnp.ndarray]:
        """x (B, H, W, 3) image, y_cond device-resident conditioning latent.

        Returns (enc dict with strings/shape, y_cur latent for carry use).
        One device dispatch + one packed download + host rANS.
        """
        y_cur, packed = self._encode(x, y_cond)
        packed = np.asarray(packed)

        b, hgt, wid, m = y_cur.shape
        zh, zw = hgt // 4, wid // 4
        zt = self.stem.tables["entropy_bottleneck"]
        zc = zt.rows
        ny = b * hgt * wid * m
        nz = b * zh * zw * zc
        y_sym = packed[: 2 * ny].view(np.int16).reshape(b, hgt, wid, m)
        z_sym = packed[2 * ny : 2 * (ny + nz)].view(np.int16).reshape(
            b, zh, zw, zc
        )
        idx = packed[2 * (ny + nz) :].reshape(b, hgt, wid, m).astype(np.int32)

        z_idx = entropy_base.bottleneck_indexes(z_sym.shape, zc)
        z_strings = entropy_base.compress(
            z_sym.astype(np.int32), z_idx, zt, self.stem.coder
        )
        y_strings = entropy_base.compress(
            y_sym.astype(np.int32), idx,
            self.stem.tables["gaussian_conditional"], self.stem.coder,
        )
        return (
            {"strings": [y_strings, z_strings], "shape": (zh, zw)},
            y_cur,
        )

    # -- decoder side ---------------------------------------------------------

    def decode_frame(self, strings, shape, y_cond):
        """Returns (x_hat, y_hat); y_hat is the next frame's conditioning.

        Two device dispatches + one upload + one download + host rANS.
        """
        zt = self.stem.tables["entropy_bottleneck"]
        z_idx = entropy_base.bottleneck_indexes(
            (len(strings[1]), *shape, zt.rows), zt.rows
        )
        z_sym = entropy_base.decompress(strings[1], z_idx, zt, self.stem.coder)
        means, idx = self._params(jnp.asarray(z_sym.astype(np.int16)), y_cond)
        y_sym = entropy_base.decompress(
            strings[0], np.asarray(idx, np.int32),
            self.stem.tables["gaussian_conditional"], self.stem.coder,
        )
        y_hat, x_hat = self._finish(
            jnp.asarray(y_sym.astype(np.int16)), means, y_cond
        )
        return x_hat, y_hat

    def analysis(self, x):
        """g_a only (I-frame conditioning bootstrap)."""
        return self._analysis(x)
