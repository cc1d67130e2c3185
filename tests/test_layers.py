"""Layer tests, including geometry parity against torch CPU (the parity
oracle: conv/deconv must match torch Conv2d/ConvTranspose2d so checkpoint
conversion is exact)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from spatiotemporalentropymodel_tpu.layers import (
    GDN,
    AttentionBlock,
    Conv,
    Deconv,
    MaskedConv2d,
    ResidualBlock,
    ResidualBlockUpsample,
    ResidualBlockWithStride,
    SFT,
    SFTResblk,
    make_causal_mask,
    pixel_shuffle,
)


def _torch_conv_ref(x_nhwc, kernel_hwio, bias, stride, padding):
    """Run torch Conv2d with the same weights (layout-converted)."""
    x_t = torch.from_numpy(np.asarray(x_nhwc).transpose(0, 3, 1, 2))
    w_t = torch.from_numpy(np.asarray(kernel_hwio).transpose(3, 2, 0, 1))
    b_t = torch.from_numpy(np.asarray(bias))
    out = F.conv2d(x_t, w_t, b_t, stride=stride, padding=padding)
    return out.numpy().transpose(0, 2, 3, 1)


class TestConvParity:
    @pytest.mark.parametrize("k,s,hw", [(5, 2, 16), (3, 1, 15), (5, 2, 17), (1, 1, 8)])
    def test_conv_matches_torch(self, k, s, hw):
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (2, hw, hw, 4))
        m = Conv(6, k, s)
        params = m.init(rng, x)
        out = m.apply(params, x)

        kernel = params["params"]["kernel"]
        bias = params["params"]["bias"]
        ref = _torch_conv_ref(x, kernel, bias, s, k // 2)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)

    @pytest.mark.parametrize("k,s,hw", [(5, 2, 8), (5, 2, 9), (3, 1, 8)])
    def test_deconv_matches_torch(self, k, s, hw):
        rng = jax.random.PRNGKey(1)
        x = jax.random.normal(rng, (2, hw, hw, 4))
        m = Deconv(6, k, s)
        params = m.init(rng, x)
        out = m.apply(params, x)
        assert out.shape == (2, hw * s, hw * s, 6)

        # our kernel is the spatially flipped torch ConvTranspose2d weight
        kernel = np.asarray(params["params"]["kernel"])  # (kh, kw, in, out)
        w_torch = kernel[::-1, ::-1].transpose(2, 3, 0, 1)  # (in, out, kh, kw)
        x_t = torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))
        out_t = F.conv_transpose2d(
            x_t,
            torch.from_numpy(np.ascontiguousarray(w_torch)),
            torch.from_numpy(np.asarray(params["params"]["bias"])),
            stride=s,
            padding=k // 2,
            output_padding=s - 1,
        )
        ref = out_t.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


class TestGDN:
    def test_formula(self):
        rng = jax.random.PRNGKey(2)
        x = jax.random.normal(rng, (1, 4, 4, 8))
        m = GDN(8)
        params = m.init(rng, x)
        out = m.apply(params, x)

        from spatiotemporalentropymodel_tpu.ops import NonNegativeParametrizer

        beta = NonNegativeParametrizer(minimum=1e-6)(params["params"]["beta"])
        gamma = NonNegativeParametrizer()(params["params"]["gamma"])
        x_np = np.asarray(x)
        norm = np.einsum("bhwi,oi->bhwo", x_np**2, np.asarray(gamma)) + np.asarray(beta)
        ref = x_np / np.sqrt(norm)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_inverse(self):
        rng = jax.random.PRNGKey(3)
        x = jnp.abs(jax.random.normal(rng, (1, 4, 4, 8))) + 0.1
        m = GDN(8, inverse=True)
        params = m.init(rng, x)
        out = np.asarray(m.apply(params, x))
        # IGDN multiplies by sqrt(norm) >= sqrt(beta) > 0
        assert np.all(np.abs(out) > 0)

    def test_init_identity_ish(self):
        # at init gamma=0.1*I, beta=1 → out = x / sqrt(1 + 0.1 x²)
        rng = jax.random.PRNGKey(4)
        x = jax.random.normal(rng, (1, 2, 2, 4))
        m = GDN(4)
        params = m.init(rng, x)
        out = np.asarray(m.apply(params, x))
        x_np = np.asarray(x)
        np.testing.assert_allclose(
            out, x_np / np.sqrt(1 + 0.1 * x_np**2), atol=1e-5
        )


class TestMaskedConv:
    def test_mask_pattern_A(self):
        m = make_causal_mask(5, 5, "A")[..., 0, 0]
        assert m[2, 2] == 0  # center masked
        assert m[2, 1] == 1
        assert np.all(m[3:] == 0)
        assert np.all(m[2, 3:] == 0)
        assert np.all(m[:2] == 1)

    def test_mask_pattern_B(self):
        m = make_causal_mask(5, 5, "B")[..., 0, 0]
        assert m[2, 2] == 1  # center kept
        assert np.all(m[2, 3:] == 0)

    def test_invalid_type(self):
        with pytest.raises(ValueError):
            make_causal_mask(3, 3, "C")

    def test_causality(self):
        """Changing a future pixel must not change the output at (h, w)."""
        rng = jax.random.PRNGKey(5)
        x = jax.random.normal(rng, (1, 7, 7, 2))
        m = MaskedConv2d(3, kernel_size=5, mask_type="A")
        params = m.init(rng, x)
        base = np.asarray(m.apply(params, x))
        x2 = x.at[0, 3, 4, :].add(100.0)  # pixel after (3,3) in raster order
        out2 = np.asarray(m.apply(params, x2))
        np.testing.assert_allclose(base[0, 3, 3], out2[0, 3, 3], atol=1e-5)
        x3 = x.at[0, 3, 3, :].add(100.0)  # the center itself (type A masks it)
        out3 = np.asarray(m.apply(params, x3))
        np.testing.assert_allclose(base[0, 3, 3], out3[0, 3, 3], atol=1e-5)


class TestPixelShuffle:
    def test_matches_torch(self):
        rng = jax.random.PRNGKey(6)
        x = jax.random.normal(rng, (2, 3, 3, 8))  # C = 2 * 2²
        out = pixel_shuffle(x, 2)
        x_t = torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))
        ref = F.pixel_shuffle(x_t, 2).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


class TestBlocks:
    @pytest.mark.parametrize(
        "mod,out_shape",
        [
            (ResidualBlockWithStride(32, 2), (1, 8, 8, 32)),
            (ResidualBlock(32), (1, 16, 16, 32)),
            (ResidualBlockUpsample(32, 2), (1, 32, 32, 32)),
            (AttentionBlock(16), (1, 16, 16, 16)),
        ],
    )
    def test_shapes(self, mod, out_shape):
        rng = jax.random.PRNGKey(7)
        x = jax.random.normal(rng, (1, 16, 16, 16))
        params = mod.init(rng, x)
        assert mod.apply(params, x).shape == out_shape

    def test_sft(self):
        rng = jax.random.PRNGKey(8)
        x = jax.random.normal(rng, (1, 8, 8, 16))
        qmap = jax.random.uniform(rng, (1, 64, 64, 1))
        m = SFT(16)
        params = m.init(rng, x, qmap)
        assert m.apply(params, x, qmap).shape == x.shape

        m2 = SFTResblk(16, 64)
        params2 = m2.init(rng, x, qmap)
        assert m2.apply(params2, x, qmap).shape == x.shape


class TestFastDeconv:
    """The sub-pixel decomposition is the same arithmetic as the
    lhs_dilation lowering (layers/conv.py::_subpixel_kernel)."""

    @pytest.mark.parametrize("k,s,hw", [(5, 2, (9, 12)), (3, 2, (8, 8)),
                                        (5, 4, (8, 8))])
    def test_lowerings_agree(self, k, s, hw):
        import importlib

        # (layers/__init__ re-exports the `conv` helper function under the
        # same name as the module)
        convmod = importlib.import_module(
            "spatiotemporalentropymodel_tpu.layers.conv")

        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, *hw, 3)).astype(np.float32))
        m = Deconv(4, k, s)
        params = m.init(jax.random.PRNGKey(1), x)
        old = convmod.FAST_DECONV
        try:
            convmod.FAST_DECONV = True
            fast = m.apply(params, x)
            convmod.FAST_DECONV = False
            ref = m.apply(params, x)
        finally:
            convmod.FAST_DECONV = old
        assert fast.shape == ref.shape == (2, s * hw[0], s * hw[1], 4)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                   atol=1e-5)

    def test_even_kernel_falls_back(self):
        # k=4 deconvs have (s·H − 1) geometry — the fast path must not
        # engage (layers/conv.py odd-k guard)
        x = jnp.zeros((1, 6, 10, 3))
        m = Deconv(4, 4, 2)
        params = m.init(jax.random.PRNGKey(1), x)
        assert m.apply(params, x).shape == (1, 11, 19, 4)


class TestS2dConv:
    """The space-to-depth lowering of a strided conv is the same arithmetic
    as XLA's native strided conv (layers/conv.py::_s2d_kernel)."""

    @pytest.mark.parametrize("k,s,hw,cin", [(5, 2, (10, 12), 3),
                                            (3, 2, (8, 8), 5),
                                            (5, 3, (9, 12), 2)])
    def test_lowerings_agree(self, k, s, hw, cin):
        import importlib

        convmod = importlib.import_module(
            "spatiotemporalentropymodel_tpu.layers.conv")

        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, *hw, cin)).astype(np.float32))
        m = Conv(4, k, s)
        params = m.init(jax.random.PRNGKey(1), x)
        old = convmod.S2D_CONV
        try:
            convmod.S2D_CONV = True
            fast = m.apply(params, x)
            convmod.S2D_CONV = False
            ref = m.apply(params, x)
        finally:
            convmod.S2D_CONV = old
        assert fast.shape == ref.shape == (2, hw[0] // s, hw[1] // s, 4)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                   atol=1e-5)

    def test_indivisible_hw_falls_back(self):
        # H not divisible by s: s2d cannot tile the input — the policy
        # must fall back to the native strided conv
        import importlib

        convmod = importlib.import_module(
            "spatiotemporalentropymodel_tpu.layers.conv")
        x = jnp.zeros((1, 7, 10, 3))
        m = Conv(4, 5, 2)
        params = m.init(jax.random.PRNGKey(1), x)
        old = convmod.S2D_CONV
        try:
            convmod.S2D_CONV = True
            out = m.apply(params, x)
        finally:
            convmod.S2D_CONV = old
        assert out.shape == (1, 4, 5, 4)
