"""Zoo registry + torch-checkpoint converter tests.

The converter round-trip builds a synthetic torch-layout state dict from a JAX
model (inverse layout transforms), converts it back, and requires exact
equality — validating the layout rules whose torch-parity is pinned in
tests/test_layers.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatiotemporalentropymodel_tpu.zoo import (
    KEY_MAPS,
    cfgs,
    create_model,
    model_architectures,
    rename_key,
    stem_models,
)
from spatiotemporalentropymodel_tpu.zoo.convert import (
    convert_state_dict,
    invert_conv_weight,
    invert_deconv_weight,
)


class TestRegistry:
    def test_all_archs_present(self):
        assert set(model_architectures) == {
            "bmshj2018-factorized",
            "bmshj2018-hyperprior",
            "mbt2018-mean",
            "mbt2018",
            "cheng2020-anchor",
            "cheng2020-attn",
        }

    def test_quality_configs(self):
        assert cfgs["bmshj2018-factorized"][1] == (128, 192)
        assert cfgs["bmshj2018-factorized"][8] == (192, 320)
        assert cfgs["mbt2018"][4] == (192, 192)
        assert cfgs["cheng2020-anchor"][6] == (192,)

    def test_invalid_arch(self):
        with pytest.raises(ValueError):
            create_model("nope", 1)

    def test_invalid_quality(self):
        with pytest.raises(ValueError):
            create_model("mbt2018", 99)

    def test_stem_registry(self):
        assert set(stem_models) == {
            "stpm_without_spm_tpm",
            "stpm_without_spm",
            "stpm_without_tpm",
            "stpm",
            "stpm_res",
            "stpm_charm",  # beyond-reference channel-AR variant
        }


class TestRenameKey:
    def test_dataparallel_strip(self):
        assert rename_key("module.g_a.0.weight") == "g_a.0.weight"

    def test_legacy_eb_names(self):
        assert (
            rename_key("entropy_bottleneck._matrices.0")
            == "entropy_bottleneck._matrix0"
        )
        assert rename_key("entropy_bottleneck._biases.2") == "entropy_bottleneck._bias2"

    def test_downsample(self):
        assert rename_key("g_a.0.downsample.weight") == "g_a.0.skip.weight"


class TestConverterRoundTrip:
    def _roundtrip(self, arch, model):
        key_map = KEY_MAPS[arch]
        params = model.params

        # Build a synthetic torch-layout state dict via the inverse transforms
        state = {}

        def record(path, leaf):
            names = tuple(p.key for p in path if hasattr(p, "key"))
            spec = key_map(names)
            if spec is None:
                return leaf
            torch_key, kind = spec
            v = np.asarray(leaf)
            if kind == "conv":
                v = invert_conv_weight(v)
            elif kind == "deconv":
                v = invert_deconv_weight(v)
            state[torch_key] = v
            return leaf

        jax.tree_util.tree_map_with_path(record, params)
        assert state, "key map matched no parameters"

        converted = convert_state_dict(state, params, key_map)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            converted,
            params,
        )

    def test_msh_roundtrip(self):
        m = create_model("mbt2018-mean", 1)
        m.init(jnp.zeros((1, 64, 64, 3)))
        # shrink: use small channels instead for speed
        self._roundtrip("mbt2018-mean", m)

    def test_stem_roundtrip(self):
        from spatiotemporalentropymodel_tpu.models import SpatioTemporalPriorModel

        m = SpatioTemporalPriorModel(
            variant="res", entropy_bottleneck_channels=16, in_channels=8
        )
        y = jnp.zeros((1, 8, 8, 8))
        m.init(y, y)
        self._roundtrip("stem", m)

    def test_shape_mismatch_raises(self):
        m = create_model("bmshj2018-factorized", 1)
        m.init(jnp.zeros((1, 64, 64, 3)))
        key_map = KEY_MAPS["bmshj2018-factorized"]
        bad_state = {"g_a.0.weight": np.zeros((1, 1, 5, 5), np.float32)}
        with pytest.raises((ValueError, KeyError)):
            convert_state_dict(bad_state, m.params, key_map)
