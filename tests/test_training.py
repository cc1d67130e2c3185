"""Training-loop smoke/regression tests (reference strategy:
compressai_tests/test_train.py — tiny data, few steps, deterministic)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatiotemporalentropymodel_tpu.training import (
    CheckpointManager,
    ReduceLROnPlateau,
    configure_optimizers,
    get_main_learning_rate,
    load_checkpoint,
    save_checkpoint,
    set_main_learning_rate,
)
from spatiotemporalentropymodel_tpu.utils.config import (
    TrainImageConfig,
    TrainStemConfig,
    TrainStemRoiConfig,
    parse_config,
)


class TestCheckpoints:
    def test_roundtrip(self, tmp_path):
        state = {
            "params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
            "counters": {"step": np.asarray(7)},
        }
        path = str(tmp_path / "ckpt.pkl")
        save_checkpoint(state, path)
        restored = load_checkpoint(path)
        np.testing.assert_array_equal(restored["params"]["w"],
                                      state["params"]["w"])
        assert int(restored["counters"]["step"]) == 7

    def test_roundtrip_gzip(self, tmp_path):
        """.pkl.gz checkpoints (committed trained-weights snapshots,
        artifacts/trained/) load transparently."""
        state = {"params": {"w": np.linspace(0, 1, 12, dtype=np.float32)}}
        path = str(tmp_path / "ckpt.pkl.gz")
        save_checkpoint(state, path)
        import gzip

        with open(path, "rb") as f:
            assert f.read(2) == b"\x1f\x8b"  # actually gzip on disk
        restored = load_checkpoint(path)
        np.testing.assert_array_equal(restored["params"]["w"],
                                      state["params"]["w"])
        del gzip

    def test_manager_best_rotation(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), "t")
        assert mgr.save({"a": np.zeros(1)}, metric=2.0) is True
        assert mgr.save({"a": np.ones(1)}, metric=3.0) is False
        assert mgr.save({"a": np.full(1, 2.0)}, metric=1.0) is True
        best = load_checkpoint(mgr.best_path)
        np.testing.assert_array_equal(best["a"], np.full(1, 2.0))
        assert mgr.restore_latest() is not None


class TestLrControl:
    def test_set_main_learning_rate(self):
        params = {"w": jnp.ones(3), "quantiles": jnp.ones(2)}
        opts = configure_optimizers(params, learning_rate=1e-4)
        st = opts.main.init(params)
        np.testing.assert_allclose(get_main_learning_rate(st), 1e-4, rtol=1e-5)
        st2 = set_main_learning_rate(st, 5e-5)
        np.testing.assert_allclose(get_main_learning_rate(st2), 5e-5, rtol=1e-5)

    def test_plateau_schedule(self):
        sched = ReduceLROnPlateau(factor=0.5, patience=1)
        assert sched.step(1.0) == 1.0
        assert sched.step(1.0) == 1.0  # bad 1
        assert sched.step(1.0) == 0.5  # bad 2 > patience → drop
        assert sched.step(0.1) == 0.5  # improvement keeps scale


class TestConfigParsing:
    def test_defaults_and_override(self):
        cfg = parse_config(TrainStemConfig, ["--variant", "full",
                                             "--batch-size", "2"])
        assert cfg.variant == "full" and cfg.batch_size == 2
        assert cfg.learning_rate == 1e-4


@pytest.mark.slow
class TestTrainLoops:
    def test_train_stem_per_frame_smoke(self, tmp_path):
        from spatiotemporalentropymodel_tpu.training.train_stem import train_stem

        cfg = TrainStemConfig(
            variant="without_spm",
            in_channels=8,
            entropy_bottleneck_channels=8,
            i_model="bmshj2018-hyperprior",
            i_quality=1,
            cropsize=64,
            batch_size=2,
            eval_every=2,
            workdir=str(tmp_path),
            step_mode="per_frame",
        )
        # shrink the I model via a custom build: use quality-1 (128, 192) is
        # heavy; monkeypatch via tiny custom model instead
        import spatiotemporalentropymodel_tpu.training.train_stem as ts
        from spatiotemporalentropymodel_tpu.models import MeanScaleHyperprior

        def tiny_i_model(config):
            m = MeanScaleHyperprior(8, 8)
            m.init(jnp.zeros((1, config.cropsize, config.cropsize, 3)))
            return m

        orig = ts.build_i_model
        ts.build_i_model = tiny_i_model
        try:
            state, metrics = train_stem(cfg, max_steps=2)
        finally:
            ts.build_i_model = orig
        assert np.isfinite(float(metrics["loss"]))
        assert int(state.step) > 0
        assert os.path.exists(os.path.join(str(tmp_path), "ckpt",
                                           "stem_latest.pkl"))

    def test_train_stem_resume(self, tmp_path):
        """Interrupted training must resume from the latest checkpoint with
        the iteration counter and optimizer state intact."""
        import spatiotemporalentropymodel_tpu.training.train_stem as ts
        from spatiotemporalentropymodel_tpu.models import MeanScaleHyperprior
        from spatiotemporalentropymodel_tpu.training.train_stem import train_stem

        cfg = TrainStemConfig(
            variant="without_spm", in_channels=8,
            entropy_bottleneck_channels=8, cropsize=64, batch_size=1,
            eval_every=2, workdir=str(tmp_path), step_mode="per_sequence",
        )

        def tiny_i_model(config):
            m = MeanScaleHyperprior(8, 8)
            m.init(jnp.zeros((1, config.cropsize, config.cropsize, 3)))
            return m

        orig = ts.build_i_model
        ts.build_i_model = tiny_i_model
        try:
            state1, _ = train_stem(cfg, max_steps=2)
            cfg2 = TrainStemConfig(**{**cfg.__dict__, "resume": True})
            state2, _ = train_stem(cfg2, max_steps=4)
        finally:
            ts.build_i_model = orig
        assert int(state1.step) == 2
        assert int(state2.step) == 4  # continued from 2, ran 2 more

    def test_train_stem_roi_smoke(self, tmp_path):
        from spatiotemporalentropymodel_tpu.training.train_stem_roi import (
            train_stem_roi,
        )

        cfg = TrainStemRoiConfig(
            mode="roi",
            in_channels=8,
            entropy_bottleneck_channels=8,
            cropsize=64,
            batch_size=1,
            workdir=str(tmp_path),
        )
        (state_i, state_p), metrics = train_stem_roi(cfg, max_steps=1)
        assert "loss" in metrics
        assert int(state_i.step) == 1 and int(state_p.step) == 1

    def test_train_image_smoke(self, tmp_path):
        from spatiotemporalentropymodel_tpu.training.train_image import train_image
        import spatiotemporalentropymodel_tpu.training.train_image as ti
        from spatiotemporalentropymodel_tpu.models import MeanScaleHyperprior
        from spatiotemporalentropymodel_tpu.zoo import model_architectures

        cfg = TrainImageConfig(
            model="mbt2018-mean", quality=1, cropsize=64, batch_size=2,
            workdir=str(tmp_path),
        )
        # shrink channels for test speed
        orig = model_architectures["mbt2018-mean"]
        import spatiotemporalentropymodel_tpu.zoo as zoo

        zoo.cfgs["mbt2018-mean"][1] = (8, 12)
        try:
            state, metrics = train_image(cfg, max_steps=2)
        finally:
            zoo.cfgs["mbt2018-mean"][1] = (128, 192)
        assert np.isfinite(float(metrics["loss"]))
