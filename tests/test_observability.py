"""Observability + pipeline-utility tests (logging, timers, prefetch,
eval step) — the aux subsystems of SURVEY §5."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from spatiotemporalentropymodel_tpu.data import batch_iterator, prefetch_to_device
from spatiotemporalentropymodel_tpu.models import STEMModule
from spatiotemporalentropymodel_tpu.parallel import make_stem_eval_step
from spatiotemporalentropymodel_tpu.training import MetricsLogger, StageTimer


class TestMetricsLogger:
    def test_jsonl_mirror(self, tmp_path):
        logger = MetricsLogger(str(tmp_path), "t")
        logger.log(1, loss=2.5, bpp=0.3)
        logger.log(2, loss=2.0)
        logger.close()
        lines = [
            json.loads(l)
            for l in open(os.path.join(tmp_path, "t_metrics.jsonl"))
        ]
        assert lines[0]["step"] == 1 and lines[0]["loss"] == 2.5
        assert lines[1]["loss"] == 2.0
        assert "time" in lines[0]


class TestStageTimer:
    def test_accumulates(self):
        t = StageTimer()
        for _ in range(3):
            with t.stage("a"):
                pass
        with t.stage("b"):
            pass
        s = t.summary()
        assert s["a"]["count"] == 3 and s["b"]["count"] == 1
        assert s["a"]["total_s"] >= 0


class TestPrefetch:
    def test_prefetch_preserves_order(self):
        batches = [np.full((2, 2), i, np.float32) for i in range(5)]
        out = list(prefetch_to_device(iter(batches), size=2))
        assert len(out) == 5
        for i, b in enumerate(out):
            np.testing.assert_array_equal(np.asarray(b), batches[i])


class TestBatchIterator:
    def test_drop_last(self):
        data = [np.zeros(3, np.float32)] * 5

        class DS:
            def __len__(self):
                return 5

            def __getitem__(self, i):
                return data[i]

        batches = list(batch_iterator(DS(), 2, epochs=1, drop_last=True))
        assert len(batches) == 2  # 5 // 2

        batches = list(batch_iterator(DS(), 2, epochs=1, drop_last=False))
        assert len(batches) == 3


class TestEvalStep:
    def test_deterministic_and_finite(self):
        module = STEMModule(variant="without_spm",
                            entropy_bottleneck_channels=8, in_channels=8)
        rng = jax.random.PRNGKey(0)
        frames = jax.random.normal(rng, (2, 3, 8, 8, 8))
        params = module.init(
            {"params": rng, "noise": rng}, frames[:, 1], frames[:, 0],
            train=True,
        )["params"]
        step = jax.jit(make_stem_eval_step(module))
        l1 = float(step(params, frames))
        l2 = float(step(params, frames))
        assert l1 == l2 and np.isfinite(l1)
