"""Eval tooling tests: codec CLI round-trip, eval_model, update_model,
find_close, bench codecs, GOP evaluator (reference strategy:
compressai_tests/test_update_model.py, test_codec.py)."""

import json
import math
import os

import jax.numpy as jnp
import numpy as np
import pytest

import spatiotemporalentropymodel_tpu.zoo as zoo


@pytest.fixture(autouse=True)
def tiny_factorized():
    """Shrink the factorized-prior config for test speed."""
    orig = zoo.cfgs["bmshj2018-factorized"][1]
    zoo.cfgs["bmshj2018-factorized"][1] = (8, 12)
    yield
    zoo.cfgs["bmshj2018-factorized"][1] = orig


def _write_png(path, h=96, w=128, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    # smooth image → reasonable codec behavior
    x = np.linspace(0, 1, w)[None, :, None] * np.ones((h, 1, 3))
    x = (x + 0.1 * rng.random((h, w, 3))).clip(0, 1)
    Image.fromarray((x * 255).astype(np.uint8)).save(path)


class TestCodecCLI:
    def test_encode_decode_roundtrip(self, tmp_path):
        from spatiotemporalentropymodel_tpu.eval import codec

        img = tmp_path / "in.png"
        _write_png(img)
        bin_path = tmp_path / "out.bin"
        rec_path = tmp_path / "rec.png"

        model = codec._build_model("bmshj2018-factorized", 1,
                                   example_hw=(128, 128))
        rv = codec.encode(str(img), str(bin_path),
                          "bmshj2018-factorized", 1, model=model)
        assert rv["bpp"] > 0 and bin_path.exists()
        x_hat = codec.decode(str(bin_path), str(rec_path), model=model)
        assert x_hat.shape == (1, 96, 128, 3)
        assert rec_path.exists()

    def test_header_roundtrip(self):
        from spatiotemporalentropymodel_tpu.eval.codec import (
            get_header,
            parse_header,
        )

        h = get_header("mbt2018", "ms-ssim", 5)
        assert parse_header(h) == ("mbt2018", "ms-ssim", 5)


class TestEvalModel:
    def test_eval_dir(self, tmp_path):
        from spatiotemporalentropymodel_tpu.eval.eval_model import (
            collect_images,
            eval_model,
        )
        from spatiotemporalentropymodel_tpu.zoo import create_model

        for i in range(2):
            _write_png(tmp_path / f"img{i}.png", seed=i)
        paths = collect_images(str(tmp_path))
        assert len(paths) == 2

        model = create_model("bmshj2018-factorized", 1)
        model.init(jnp.zeros((1, 128, 128, 3)))
        model.update()
        rv = eval_model(model, paths)
        assert set(rv) >= {"psnr", "ms-ssim", "bpp"}
        assert rv["bpp"] > 0

    def test_entropy_estimation_mode(self, tmp_path):
        from spatiotemporalentropymodel_tpu.eval.eval_model import eval_model
        from spatiotemporalentropymodel_tpu.zoo import create_model

        _write_png(tmp_path / "a.png")
        model = create_model("bmshj2018-factorized", 1)
        model.init(jnp.zeros((1, 128, 128, 3)))
        model.update()
        rv = eval_model(model, [str(tmp_path / "a.png")],
                        entropy_estimation=True)
        assert rv["bpp"] > 0


class TestUpdateModel:
    def test_hash_export(self, tmp_path):
        from spatiotemporalentropymodel_tpu.eval.update_model import (
            update_checkpoint,
        )
        from spatiotemporalentropymodel_tpu.training.checkpoints import (
            load_checkpoint,
            save_checkpoint,
        )
        from spatiotemporalentropymodel_tpu.zoo import create_model

        model = create_model("bmshj2018-factorized", 1)
        model.init(jnp.zeros((1, 64, 64, 3)))
        ckpt_in = str(tmp_path / "train.pkl")
        save_checkpoint({"model": model.state_dict()}, ckpt_in)

        model2 = create_model("bmshj2018-factorized", 1)
        model2.init(jnp.zeros((1, 64, 64, 3)))
        out = update_checkpoint(model2, ckpt_in, str(tmp_path / "out"))
        assert os.path.exists(out)
        base = os.path.basename(out)
        assert "-" in base and base.endswith(".pkl")
        restored = load_checkpoint(out)
        assert "tables" in restored["model"]
        assert len(restored["model"]["tables"]) > 0


class TestFindClose:
    def test_bisection(self):
        from spatiotemporalentropymodel_tpu.eval.find_close import find_closest

        # synthetic monotone metric: psnr(q) = 20 + q/2
        def ev(q):
            return {"psnr": 20 + q / 2}

        q, rv = find_closest(ev, 35.0, "psnr", 1, 95)
        assert abs(rv["psnr"] - 35.0) <= 0.5


class TestBenchCodecs:
    def test_jpeg(self, tmp_path):
        from spatiotemporalentropymodel_tpu.eval.bench_codecs import bench

        _write_png(tmp_path / "a.png")
        out = bench("jpeg", [str(tmp_path / "a.png")], [30, 80], workers=1)
        assert len(out["results"]["bpp"]) == 2
        # higher quality → more bits, better psnr
        assert out["results"]["bpp"][1] > out["results"]["bpp"][0]
        assert out["results"]["psnr"][1] > out["results"]["psnr"][0]

    def test_missing_binary_graceful(self):
        from spatiotemporalentropymodel_tpu.eval.bench_codecs import get_codec

        bpg = get_codec("bpg")
        assert bpg.available() is False
        with pytest.raises(RuntimeError):
            bpg.run("nope.png", 30)


class TestPlot:
    def test_csv_fallback_and_load(self, tmp_path):
        from spatiotemporalentropymodel_tpu.eval.plot import load_results, plot

        res = {"name": "test", "results": {"bpp": [0.1, 0.2],
                                           "psnr": [30.0, 33.0]}}
        p = tmp_path / "res.json"
        p.write_text(json.dumps(res))
        loaded = load_results([str(p)])
        out = tmp_path / "curve.png"
        plot(loaded, "psnr", "uvg", str(out))
        assert out.exists()


class TestGOPEvaluator:
    @pytest.mark.slow
    def test_eval_sequence_estimation(self, tmp_path):
        from spatiotemporalentropymodel_tpu.data.gop import GOPSequence
        from spatiotemporalentropymodel_tpu.eval.eval_stem import eval_sequence
        from spatiotemporalentropymodel_tpu.models import (
            MeanScaleHyperprior,
            SpatioTemporalPriorModel,
        )

        seq_dir = tmp_path / "seq"
        seq_dir.mkdir()
        for i in range(1, 5):
            _write_png(seq_dir / f"im{i:03d}.png", h=64, w=64, seed=i)

        i_model = MeanScaleHyperprior(8, 12)
        i_model.init(jnp.zeros((1, 64, 64, 3)))
        i_model.update()
        stem = SpatioTemporalPriorModel(
            variant="without_spm", entropy_bottleneck_channels=16,
            in_channels=12,
        )
        d = jnp.zeros((1, 4, 4, 12))
        stem.init(d, d)
        stem.update()

        seq = GOPSequence(str(seq_dir), gop_size=4)
        rv = eval_sequence(i_model, stem, seq, entropy_estimation=False,
                           compute_msssim=False)
        assert rv["frames"] == 4
        assert np.isfinite(rv["psnr"]) and rv["bpp"] > 0

        # serving-pipeline-backed eval (bench.py's exact P-frame path):
        # same frame count, finite metrics, timing excludes the bpp_est pass
        from spatiotemporalentropymodel_tpu.eval.pipeline import (
            StemVideoPipeline,
        )

        pipe = StemVideoPipeline(i_model, stem)
        rv2 = eval_sequence(
            i_model, stem, seq, entropy_estimation=False,
            compute_msssim=False, report_estimated_bpp=False, pipeline=pipe,
        )
        assert rv2["frames"] == 4
        assert np.isfinite(rv2["psnr"]) and rv2["bpp"] > 0
        assert math.isnan(rv2["bpp_est"]) or rv2["bpp_est"] == 0.0
