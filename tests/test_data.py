"""Data-pipeline tests (reference strategy: compressai_tests/test_datasets.py /
test_transforms.py with tmpdir fixtures)."""

import os
import random

import numpy as np
import pytest

from spatiotemporalentropymodel_tpu.data import (
    GOPDataset,
    ImageFolder,
    VimeoSepTuplet,
    batch_iterator,
    gradient_qmap,
    rgb2ycbcr,
    subsample_frames,
    synthesize_qmap,
    uniform_qmap,
    ycbcr2rgb,
    yuv_420_to_444,
    yuv_444_to_420,
)


def _write_png(path, h=64, w=64, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


@pytest.fixture
def vimeo_root(tmp_path):
    root = tmp_path / "vimeo"
    seq = root / "sequences" / "00001" / "0001"
    seq.mkdir(parents=True)
    for i in range(1, 8):
        _write_png(seq / f"f{i:03d}.png", 128, 160, seed=i)
    (root / "sep_trainlist.txt").write_text("00001/0001\n")
    (root / "sep_testlist.txt").write_text("00001/0001\n")
    return str(root)


class TestVimeo:
    def test_shapes_and_same_crop(self, vimeo_root):
        ds = VimeoSepTuplet(vimeo_root, is_training=True, cropsize=64,
                            rng=random.Random(0))
        frames = ds[0]
        assert frames.shape == (7, 64, 64, 3)
        assert frames.dtype == np.float32
        assert 0 <= frames.min() and frames.max() <= 1

    def test_test_mode_center_crop_deterministic(self, vimeo_root):
        ds = VimeoSepTuplet(vimeo_root, is_training=False, cropsize=64)
        np.testing.assert_array_equal(ds[0], ds[0])

    def test_subsample(self):
        batch = np.zeros((2, 7, 8, 8, 3))
        out = subsample_frames(batch, random.Random(0))
        assert out.shape[1] in (2, 3, 4, 7)

    def test_qmap_dataset(self, vimeo_root):
        from spatiotemporalentropymodel_tpu.data import VimeoSepTupletQMap

        ds = VimeoSepTupletQMap(vimeo_root, is_training=True, cropsize=64,
                                rng=random.Random(0))
        frames, qmap = ds[0]
        assert frames.shape == (7, 64, 64, 3)
        assert qmap.shape == (64, 64, 1)
        assert 0 <= qmap.min() and qmap.max() <= 1.02

        ds_test = VimeoSepTupletQMap(vimeo_root, is_training=False,
                                     cropsize=64, level=50)
        _, qmap_t = ds_test[0]
        np.testing.assert_allclose(qmap_t, 0.5)

    def test_batch_iterator(self, vimeo_root):
        ds = VimeoSepTuplet(vimeo_root, is_training=True, cropsize=32)
        it = batch_iterator(ds, batch_size=1, epochs=2)
        batches = list(it)
        assert len(batches) == 2
        assert batches[0].shape == (1, 7, 32, 32, 3)


class TestImageFolder:
    def test_split_required(self, tmp_path):
        with pytest.raises(RuntimeError):
            ImageFolder(str(tmp_path), split="train")

    def test_loads(self, tmp_path):
        (tmp_path / "train").mkdir()
        _write_png(tmp_path / "train" / "a.png")
        ds = ImageFolder(str(tmp_path), split="train", cropsize=32)
        assert len(ds) == 1
        assert ds[0].shape == (32, 32, 3)


class TestGOP:
    def test_intra_flags(self, tmp_path):
        seq = tmp_path / "seq01"
        seq.mkdir()
        for i in range(1, 25):
            _write_png(seq / f"im{i:05d}.png", 32, 32, seed=i)
        ds = GOPDataset(str(tmp_path), gop_size=12, n_gops=2)
        assert len(ds) == 1
        frames = list(ds.sequences[0])
        assert len(frames) == 24
        intra = [f.index for f in frames if f.is_intra]
        assert intra == [1, 13]


class TestQmap:
    def test_range_and_shape(self):
        rng = random.Random(0)
        for _ in range(20):
            q = synthesize_qmap(64, rng=rng)
            assert q.shape == (64, 64, 1)
            assert q.min() >= 0 and q.max() <= 1.02

    def test_uniform(self):
        q = uniform_qmap(16, 50)
        np.testing.assert_allclose(q, 0.5)

    def test_gradient(self):
        q = gradient_qmap((8, 16), 0, 100)
        assert q.shape == (8, 16, 1)
        assert q[0, 0, 0] == 0 and abs(q[0, -1, 0] - 1.0) < 1e-6


class TestColorTransforms:
    def test_rgb_ycbcr_roundtrip(self):
        rng = np.random.default_rng(0)
        rgb = rng.random((2, 16, 16, 3)).astype(np.float32)
        back = np.asarray(ycbcr2rgb(rgb2ycbcr(rgb)))
        np.testing.assert_allclose(back, rgb, atol=1e-5)

    def test_yuv_420_shapes(self):
        x = np.random.default_rng(1).random((1, 32, 32, 3)).astype(np.float32)
        y, u, v = yuv_444_to_420(x)
        assert y.shape == (1, 32, 32, 1)
        assert u.shape == (1, 16, 16, 1)
        out = yuv_420_to_444((y, u, v))
        assert out.shape == (1, 32, 32, 3)


class TestThreadedBatcher:
    def test_workers_match_serial(self):
        """Threaded decode must reproduce the serial path exactly —
        same batch order, same contents (data/pipeline.py workers>0)."""
        rng = np.random.default_rng(0)
        data = rng.random((37, 5, 4, 3)).astype(np.float32)

        class DS:
            def __len__(self):
                return len(data)

            def __getitem__(self, i):
                return data[i]

        from spatiotemporalentropymodel_tpu.data.pipeline import batch_iterator

        serial = list(batch_iterator(DS(), 4, seed=3, epochs=2))
        threaded = list(batch_iterator(DS(), 4, seed=3, epochs=2, workers=3))
        assert len(serial) == len(threaded)
        for a, b in zip(serial, threaded):
            np.testing.assert_array_equal(a, b)
