"""Vimeo90k septuplet loader (host-side NumPy, NHWC).

Parity: stem/dataset_vidseq.py:25-103 (VimeoSepTuplet: 7-frame sequences from
sep_trainlist/sep_testlist, same random crop across all frames, 50% temporal
reversal) and the training-time temporal subsampling of trainSTEM.py:176-182.
Torch DataLoader is replaced by a NumPy batcher with on-device prefetch
(data/pipeline.py) — batches are NHWC float32 in [0, 1].
"""

import os
import random
from typing import Optional

import numpy as np

# trainSTEM.py:176-182: random temporal subsampling per batch
TEMPORAL_SUBSAMPLES = (
    (0, 2, 4, 6),  # frames 1,3,5,7 (1-indexed in the reference)
    (0, 3, 6),     # frames 1,4,7
    (0, 6),        # frames 1,7
    (0, 1, 2, 3, 4, 5, 6),
)


def _load_image(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), np.float32) / 255.0


class VimeoSepTuplet:
    """Iterable dataset of 7-frame sequences.

    Returns (7, H, W, 3) float32 arrays; the same crop is applied to all
    frames of a sequence (dataset_vidseq.py:12-22) and training sequences are
    temporally reversed with p=0.5 (:81-83).
    """

    def __init__(
        self,
        data_root: str,
        is_training: bool = True,
        cropsize: int = 256,
        rng: Optional[random.Random] = None,
    ):
        self.data_root = data_root
        self.image_root = os.path.join(data_root, "sequences")
        self.training = is_training
        self.cropsize = cropsize
        self.rng = rng or random.Random()

        list_file = os.path.join(
            data_root, "sep_trainlist.txt" if is_training else "sep_testlist.txt"
        )
        with open(list_file) as f:
            self.seqlist = [l.strip() for l in f if l.strip()]

    def __len__(self):
        return len(self.seqlist)

    def _crop_params(self, h, w):
        cs = self.cropsize
        if h == cs and w == cs:
            return 0, 0
        if self.training:
            return self.rng.randint(0, h - cs), self.rng.randint(0, w - cs)
        return int(round((h - cs) / 2)), int(round((w - cs) / 2))

    def _frame_path(self, seq: str, i: int) -> str:
        # Vimeo90k (and the reference loader, dataset_vidseq.py:60-66) names
        # frames im1.png..im7.png; f%03d.png kept for legacy fixtures
        p = os.path.join(self.image_root, seq, f"im{i}.png")
        if os.path.exists(p):
            return p
        return os.path.join(self.image_root, seq, f"f{i:03d}.png")

    def __getitem__(self, index: int) -> np.ndarray:
        seq = self.seqlist[index]
        frames = [self._frame_path(seq, i) for i in range(1, 8)]
        frames = [_load_image(p) for p in frames]
        h, w = frames[0].shape[:2]
        top, left = self._crop_params(h, w)
        cs = self.cropsize
        frames = [f[top : top + cs, left : left + cs] for f in frames]
        if self.training and self.rng.random() >= 0.5:
            frames = frames[::-1]
        return np.stack(frames)  # (7, cs, cs, 3)


def subsample_frames(batch: np.ndarray, rng: Optional[random.Random] = None):
    """Apply the trainSTEM temporal subsampling to a (B, 7, H, W, C) batch."""
    rng = rng or random
    idx = rng.choice(TEMPORAL_SUBSAMPLES)
    return batch[:, list(idx)]


class VimeoSepTupletQMap(VimeoSepTuplet):
    """Septuplets + a synthesized quality map per sample.

    Parity: stem_roi/stem_roi_dataset.py:13-154 (VimeoSepTuplet_QMap):
    training maps are 30% uniform / 30% gradient / 40% Gaussian-mixture
    (data/qmap.py); test maps are uniform at ``level``. Returns
    (frames (7, cs, cs, 3), qmap (cs, cs, 1)).
    """

    def __init__(self, data_root: str, is_training: bool = True,
                 cropsize: int = 256, level: float = 0,
                 level_range=(0, 100), rng: Optional[random.Random] = None):
        super().__init__(data_root, is_training, cropsize, rng)
        self.level = level
        self.level_range = level_range

    def __getitem__(self, index: int):
        from .qmap import synthesize_qmap, uniform_qmap

        frames = super().__getitem__(index)
        if self.training:
            qmap = synthesize_qmap(self.cropsize, self.level_range,
                                   rng=self.rng)
        else:
            qmap = uniform_qmap(self.cropsize, self.level,
                                self.level_range[1])
        return frames, qmap
