"""Flat image-folder dataset (train/test split subdirectories).

Parity: compressai/datasets/utils.py:21-66 (ImageFolder): root/{train,test}
directories of images; missing split raises.
"""

import os
import random
from pathlib import Path
from typing import Optional

import numpy as np


class ImageFolder:
    def __init__(self, root: str, split: str = "train", cropsize: Optional[int] = None,
                 training: bool = True, rng: Optional[random.Random] = None):
        splitdir = Path(root) / split
        if not splitdir.is_dir():
            raise RuntimeError(f'Invalid directory "{splitdir}"')
        self.samples = sorted(
            p for p in splitdir.iterdir()
            if p.suffix.lower() in (".png", ".jpg", ".jpeg", ".bmp")
        )
        self.cropsize = cropsize
        self.training = training
        self.rng = rng or random.Random()

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index: int) -> np.ndarray:
        from PIL import Image

        with Image.open(self.samples[index]) as im:
            arr = np.asarray(im.convert("RGB"), np.float32) / 255.0
        if self.cropsize:
            cs = self.cropsize
            h, w = arr.shape[:2]
            if self.training:
                top = self.rng.randint(0, max(h - cs, 0))
                left = self.rng.randint(0, max(w - cs, 0))
            else:
                top, left = (h - cs) // 2, (w - cs) // 2
            arr = arr[top : top + cs, left : left + cs]
        return arr
