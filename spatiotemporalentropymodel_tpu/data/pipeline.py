"""Host batching + device prefetch.

Replaces the reference's torch DataLoader usage (stem/dataset_vidseq.py:97-103)
with a thread-backed NumPy batcher and a one-deep device prefetch so host IO
overlaps device compute (SURVEY.md §7 step 7).
"""

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

import numpy as np


def batch_iterator(
    dataset,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = True,
    epochs: Optional[int] = None,
    collate: Optional[Callable] = None,
) -> Iterator[np.ndarray]:
    """Yield stacked batches from an indexable dataset."""
    rng = np.random.default_rng(seed)
    n = len(dataset)
    epoch = 0
    while epochs is None or epoch < epochs:
        order = rng.permutation(n) if shuffle else np.arange(n)
        for start in range(0, n - (batch_size - 1 if drop_last else 0), batch_size):
            idx = order[start : start + batch_size]
            if len(idx) == 0:
                continue
            items = [dataset[int(i)] for i in idx]
            yield collate(items) if collate else np.stack(items)
        epoch += 1


def prefetch_to_device(iterator: Iterable, size: int = 2) -> Iterator:
    """Stage host batches onto the default device ahead of consumption."""
    import jax

    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()

    def producer():
        try:
            for item in iterator:
                q.put(jax.device_put(item))
        finally:
            q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        yield item
