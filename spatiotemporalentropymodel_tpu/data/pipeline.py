"""Host batching + device prefetch.

Replaces the reference's torch DataLoader usage (stem/dataset_vidseq.py:97-103)
with a thread-backed NumPy batcher and a one-deep device prefetch so host IO
overlaps device compute (SURVEY.md §7 step 7).
"""

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, Optional

import numpy as np


def _batch_indices(n, batch_size, shuffle, seed, drop_last, epochs):
    rng = np.random.default_rng(seed)
    epoch = 0
    while epochs is None or epoch < epochs:
        order = rng.permutation(n) if shuffle else np.arange(n)
        for start in range(
            0, n - (batch_size - 1 if drop_last else 0), batch_size
        ):
            idx = order[start : start + batch_size]
            if len(idx):
                yield idx
        epoch += 1


def batch_iterator(
    dataset,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = True,
    epochs: Optional[int] = None,
    collate: Optional[Callable] = None,
    workers: int = 0,
    prefetch_batches: int = 2,
) -> Iterator[np.ndarray]:
    """Yield stacked batches from an indexable dataset.

    ``workers > 0`` decodes samples on a thread pool with
    ``prefetch_batches`` batches in flight (PIL decode releases the GIL, the
    torch-DataLoader-workers equivalent, dataset_vidseq.py:97-103); batch
    order and contents are identical to the serial path.
    """
    batches = _batch_indices(len(dataset), batch_size, shuffle, seed,
                             drop_last, epochs)
    pack = collate if collate else np.stack

    if workers <= 0:
        for idx in batches:
            yield pack([dataset[int(i)] for i in idx])
        return

    with ThreadPoolExecutor(max_workers=workers) as pool:
        inflight = []

        def submit(idx):
            inflight.append([pool.submit(dataset.__getitem__, int(i))
                             for i in idx])

        for idx in batches:
            submit(idx)
            while len(inflight) > max(1, prefetch_batches):
                yield pack([f.result() for f in inflight.pop(0)])
        while inflight:
            yield pack([f.result() for f in inflight.pop(0)])


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
