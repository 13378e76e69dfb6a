"""Prefetching host batch loader: threads decode images → pinned numpy
batches → device. Replaces torch DataLoader worker processes
(arcface_dataloader.py:525-590, num_workers=4-8, pin_memory) with a
thread-pool + bounded queue (images decode with PIL, resize on device
happens in the train step)."""

from __future__ import annotations

import queue
import threading
import time
from typing import Iterator, Optional, Sequence

import numpy as np

from facerecognition_tpu.data.datasets import DatasetIndex
from facerecognition_tpu.utils.imageio import load_image


def _load_resize(path: str, size: int) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB")
        if im.size != (size, size):
            im = im.resize((size, size), Image.BILINEAR)
        return np.asarray(im)


class BatchLoader:
    """Iterates (images (B, S, S, 3) uint8, labels (B,)) with prefetch.

    ``sampler`` yields index arrays; ``n_prefetch`` batches are produced
    ahead by ``n_workers`` threads.
    """

    def __init__(
        self,
        index: DatasetIndex,
        sampler: Iterator[np.ndarray],
        image_size: int = 112,
        n_workers: int = 8,
        n_prefetch: int = 4,
        use_native: bool = True,
    ):
        self.index = index
        self.sampler = sampler
        self.image_size = image_size
        self.n_workers = n_workers
        self.queue: queue.Queue = queue.Queue(maxsize=n_prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._started = False
        if use_native:
            from facerecognition_tpu.data import native_decode

            self._native = native_decode if native_decode.available() else None
        else:
            self._native = None

    def _load_batch(self, idx: np.ndarray):
        if self._native is not None:
            paths = [self.index.paths[i] for i in idx]
            imgs, ok = self._native.decode_batch(
                paths, self.image_size, self.n_workers
            )
            if not ok.all():
                # PIL fallback for formats the native decoder rejects.
                for j in np.flatnonzero(~ok):
                    try:
                        imgs[j] = _load_resize(paths[j], self.image_size)
                    except (FileNotFoundError, OSError):
                        pass
            return imgs, self.index.labels[idx]
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(self.n_workers) as pool:
            imgs = list(
                pool.map(
                    lambda i: _load_resize(
                        self.index.paths[i], self.image_size
                    ),
                    idx,
                )
            )
        return np.stack(imgs), self.index.labels[idx]

    def _producer(self):
        for idx in self.sampler:
            if self._stop.is_set():
                return
            self.queue.put(self._load_batch(idx))

    def __iter__(self):
        if not self._started:
            self._thread.start()
            self._started = True
        while not self._stop.is_set():
            yield self.queue.get()

    def stop(self):
        self._stop.set()
        # Drain so the producer can exit a blocked put.
        try:
            while True:
                self.queue.get_nowait()
        except queue.Empty:
            pass


def benchmark_loader(loader: BatchLoader, n_batches: int = 10) -> dict:
    """Loader throughput probe (reference arcface_dataloader.py:746-771,
    which targets ≥100 img/s)."""
    it = iter(loader)
    next(it)  # warm
    t0 = time.perf_counter()
    n_images = 0
    for _ in range(n_batches):
        imgs, labels = next(it)
        n_images += len(imgs)
    dt = time.perf_counter() - t0
    return {
        "images_per_sec": n_images / dt,
        "batches_per_sec": n_batches / dt,
        "seconds_per_batch": dt / n_batches,
    }
