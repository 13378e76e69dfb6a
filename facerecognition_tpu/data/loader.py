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


_END_OF_DATA = object()  # finite-sampler end marker (queue sentinel)


class _ProducerError:
    """Wraps a producer-thread exception for re-raise in the consumer."""

    def __init__(self, exc: BaseException):
        self.exc = exc


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
        self._pool = None  # lazy long-lived PIL-path thread pool
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._started = False
        if use_native:
            from facerecognition_tpu.data import native_decode

            self._native = native_decode if native_decode.available() else None
        else:
            self._native = None

    def _load_one(self, i: int) -> np.ndarray:
        try:
            return _load_resize(self.index.paths[i], self.image_size)
        except (FileNotFoundError, OSError) as exc:
            self._warn_failed(self.index.paths[i], exc)
            return np.zeros(
                (self.image_size, self.image_size, 3), np.uint8
            )

    def _warn_failed(self, path: str, exc) -> None:
        # Zero-filled rows train real labels against black images — never
        # do that silently (cap the noise at a few messages).
        self._n_failed = getattr(self, "_n_failed", 0) + 1
        if self._n_failed <= 5:
            import warnings

            warnings.warn(f"image decode failed, zero-filled: {path}: {exc}")

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
                    except (FileNotFoundError, OSError) as exc:
                        self._warn_failed(paths[j], exc)
            return imgs, self.index.labels[idx]
        if self._pool is None:
            from concurrent.futures import ThreadPoolExecutor

            # One long-lived pool — a pool per batch would pay thread
            # create/join on every batch of the >=100 img/s budget.
            self._pool = ThreadPoolExecutor(self.n_workers)
        imgs = list(self._pool.map(self._load_one, idx))
        return np.stack(imgs), self.index.labels[idx]

    def _producer(self):
        try:
            for idx in self.sampler:
                if self._stop.is_set():
                    return
                batch = self._load_batch(idx)
                while not self._stop.is_set():
                    try:
                        self.queue.put(batch, timeout=0.5)
                        break
                    except queue.Full:
                        continue
        except BaseException as exc:  # surface in the consumer, don't hang
            self._put_control(_ProducerError(exc))
            return
        self._put_control(_END_OF_DATA)  # finite sampler: clean stop

    def _put_control(self, item) -> None:
        while not self._stop.is_set():
            try:
                self.queue.put(item, timeout=0.5)
                return
            except queue.Full:
                continue

    def __iter__(self):
        if not self._started:
            self._thread.start()
            self._started = True
        while not self._stop.is_set():
            item = self.queue.get()
            if item is _END_OF_DATA:
                return
            if isinstance(item, _ProducerError):
                raise RuntimeError("loader producer failed") from item.exc
            yield item

    def stop(self):
        self._stop.set()
        # Drain so the producer can exit a blocked put.
        try:
            while True:
                self.queue.get_nowait()
        except queue.Empty:
            pass
        if self._pool is not None:
            self._pool.shutdown(wait=False)
            self._pool = None


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
