"""ImageNet validation input pipeline (ImageFolder-style directory).

Replaces the reference's torchvision DataLoader stack
(reference: inference/inference_sim.py:209-229): resize shorter side to 256
(299 for inception), center-crop 224 (299), scale to [0,1], normalize with
the ImageNet mean/std — bilinear resize like torchvision's default.

Decode + preprocess runs in a small thread pool with double buffering so the
host pipeline overlaps TPU compute.  Layout is NHWC (TPU-native).
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterator, Sequence

import numpy as np

from .synthetic import IMAGENET_MEAN, IMAGENET_STD


def find_samples(valdir: str):
    """(path, label) list; labels = sorted class-dir index (ImageFolder rule)."""
    classes = sorted(d for d in os.listdir(valdir)
                     if os.path.isdir(os.path.join(valdir, d)))
    samples = []
    for idx, cls in enumerate(classes):
        d = os.path.join(valdir, cls)
        for fn in sorted(os.listdir(d)):
            if fn.lower().endswith(('.jpeg', '.jpg', '.png', '.bmp')):
                samples.append((os.path.join(d, fn), idx))
    return samples


def _load_image(path: str, resize: int, crop: int) -> np.ndarray:
    from PIL import Image
    with Image.open(path) as im:
        im = im.convert('RGB')
        w, h = im.size
        if w < h:
            nw, nh = resize, int(round(h * resize / w))
        else:
            nw, nh = int(round(w * resize / h)), resize
        im = im.resize((nw, nh), Image.BILINEAR)
        left = (nw - crop) // 2
        top = (nh - crop) // 2
        im = im.crop((left, top, left + crop, top + crop))
        arr = np.asarray(im, np.float32) / 255.0
    return (arr - IMAGENET_MEAN) / IMAGENET_STD


class ImageNetVal:
    def __init__(self, valdir: str, batch_size: int, *, resize: int = 256,
                 crop: int = 224, shuffle: bool = False, seed: int = 12345,
                 workers: int = 8, limit: int | None = None):
        self.samples = find_samples(valdir)
        if shuffle:
            rng = np.random.RandomState(seed)
            rng.shuffle(self.samples)
        if limit is not None:
            self.samples = self.samples[:limit]
        self.batch_size = batch_size
        self.resize = resize
        self.crop = crop
        self.workers = workers

    def __len__(self):
        return (len(self.samples) + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        from concurrent.futures import ThreadPoolExecutor
        bs = self.batch_size
        batches = [self.samples[i:i + bs] for i in range(0, len(self.samples), bs)]

        def make_batch(batch):
            imgs = np.stack([_load_image(p, self.resize, self.crop) for p, _ in batch])
            labels = np.array([l for _, l in batch], np.int32)
            return imgs, labels

        with ThreadPoolExecutor(max_workers=self.workers) as pool:
            # double-buffered prefetch
            futures = queue.Queue()
            it = iter(batches)
            for _ in range(2):
                b = next(it, None)
                if b is not None:
                    futures.put(pool.submit(make_batch, b))
            while not futures.empty():
                f = futures.get()
                b = next(it, None)
                if b is not None:
                    futures.put(pool.submit(make_batch, b))
                yield f.result()


def make_loader(data_dir: str | None, arch: str, batch_size: int, *,
                shuffle: bool = False, limit: int | None = None,
                synthetic_batches_count: int = 8, seed: int = 12345,
                size: int | None = None):
    """Real ImageNet val loader if the directory exists, else synthetic.

    ``size`` overrides the arch-default crop (224/299) — used for quick
    smoke runs on small inputs (all models are fully convolutional up to
    the pooled classifier)."""
    if size is None:
        size = 299 if arch == 'inception_v3' else 224
    resize = max(size + 32, size * 256 // 224)
    if data_dir and data_dir.endswith('.npz') and os.path.exists(data_dir):
        # packed eval set: arrays 'images' [N,H,W,3] float32 (already
        # preprocessed) and 'labels' [N] int — the CLI analogue of the
        # reference's ImageFolder val dir for custom/synthetic tasks
        # (used by tests/test_accuracy_ordering.py's trained-CNN recipes)
        with np.load(data_dir) as z:
            images = np.asarray(z['images'], np.float32)
            labels = np.asarray(z['labels'], np.int32)
        if shuffle:
            perm = np.random.RandomState(seed).permutation(len(images))
            images, labels = images[perm], labels[perm]
        if limit is not None:
            images, labels = images[:limit], labels[:limit]
        batches = [(images[i:i + batch_size], labels[i:i + batch_size])
                   for i in range(0, len(images), batch_size)]
        return batches, True
    valdir = None
    if data_dir:
        cand = os.path.join(data_dir, 'val')
        valdir = cand if os.path.isdir(cand) else (data_dir if os.path.isdir(data_dir) else None)
    if valdir and os.path.isdir(valdir):
        loader = ImageNetVal(valdir, batch_size, resize=resize, crop=size,
                             shuffle=shuffle, limit=limit, seed=seed)
        if len(loader.samples) > 0:
            return loader, True
    from .synthetic import synthetic_batches
    n = synthetic_batches_count if limit is None else max(1, limit // batch_size)
    return list(synthetic_batches(batch_size, n, size=size, seed=seed)), False
