"""Image loading with background prefetch.

Replaces the reference's cv::imread ingestion (cuda_class.cu:475-519,
manager_class.cpp:167-243) and its async next-image prefetch
(manager_class.cpp:1438-1447, the std::async set_next_image overlap) with a
thread-pool prefetcher that decodes and stages frames ahead of the solve.
"""

from __future__ import annotations

from concurrent.futures import Future, ThreadPoolExecutor

import numpy as np


def load_image(path: str, monochrome: bool = True) -> np.ndarray:
    """Decode an image file to [H, W, C] float32 with uint8 values.

    monochrome=True converts to single-channel luma (the reference's
    cv::IMREAD_GRAYSCALE default, manager_class.cpp:100-104).
    """
    from PIL import Image

    with Image.open(path) as im:
        if monochrome:
            im = im.convert("L")
            arr = np.asarray(im, np.float32)[..., None]
        else:
            im = im.convert("RGB")
            arr = np.asarray(im, np.float32)
    return arr


class FramePrefetcher:
    """Decode frames ahead of the solver (the std::async analog).

    Keeps up to `ahead` decoded frames in flight; frames are retrieved in
    order with next().
    """

    def __init__(self, paths: list[str], monochrome: bool = True, ahead: int = 2):
        self.paths = paths
        self.monochrome = monochrome
        self.ahead = ahead
        self._pool = ThreadPoolExecutor(max_workers=2)
        self._futures: dict[int, Future] = {}
        self._next = 0
        for i in range(min(ahead, len(paths))):
            self._submit(i)

    def _submit(self, idx: int):
        if 0 <= idx < len(self.paths) and idx not in self._futures:
            self._futures[idx] = self._pool.submit(
                load_image, self.paths[idx], self.monochrome
            )

    def get(self, idx: int) -> np.ndarray:
        self._submit(idx)
        for j in range(idx + 1, min(idx + 1 + self.ahead, len(self.paths))):
            self._submit(j)
        return self._futures[idx].result()

    def close(self):
        self._pool.shutdown(wait=False, cancel_futures=True)
