"""Host-side image pipeline: JPEG decode + resize -> uint8 NHWC batches.

Reference behavior (src/dataset.py:134-151): per batch, cv2.imread each photo,
resize to 224x224 (bilinear), BGR->RGB, scale to [0,1]; unreadable files yield
zeros.  Quirk preserved: NO ImageNet mean/std normalization -- the reference
feeds raw /255 pixels to VGG16 (dataset.py:140-141).

TPU-first changes:
- images cross host->device as uint8 NHWC (4x less transfer than f32; the
  /255.0 conversion runs on device, fused into the VGG prologue);
- decode happens in a look-ahead worker (see loader.py) so the TPU never
  waits on disk I/O;
- layout is NHWC (TPU-native), not the reference's NCHW torch layout.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
    _HAS_CV2 = True
except ImportError:  # pragma: no cover - cv2 is present in this image
    _HAS_CV2 = False


def get_image(path, resize=(224, 224)):
    """Decode one image to uint8 HWC RGB; zeros on any failure
    (reference: dataset.py:134-143, including the 'unknown'-path sentinel)."""
    if not path or not _HAS_CV2:
        return np.zeros((resize[1], resize[0], 3), dtype=np.uint8)
    try:
        image = cv2.imread(path)
        image = cv2.resize(image, resize)  # bilinear, as in the reference
        image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
        return image  # uint8 HWC
    except Exception:
        return np.zeros((resize[1], resize[0], 3), dtype=np.uint8)


class PhotoCache:
    """LRU cache of decoded+resized photos.

    UMPR reuses each item's photos in EVERY sample of that item (reference
    dataset.py:87-119), so after one pass the working set is just the unique
    photo count; caching decoded uint8 tensors (~150 KB each at 224px)
    removes the JPEG-decode host bottleneck entirely on later epochs.
    The reference re-decodes from disk every batch (dataset.py:146-151).
    """

    def __init__(self, capacity_bytes=2 << 30):
        import threading
        from collections import OrderedDict
        self._d = OrderedDict()
        self._capacity = capacity_bytes
        self._bytes = 0
        self._lock = threading.Lock()  # train + eval prefetch threads share
                                       # the trainer's cache concurrently
        self.hits = 0
        self.misses = 0

    def get(self, path, resize):
        # resize is part of the key: one cache may serve loaders with
        # different photo sizes (serving vs training), and a hit of the
        # wrong shape would corrupt the batch stack
        key = (path, resize)
        with self._lock:
            img = self._d.get(key)
            if img is not None:
                self._d.move_to_end(key)
                self.hits += 1
                return img
            self.misses += 1
        img = get_image(path, resize)  # decode outside the lock
        with self._lock:
            if key not in self._d:
                self._bytes += img.nbytes
                self._d[key] = img
                while self._bytes > self._capacity and self._d:
                    _, old = self._d.popitem(last=False)
                    self._bytes -= old.nbytes
        return img


def load_photo_batch(paths, resize=(224, 224), executor=None, cache=None):
    """paths: (B, V, P) array of path strings -> (B, V, P, H, W, 3) uint8.

    cache + executor compose: cold-cache decodes fan out across the worker
    pool (PhotoCache.get decodes outside its lock, so parallel misses are
    safe and duplicate decodes of one path are merely redundant work), then
    land in the cache for the next epoch."""
    b, v, p = paths.shape
    flat = paths.reshape(-1)
    if cache is not None:
        if executor is not None:
            # UMPR batches repeat each item's photos across its samples:
            # fan out UNIQUE paths only (per-occurrence submission would
            # race pool-width duplicate decodes of the same JPEG before
            # the first insert lands), then assemble from cache hits.
            list(executor.map(lambda s: cache.get(s, resize), set(flat)))
        imgs = [cache.get(s, resize) for s in flat]
    elif executor is not None:
        imgs = list(executor.map(lambda s: get_image(s, resize), flat))
    else:
        imgs = [get_image(s, resize) for s in flat]
    out = np.stack(imgs).reshape(b, v, p, resize[1], resize[0], 3)
    return out
