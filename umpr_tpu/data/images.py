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


def load_photo_batch(paths, resize=(224, 224), executor=None):
    """paths: (B, V, P) array of path strings -> (B, V, P, H, W, 3) uint8."""
    b, v, p = paths.shape
    flat = paths.reshape(-1)
    if executor is not None:
        imgs = list(executor.map(lambda s: get_image(s, resize), flat))
    else:
        imgs = [get_image(s, resize) for s in flat]
    out = np.stack(imgs).reshape(b, v, p, resize[1], resize[0], 3)
    return out
