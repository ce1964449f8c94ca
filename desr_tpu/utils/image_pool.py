"""50%-replay image buffer for discriminator updates.

Reference: util/image_pool.py:5-54. The pool is inherently stateful
batch-to-batch, so it lives on the host between jitted steps; stored samples
are kept as numpy arrays (cheap host RAM, one H2D copy on query).
"""

from __future__ import annotations

import random

import numpy as np


class ImagePool:
    def __init__(self, pool_size=50):
        self.pool_size = pool_size
        self.num_imgs = 0
        self.images = []

    def query(self, images):
        """images: (B, H, W, C) array. Returns a same-shaped mixed batch."""
        if self.pool_size == 0:
            return images
        images = np.asarray(images)
        out = []
        for image in images:
            if self.num_imgs < self.pool_size:
                self.num_imgs += 1
                self.images.append(image.copy())
                out.append(image)
            elif random.uniform(0, 1) > 0.5:
                idx = random.randint(0, self.pool_size - 1)
                tmp = self.images[idx].copy()
                self.images[idx] = image.copy()
                out.append(tmp)
            else:
                out.append(image)
        return np.stack(out, axis=0)
