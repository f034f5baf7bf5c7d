"""Video frame-array transforms over [t, h, w, c] clips.

Behavioral parity with /root/reference/prepare/videotransforms.py (only
CenterCrop is used by the extractors, extract_charades.py:47; the random
transforms are kept for capability parity)."""
import numbers

import numpy as np


class RandomCrop:
    def __init__(self, size):
        if isinstance(size, numbers.Number):
            self.size = (int(size), int(size))
        else:
            self.size = size

    def get_params(self, img, output_size):
        t, h, w, c = img.shape
        th, tw = output_size
        if w == tw and h == th:
            return 0, 0, h, w
        # reference uses random.randint (inclusive upper bound): the maximal
        # offset h-th must be reachable, hence the +1 with numpy's exclusive
        # randint
        i = np.random.randint(0, h - th + 1) if h != th else 0
        j = np.random.randint(0, w - tw + 1) if w != tw else 0
        return i, j, th, tw

    def __call__(self, imgs):
        i, j, h, w = self.get_params(imgs, self.size)
        return imgs[:, i : i + h, j : j + w, :]

    def __repr__(self):
        return self.__class__.__name__ + "(size={0})".format(self.size)


class CenterCrop:
    def __init__(self, size):
        if isinstance(size, numbers.Number):
            self.size = (int(size), int(size))
        else:
            self.size = size

    def __call__(self, imgs):
        t, h, w, c = imgs.shape
        th, tw = self.size
        i = int(np.round((h - th) / 2.0))
        j = int(np.round((w - tw) / 2.0))
        return imgs[:, i : i + th, j : j + tw, :]

    def __repr__(self):
        return self.__class__.__name__ + "(size={0})".format(self.size)


class RandomHorizontalFlip:
    """Horizontally flip the clip with probability p."""

    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, imgs):
        if np.random.random() < self.p:
            return np.flip(imgs, axis=2).copy()
        return imgs

    def __repr__(self):
        return self.__class__.__name__ + "(p={})".format(self.p)


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, imgs):
        for t in self.transforms:
            imgs = t(imgs)
        return imgs
