"""Data augmentation transforms (host-side, HWC numpy).

Capability parity with reference src/dataset.py:134-141 (RandomFlip), with
seeded, stateful RNG instead of the reference's global unseeded ``random``.
"""

from __future__ import annotations

import numpy as np


class RandomFlip:
    """Horizontal flip of input and target with probability 0.5
    (reference flips axis=2 of CHW, i.e. width — here axis=1 of HWC)."""

    def __init__(self, seed: int = 42):
        self.rng = np.random.default_rng(seed)

    def __call__(self, x: np.ndarray, y: np.ndarray):
        if self.rng.random() < 0.5:
            x = np.ascontiguousarray(x[:, ::-1, :])
            y = np.ascontiguousarray(y[:, ::-1, :])
        return x, y
