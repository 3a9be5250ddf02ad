"""Misc utilities (reference `oscar/utils/misc.py`)."""

from __future__ import annotations

import errno
import os
import random
from typing import Any, List, Sequence

import numpy as np


def mkdir(path: str) -> None:
    try:
        os.makedirs(path)
    except OSError as e:
        if e.errno != errno.EEXIST:
            raise


def set_seed(seed: int, _n_gpu: int = 0) -> None:
    random.seed(seed)
    np.random.seed(seed)


def load_from_yaml_file(path: str) -> Any:
    import yaml
    with open(path) as f:
        return yaml.safe_load(f)


def weighted_sample(weights: Sequence[float], rng: random.Random) -> int:
    """Sample an index proportional to weights (reference misc.py:weighted_sample)."""
    total = float(sum(weights))
    r = rng.random() * total
    acc = 0.0
    for i, w in enumerate(weights):
        acc += w
        if r <= acc:
            return i
    return len(weights) - 1
