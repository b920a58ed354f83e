"""Small shared helpers (counterpart of sglang's srt/utils.py grab-bag).

Reference: python/sglang/srt/utils.py (only the pieces a TPU single-controller
design needs; the CUDA/process helpers have no equivalent here).
"""

from __future__ import annotations

import logging
import os
import random
from typing import Sequence

import numpy as np

logger = logging.getLogger(__name__)


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


def next_power_of_2(n: int) -> int:
    if n <= 1:
        return 1
    return 1 << (n - 1).bit_length()


def bucketize(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n. Buckets must be sorted ascending."""
    for b in buckets:
        if b >= n:
            return b
    raise ValueError(f"value {n} exceeds largest bucket {buckets[-1]}")


def get_bool_env_var(name: str, default: str = "false") -> bool:
    return os.getenv(name, default).lower() in ("1", "true", "yes", "on")


def get_int_env_var(name: str, default: int) -> int:
    v = os.getenv(name)
    return int(v) if v is not None else default


def set_random_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed % (2**32))
