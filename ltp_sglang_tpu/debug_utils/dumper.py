"""Tensor dumper for cross-implementation debugging.

Counterpart of debug_utils/dumper.py (reference `_Dumper`): dump named
arrays per forward pass to disk, then diff two dump trees with
`dump_comparator`. TPU notes: works on host values (numpy / jax arrays are
snapshotted with `np.asarray`, forcing a device sync) — call it OUTSIDE jit,
or pass values already fetched. For in-jit dumping use `dump_in_jit`, which
routes through `jax.debug.callback` (ordered, works under jit/scan but adds
a host sync per dumped value — debugging only).

Env: LTP_DUMPER_ENABLE=0 disables, LTP_DUMPER_DIR sets the output root.
"""

from __future__ import annotations

import os
import time
from pathlib import Path
from typing import Optional

import numpy as np


class _Dumper:
    def __init__(self):
        self._enable = bool(int(os.environ.get("LTP_DUMPER_ENABLE", "1")))
        self._base_dir = Path(os.environ.get("LTP_DUMPER_DIR", "/tmp"))
        self._partial_name: Optional[str] = None
        self._dump_index = 0
        self._forward_pass_id = 0

    def on_forward_pass_start(self):
        self._forward_pass_id += 1

    @property
    def dir(self) -> Path:
        if self._partial_name is None:
            self._partial_name = (
                f"ltp_dump_{time.time_ns()}_{os.getpid()}_{id(self) & 0xFFFF}"
            )
        return self._base_dir / self._partial_name

    def dump(self, name: str, value, **kwargs):
        """Save one array as <dir>/pass<P>__<name>__k=v.npy."""
        if not self._enable:
            return
        if self._forward_pass_id == 0:
            self.on_forward_pass_start()
        self._dump_index += 1
        parts = [f"pass={self._forward_pass_id:05d}", f"i={self._dump_index:06d}",
                 name] + [f"{k}={v}" for k, v in sorted(kwargs.items())]
        fname = "__".join(str(p) for p in parts) + ".npy"
        self.dir.mkdir(parents=True, exist_ok=True)
        arr = np.asarray(value)  # device sync for jax arrays
        np.save(self.dir / fname, arr)

    def dump_in_jit(self, name: str, value, **kwargs):
        """Dump from inside a jitted function via an ordered host callback."""
        if not self._enable:
            return
        import jax

        jax.debug.callback(
            lambda v: self.dump(name, v, **kwargs), value, ordered=True
        )


dumper = _Dumper()
