"""file:// and memory:// connectors (the TPU pod deployments mount weights
over NFS/GCS-fuse, so a filesystem connector is the primary remote here;
memory:// backs tests and colocated RLHF weight hand-off)."""

from __future__ import annotations

import fnmatch
import glob as _glob
import os
import shutil
from typing import Dict, Generator, List, Optional, Tuple
from urllib.parse import urlparse

import numpy as np

from ltp_sglang_tpu.connector.base import BaseFileConnector, BaseKVConnector


def _iter_safetensors(path: str):
    from safetensors import safe_open

    for f in sorted(_glob.glob(os.path.join(path, "*.safetensors"))):
        with safe_open(f, framework="np") as sf:
            for name in sf.keys():
                yield name, sf.get_tensor(name)


class FileConnector(BaseFileConnector):
    """file:///abs/path — serves a local/NFS checkpoint tree."""

    def __init__(self, url: str):
        super().__init__(url)
        p = urlparse(url)
        self.root = p.path if not p.netloc else f"/{p.netloc}{p.path}"
        if not os.path.isdir(self.root):
            raise FileNotFoundError(f"connector root not found: {self.root}")

    def glob(self, allow_pattern: str) -> List[str]:
        return sorted(
            os.path.relpath(f, self.root)
            for f in _glob.glob(os.path.join(self.root, allow_pattern))
        )

    def weight_iterator(
        self, rank: int = 0
    ) -> Generator[Tuple[str, np.ndarray], None, None]:
        yield from _iter_safetensors(self.root)

    def pull_files(
        self,
        allow_pattern: Optional[List[str]] = None,
        ignore_pattern: Optional[List[str]] = None,
    ) -> None:
        names = set()
        for pat in allow_pattern or ["*"]:
            names.update(self.glob(pat))
        for pat in ignore_pattern or []:
            names -= set(fnmatch.filter(names, pat))
        for rel in sorted(names):
            src = os.path.join(self.root, rel)
            if not os.path.isfile(src):
                continue
            dst = os.path.join(self.local_dir, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.copy2(src, dst)


class MemoryConnector(BaseKVConnector):
    """memory://<namespace> — process-local KV store. Used by tests and by
    colocated trainers handing updated weights to the engine without disk."""

    _stores: Dict[str, Dict[str, np.ndarray]] = {}
    _strs: Dict[str, Dict[str, str]] = {}

    def __init__(self, url: str):
        super().__init__(url)
        ns = urlparse(url).netloc or "default"
        self.kv = self._stores.setdefault(ns, {})
        self.strs = self._strs.setdefault(ns, {})

    def get(self, key: str) -> Optional[np.ndarray]:
        return self.kv.get(key)

    def set(self, key: str, value: np.ndarray) -> None:
        self.kv[key] = np.asarray(value)

    def getstr(self, key: str) -> Optional[str]:
        return self.strs.get(key)

    def setstr(self, key: str, value: str) -> None:
        self.strs[key] = value

    def list(self, prefix: str) -> List[str]:
        return sorted(k for k in self.kv if k.startswith(prefix))

    def weight_iterator(
        self, rank: int = 0
    ) -> Generator[Tuple[str, np.ndarray], None, None]:
        for k in self.list(""):
            yield k, self.kv[k]

    def pull_files(self, allow_pattern=None, ignore_pattern=None) -> None:
        pass
