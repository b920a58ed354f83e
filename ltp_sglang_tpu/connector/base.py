"""Connector base classes (reference connector/base_connector.py:13-130)."""

from __future__ import annotations

import os
import shutil
import tempfile
from abc import ABC, abstractmethod
from typing import Generator, List, Optional, Tuple

import numpy as np


class BaseConnector(ABC):
    """URL-addressed source of model weights and/or KV blobs.

    fs connectors:  <scheme>://<path>/<filename>
    kv connectors:  <scheme>://<host>:<port>/<model>/keys/<key>
    """

    def __init__(self, url: str):
        self.url = url
        self.closed = False
        self.local_dir = tempfile.mkdtemp(prefix="ltp_connector_")

    def get_local_dir(self) -> str:
        return self.local_dir

    @abstractmethod
    def weight_iterator(
        self, rank: int = 0
    ) -> Generator[Tuple[str, np.ndarray], None, None]:
        ...

    @abstractmethod
    def pull_files(
        self,
        allow_pattern: Optional[List[str]] = None,
        ignore_pattern: Optional[List[str]] = None,
    ) -> None:
        """Materialize remote files into local_dir."""
        ...

    def close(self):
        if self.closed:
            return
        self.closed = True
        if os.path.exists(self.local_dir):
            shutil.rmtree(self.local_dir, ignore_errors=True)

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_value, traceback):
        self.close()

    def __del__(self):
        self.close()


class BaseKVConnector(BaseConnector):
    @abstractmethod
    def get(self, key: str) -> Optional[np.ndarray]:
        ...

    @abstractmethod
    def set(self, key: str, value: np.ndarray) -> None:
        ...

    def getstr(self, key: str) -> Optional[str]:
        raise NotImplementedError

    def setstr(self, key: str, value: str) -> None:
        raise NotImplementedError

    def list(self, prefix: str) -> List[str]:
        raise NotImplementedError


class BaseFileConnector(BaseConnector):
    @abstractmethod
    def glob(self, allow_pattern: str) -> List[str]:
        ...
