"""Redis KV connector (reference connector/redis.py). Requires the `redis`
package; import-guarded because the serving image may not ship it."""

from __future__ import annotations

import io
from typing import Generator, List, Optional, Tuple
from urllib.parse import urlparse

import numpy as np

from ltp_sglang_tpu.connector.base import BaseKVConnector


def _dumps(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.save(buf, np.asarray(arr), allow_pickle=False)
    return buf.getvalue()


def _loads(raw: bytes) -> np.ndarray:
    return np.load(io.BytesIO(raw), allow_pickle=False)


class RedisConnector(BaseKVConnector):
    def __init__(self, url: str):
        try:
            import redis
        except ImportError as e:  # pragma: no cover - optional dep
            raise RuntimeError(
                "redis:// connector requires the `redis` package"
            ) from e
        super().__init__(url)
        p = urlparse(url)
        self.model_name = p.path.lstrip("/")
        self.connection = redis.Redis(host=p.hostname, port=p.port or 6379)

    def _k(self, key: str) -> str:
        return f"{self.model_name}/keys/{key}"

    def get(self, key: str) -> Optional[np.ndarray]:
        raw = self.connection.get(self._k(key))
        return None if raw is None else _loads(raw)

    def set(self, key: str, value: np.ndarray) -> None:
        self.connection.set(self._k(key), _dumps(value))

    def getstr(self, key: str) -> Optional[str]:
        raw = self.connection.get(self._k(key))
        return None if raw is None else raw.decode()

    def setstr(self, key: str, value: str) -> None:
        self.connection.set(self._k(key), value.encode())

    def list(self, prefix: str) -> List[str]:
        pat = f"{self.model_name}/keys/{prefix}*"
        plen = len(f"{self.model_name}/keys/")
        return sorted(k.decode()[plen:] for k in self.connection.keys(pat))

    def weight_iterator(
        self, rank: int = 0
    ) -> Generator[Tuple[str, np.ndarray], None, None]:
        for key in self.list(""):
            yield key, self.get(key)

    def pull_files(self, allow_pattern=None, ignore_pattern=None) -> None:
        raise NotImplementedError("redis is a KV connector")
