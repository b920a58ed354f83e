"""Storage connectors: remote weight / KV sources behind one URL scheme.

Counterpart of connector/ (base_connector.py, redis.py, s3.py, serde/).
TPU-native differences: tensors are numpy (fed to jnp by the loader), the
serde is a plain safetensors/npz container, and a `file://` backend serves
the NFS/local-disk deployments (redis/s3 clients are import-guarded — this
image has zero egress, so they raise a clear error when unavailable rather
than at import).

URLs:
  file:///path/to/dir                 - filesystem tree
  memory://<namespace>                - in-process dict (tests, colocated RL)
  redis://host:port/model             - Redis KV (requires `redis` package)
  s3://bucket/prefix                  - S3 (requires `boto3`)
"""

from __future__ import annotations

import enum
import logging
from urllib.parse import urlparse

from ltp_sglang_tpu.connector.base import (  # noqa: F401
    BaseConnector,
    BaseFileConnector,
    BaseKVConnector,
)
from ltp_sglang_tpu.connector.file import FileConnector, MemoryConnector

logger = logging.getLogger(__name__)


class ConnectorType(str, enum.Enum):
    FS = "filesystem"
    KV = "KV"


def create_remote_connector(url: str) -> BaseConnector:
    scheme = urlparse(url).scheme
    if scheme == "file":
        return FileConnector(url)
    if scheme == "memory":
        return MemoryConnector(url)
    if scheme == "redis":
        from ltp_sglang_tpu.connector.redis import RedisConnector

        return RedisConnector(url)
    if scheme == "s3":
        from ltp_sglang_tpu.connector.s3 import S3Connector

        return S3Connector(url)
    raise ValueError(f"unsupported connector url: {url}")


def get_connector_type(client: BaseConnector) -> ConnectorType:
    if isinstance(client, BaseKVConnector):
        return ConnectorType.KV
    return ConnectorType.FS
