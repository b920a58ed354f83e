"""S3 file connector (reference connector/s3.py). Requires `boto3`;
import-guarded — the TPU serving image has zero egress, so this backend is
for deployments with object-store access."""

from __future__ import annotations

import fnmatch
import os
import tempfile
from typing import Generator, List, Optional, Tuple
from urllib.parse import urlparse

import numpy as np

from ltp_sglang_tpu.connector.base import BaseFileConnector


class S3Connector(BaseFileConnector):
    def __init__(self, url: str):
        try:
            import boto3
        except ImportError as e:  # pragma: no cover - optional dep
            raise RuntimeError("s3:// connector requires `boto3`") from e
        super().__init__(url)
        p = urlparse(url)
        self.bucket = p.netloc
        self.prefix = p.path.lstrip("/")
        self.client = boto3.client("s3")

    def glob(self, allow_pattern: str) -> List[str]:
        paginator = self.client.get_paginator("list_objects_v2")
        keys = []
        for page in paginator.paginate(Bucket=self.bucket, Prefix=self.prefix):
            for obj in page.get("Contents", []):
                rel = obj["Key"][len(self.prefix):].lstrip("/")
                if fnmatch.fnmatch(rel, allow_pattern):
                    keys.append(rel)
        return sorted(keys)

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
            dst = os.path.join(self.local_dir, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            self.client.download_file(
                self.bucket, f"{self.prefix}/{rel}".lstrip("/"), dst
            )

    def weight_iterator(
        self, rank: int = 0
    ) -> Generator[Tuple[str, np.ndarray], None, None]:
        from safetensors import safe_open

        for rel in self.glob("*.safetensors"):
            with tempfile.NamedTemporaryFile(suffix=".safetensors") as tmp:
                self.client.download_file(
                    self.bucket, f"{self.prefix}/{rel}".lstrip("/"), tmp.name
                )
                with safe_open(tmp.name, framework="np") as sf:
                    for name in sf.keys():
                        yield name, sf.get_tensor(name)
