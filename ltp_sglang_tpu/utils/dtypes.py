"""Dtype name <-> jnp dtype resolution (incl. fp8 variants)."""

from __future__ import annotations

import jax.numpy as jnp

_DTYPE_MAP = {
    "float32": jnp.float32,
    "fp32": jnp.float32,
    "float16": jnp.float16,
    "half": jnp.float16,
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
    "fp8_e4m3": jnp.float8_e4m3fn,
    "float8_e4m3fn": jnp.float8_e4m3fn,
    "fp8_e5m2": jnp.float8_e5m2,
    "float8_e5m2": jnp.float8_e5m2,
    "int8": jnp.int8,
    "int32": jnp.int32,
    "auto": jnp.bfloat16,
}

_BYTES = {
    "float32": 4, "fp32": 4,
    "float16": 2, "half": 2,
    "bfloat16": 2, "bf16": 2,
    "fp8_e4m3": 1, "float8_e4m3fn": 1,
    "fp8_e5m2": 1, "float8_e5m2": 1,
    "int8": 1,
    "int32": 4,
    "auto": 2,
}


def to_jnp_dtype(name):
    if not isinstance(name, str):
        return name
    if name not in _DTYPE_MAP:
        raise ValueError(f"unknown dtype {name!r}")
    return _DTYPE_MAP[name]


def dtype_bytes(name: str) -> int:
    if not isinstance(name, str):
        return jnp.dtype(name).itemsize
    return _BYTES[name]
