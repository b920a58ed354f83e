"""Activation functions (functional).

Reference: sgl-kernel silu_and_mul / gelu_and_mul / gelu_tanh_and_mul fused
CUDA ops (csrc/elementwise/). XLA fuses these on TPU; plain jnp suffices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def silu_and_mul(gate_up):
    """gate_up: [..., 2*I] -> silu(gate) * up, matching the reference layout
    where gate is the first half."""
    gate, up = jnp.split(gate_up, 2, axis=-1)
    return jax.nn.silu(gate) * up


def gelu_and_mul(gate_up, approximate: str = "tanh"):
    gate, up = jnp.split(gate_up, 2, axis=-1)
    return jax.nn.gelu(gate, approximate=(approximate == "tanh")) * up


ACT2FN = {
    "silu": jax.nn.silu,
    "gelu": jax.nn.gelu,
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
}
