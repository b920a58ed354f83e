"""ltp_sglang_tpu — a TPU-native LLM serving framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of SGLang
(microsoft/ltp-sglang): continuous batching with chunked prefill, paged KV
cache with RadixAttention prefix reuse, quantized (INT4/FP8) compute paths as
fused Pallas kernels, structured outputs, speculative decoding, MoE/EP, and an
OpenAI-compatible server — all driven by a single controller per host over a
`jax.sharding.Mesh` (no process-per-device; XLA collectives over ICI replace
NCCL).
"""

__version__ = "0.1.0"
