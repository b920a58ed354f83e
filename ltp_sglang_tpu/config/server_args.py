"""Server/engine configuration.

TPU-native counterpart of the reference's ServerArgs dataclass
(python/sglang/srt/server_args.py:50-275). We keep the same field names where
behavior is identical so users of the reference find their flags; fields tied
to CUDA-process architecture (gpu_id math, nccl ports, cuda graph flags) are
replaced by mesh/bucket equivalents.
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
from typing import List, Optional

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class ServerArgs:
    # Model and tokenizer
    model_path: str = ""
    tokenizer_path: Optional[str] = None
    load_format: str = "auto"  # auto | safetensors | dummy
    dtype: str = "bfloat16"
    kv_cache_dtype: str = "auto"  # auto | bfloat16 | float32 | fp8_e4m3 | int8
    context_length: Optional[int] = None
    revision: Optional[str] = None
    model_override_args: Optional[dict] = None
    quantization: Optional[str] = None  # awq | gptq | fp8 | w8a8_int8 | None
    random_seed: int = 42

    # Serving
    host: str = "127.0.0.1"
    port: int = 30000
    served_model_name: Optional[str] = None
    api_key: Optional[str] = None

    # Memory / KV cache
    mem_fraction_static: Optional[float] = None
    max_total_tokens: Optional[int] = None
    max_running_requests: Optional[int] = None
    max_queued_requests: Optional[int] = None
    page_size: int = 1
    swa_full_tokens_ratio: float = 0.8

    # Scheduling
    max_prefill_tokens: int = 16384
    chunked_prefill_size: Optional[int] = None  # None => auto; -1 disables
    # Prefill coalescing window (ms): while a request burst is still landing
    # and decode keeps the chip busy, admission waits this long so the burst
    # prefills as a few large batches instead of a trickle of tiny ones
    # (Scheduler._should_defer_prefill). 0 disables.
    prefill_coalesce_ms: float = 2.0
    schedule_policy: str = "fcfs"  # fcfs | lpm | dfs-weight | lof | random
    schedule_conservativeness: float = 1.0
    stream_interval: int = 1
    # Decode steps executed per device program (on-device token feedback);
    # the TPU analog of the reference's zero-overhead overlap scheduler.
    # 1 = sync every token (needed for grammar-constrained requests).
    decode_window_size: int = 8
    # Chain decode windows on device (window N+1's input token read from
    # window N's output without a host sync); see Scheduler.event_loop_step.
    disable_window_pipeline: bool = False
    disable_radix_cache: bool = False
    # Hybrid SWA memory pool (per-request KV rings for sliding-window
    # layers); reference --disable-hybrid-swa-memory.
    disable_swa_memory_pool: bool = False
    # Ring-snapshot regions backing cross-request SWA prefix reuse
    # (mem_cache/swa_radix_cache.py); 0 disables the SWA radix cache.
    swa_snapshot_slots: int = 16
    radix_cache_backend: str = "python"  # python | cpp (ctypes C++ tree)
    # Hierarchical KV cache: device tier + host-RAM write-back tier.
    enable_hierarchical_cache: bool = False
    hicache_host_tokens: int = 1 << 20
    # Host-tier write policy (reference hiradix_cache.py:120-204).
    hicache_write_policy: str = "write_through_selective"
    hicache_write_threshold: int = 2
    # File-backed host arena (the storage tier; reference HiCacheStorage).
    hicache_storage_dir: Optional[str] = None
    # Remote third tier (mem_cache/hicache_storage.py): a KV-connector URL
    # (memory://ns, redis://..., s3://...). Host-arena eviction demotes
    # spans there hash-keyed; prefix matches promote them back.
    hicache_storage_url: Optional[str] = None
    # Host->device load-back layer-range chunks (per-layer overlap;
    # reference LayerDoneCounter, managers/cache_controller.py:32-62).
    hicache_layer_chunks: int = 4
    # Run running-batch decode steps INSIDE prefill programs as 1-token
    # extends (ForwardMode.MIXED; reference scheduler.py:1646 mixed batches)
    # so decodes don't stall behind long chunks.
    enable_mixed_chunk: bool = False
    disable_overlap_schedule: bool = False
    retract_decode_steps: int = 20
    num_reserved_decode_tokens: int = 512
    watchdog_timeout: float = 300.0
    watchdog_action: str = "exit"  # "exit" (reference SIGQUIT analog) | "log"
    crash_dump_folder: Optional[str] = None

    # Parallelism (mesh axes sizes)
    tp_size: int = 1
    dp_size: int = 1
    pp_size: int = 1
    ep_size: int = 1
    enable_dp_attention: bool = False
    # Two-batch overlap (reference two_batch_overlap.py): the EP MoE splits
    # its per-chip tokens into two independent micro-batch pipelines so
    # XLA's latency-hiding scheduler overlaps one's a2a with the other's
    # expert GEMMs (layers/moe.py moe_ffn_ep_a2a tbo=True).
    enable_two_batch_overlap: bool = False
    # EPLB periodic auto-rebalance (reference eplb/eplb_manager.py:16):
    # every N scheduler forward passes, rebalance expert placement from the
    # recorded distribution iff it beats the current placement's imbalance
    # by > eplb_min_rebalance_gain (relative). 0 disables (HTTP
    # /rebalance_experts stays available for manual control).
    eplb_rebalance_every: int = 0
    eplb_redundant_experts: int = 0
    eplb_min_rebalance_gain: float = 0.05
    # Request dispatch across dp-attention groups (reference
    # data_parallel_controller.py:48-56).
    load_balance_method: str = "shortest_queue"  # round_robin | minimum_tokens
    node_rank: int = 0
    nnodes: int = 1
    dist_init_addr: Optional[str] = None

    # Attention / kernels
    attention_backend: Optional[str] = None  # None => auto (pallas on tpu, reference on cpu)
    sampling_backend: str = "jax"
    decode_bs_buckets: Optional[List[int]] = None
    prefill_token_buckets: Optional[List[int]] = None
    context_buckets: Optional[List[int]] = None

    # Speculative decoding
    speculative_algorithm: Optional[str] = None  # EAGLE | EAGLE3 | STANDALONE
    speculative_draft_model_path: Optional[str] = None
    speculative_num_steps: int = 5
    speculative_eagle_topk: int = 4
    speculative_num_draft_tokens: int = 8

    # Structured output
    grammar_backend: str = "native"
    # Requests whose grammar has not compiled within this many seconds are
    # aborted (reference grammar_queue timeout, scheduler.py:2017-2081).
    grammar_compile_timeout: float = 60.0
    tool_call_parser: str = "qwen25"  # llama3 | qwen25 | mistral | pythonic
    # Named template from chat_template.py; None = tokenizer's own template,
    # falling back to a registry match on the model path.
    chat_template: Optional[str] = None
    reasoning_parser: Optional[str] = None  # e.g. "deepseek-r1"

    # Observability
    log_level: str = "info"
    log_requests: bool = False
    enable_metrics: bool = False
    decode_log_interval: int = 40
    enable_nan_detection: bool = False
    # Precompile the bucket ladder before accepting traffic (the reference's
    # startup CUDA-graph capture analog). Slower start, no first-hit stalls.
    warmup_buckets: bool = False

    # LoRA
    lora_paths: Optional[List[str]] = None
    max_loras_per_batch: int = 8

    # Per-request custom logit processors (reference
    # --enable-custom-logit-processor + sampling/custom_logit_processor.py).
    # Opt-in: processor rows sample on host and force decode-window K=1.
    enable_custom_logit_processor: bool = False

    # Double sparsity (reference server_args.py:206-211 /
    # layers/attention/double_sparsity_backend.py): decode attention reads a
    # small per-layer "label" cache (heavy channels of K), picks the
    # ds_heavy_token_num highest-scoring tokens per request, and attends
    # exactly over only those rows. TPU design note: selection is per
    # REQUEST (union over heads) — the DMA row layout stores all kv heads in
    # one row, so per-head token sets would read-amplify the gather 8x.
    enable_double_sparsity: bool = False
    ds_channel_config_path: Optional[str] = None  # json: per-layer channels
    ds_heavy_channel_num: int = 32
    ds_heavy_token_num: int = 256
    ds_heavy_channel_type: str = "auto"  # auto (k-proj norm) | q | k | qk
    ds_sparse_decode_threshold: int = 4096  # dense below this kv bucket

    # PD disaggregation
    disaggregation_mode: str = "null"  # null | prefill | decode
    # 0 = pick an ephemeral port (exposed as engine.pd_prefill.port).
    disaggregation_bootstrap_port: int = 0
    disaggregation_transfer_backend: str = "socket"  # socket | fake
    pd_transfer_timeout: float = 60.0

    def __post_init__(self):
        if self.tokenizer_path is None:
            self.tokenizer_path = self.model_path
        if self.served_model_name is None:
            self.served_model_name = self.model_path
        if self.chunked_prefill_size is None:
            self.chunked_prefill_size = 4096
        if self.mem_fraction_static is None:
            # Reference auto-tunes by tp size (server_args.py post-init); one
            # host-controller per TPU slice lets us keep a single default.
            self.mem_fraction_static = 0.85
        if self.decode_bs_buckets is None:
            self.decode_bs_buckets = [1, 2, 4, 8, 16, 32, 64, 128, 256]
        if self.prefill_token_buckets is None:
            self.prefill_token_buckets = [64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384]
        if self.context_buckets is None:
            # 128/192 rungs cut short-context decode's attention reads ~25%
            # (KV pages pad to the bucket); measured +3% decode tok/s on the
            # llama-3B bench geometry (ctx 64..160) on v5e.
            self.context_buckets = [128, 192, 256, 512, 1024, 2048, 4096, 8192, 16384, 32768, 65536, 131072]

    # ------------------------------------------------------------------ CLI
    @staticmethod
    def add_cli_args(parser: argparse.ArgumentParser) -> None:
        for f in dataclasses.fields(ServerArgs):
            name = "--" + f.name.replace("_", "-")
            default = None
            if f.default is not dataclasses.MISSING:
                default = f.default
            if f.type in ("bool", bool):
                parser.add_argument(name, action="store_true", default=default)
            elif f.type in ("Optional[List[str]]", "List[str]"):
                parser.add_argument(name, type=str, nargs="*", default=default)
            elif f.type in ("Optional[List[int]]", "List[int]"):
                parser.add_argument(name, type=int, nargs="*", default=default)
            elif f.type in ("Optional[int]", "int"):
                parser.add_argument(name, type=int, default=default)
            elif f.type in ("Optional[float]", "float"):
                parser.add_argument(name, type=float, default=default)
            elif f.type in ("Optional[dict]",):
                continue
            else:
                parser.add_argument(name, type=str, default=default)

    @classmethod
    def from_cli_args(cls, args: argparse.Namespace) -> "ServerArgs":
        kwargs = {}
        for f in dataclasses.fields(cls):
            if hasattr(args, f.name):
                kwargs[f.name] = getattr(args, f.name)
        return cls(**kwargs)

    def check_server_args(self) -> None:
        assert self.dp_size >= 1 and self.tp_size >= 1 and self.pp_size >= 1
        assert self.page_size >= 1
        if self.disaggregation_mode != "null":
            assert self.disaggregation_mode in ("prefill", "decode")


def prepare_server_args(argv: List[str]) -> ServerArgs:
    parser = argparse.ArgumentParser(description="ltp_sglang_tpu server")
    ServerArgs.add_cli_args(parser)
    args = parser.parse_args(argv)
    server_args = ServerArgs.from_cli_args(args)
    server_args.check_server_args()
    return server_args
