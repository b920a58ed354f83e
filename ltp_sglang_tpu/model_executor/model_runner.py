"""ModelRunner: owns params, KV cache, and the jitted step-function ladder.

Counterpart of model_executor/model_runner.py:151-1786 redesigned for XLA:

- CUDA graphs -> a cache of jit-compiled step functions keyed by the padded
  (B, E, C) bucket (SURVEY A.5 translation). Each step fuses: req_to_token
  update, KV write, all layers, logits, and sampling into ONE device program,
  with KV/table buffers donated so updates are in-place.
- The req_to_token table lives on device ([R+1, MAXCTX], row R = scatter dump
  for padded lanes). Decode appends slots in-jit (no per-step H2D of page
  tables); extend steps upload full rows (host radix cache is the source of
  truth for prefix re-linking).
- Sampling runs in the same program; next tokens come back as one small D2H
  transfer (the async-dispatch analog of the overlap scheduler's future
  tokens, SURVEY §3.3).
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.config.server_args import ServerArgs
from ltp_sglang_tpu.mem_cache.allocator import (
    PagedTokenToKVPoolAllocator,
    TokenToKVPoolAllocator,
)
from ltp_sglang_tpu.mem_cache.req_to_token import ReqToTokenPool
from ltp_sglang_tpu.model_executor.forward_batch import ForwardBatch, ForwardMode
from ltp_sglang_tpu.model_loader.loader import load_model_weights
from ltp_sglang_tpu.models.llama import StepArrays
from ltp_sglang_tpu.models.registry import resolve_model_cls
from ltp_sglang_tpu.ops.sampling import apply_logit_processing, sample_tokens
from ltp_sglang_tpu.parallel.mesh import MeshContext, shard_pytree
from ltp_sglang_tpu.utils.dtypes import to_jnp_dtype

logger = logging.getLogger(__name__)


class ModelRunner:
    def __init__(
        self,
        model_config: ModelConfig,
        server_args: ServerArgs,
        mesh_ctx: Optional[MeshContext] = None,
    ):
        self.model_config = model_config
        self.server_args = server_args
        self.mesh_ctx = mesh_ctx
        self.dtype = to_jnp_dtype(model_config.dtype)
        kv_dtype_name = (
            model_config.kv_cache_dtype
            if model_config.kv_cache_dtype != "auto"
            else model_config.dtype
        )
        self.kv_dtype = to_jnp_dtype(kv_dtype_name)

        model_cls = resolve_model_cls(model_config.architectures)
        self.model = model_cls(model_config)

        self.load_model()
        self.init_memory_pool()
        self._step_cache: Dict[Tuple, Any] = {}
        self._rng_key = jax.random.PRNGKey(server_args.random_seed)
        self._step_counter = 0
        self._dirty_rows: Dict[int, np.ndarray] = {}

    # ------------------------------------------------------------------ init
    def load_model(self):
        t0 = time.time()
        load_format = self.server_args.load_format
        if load_format == "auto":
            import glob as _glob
            import os as _os

            has_files = bool(
                _glob.glob(_os.path.join(self.model_config.model_path, "*.safetensors"))
            ) or bool(_glob.glob(_os.path.join(self.model_config.model_path, "*.bin")))
            load_format = "safetensors" if has_files else "dummy"
        self.params = load_model_weights(
            self.model,
            self.model_config.model_path,
            load_format="dummy" if load_format == "dummy" else "auto",
            seed=self.server_args.random_seed,
        )
        if self.mesh_ctx is not None and not self.mesh_ctx.is_single_device:
            self.params = shard_pytree(self.params, self.model.param_specs(), self.mesh_ctx)
        logger.info("Model loaded in %.1fs (format=%s)", time.time() - t0, load_format)

    def profile_max_num_tokens(self) -> int:
        """KV pool sizing from free device memory (ModelRunner.
        profile_max_num_token, model_runner.py:955)."""
        if self.server_args.max_total_tokens is not None:
            return self.server_args.max_total_tokens
        try:
            stats = jax.devices()[0].memory_stats()
            limit = stats.get("bytes_limit", 0)
            in_use = stats.get("bytes_in_use", 0)
            free = (limit - in_use) * self.server_args.mem_fraction_static
            per_token = self.model_config.kv_cache_bytes_per_token()
            n_dev = self.mesh_ctx.mesh.devices.size if self.mesh_ctx else 1
            # KV is sharded over tp: per-chip bytes divide by tp_size.
            tp = self.mesh_ctx.tp_size if self.mesh_ctx else 1
            tokens = int(free * n_dev / per_token)
            if tokens <= 0:
                raise ValueError
            return min(tokens, 4_000_000)
        except Exception:
            logger.warning("memory profiling unavailable; defaulting KV pool to 2^16 tokens")
            return 65536

    def init_memory_pool(self):
        cfg = self.model_config
        args = self.server_args
        self.max_total_num_tokens = self.profile_max_num_tokens()
        page_size = args.page_size
        # Round down to page multiple; +1 for the garbage slot handled inside.
        self.max_total_num_tokens = (
            self.max_total_num_tokens // page_size * page_size
        )

        max_reqs = args.max_running_requests
        if max_reqs is None:
            max_reqs = min(
                max(self.max_total_num_tokens // cfg.context_len, 1) * 4, 4096
            )
        self.max_running_requests = max_reqs

        self.req_to_token_pool = ReqToTokenPool(max_reqs, cfg.context_len)
        if page_size == 1:
            self.token_to_kv_pool_allocator = TokenToKVPoolAllocator(
                self.max_total_num_tokens
            )
        else:
            self.token_to_kv_pool_allocator = PagedTokenToKVPoolAllocator(
                self.max_total_num_tokens, page_size
            )

        # Device KV cache [L, S+1, Hkv, D] (+1 garbage slot 0) and req table.
        L = cfg.num_layers
        S = self.max_total_num_tokens + 1
        Hkv, D = cfg.num_kv_heads, cfg.head_dim
        kv_sharding = None
        if self.mesh_ctx is not None and not self.mesh_ctx.is_single_device:
            from jax.sharding import PartitionSpec as P

            kv_sharding = self.mesh_ctx.sharding(P(None, None, "tp", None))
        self.k_cache = jnp.zeros((L, S, Hkv, D), dtype=self.kv_dtype, device=kv_sharding)
        self.v_cache = jnp.zeros((L, S, Hkv, D), dtype=self.kv_dtype, device=kv_sharding)
        table_sharding = self.mesh_ctx.replicated() if kv_sharding is not None else None
        self.req_table = jnp.zeros(
            (max_reqs + 1, cfg.context_len), dtype=jnp.int32, device=table_sharding
        )
        self.dump_req_row = max_reqs
        logger.info(
            "KV pool: %d tokens x %d layers x %d kv heads x %d dims (%s), %d req slots",
            self.max_total_num_tokens, L, Hkv, D, str(self.kv_dtype.__name__ if hasattr(self.kv_dtype, '__name__') else self.kv_dtype), max_reqs,
        )

    # ----------------------------------------------------------------- steps
    def _build_step_fn(self, mode_is_decode: bool, C: int, has_logit_bias: bool,
                       return_logits: bool):
        model = self.model

        def step_fn(
            params,
            k_cache,
            v_cache,
            table,
            input_ids,
            positions,
            cache_locs,
            req_indices,
            seq_lens,
            prefix_lens,
            extend_lens,
            kv_indices_in,  # [B, C] for extend; unused (dummy [1,1]) for decode
            temperatures,
            top_ps,
            top_ks,
            min_ps,
            logit_bias,  # [B, V] or dummy [1, 1]
            step_idx,
        ):
            B, E = input_ids.shape
            if mode_is_decode:
                # Append this step's slot, then read rows from the table.
                table = table.at[req_indices, jnp.maximum(seq_lens - 1, 0)].set(
                    cache_locs[:, 0]
                )
                kv_indices = table[req_indices, :C]
            else:
                # Host provided full rows (prefix + new); persist them.
                table = table.at[req_indices, :C].set(kv_indices_in)
                kv_indices = kv_indices_in

            step = StepArrays(
                input_ids=input_ids,
                positions=positions,
                cache_locs=cache_locs,
                seq_lens=seq_lens,
                prefix_lens=prefix_lens,
                extend_lens=extend_lens,
                kv_indices=kv_indices,
            )
            logits, k_cache, v_cache = model.forward(params, step, k_cache, v_cache)
            logits = apply_logit_processing(
                logits, logit_bias if has_logit_bias else None, None
            )
            key = jax.random.fold_in(self._rng_key, step_idx)
            tokens = sample_tokens(logits, temperatures, top_ps, top_ks, min_ps, key)
            out_logits = logits if return_logits else jnp.zeros((0,), jnp.float32)
            return tokens, out_logits, k_cache, v_cache, table

        return jax.jit(step_fn, donate_argnums=(1, 2, 3))

    def _get_step_fn(self, fb: ForwardBatch, has_logit_bias: bool, return_logits: bool):
        B, E = fb.input_ids.shape
        key = (fb.mode == ForwardMode.DECODE, B, E, fb.kv_bucket, has_logit_bias,
               return_logits)
        fn = self._step_cache.get(key)
        if fn is None:
            t0 = time.time()
            fn = self._build_step_fn(key[0], fb.kv_bucket, has_logit_bias, return_logits)
            self._step_cache[key] = fn
            logger.info(
                "compiling step fn mode=%s B=%d E=%d C=%d",
                "decode" if key[0] else "extend", B, E, fb.kv_bucket,
            )
        return fn

    def mark_row_dirty(self, req_idx: int):
        """Host radix relink changed this request's token row; re-upload it
        before the next device step."""
        self._dirty_rows[req_idx] = self.req_to_token_pool.req_to_token[req_idx].copy()

    def _flush_dirty_rows(self):
        if not self._dirty_rows:
            return
        idx = np.array(list(self._dirty_rows.keys()), dtype=np.int32)
        rows = np.stack(list(self._dirty_rows.values()))
        self.req_table = _row_update(self.req_table, jnp.asarray(idx), jnp.asarray(rows))
        self._dirty_rows.clear()

    def forward(self, fb: ForwardBatch, return_logits: bool = False):
        """Run one step. Returns (next_token_ids device array [B], logits or None)."""
        self._flush_dirty_rows()
        si = fb.sampling_info
        B, E = fb.input_ids.shape
        C = fb.kv_bucket

        if fb.mode == ForwardMode.DECODE:
            kv_indices = np.zeros((1, 1), dtype=np.int32)
        else:
            # Full rows from the host table (prefix slots + new slots already
            # written by the scheduler's prepare_for_extend).
            rows = self.req_to_token_pool.req_to_token[
                np.minimum(fb.req_indices, self.req_to_token_pool.size - 1), :C
            ]
            # Padded rows must not corrupt real rows: their req_indices already
            # point at the dump row; contents are irrelevant.
            kv_indices = np.ascontiguousarray(rows)

        has_logit_bias = si is not None and si.logit_bias is not None
        logit_bias = (
            si.logit_bias if has_logit_bias else np.zeros((1, 1), dtype=np.float32)
        )

        fn = self._get_step_fn(fb, has_logit_bias, return_logits)
        self._step_counter += 1
        tokens, logits, self.k_cache, self.v_cache, self.req_table = fn(
            self.params,
            self.k_cache,
            self.v_cache,
            self.req_table,
            fb.input_ids,
            fb.positions,
            fb.cache_locs,
            fb.req_indices,
            fb.seq_lens,
            fb.prefix_lens,
            fb.extend_lens,
            kv_indices,
            si.temperatures,
            si.top_ps,
            si.top_ks,
            si.min_ps,
            logit_bias,
            np.int32(self._step_counter),
        )
        return tokens, (logits if return_logits else None)

    # -------------------------------------------------------------- utilities
    def flush_cache(self):
        self.req_to_token_pool.clear()
        self.token_to_kv_pool_allocator.clear()

    def update_weights_from_params(self, params):
        """Weight hot-swap (update_weights_from_tensor analog)."""
        if self.mesh_ctx is not None and not self.mesh_ctx.is_single_device:
            params = shard_pytree(params, self.model.param_specs(), self.mesh_ctx)
        self.params = params


@functools.partial(jax.jit, donate_argnums=(0,))
def _row_update(table, idx, rows):
    return table.at[idx].set(rows)
