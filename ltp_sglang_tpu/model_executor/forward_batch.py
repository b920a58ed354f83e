"""Forward-batch metadata: the host-side description of one device step.

Counterpart of ForwardBatch / ForwardMode (model_executor/forward_batch_info.py:
68-300), redesigned for XLA's static-shape compilation model:

- The reference builds GPU tensors per step and relies on CUDA graphs for
  decode; we instead pad every batch into a (B, E, C) *bucket* and jit-compile
  one step function per bucket (the TPU translation of the CUDA-graph ladder,
  SURVEY A.5).
- DECODE is the E=1 special case of EXTEND, so a single compiled step family
  covers both; MIXED (chunked prefill + decode) batches also fit this layout.
- Token layout is [B, E] padded-per-request rather than the reference's
  flattened ragged layout: per-request padding is what maps onto the MXU and
  lets one attention kernel serve prefill/extend/decode.

All arrays here are host numpy; ModelRunner ships them to device.
"""

from __future__ import annotations

import dataclasses
from enum import IntEnum, auto
from typing import List, Optional

import numpy as np

from ltp_sglang_tpu.sampling.sampling_batch_info import SamplingBatchInfo
from ltp_sglang_tpu.utils import bucketize


class ForwardMode(IntEnum):
    EXTEND = auto()
    DECODE = auto()
    MIXED = auto()
    IDLE = auto()
    TARGET_VERIFY = auto()
    DRAFT_EXTEND = auto()

    def is_extend(self):
        return self in (ForwardMode.EXTEND, ForwardMode.MIXED, ForwardMode.DRAFT_EXTEND)

    def is_decode(self):
        return self == ForwardMode.DECODE

    def is_idle(self):
        return self == ForwardMode.IDLE


@dataclasses.dataclass
class ForwardBatch:
    """Padded, bucketed arrays describing one step. B/E/C are bucket sizes."""

    mode: ForwardMode
    batch_size: int  # real (un-padded) number of requests
    input_ids: np.ndarray  # [B, E] int32
    positions: np.ndarray  # [B, E] int32 absolute positions (pad: 0)
    cache_locs: np.ndarray  # [B, E] int32 KV slot per new token (pad: 0)
    req_indices: np.ndarray  # [B] int32 request-pool rows (pad rows: dump row)
    seq_lens: np.ndarray  # [B] int32 post-step total kv len (pad: 0)
    prefix_lens: np.ndarray  # [B] int32 cached-prefix length (pad: 0)
    extend_lens: np.ndarray  # [B] int32 new tokens this step (pad: 0)
    kv_bucket: int  # C: static max kv length this step
    sampling_info: Optional[SamplingBatchInfo] = None
    vocab_mask: Optional[np.ndarray] = None  # [B, V] bool (grammar constraints)
    lora_ids: Optional[np.ndarray] = None  # [B] int32 adapter ids (0 = none)
    # VLM embedding injection over placeholder positions (models/llava.py).
    mm_embeds: Optional[np.ndarray] = None  # [B, E, Dm] float
    mm_mask: Optional[np.ndarray] = None  # [B, E] bool

    @property
    def bucket_key(self):
        return (self.input_ids.shape[0], self.input_ids.shape[1], self.kv_bucket)


def build_forward_batch(
    mode: ForwardMode,
    *,
    input_ids_list: List[np.ndarray],  # per-request new token ids
    prefix_lens: List[int],
    seq_lens: List[int],  # post-step totals (prefix + new)
    cache_locs_list: List[np.ndarray],  # per-request new-token kv slots
    req_indices: List[int],
    sampling_info: Optional[SamplingBatchInfo],
    bs_buckets: List[int],
    extend_buckets: List[int],
    context_buckets: List[int],
    dump_req_row: int,
    lora_ids_list: Optional[List[int]] = None,
) -> ForwardBatch:
    n = len(input_ids_list)
    B = bucketize(n, bs_buckets)
    max_extend = max(len(x) for x in input_ids_list)
    E = 1 if mode == ForwardMode.DECODE else bucketize(max_extend, extend_buckets)
    C = bucketize(max(seq_lens), context_buckets)

    input_ids = np.zeros((B, E), dtype=np.int32)
    positions = np.zeros((B, E), dtype=np.int32)
    cache_locs = np.zeros((B, E), dtype=np.int32)
    req_idx = np.full((B,), dump_req_row, dtype=np.int32)
    seq = np.zeros((B,), dtype=np.int32)
    pre = np.zeros((B,), dtype=np.int32)
    ext = np.zeros((B,), dtype=np.int32)

    for i in range(n):
        ids = input_ids_list[i]
        e = len(ids)
        input_ids[i, :e] = ids
        positions[i, :e] = np.arange(prefix_lens[i], prefix_lens[i] + e, dtype=np.int32)
        cache_locs[i, :e] = cache_locs_list[i]
        req_idx[i] = req_indices[i]
        seq[i] = seq_lens[i]
        pre[i] = prefix_lens[i]
        ext[i] = e

    lora_ids = np.zeros((B,), dtype=np.int32)
    if lora_ids_list is not None:
        lora_ids[:n] = lora_ids_list

    return ForwardBatch(
        mode=mode,
        batch_size=n,
        input_ids=input_ids,
        positions=positions,
        cache_locs=cache_locs,
        req_indices=req_idx,
        seq_lens=seq,
        prefix_lens=pre,
        extend_lens=ext,
        kv_bucket=C,
        sampling_info=sampling_info.padded(B) if sampling_info else None,
        lora_ids=lora_ids,
    )
