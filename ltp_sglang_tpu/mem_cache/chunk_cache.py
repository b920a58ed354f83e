"""ChunkCache: the no-prefix-sharing fallback (mem_cache/chunk_cache.py).

Used when the radix cache is disabled; keeps the same interface so the
scheduler is agnostic.
"""

from __future__ import annotations

import numpy as np

from ltp_sglang_tpu.mem_cache.radix_cache import MatchResult, TreeNode


class ChunkCache:
    def __init__(self, req_to_token_pool, token_to_kv_pool_allocator, page_size: int = 1):
        self.req_to_token_pool = req_to_token_pool
        self.token_to_kv_pool_allocator = token_to_kv_pool_allocator
        self.page_size = page_size
        self.disable = True
        self._dummy_node = TreeNode()

    def reset(self):
        pass

    def match_prefix(self, key) -> MatchResult:
        return MatchResult(np.empty((0,), dtype=np.int32), self._dummy_node)

    def cache_finished_req(self, req):
        kv = self.req_to_token_pool.req_to_token[
            req.req_pool_idx, : len(req.origin_input_ids) + len(req.output_ids) - 1
        ]
        self.token_to_kv_pool_allocator.free(kv)
        self.req_to_token_pool.free(req.req_pool_idx)

    def cache_unfinished_req(self, req):
        # KV stays owned by the request across chunks; record the computed
        # part as the request's prefix so the next chunk extends from it.
        kv = self.req_to_token_pool.req_to_token[req.req_pool_idx, : len(req.fill_ids)]
        req.prefix_indices = kv.copy()

    def evict(self, num_tokens: int):
        pass

    def inc_lock_ref(self, node):
        pass

    def dec_lock_ref(self, node):
        pass

    def evictable_size(self) -> int:
        return 0

    def protected_size(self) -> int:
        return 0
