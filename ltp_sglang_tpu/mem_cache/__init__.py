from ltp_sglang_tpu.mem_cache.req_to_token import ReqToTokenPool
from ltp_sglang_tpu.mem_cache.allocator import (
    TokenToKVPoolAllocator,
    PagedTokenToKVPoolAllocator,
)
from ltp_sglang_tpu.mem_cache.radix_cache import RadixCache, MatchResult
from ltp_sglang_tpu.mem_cache.chunk_cache import ChunkCache
