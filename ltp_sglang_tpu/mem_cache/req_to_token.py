"""Request-slot → token-KV-index map.

Counterpart of ReqToTokenPool (mem_cache/memory_pool.py:47-94). Host-side
numpy is the source of truth (the scheduler and radix cache mutate it); the
ModelRunner keeps a device mirror ([R+1, C], row R reserved as a scatter dump
for padded lanes) that jitted steps update in-place via donation, plus
explicit row refresh after radix re-linking.
"""

from __future__ import annotations

from typing import List

import numpy as np


class ReqToTokenPool:
    def __init__(self, size: int, max_context_len: int):
        self.size = size
        self.max_context_len = max_context_len
        self.req_to_token = np.zeros((size, max_context_len), dtype=np.int32)
        self.free_slots: List[int] = list(range(size))

    def available_size(self) -> int:
        return len(self.free_slots)

    def alloc(self, need_size: int = 1) -> List[int]:
        if need_size > len(self.free_slots):
            return None
        out = self.free_slots[:need_size]
        self.free_slots = self.free_slots[need_size:]
        return out

    def free(self, free_index):
        # Rows are zeroed on release so that recovery paths (abort_all) can
        # identify genuinely-allocated KV slots by row != 0 without seeing
        # stale entries from a previous occupant of the slot.
        if isinstance(free_index, (int, np.integer)):
            self.free_slots.append(int(free_index))
            self.req_to_token[int(free_index)] = 0
        else:
            self.free_slots.extend(int(i) for i in free_index)
            for i in free_index:
                self.req_to_token[int(i)] = 0

    def write(self, req_idx: int, loc: slice, values: np.ndarray):
        self.req_to_token[req_idx, loc] = values

    def clear(self):
        self.free_slots = list(range(self.size))
