"""KV slot allocators (host-side).

Counterpart of mem_cache/allocator.py:37-751. The reference needs Triton
kernels (`alloc_extend_kernel`/`alloc_decode_kernel`) because its free list
lives on-GPU; in the single-controller TPU design allocation is host-side
numpy (the device only ever sees the resulting index arrays), so the kernels
reduce to vectorized numpy. Slot 0 is reserved as the garbage slot that padded
lanes write to.

Includes the backup/restore used by speculative decoding rollback
(allocator.py:67-71) and page-aligned allocation semantics for page_size > 1
(PagedTokenToKVPoolAllocator:404).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


class BaseTokenToKVPoolAllocator:
    def __init__(self, size: int, page_size: int):
        # Usable slots are [1, size]; slot 0 is the padding/garbage slot.
        self.size = size
        self.page_size = page_size
        self._backup = None

    def available_size(self) -> int:
        raise NotImplementedError

    def alloc(self, need_size: int) -> Optional[np.ndarray]:
        raise NotImplementedError

    def free(self, indices: np.ndarray):
        raise NotImplementedError

    def backup_state(self):
        raise NotImplementedError

    def restore_state(self, state):
        raise NotImplementedError


class TokenToKVPoolAllocator(BaseTokenToKVPoolAllocator):
    """page_size == 1 free-list allocator (mem_cache/allocator.py:117)."""

    def __init__(self, size: int, page_size: int = 1):
        assert page_size == 1
        super().__init__(size, 1)
        self.clear()

    def clear(self):
        self.free_pages = np.arange(1, self.size + 1, dtype=np.int32)
        self.is_not_in_free_group = True
        self.free_group = []

    def available_size(self) -> int:
        return len(self.free_pages)

    def alloc(self, need_size: int) -> Optional[np.ndarray]:
        if need_size > len(self.free_pages):
            return None
        out = self.free_pages[:need_size]
        self.free_pages = self.free_pages[need_size:]
        return out

    def free(self, indices):
        if indices is None or len(indices) == 0:
            return
        indices = np.asarray(indices, dtype=np.int32)
        if self.is_not_in_free_group:
            self.free_pages = np.concatenate([self.free_pages, indices])
        else:
            self.free_group.append(indices)

    # Grouped free: defer frees inside a batch-filter pass (allocator.py:94).
    def free_group_begin(self):
        self.is_not_in_free_group = False
        self.free_group = []

    def free_group_end(self):
        self.is_not_in_free_group = True
        if self.free_group:
            self.free(np.concatenate(self.free_group))

    def backup_state(self):
        return self.free_pages.copy()

    def restore_state(self, state):
        self.free_pages = state


class _PagedBackup:
    __slots__ = ("free_pages", "issued")

    def __init__(self, free_pages, issued):
        self.free_pages = free_pages
        self.issued = issued


class PagedTokenToKVPoolAllocator(BaseTokenToKVPoolAllocator):
    """Page-aligned allocator (mem_cache/allocator.py:404).

    Slots are grouped in pages of `page_size` consecutive slots; a request's
    token at sequence position p lives in page p // page_size of its own page
    list. alloc_extend gives each request enough new pages to extend from
    prefix_len to seq_len, reusing the partial last page.

    A page owned by requests/tree may have only SOME of its slots issued (an
    unaligned tail, a truncated decode window). The allocator tracks the set
    of currently-issued offsets per page and returns the page to the pool
    when that set empties — the offsets never issued don't block release, and
    frees spread over several calls (finished-request tails, retract ranges)
    are accounted exactly. The reference instead frees any touched page
    (allocator.py:404); issued-set tracking is safe against double-free of a
    still-live remainder.
    """

    def __init__(self, size: int, page_size: int):
        super().__init__(size, page_size)
        assert size % page_size == 0
        self.num_pages = size // page_size
        self.clear()

    def clear(self):
        # Page ids start at 1; slot index = page_id * page_size + offset.
        # Page 0 contains the garbage slot 0.
        self.free_pages = np.arange(1, self.num_pages + 1, dtype=np.int32)
        self.is_not_in_free_group = True
        self.free_group = []
        self._issued: dict = {}  # page -> set of live offsets

    def available_size(self) -> int:
        return len(self.free_pages) * self.page_size

    def _mark_issued(self, slots: np.ndarray):
        for slot in slots.tolist():
            page, offset = divmod(int(slot), self.page_size)
            self._issued.setdefault(page, set()).add(offset)

    def alloc(self, need_size: int) -> Optional[np.ndarray]:
        """Allocate whole fresh pages covering need_size tokens (used for
        fresh prefill with no partial page)."""
        num_pages = -(-need_size // self.page_size)
        if num_pages > len(self.free_pages):
            return None
        pages = self.free_pages[:num_pages]
        self.free_pages = self.free_pages[num_pages:]
        slots = (
            pages[:, None] * self.page_size + np.arange(self.page_size, dtype=np.int32)
        ).reshape(-1)[:need_size]
        self._mark_issued(slots)
        return slots

    def alloc_extend(
        self,
        prefix_len: int,
        extend_len: int,
        last_slot: int,
    ) -> Optional[np.ndarray]:
        """Extend one request from prefix_len by extend_len tokens.

        last_slot: kv slot of token (prefix_len - 1), used to continue its
        partial page. Mirrors alloc_extend_kernel (allocator.py:276).
        """
        out = np.empty(extend_len, dtype=np.int32)
        filled = 0
        if prefix_len % self.page_size != 0:
            # Continue the partial page.
            page = last_slot // self.page_size
            offset = prefix_len % self.page_size
            take = min(self.page_size - offset, extend_len)
            out[:take] = page * self.page_size + np.arange(offset, offset + take)
            filled = take
        remaining = extend_len - filled
        if remaining > 0:
            num_pages = -(-remaining // self.page_size)
            if num_pages > len(self.free_pages):
                return None
            pages = self.free_pages[:num_pages]
            self.free_pages = self.free_pages[num_pages:]
            slots = (
                pages[:, None] * self.page_size
                + np.arange(self.page_size, dtype=np.int32)
            ).reshape(-1)
            out[filled:] = slots[:remaining]
        self._mark_issued(out)
        return out

    def alloc_decode(self, seq_len: int, last_slot: int) -> Optional[np.ndarray]:
        """One new token at position seq_len-1 (post-increment length)."""
        return self.alloc_extend(seq_len - 1, 1, last_slot)

    def free(self, indices):
        if indices is None or len(indices) == 0:
            return
        indices = np.asarray(indices, dtype=np.int32)
        if self.is_not_in_free_group:
            full = []
            for slot in indices.tolist():
                page, offset = divmod(int(slot), self.page_size)
                offs = self._issued.get(page)
                if offs is None:
                    continue  # page already released (tolerated double-free)
                offs.discard(offset)
                if not offs:
                    full.append(page)
                    del self._issued[page]
            if full:
                self.free_pages = np.concatenate(
                    [self.free_pages, np.asarray(full, dtype=np.int32)]
                )
        else:
            self.free_group.append(indices)

    def free_group_begin(self):
        self.is_not_in_free_group = False
        self.free_group = []

    def free_group_end(self):
        self.is_not_in_free_group = True
        if self.free_group:
            self.free(np.concatenate(self.free_group))

    def backup_state(self):
        return _PagedBackup(
            self.free_pages.copy(),
            {p: s.copy() for p, s in self._issued.items()},
        )

    def restore_state(self, state):
        self.free_pages = state.free_pages
        self._issued = state.issued


class RingKVAllocator(BaseTokenToKVPoolAllocator):
    """All-SWA models (mistral/qwen2-with-window): every layer slides, so KV
    lives in fixed PER-REQUEST RING regions — slot(req, pos) =
    (req_row + 1) * ring + pos % ring, with slots [0, ring) as the garbage
    region (pads write slot 0). No free list: a position's slot is reclaimed
    implicitly when the ring wraps, and the sliding-window attention mask
    excludes wrapped (overwritten) positions. ring >= window + the largest
    extend chunk guarantees no in-window collision (the tightest read is the
    first query of a chunk looking back W while the chunk writes ext more).

    Reference analog: SWAKVPool + SWATokenToKVPoolAllocator
    (mem_cache/memory_pool.py:420, allocator.py:163) collapsed to the
    all-sliding case.
    """

    def __init__(self, ring: int, max_reqs: int):
        super().__init__((max_reqs + 1) * ring, 1)
        self.ring = ring
        self.max_reqs = max_reqs

    def clear(self):
        pass

    def available_size(self) -> int:
        # Capacity is per-request by construction; report the pool size so
        # admission budgets never starve on this axis (request slots and
        # context length are the real limits).
        return self.size

    def slots_for(self, req_row: int, start_pos: int, n: int) -> np.ndarray:
        base = (req_row + 1) * self.ring
        return (base + (np.arange(start_pos, start_pos + n) % self.ring)).astype(
            np.int32
        )

    def alloc(self, need_size: int):
        raise RuntimeError("RingKVAllocator has no anonymous slots; "
                           "use slots_for(req_row, pos, n)")

    def free(self, indices):
        pass

    def backup_state(self):
        return None

    def restore_state(self, state):
        pass
