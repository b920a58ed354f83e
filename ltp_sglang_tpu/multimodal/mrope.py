"""M-RoPE position computation (Qwen2-VL family).

Reference: transformers Qwen2_5_VLModel.get_rope_index / the reference
serving stack's MRotaryEmbedding.get_input_positions: text tokens advance a
single running position (all three of t/h/w equal); an image span holds the
running position for its t row while h/w rows enumerate the (merged) patch
grid; after the span the running position jumps by max(t, h', w') so text
continues past the largest spatial extent.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def build_mrope_positions(seq_len: int, items) -> Tuple[np.ndarray, int]:
    """-> (positions [3, seq_len] int32, delta) for one prompt.

    `items`: MultimodalItem list (sorted by offset) with grid_thw set; the
    span length must equal t * (h/merge) * (w/merge) — the processor expands
    placeholders to exactly that many pad ids. `delta` is added to the
    sequence index of every token past the prompt (generated tokens)."""
    pos = np.zeros((3, seq_len), np.int32)
    cur = 0
    idx = 0
    for it in sorted(items or [], key=lambda x: x.offset):
        n_text = it.offset - idx
        if n_text:
            pos[:, idx:it.offset] = cur + np.arange(n_text, dtype=np.int32)
            cur += n_text
        t, hh, ww = it.llm_grid
        span = t * hh * ww
        assert span == it.length, (span, it.length)
        ti = np.repeat(np.arange(t, dtype=np.int32), hh * ww)
        hi = np.tile(np.repeat(np.arange(hh, dtype=np.int32), ww), t)
        wi = np.tile(np.arange(ww, dtype=np.int32), t * hh)
        end = it.offset + span
        pos[0, it.offset:end] = cur + ti
        pos[1, it.offset:end] = cur + hi
        pos[2, it.offset:end] = cur + wi
        cur += max(t, hh, ww)
        idx = end
    if idx < seq_len:
        pos[:, idx:] = cur + np.arange(seq_len - idx, dtype=np.int32)
        cur += seq_len - idx
    return pos, cur - seq_len


def ensure_req_mrope(req):
    """Populate req.mrope_pos / req.mrope_delta once per request."""
    if req.mrope_pos is not None:
        return
    if not req.mm_items:
        req.mrope_pos = np.zeros((3, 0), np.int32)
        req.mrope_delta = 0
        return
    req.mrope_pos, req.mrope_delta = build_mrope_positions(
        len(req.origin_input_ids), req.mm_items
    )
