"""Incremental detokenization.

Counterpart of DetokenizerManager (managers/detokenizer_manager.py:57-238):
the surrogate-offset algorithm (decode the tail twice, only publish once the
text is stable / not ending in a partial UTF-8 replacement char) and stop-
string trimming (trim_matched_stop:113). Runs in the controller process; a
separate process is unnecessary without a GIL-bound GPU loop.
"""

from __future__ import annotations

from typing import Optional


class IncrementalDecoder:
    def __init__(self, tokenizer):
        self.tokenizer = tokenizer

    def step(self, req) -> str:
        """Decode newly generated tokens for `req`; updates req.decoded_text
        and offsets; returns the newly appended text (may be "")."""
        if self.tokenizer is None:
            return ""
        sp = req.sampling_params
        ids = req.output_ids
        surr, read = req.surr_offset, req.read_offset
        kw = dict(
            skip_special_tokens=sp.skip_special_tokens,
            spaces_between_special_tokens=sp.spaces_between_special_tokens,
        )
        surr_text = self.tokenizer.decode(ids[surr:read], **kw)
        full_text = self.tokenizer.decode(ids[surr:], **kw)
        if full_text.endswith("�") or len(full_text) <= len(surr_text):
            # Partial multi-byte sequence; wait for more tokens.
            return ""
        new_text = full_text[len(surr_text):]
        req.decoded_text += new_text
        req.surr_offset = read
        req.read_offset = len(ids)
        return new_text


def trim_matched_stop(text: str, stop_strs, no_stop_trim: bool) -> str:
    """Trim the matched stop string from the final text
    (detokenizer_manager.py:113)."""
    if no_stop_trim or not stop_strs:
        return text
    for s in stop_strs:
        if s:
            pos = text.find(s)
            if pos != -1:
                return text[:pos]
    return text
