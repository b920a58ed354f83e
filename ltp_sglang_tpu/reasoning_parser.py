"""Reasoning (<think>) splitting for R1-style models.

Counterpart of python/sglang/srt/reasoning_parser.py:1-257: separates the
reasoning block from the answer, streaming-capable. Models that open with an
implicit think block (DeepSeek-R1) are handled by `force_reasoning`.
"""

from __future__ import annotations

from typing import Optional, Tuple


class ReasoningParser:
    def __init__(self, think_start: str = "<think>", think_end: str = "</think>",
                 force_reasoning: bool = False):
        self.start = think_start
        self.end = think_end
        self.in_reasoning = force_reasoning
        self._buffer = ""

    def parse_non_stream(self, text: str) -> Tuple[str, str]:
        """Returns (reasoning_text, content)."""
        reasoning = ""
        rest = text
        if self.in_reasoning and self.start not in text:
            # Implicit open block.
            if self.end in text:
                reasoning, _, rest = text.partition(self.end)
            else:
                return text, ""
        elif self.start in text:
            before, _, after = text.partition(self.start)
            if self.end in after:
                reasoning, _, tail = after.partition(self.end)
                rest = before + tail
            else:
                return before + after, ""
        return reasoning.strip(), rest.strip()

    def parse_stream_chunk(self, delta: str) -> Tuple[str, str]:
        """Returns (reasoning_delta, content_delta) for an incremental chunk."""
        self._buffer += delta
        reasoning_out, content_out = "", ""
        while True:
            if self.in_reasoning:
                if self.end in self._buffer:
                    r, _, self._buffer = self._buffer.partition(self.end)
                    reasoning_out += r
                    self.in_reasoning = False
                    continue
                # Hold back a possible partial end tag.
                safe = max(len(self._buffer) - len(self.end), 0)
                reasoning_out += self._buffer[:safe]
                self._buffer = self._buffer[safe:]
                return reasoning_out, content_out
            if self.start in self._buffer:
                c, _, self._buffer = self._buffer.partition(self.start)
                content_out += c
                self.in_reasoning = True
                continue
            safe = max(len(self._buffer) - len(self.start), 0)
            content_out += self._buffer[:safe]
            self._buffer = self._buffer[safe:]
            return reasoning_out, content_out

    def flush(self) -> Tuple[str, str]:
        """End of stream: release whatever tail was held back."""
        tail, self._buffer = self._buffer, ""
        return (tail, "") if self.in_reasoning else ("", tail)
