"""Tool/function-call parsing per model family.

Counterpart of function_call/ in the reference (llama32_detector.py,
qwen25_detector.py, mistral_detector.py, pythonic_detector.py + dispatcher
function_call_parser.py): detect and extract structured tool calls from
model output, with incremental (streaming) support via buffered re-parsing.
"""

from __future__ import annotations

import ast
import dataclasses
import json
import re
from typing import List, Optional, Tuple


@dataclasses.dataclass
class ToolCallItem:
    name: str
    parameters: str  # JSON string


class BaseDetector:
    def detect_and_parse(self, text: str) -> Tuple[str, List[ToolCallItem]]:
        raise NotImplementedError

    def has_tool_call(self, text: str) -> bool:
        raise NotImplementedError


class Llama32Detector(BaseDetector):
    """Llama-3.x: `<|python_tag|>{json}` or a bare JSON object with
    name/parameters (function_call/llama32_detector.py)."""

    bot_token = "<|python_tag|>"

    def has_tool_call(self, text: str) -> bool:
        return self.bot_token in text or text.lstrip().startswith('{"name"')

    def detect_and_parse(self, text: str):
        if self.bot_token in text:
            normal, _, payload = text.partition(self.bot_token)
        elif text.lstrip().startswith('{"name"'):
            normal, payload = "", text
        else:
            return text, []
        calls = []
        for part in payload.split(";"):
            part = part.strip()
            if not part:
                continue
            try:
                obj = json.loads(part)
                calls.append(
                    ToolCallItem(
                        obj["name"],
                        json.dumps(obj.get("parameters", obj.get("arguments", {}))),
                    )
                )
            except (json.JSONDecodeError, KeyError, TypeError):
                normal += part
        return normal, calls


class Qwen25Detector(BaseDetector):
    """Qwen2.5: <tool_call>\\n{json}\\n</tool_call> blocks."""

    pattern = re.compile(r"<tool_call>\s*(.*?)\s*</tool_call>", re.DOTALL)

    def has_tool_call(self, text: str) -> bool:
        return "<tool_call>" in text

    def detect_and_parse(self, text: str):
        calls = []
        for m in self.pattern.finditer(text):
            try:
                obj = json.loads(m.group(1))
                calls.append(
                    ToolCallItem(obj["name"], json.dumps(obj.get("arguments", {})))
                )
            except (json.JSONDecodeError, KeyError):
                pass
        normal = self.pattern.sub("", text).replace("<tool_call>", "").strip()
        return normal, calls


class MistralDetector(BaseDetector):
    """Mistral: [TOOL_CALLS] [{...}, ...]"""

    bot_token = "[TOOL_CALLS]"

    def has_tool_call(self, text: str) -> bool:
        return self.bot_token in text

    def detect_and_parse(self, text: str):
        if self.bot_token not in text:
            return text, []
        normal, _, payload = text.partition(self.bot_token)
        try:
            arr = json.loads(payload.strip())
            calls = [
                ToolCallItem(o["name"], json.dumps(o.get("arguments", {})))
                for o in arr
            ]
        except (json.JSONDecodeError, KeyError, TypeError):
            calls = []
        return normal.strip(), calls


class PythonicDetector(BaseDetector):
    """Pythonic (llama4-style): [fn(a=1, b="x"), g()]"""

    pattern = re.compile(r"^\s*\[[\w.]+\(.*\)\s*(?:,\s*[\w.]+\(.*\)\s*)*\]\s*$", re.DOTALL)

    def has_tool_call(self, text: str) -> bool:
        return bool(self.pattern.match(text.strip()))

    def detect_and_parse(self, text: str):
        s = text.strip()
        if not self.pattern.match(s):
            return text, []
        try:
            tree = ast.parse(s, mode="eval")
            calls = []
            for node in tree.body.elts:
                if not isinstance(node, ast.Call):
                    continue
                name = ast.unparse(node.func)
                kwargs = {
                    kw.arg: ast.literal_eval(kw.value) for kw in node.keywords
                }
                calls.append(ToolCallItem(name, json.dumps(kwargs)))
            return "", calls
        except (SyntaxError, ValueError):
            return text, []


DETECTORS = {
    "llama3": Llama32Detector,
    "llama32": Llama32Detector,
    "qwen25": Qwen25Detector,
    "qwen": Qwen25Detector,
    "mistral": MistralDetector,
    "pythonic": PythonicDetector,
}


class FunctionCallParser:
    """Dispatcher (function_call_parser.py) + buffered streaming support."""

    def __init__(self, format: str = "qwen25"):
        self.detector = DETECTORS[format]()
        self._buffer = ""

    def parse_non_stream(self, text: str) -> Tuple[str, List[ToolCallItem]]:
        return self.detector.detect_and_parse(text)

    def parse_stream_chunk(self, delta: str) -> Tuple[str, List[ToolCallItem]]:
        """Feed an incremental chunk; returns (safe_normal_text_delta, calls
        completed so far). Text is withheld once a tool-call marker might be
        forming."""
        self._buffer += delta
        if self.detector.has_tool_call(self._buffer):
            normal, calls = self.detector.detect_and_parse(self._buffer)
            if calls:
                self._buffer = ""
                return normal, calls
            return "", []
        # No marker: release all but a tail that could be a partial marker.
        hold = 16
        if len(self._buffer) > hold:
            out = self._buffer[:-hold]
            self._buffer = self._buffer[-hold:]
            return out, []
        return "", []

    def flush(self) -> str:
        out, self._buffer = self._buffer, ""
        return out
