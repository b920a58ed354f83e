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


def _coerce(v: str):
    """Tag-format argument values arrive as raw text; recover JSON types
    where unambiguous (the reference coerces against the tool schema)."""
    v = v.strip()
    try:
        return json.loads(v)
    except (json.JSONDecodeError, ValueError):
        try:
            return ast.literal_eval(v)
        except (ValueError, SyntaxError):
            return v


class DeepSeekV3Detector(BaseDetector):
    """DeepSeek-V3 (function_call/deepseekv3_detector.py):
    <｜tool▁calls▁begin｜><｜tool▁call▁begin｜>function<｜tool▁sep｜>{name}
    ```json\\n{args}\\n```<｜tool▁call▁end｜>...<｜tool▁calls▁end｜>"""

    bot_token = "<｜tool▁calls▁begin｜>"
    call_re = re.compile(r"<｜tool▁call▁begin｜>.*?<｜tool▁call▁end｜>", re.DOTALL)
    detail_re = re.compile(
        r"<｜tool▁call▁begin｜>(.*)<｜tool▁sep｜>(.*?)\n```json\n(.*)\n```"
        r"<｜tool▁call▁end｜>",
        re.DOTALL,
    )

    def has_tool_call(self, text: str) -> bool:
        return self.bot_token in text

    def detect_and_parse(self, text: str):
        if self.bot_token not in text:
            return text, []
        normal = text.split(self.bot_token)[0]
        calls = []
        for block in self.call_re.findall(text):
            m = self.detail_re.search(block)
            if m is None:
                continue
            try:
                calls.append(
                    ToolCallItem(m.group(2).strip(),
                                 json.dumps(json.loads(m.group(3))))
                )
            except json.JSONDecodeError:
                pass
        return normal.strip(), calls


class KimiK2Detector(BaseDetector):
    """Kimi-K2 (function_call/kimik2_detector.py):
    <|tool_calls_section_begin|><|tool_call_begin|>functions.{name}:{idx}
    <|tool_call_argument_begin|>{json}<|tool_call_end|>...
    <|tool_calls_section_end|>"""

    bot_token = "<|tool_calls_section_begin|>"
    call_re = re.compile(
        r"<\|tool_call_begin\|>\s*(?P<id>[\w\.]+:\d+)\s*"
        r"<\|tool_call_argument_begin\|>\s*(?P<args>\{.*?\})\s*"
        r"<\|tool_call_end\|>",
        re.DOTALL,
    )

    def has_tool_call(self, text: str) -> bool:
        return self.bot_token in text

    def detect_and_parse(self, text: str):
        if self.bot_token not in text:
            return text, []
        normal = text.split(self.bot_token)[0]
        calls = []
        for m in self.call_re.finditer(text):
            # id = "functions.{name}:{index}"
            fid = m.group("id")
            name = fid.split(":")[0].split(".", 1)[-1]
            try:
                calls.append(
                    ToolCallItem(name, json.dumps(json.loads(m.group("args"))))
                )
            except json.JSONDecodeError:
                pass
        return normal.strip(), calls


class Glm4MoeDetector(BaseDetector):
    """GLM-4.5/MoE (function_call/glm4_moe_detector.py):
    <tool_call>{name}\\n<arg_key>k</arg_key><arg_value>v</arg_value>...
    </tool_call>"""

    call_re = re.compile(r"<tool_call>.*?</tool_call>", re.DOTALL)
    detail_re = re.compile(r"<tool_call>([^\n<]*)\n?(.*)</tool_call>", re.DOTALL)
    arg_re = re.compile(r"<arg_key>(.*?)</arg_key>\s*<arg_value>(.*?)</arg_value>",
                        re.DOTALL)

    def has_tool_call(self, text: str) -> bool:
        return "<tool_call>" in text and "<arg_key>" in text

    def detect_and_parse(self, text: str):
        if not self.has_tool_call(text):
            return text, []
        calls = []
        for block in self.call_re.findall(text):
            m = self.detail_re.search(block)
            if m is None:
                continue
            name = m.group(1).strip()
            args = {k.strip(): _coerce(v) for k, v in self.arg_re.findall(m.group(2))}
            if name:
                calls.append(ToolCallItem(name, json.dumps(args)))
        normal = self.call_re.sub("", text).strip()
        return normal, calls


class Qwen3CoderDetector(BaseDetector):
    """Qwen3-Coder (function_call/qwen3_coder_detector.py):
    <tool_call><function=name><parameter=key>value</parameter>...
    </function></tool_call>"""

    call_re = re.compile(r"<tool_call>(.*?)</tool_call>", re.DOTALL)
    fn_re = re.compile(r"<function=(.*?)(?:>|\n)(.*?)</function>", re.DOTALL)
    param_re = re.compile(r"<parameter=(.*?)(?:>|\n)(.*?)</parameter>", re.DOTALL)

    def has_tool_call(self, text: str) -> bool:
        return "<tool_call>" in text and "<function=" in text

    def detect_and_parse(self, text: str):
        if not self.has_tool_call(text):
            return text, []
        calls = []
        for block in self.call_re.findall(text):
            for fm in self.fn_re.finditer(block):
                name = fm.group(1).strip().rstrip(">")
                args = {
                    pm.group(1).strip().rstrip(">"): _coerce(pm.group(2))
                    for pm in self.param_re.finditer(fm.group(2))
                }
                calls.append(ToolCallItem(name, json.dumps(args)))
        normal = self.call_re.sub("", text).strip()
        return normal, calls


class Step3Detector(BaseDetector):
    """Step3 (function_call/step3_detector.py): steptml XML invocations
    inside <｜tool_calls_begin｜>...<｜tool_calls_end｜>."""

    bot_token = "<｜tool_calls_begin｜>"
    invoke_re = re.compile(
        r'<steptml:invoke name="([^"]+)">(.+?)</steptml:invoke>', re.DOTALL
    )
    param_re = re.compile(
        r'<steptml:parameter name="([^"]+)">([^<]*)</steptml:parameter>',
        re.DOTALL,
    )

    def has_tool_call(self, text: str) -> bool:
        return self.bot_token in text

    def detect_and_parse(self, text: str):
        if self.bot_token not in text:
            return text, []
        normal = text.split(self.bot_token)[0]
        calls = []
        for name, body in self.invoke_re.findall(text):
            args = {k: _coerce(v) for k, v in self.param_re.findall(body)}
            calls.append(ToolCallItem(name, json.dumps(args)))
        return normal.strip(), calls


DETECTORS = {
    "llama3": Llama32Detector,
    "llama32": Llama32Detector,
    "llama4": PythonicDetector,
    "qwen25": Qwen25Detector,
    "qwen": Qwen25Detector,
    "mistral": MistralDetector,
    "pythonic": PythonicDetector,
    "deepseekv3": DeepSeekV3Detector,
    "deepseek": DeepSeekV3Detector,
    "kimi_k2": KimiK2Detector,
    "kimik2": KimiK2Detector,
    "glm4_moe": Glm4MoeDetector,
    "glm45": Glm4MoeDetector,
    "qwen3_coder": Qwen3CoderDetector,
    "step3": Step3Detector,
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
