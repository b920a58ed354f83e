"""Constrained tool-call composition.

Counterpart of function_call/ebnf_composer.py in the reference: when a chat
request sets tool_choice="required" (or names a specific function), the
generation is CONSTRAINED so the model can only emit a syntactically valid
tool call whose arguments satisfy the tool's JSON schema. The reference
composes an xgrammar EBNF; here the composition targets the regex/DFA
pipeline (constrained/regex_engine.py) — each tool's parameter schema
compiles through constrained/json_schema.schema_to_regex and the format's
fixed wrappers are escaped literals, so masks precompute per DFA state.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from ltp_sglang_tpu.constrained.json_schema import schema_to_regex

_SPECIAL = set(".^$*+?()[]{}|\\/")


def _lit(s: str) -> str:
    return "".join("\\" + c if c in _SPECIAL else c for c in s)


# Per-detector wrappers (function name inlined by _one_call):
#   (prefix, name_open, name_close_args_open, args_close_suffix)
_FORMATS = {
    "qwen25": ('<tool_call>\n{"name": "', '", "arguments": ', "}\n</tool_call>"),
    "llama32": ('{"name": "', '", "parameters": ', "}"),
    "mistral": ('[TOOL_CALLS] [{"name": "', '", "arguments": ', "}]"),
}


def _one_call(fmt: str, name: str, params_schema: Optional[Dict[str, Any]]):
    pre, mid, post = _FORMATS[fmt]
    args_re = schema_to_regex(params_schema or {"type": "object"})
    return _lit(pre) + _lit(name) + _lit(mid) + args_re + _lit(post)


def compose_tool_call_regex(
    tools: List[Dict[str, Any]],
    tool_choice: Any = "required",
    fmt: str = "qwen25",
) -> Optional[str]:
    """-> regex constraining the completion to exactly one valid tool call
    (alternation over the allowed functions), or None when the choice is
    "auto"/"none" (unconstrained) or the format has no composer."""
    if fmt not in _FORMATS or not tools:
        return None
    if tool_choice in (None, "auto", "none"):
        return None
    wanted = None
    if isinstance(tool_choice, dict):
        wanted = (tool_choice.get("function") or {}).get("name")
    alts = []
    for t in tools:
        f = t.get("function", t)
        name = f.get("name")
        if not name or (wanted and name != wanted):
            continue
        alts.append(_one_call(fmt, name, f.get("parameters")))
    if not alts:
        return None
    return "(" + "|".join(alts) + ")"
