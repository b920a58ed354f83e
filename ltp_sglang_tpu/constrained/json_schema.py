"""JSON schema -> regex (the outlines-style approach, built from scratch).

Covers the schema subset that serving traffic actually uses: object with
properties (+required), string (+enum/const/pattern), integer, number,
boolean, null, arrays with item schemas, nested objects, anyOf.
Whitespace-free JSON output keeps the DFA small (valid JSON; the reference's
xgrammar output is similarly canonical).
"""

from __future__ import annotations

import json
from typing import Any, Dict

STRING_INNER = r'(?:[^"\\\x00-\x1f]|\\["\\/bfnrt]|\\u[0-9a-fA-F]{4})'
STRING_RE = f'"{STRING_INNER}*"'
INTEGER_RE = r"-?(?:0|[1-9]\d*)"
NUMBER_RE = r"-?(?:0|[1-9]\d*)(?:\.\d+)?(?:[eE][+-]?\d+)?"
BOOL_RE = r"(?:true|false)"
NULL_RE = r"null"


def _escape_literal(s: str) -> str:
    out = []
    for ch in s:
        if ch in r"\^$.|?*+()[]{}":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


def schema_to_regex(schema: Any) -> str:
    if isinstance(schema, str):
        schema = json.loads(schema)
    return _to_regex(schema)


def _to_regex(s: Dict[str, Any]) -> str:
    if not isinstance(s, dict):
        raise ValueError(f"unsupported schema node: {s!r}")
    if "const" in s:
        return _escape_literal(json.dumps(s["const"], separators=(",", ":")))
    if "enum" in s:
        opts = [
            _escape_literal(json.dumps(v, separators=(",", ":"))) for v in s["enum"]
        ]
        return "(?:" + "|".join(opts) + ")"
    if "anyOf" in s or "oneOf" in s:
        subs = s.get("anyOf") or s.get("oneOf")
        return "(?:" + "|".join(_to_regex(x) for x in subs) + ")"

    t = s.get("type")
    if isinstance(t, list):
        return "(?:" + "|".join(_to_regex({**s, "type": x}) for x in t) + ")"
    if t == "string":
        if "pattern" in s:
            return f'"{s["pattern"]}"'
        lo = s.get("minLength")
        hi = s.get("maxLength")
        if lo is not None or hi is not None:
            return f'"{STRING_INNER}{{{lo or 0},{hi if hi is not None else ""}}}"'
        return STRING_RE
    if t == "integer":
        return INTEGER_RE
    if t == "number":
        return NUMBER_RE
    if t == "boolean":
        return BOOL_RE
    if t == "null":
        return NULL_RE
    if t == "array":
        item = _to_regex(s.get("items", {"type": "string"})) if s.get("items") else None
        if item is None:
            item = f"(?:{STRING_RE}|{NUMBER_RE}|{BOOL_RE}|{NULL_RE})"
        min_i = s.get("minItems", 0)
        if min_i == 0:
            return rf"\[(?:{item}(?:,{item})*)?\]"
        reps = f"{item}" + f"(?:,{item})" + "{" + str(min_i - 1) + ",}"
        return rf"\[{reps}\]"
    if t == "object" or "properties" in s:
        props = s.get("properties", {})
        required = set(s.get("required", list(props.keys())))
        if not props:
            return r"\{\}"
        parts = []
        for name, sub in props.items():
            key = _escape_literal(json.dumps(name)) + ":" + _to_regex(sub)
            parts.append((key, name in required))
        # Fixed property order (canonical output); optional props may vanish.
        body = ""
        emitted_any = False
        for key, req in parts:
            if req:
                if emitted_any:
                    body += "," + key
                else:
                    body += key
                    emitted_any = True
            else:
                if emitted_any:
                    body += f"(?:,{key})?"
                else:
                    # Optional first property: allow present-or-absent; keep
                    # simple by requiring a leading comma form on followers.
                    body += f"(?:{key},)?"
        return r"\{" + body + r"\}"
    # Unconstrained: any JSON scalar/composite (bounded nesting depth 3).
    scalar = f"(?:{STRING_RE}|{NUMBER_RE}|{BOOL_RE}|{NULL_RE})"
    arr = rf"\[(?:{scalar}(?:,{scalar})*)?\]"
    obj = rf"\{{(?:{STRING_RE}:{scalar}(?:,{STRING_RE}:{scalar})*)?\}}"
    return f"(?:{scalar}|{arr}|{obj})"
