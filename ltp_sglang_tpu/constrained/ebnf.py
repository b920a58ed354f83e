"""EBNF (GBNF-style) grammars -> regex, for the DFA token-mask pipeline.

The reference serves EBNF through xgrammar's pushdown automaton
(srt/constrained/xgrammar_backend.py). Here EBNF is compiled to a regex by
inlining rule references, then reuses the interval-DFA engine
(regex_engine.py) and trie-based token masking (token_fsm.py).

Recursive rules are inlined to a bounded depth (default 6): at the depth
limit, alternatives that would recurse further are dropped, so grammars with
a non-recursive base case (the normal shape: `value ::= object | STRING`,
`object ::= "{" value "}"`) stay correct up to that nesting depth. Grammars
that are recursive with no base case are rejected. A true PDA matcher (exact
unbounded nesting) is future work.

GBNF syntax: `name ::= alternatives`, `|`, `( ... )`, `"literal"` with
escapes, `[a-z]` classes, `?` `*` `+` and `{m,n}` repetition, `#` comments.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

_RULE_NAME = re.compile(r"[A-Za-z_][A-Za-z0-9_-]*")

# Characters that must be escaped to appear literally in a regex.
_REGEX_SPECIAL = set(".^$*+?()[]{}|\\/")


def _escape_literal(s: str) -> str:
    return "".join("\\" + c if c in _REGEX_SPECIAL else c for c in s)


class _Tok:
    def __init__(self, kind: str, value: str):
        self.kind = kind  # name, literal, class, op
        self.value = value

    def __repr__(self):
        return f"{self.kind}:{self.value!r}"


def _tokenize_body(body: str) -> List[_Tok]:
    toks: List[_Tok] = []
    i, n = 0, len(body)
    while i < n:
        c = body[i]
        if c in " \t\r\n":
            i += 1
            continue
        if c == "#":
            while i < n and body[i] != "\n":
                i += 1
            continue
        if c == '"':
            j = i + 1
            out = []
            while j < n and body[j] != '"':
                if body[j] == "\\" and j + 1 < n:
                    esc = body[j + 1]
                    mapping = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\"}
                    if esc == "x" and j + 3 < n:
                        out.append(chr(int(body[j + 2:j + 4], 16)))
                        j += 4
                        continue
                    if esc == "u" and j + 5 < n:
                        out.append(chr(int(body[j + 2:j + 6], 16)))
                        j += 6
                        continue
                    out.append(mapping.get(esc, esc))
                    j += 2
                else:
                    out.append(body[j])
                    j += 1
            if j >= n:
                raise ValueError("unterminated string literal in EBNF")
            toks.append(_Tok("literal", "".join(out)))
            i = j + 1
            continue
        if c == "[":
            j = i + 1
            depth_escape = False
            while j < n:
                if depth_escape:
                    depth_escape = False
                elif body[j] == "\\":
                    depth_escape = True
                elif body[j] == "]":
                    break
                j += 1
            if j >= n:
                raise ValueError("unterminated character class in EBNF")
            toks.append(_Tok("class", body[i:j + 1]))
            i = j + 1
            continue
        if c in "()|?*+":
            toks.append(_Tok("op", c))
            i += 1
            continue
        if c == "{":
            j = body.index("}", i)
            toks.append(_Tok("op", body[i:j + 1]))
            i = j + 1
            continue
        m = _RULE_NAME.match(body, i)
        if m:
            toks.append(_Tok("name", m.group(0)))
            i = m.end()
            continue
        raise ValueError(f"unexpected character {c!r} in EBNF body")
    return toks


# AST: ("alt", [seq...]), ("seq", [item...]), ("lit", s), ("class", s),
# ("ref", name), ("rep", item, suffix)
class _BodyParser:
    def __init__(self, toks: List[_Tok]):
        self.toks = toks
        self.pos = 0

    def peek(self) -> Optional[_Tok]:
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def parse(self):
        node = self.alternation()
        if self.pos != len(self.toks):
            raise ValueError(f"trailing tokens in EBNF body: {self.toks[self.pos:]}")
        return node

    def alternation(self):
        seqs = [self.sequence()]
        while (t := self.peek()) and t.kind == "op" and t.value == "|":
            self.pos += 1
            seqs.append(self.sequence())
        return ("alt", seqs) if len(seqs) > 1 else seqs[0]

    def sequence(self):
        items = []
        while (t := self.peek()) is not None:
            if t.kind == "op" and t.value in ("|", ")"):
                break
            items.append(self.item())
        return ("seq", items)

    def item(self):
        t = self.peek()
        if t.kind == "op" and t.value == "(":
            self.pos += 1
            inner = self.alternation()
            close = self.peek()
            if not (close and close.kind == "op" and close.value == ")"):
                raise ValueError("unbalanced parentheses in EBNF")
            self.pos += 1
            node = inner
        elif t.kind == "literal":
            self.pos += 1
            node = ("lit", t.value)
        elif t.kind == "class":
            self.pos += 1
            node = ("class", t.value)
        elif t.kind == "name":
            self.pos += 1
            node = ("ref", t.value)
        else:
            raise ValueError(f"unexpected token {t} in EBNF body")
        nxt = self.peek()
        if nxt and nxt.kind == "op" and (
            nxt.value in ("?", "*", "+") or nxt.value.startswith("{")
        ):
            self.pos += 1
            node = ("rep", node, nxt.value)
        return node


def parse_ebnf(text: str) -> Dict[str, object]:
    """Parse a GBNF grammar into {rule_name: AST}."""
    # Join continuation lines: a rule body extends until the next `name ::=`.
    chunks: List[Tuple[str, str]] = []
    current_name, current_body = None, []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].rstrip()
        if not line.strip():
            continue
        m = re.match(r"\s*([A-Za-z_][A-Za-z0-9_-]*)\s*::=\s*(.*)$", line)
        if m:
            if current_name is not None:
                chunks.append((current_name, "\n".join(current_body)))
            current_name, current_body = m.group(1), [m.group(2)]
        else:
            if current_name is None:
                raise ValueError(f"EBNF line outside a rule: {raw!r}")
            current_body.append(line)
    if current_name is not None:
        chunks.append((current_name, "\n".join(current_body)))
    rules = {}
    for name, body in chunks:
        rules[name] = _BodyParser(_tokenize_body(body)).parse()
    if "root" not in rules:
        raise ValueError("EBNF grammar must define a 'root' rule")
    return rules


def ebnf_to_regex(text: str, max_depth: int = 6) -> str:
    """Compile an EBNF grammar to a regex (bounded-recursion inlining)."""
    rules = parse_ebnf(text)
    depth: Dict[str, int] = {}

    def emit(node) -> Optional[str]:
        kind = node[0]
        if kind == "lit":
            return _escape_literal(node[1])
        if kind == "class":
            return node[1]
        if kind == "seq":
            parts = []
            for it in node[1]:
                p = emit(it)
                if p is None:
                    return None  # a dead sub-expression kills the sequence
                parts.append(p)
            return "".join(parts) if parts else ""
        if kind == "alt":
            outs = [p for p in (emit(s) for s in node[1]) if p is not None]
            if not outs:
                return None
            return "(" + "|".join(outs) + ")"
        if kind == "rep":
            inner = emit(node[1])
            suffix = node[2]
            if inner is None:
                # x* / x? of a dead expression match empty; x+ is dead.
                if suffix in ("*", "?") or suffix.startswith("{0"):
                    return ""
                return None
            return "(" + inner + ")" + suffix
        if kind == "ref":
            name = node[1]
            if name not in rules:
                raise ValueError(f"EBNF references undefined rule {name!r}")
            if depth.get(name, 0) >= max_depth:
                return None  # recursion bottom: drop this branch
            depth[name] = depth.get(name, 0) + 1
            try:
                return emit(rules[name])
            finally:
                depth[name] -= 1
        raise AssertionError(kind)

    out = emit(rules["root"])
    if out is None:
        raise ValueError(
            "EBNF grammar is recursive with no non-recursive base case "
            f"within depth {max_depth}"
        )
    return out


def ebnf_is_recursive(text: str) -> bool:
    """True when any rule can (transitively) reference itself — the regex
    inlining path cannot be exact then and the PDA engine (pda.py) serves
    the grammar instead."""
    rules = parse_ebnf(text)

    def refs(node, acc):
        kind = node[0]
        if kind == "ref":
            acc.add(node[1])
        elif kind in ("alt", "seq"):
            for sub in node[1]:
                refs(sub, acc)
        elif kind == "rep":
            refs(node[1], acc)
        return acc

    graph = {name: refs(node, set()) for name, node in rules.items()}
    color = {}

    def visit(u):
        color[u] = 1
        for w in graph.get(u, ()):  # undefined refs error later in compile
            if color.get(w) == 1:
                return True
            if color.get(w) != 2 and visit(w):
                return True
        color[u] = 2
        return False

    return any(color.get(n) != 2 and visit(n) for n in graph)
