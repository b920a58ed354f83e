"""Pushdown-automaton EBNF matcher — exact unbounded recursion.

The reference serves EBNF through xgrammar's PDA (constrained/
xgrammar_backend.py:45); the regex path here (ebnf.py) inlines recursion to
a fixed depth and therefore goes dead past it (r03 weak #8). This module is
the exact engine for RECURSIVE grammars: a scannerless nondeterministic
pushdown matcher whose configuration is a SET of symbol stacks (persistent
tuples, top at the end). Character steps expand nonterminal stack tops to
their alternatives (closure) and consume the char against terminal tops;
token masks come from a DFS over (vocab trie x configuration) with
per-(stack, char) advance memoization and per-configuration mask caching.

Loudly rejected at compile (submit) time rather than failing mid-request:
left-recursive rules (the LL-style expansion would loop; rewrite with
repetition — the same guidance llguidance gives) and configurations that
explode past the stack/branch budget.
"""

from __future__ import annotations

import re
from typing import Dict, FrozenSet, List, Optional, Tuple

import numpy as np

from ltp_sglang_tpu.constrained.ebnf import parse_ebnf

# Symbols: ("t", ranges) terminal with ranges = tuple of (lo, hi) codepoint
# pairs (inclusive), negated handled at build; ("nt", name) nonterminal.
Sym = Tuple[str, object]

_MAX_STACKS = 256  # live nondeterministic branches per configuration
_MAX_DEPTH = 4096  # symbols on one stack


def _class_to_ranges(cls: str) -> Tuple[Tuple[int, int], ...]:
    """[a-z0-9] character class -> sorted inclusive codepoint ranges."""
    body = cls[1:-1]
    neg = body.startswith("^")
    if neg:
        body = body[1:]
    i, n = 0, len(body)
    ranges: List[Tuple[int, int]] = []

    def read_char():
        nonlocal i
        if body[i] == "\\" and i + 1 < n:
            esc = body[i + 1]
            mapping = {"n": "\n", "t": "\t", "r": "\r"}
            if esc == "x" and i + 3 < n:
                ch = chr(int(body[i + 2:i + 4], 16))
                i += 4
                return ch
            if esc == "u" and i + 5 < n:
                ch = chr(int(body[i + 2:i + 6], 16))
                i += 6
                return ch
            i += 2
            return mapping.get(esc, esc)
        ch = body[i]
        i += 1
        return ch

    while i < n:
        a = read_char()
        if i < n and body[i] == "-" and i + 1 < n:
            i += 1
            b = read_char()
            ranges.append((ord(a), ord(b)))
        else:
            ranges.append((ord(a), ord(a)))
    ranges.sort()
    if not neg:
        return tuple(ranges)
    out = []
    prev = 0
    for lo, hi in ranges:
        if lo > prev:
            out.append((prev, lo - 1))
        prev = max(prev, hi + 1)
    if prev <= 0x10FFFF:
        out.append((prev, 0x10FFFF))
    return tuple(out)


def _in_ranges(cp: int, ranges) -> bool:
    for lo, hi in ranges:
        if lo <= cp <= hi:
            return True
    return False


class PDAGrammarSpec:
    """Compiled CFG: rule -> alternatives (symbol sequences)."""

    def __init__(self, text: str):
        ast_rules = parse_ebnf(text)
        self.rules: Dict[str, List[Tuple[Sym, ...]]] = {}
        self._aux = 0
        for name, node in ast_rules.items():
            self.rules[name] = [tuple(s) for s in self._alts(node, name)]
        for name, alts in list(self.rules.items()):
            for alt in alts:
                for kind, v in alt:
                    if kind == "nt" and v not in self.rules:
                        raise ValueError(
                            f"EBNF references undefined rule {v!r}"
                        )
        self._reject_left_recursion()

    # ---- desugar AST into plain CFG alternatives
    def _fresh(self, base: str) -> str:
        self._aux += 1
        return f"{base}%{self._aux}"

    def _alts(self, node, ctx: str) -> List[List[Sym]]:
        kind = node[0]
        if kind == "alt":
            out: List[List[Sym]] = []
            for sub in node[1]:
                out.extend(self._alts(sub, ctx))
            return out
        return [self._seq(node, ctx)]

    def _seq(self, node, ctx: str) -> List[Sym]:
        kind = node[0]
        if kind == "seq":
            out: List[Sym] = []
            for it in node[1]:
                out.extend(self._seq(it, ctx))
            return out
        if kind == "lit":
            return [("t", ((ord(c), ord(c)),)) for c in node[1]]
        if kind == "class":
            return [("t", _class_to_ranges(node[1]))]
        if kind == "ref":
            return [("nt", node[1])]
        if kind in ("alt",):
            aux = self._fresh(ctx)
            self.rules[aux] = [tuple(s) for s in self._alts(node, ctx)]
            return [("nt", aux)]
        if kind == "rep":
            inner = self._seq(node[1], ctx) if node[1][0] != "alt" else None
            if inner is None:
                sub = self._fresh(ctx)
                self.rules[sub] = [tuple(s) for s in self._alts(node[1], ctx)]
                inner = [("nt", sub)]
            suffix = node[2]
            aux = self._fresh(ctx)
            if suffix == "?":
                self.rules[aux] = [tuple(inner), ()]
            elif suffix == "*":
                self.rules[aux] = [tuple(inner) + (("nt", aux),), ()]
            elif suffix == "+":
                star = self._fresh(ctx)
                self.rules[star] = [tuple(inner) + (("nt", star),), ()]
                self.rules[aux] = [tuple(inner) + (("nt", star),)]
            elif suffix.startswith("{"):
                m = re.match(r"\{(\d+)(?:,(\d*))?\}$", suffix)
                if not m:
                    raise ValueError(f"bad repetition {suffix!r}")
                lo = int(m.group(1))
                hi = m.group(2)
                alts: List[Tuple[Sym, ...]] = []
                if hi is None:  # exactly lo
                    alts = [tuple(inner) * lo]
                elif hi == "":  # lo or more
                    star = self._fresh(ctx)
                    self.rules[star] = [tuple(inner) + (("nt", star),), ()]
                    alts = [tuple(inner) * lo + (("nt", star),)]
                else:
                    alts = [tuple(inner) * k for k in range(lo, int(hi) + 1)]
                self.rules[aux] = alts or [()]
            else:
                raise ValueError(f"bad repetition {suffix!r}")
            return [("nt", aux)]
        raise AssertionError(kind)

    # ---- nullability + left recursion (submit-time rejection)
    def _nullable_set(self) -> set:
        nullable = set()
        changed = True
        while changed:
            changed = False
            for name, alts in self.rules.items():
                if name in nullable:
                    continue
                for alt in alts:
                    if all(k == "nt" and v in nullable for k, v in alt):
                        nullable.add(name)
                        changed = True
                        break
        return nullable

    def _reject_left_recursion(self):
        nullable = self._nullable_set()
        # left-corner graph: A -> B when B can start A's expansion.
        edges: Dict[str, set] = {name: set() for name in self.rules}
        for name, alts in self.rules.items():
            for alt in alts:
                for kind, v in alt:
                    if kind != "nt":
                        break
                    edges[name].add(v)
                    if v not in nullable:
                        break
        # cycle detection
        color: Dict[str, int] = {}

        def visit(u, path):
            color[u] = 1
            for w in edges[u]:
                if color.get(w) == 1:
                    raise ValueError(
                        "left-recursive EBNF rule "
                        f"{w.split('%')[0]!r} (via {' -> '.join(path + [w])}): "
                        "the PDA matcher expands leftmost-first; rewrite "
                        "with repetition (x*) instead of left recursion"
                    )
                if color.get(w) != 2:
                    visit(w, path + [w])
            color[u] = 2

        for name in self.rules:
            if color.get(name) != 2:
                visit(name, [name])


class PDATokenFSM:
    """Token-mask engine over PDA configurations (TokenFSM analog; shared
    per grammar, stateless — per-request state lives in PDAGrammar)."""

    def __init__(self, spec: PDAGrammarSpec, trie, vocab_size: int, eos_ids):
        self.spec = spec
        self.trie = trie
        self.vocab_size = vocab_size
        self.eos_ids = list(eos_ids)
        self._advance_cache: Dict[Tuple[Tuple[Sym, ...], str],
                                  Tuple[Tuple[Sym, ...], ...]] = {}
        self._mask_cache: Dict[FrozenSet, np.ndarray] = {}
        self.start: FrozenSet = frozenset({(("nt", "root"),)})

    # ---- single-stack closure: expand nonterminal tops until terminal/empty
    def _closure(self, stack: Tuple[Sym, ...]) -> List[Tuple[Sym, ...]]:
        out: List[Tuple[Sym, ...]] = []
        seen = set()
        work = [stack]
        while work:
            st = work.pop()
            if st in seen:
                continue
            seen.add(st)
            if len(seen) > _MAX_STACKS * 4:
                raise ValueError("EBNF expansion exploded (closure budget)")
            if not st or st[-1][0] == "t":
                out.append(st)
                continue
            name = st[-1][1]
            base = st[:-1]
            if len(base) > _MAX_DEPTH:
                raise ValueError("EBNF stack depth budget exceeded")
            for alt in self.spec.rules[name]:
                work.append(base + tuple(reversed(alt)))
        return out

    def _advance_stack(self, stack: Tuple[Sym, ...], ch: str):
        """Closure + consume one char. Returns tuple of successor stacks."""
        key = (stack, ch)
        hit = self._advance_cache.get(key)
        if hit is not None:
            return hit
        cp = ord(ch)
        out = []
        for st in self._closure(stack):
            if st and st[-1][0] == "t" and _in_ranges(cp, st[-1][1]):
                out.append(st[:-1])
        res = tuple(out)
        self._advance_cache[key] = res
        return res

    def advance(self, configs: FrozenSet, ch: str) -> FrozenSet:
        out = set()
        for st in configs:
            out.update(self._advance_stack(st, ch))
        if len(out) > _MAX_STACKS:
            raise ValueError(
                f"EBNF nondeterminism exceeded {_MAX_STACKS} branches"
            )
        return frozenset(out)

    def accepts_empty(self, configs: FrozenSet) -> bool:
        return any(not st for st in
                   (c for stack in configs for c in self._closure(stack)))

    def allowed_mask(self, configs: FrozenSet) -> np.ndarray:
        m = self._mask_cache.get(configs)
        if m is not None:
            return m
        mask = np.zeros((self.vocab_size,), dtype=bool)
        children = self.trie.children
        tokens_at = self.trie.tokens_at
        stack = [(0, configs)]
        while stack:
            node, cfgs = stack.pop()
            for tid in tokens_at[node]:
                mask[tid] = True
            for ch, nxt in children[node].items():
                ncf = set()
                for st in cfgs:
                    ncf.update(self._advance_stack(st, ch))
                if ncf:
                    stack.append((nxt, frozenset(ncf)))
        if self.accepts_empty(configs):
            for e in self.eos_ids:
                mask[e] = True
        if len(self._mask_cache) > 512:
            self._mask_cache.pop(next(iter(self._mask_cache)))
        self._mask_cache[configs] = mask
        return mask


class PDAGrammar:
    """Per-request grammar object (BaseGrammarObject contract), PDA-backed."""

    def __init__(self, fsm: PDATokenFSM, token_strings):
        self.fsm = fsm
        self.token_strings = token_strings
        self.configs = fsm.start
        self.history: List[FrozenSet] = []
        self.finished = False

    def accept_token(self, token_id: int) -> bool:
        if token_id in self.fsm.eos_ids:
            if self.fsm.accepts_empty(self.configs):
                self.finished = True
                return True
            return False
        s = self.token_strings[token_id]
        if not s:
            return False
        cfgs = self.configs
        for ch in s:
            cfgs = self.fsm.advance(cfgs, ch)
            if not cfgs:
                return False
        self.history.append(self.configs)
        self.configs = cfgs
        return True

    def rollback(self, n: int):
        for _ in range(n):
            self.configs = self.history.pop()

    def fill_vocab_mask(self, mask_row: np.ndarray):
        allowed = self.fsm.allowed_mask(self.configs)
        np.logical_not(allowed, out=mask_row[: len(allowed)])

    def window_stable_mask(self):
        # No closure-stability analysis over PDA configurations; the
        # scheduler falls back to per-step masking (K=1) for PDA requests.
        return None

    def is_terminated(self) -> bool:
        return self.finished

    @property
    def num_allowed(self) -> int:
        return int(self.fsm.allowed_mask(self.configs).sum())
