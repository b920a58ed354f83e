"""A self-contained regex -> NFA -> DFA compiler over unicode codepoints.

This image has neither xgrammar nor outlines (the reference's grammar
backends, constrained/{xgrammar,outlines}_backend.py), so the FSM machinery
is built from scratch: interval-based character classes, Thompson NFA
construction, subset-construction DFA. Full-match semantics (implicitly
anchored), which is what structured-output constraints need.

Supported syntax: literals, `.`, escapes (\\d \\w \\s \\n \\t \\r and
punctuation escapes), classes `[...]` with ranges and negation, groups
`(...)`, alternation `|`, quantifiers `* + ? {m} {m,} {m,n}`.
"""

from __future__ import annotations

from typing import Dict, FrozenSet, List, Optional, Tuple

MAX_CP = 0x10FFFF

# An interval set is a sorted list of (lo, hi) inclusive codepoint ranges.
Intervals = Tuple[Tuple[int, int], ...]

DIGIT: Intervals = ((48, 57),)
WORD: Intervals = ((48, 57), (65, 90), (95, 95), (97, 122))
SPACE: Intervals = ((9, 10), (11, 13), (32, 32))
DOT: Intervals = ((0, 9), (11, MAX_CP))  # anything but \n


def _negate(iv: Intervals) -> Intervals:
    out = []
    prev = 0
    for lo, hi in sorted(iv):
        if lo > prev:
            out.append((prev, lo - 1))
        prev = max(prev, hi + 1)
    if prev <= MAX_CP:
        out.append((prev, MAX_CP))
    return tuple(out)


def _merge(iv: List[Tuple[int, int]]) -> Intervals:
    if not iv:
        return ()
    iv = sorted(iv)
    out = [iv[0]]
    for lo, hi in iv[1:]:
        if lo <= out[-1][1] + 1:
            out[-1] = (out[-1][0], max(out[-1][1], hi))
        else:
            out.append((lo, hi))
    return tuple(out)


# ------------------------------------------------------------------- parser
class _Parser:
    """Recursive-descent regex parser producing an AST."""

    def __init__(self, pattern: str):
        self.p = pattern
        self.i = 0

    def peek(self) -> Optional[str]:
        return self.p[self.i] if self.i < len(self.p) else None

    def next(self) -> str:
        c = self.p[self.i]
        self.i += 1
        return c

    def parse(self):
        node = self.alternation()
        if self.i != len(self.p):
            raise ValueError(f"unexpected char at {self.i} in regex {self.p!r}")
        return node

    def alternation(self):
        branches = [self.concat()]
        while self.peek() == "|":
            self.next()
            branches.append(self.concat())
        return ("alt", branches) if len(branches) > 1 else branches[0]

    def concat(self):
        items = []
        while self.peek() is not None and self.peek() not in "|)":
            items.append(self.repeat())
        if not items:
            return ("empty",)
        return ("cat", items) if len(items) > 1 else items[0]

    def repeat(self):
        atom = self.atom()
        while True:
            c = self.peek()
            if c == "*":
                self.next()
                atom = ("star", atom)
            elif c == "+":
                self.next()
                atom = ("plus", atom)
            elif c == "?":
                self.next()
                atom = ("opt", atom)
            elif c == "{":
                save = self.i
                self.next()
                spec = ""
                while self.peek() is not None and self.peek() != "}":
                    spec += self.next()
                if self.peek() != "}":
                    self.i = save
                    break
                self.next()
                if "," in spec:
                    lo_s, hi_s = spec.split(",", 1)
                    lo = int(lo_s) if lo_s else 0
                    hi = int(hi_s) if hi_s.strip() else None
                else:
                    lo = hi = int(spec)
                atom = ("rep", atom, lo, hi)
            else:
                break
        return atom

    def atom(self):
        c = self.next()
        if c == "(":
            if self.p[self.i : self.i + 2] == "?:":
                self.i += 2
            node = self.alternation()
            if self.peek() != ")":
                raise ValueError("unbalanced paren")
            self.next()
            return node
        if c == "[":
            return ("class", self.char_class())
        if c == ".":
            return ("class", DOT)
        if c == "\\":
            return ("class", self.escape(self.next()))
        if c in "*+?{":
            raise ValueError(f"dangling quantifier {c!r}")
        return ("class", ((ord(c), ord(c)),))

    def escape(self, c: str) -> Intervals:
        if c == "d":
            return DIGIT
        if c == "D":
            return _negate(DIGIT)
        if c == "w":
            return WORD
        if c == "W":
            return _negate(WORD)
        if c == "s":
            return SPACE
        if c == "S":
            return _negate(SPACE)
        if c == "n":
            return ((10, 10),)
        if c == "t":
            return ((9, 9),)
        if c == "r":
            return ((13, 13),)
        if c == "x":
            v = int(self.next() + self.next(), 16)
            return ((v, v),)
        if c == "u":
            v = int("".join(self.next() for _ in range(4)), 16)
            return ((v, v),)
        return ((ord(c), ord(c)),)

    def char_class(self) -> Intervals:
        negated = False
        if self.peek() == "^":
            self.next()
            negated = True
        items: List[Tuple[int, int]] = []
        first = True
        while True:
            c = self.peek()
            if c is None:
                raise ValueError("unterminated class")
            if c == "]" and not first:
                self.next()
                break
            first = False
            c = self.next()
            if c == "\\":
                iv = self.escape(self.next())
                items.extend(iv)
                continue
            lo = ord(c)
            if self.peek() == "-" and self.i + 1 < len(self.p) and self.p[self.i + 1] != "]":
                self.next()
                hic = self.next()
                if hic == "\\":
                    hic = self.next()
                items.append((lo, ord(hic)))
            else:
                items.append((lo, lo))
        iv = _merge(items)
        return _negate(iv) if negated else iv


# ---------------------------------------------------------------------- NFA
class _NFA:
    def __init__(self):
        self.eps: List[List[int]] = []  # state -> eps targets
        self.trans: List[List[Tuple[Intervals, int]]] = []  # state -> [(iv, dst)]

    def new_state(self) -> int:
        self.eps.append([])
        self.trans.append([])
        return len(self.eps) - 1


def _build_nfa(node, nfa: _NFA) -> Tuple[int, int]:
    """Returns (start, end) state ids."""
    kind = node[0]
    if kind == "empty":
        s = nfa.new_state()
        return s, s
    if kind == "class":
        s, e = nfa.new_state(), nfa.new_state()
        nfa.trans[s].append((node[1], e))
        return s, e
    if kind == "cat":
        first = None
        prev_end = None
        for item in node[1]:
            s, e = _build_nfa(item, nfa)
            if first is None:
                first = s
            else:
                nfa.eps[prev_end].append(s)
            prev_end = e
        return first, prev_end
    if kind == "alt":
        s, e = nfa.new_state(), nfa.new_state()
        for b in node[1]:
            bs, be = _build_nfa(b, nfa)
            nfa.eps[s].append(bs)
            nfa.eps[be].append(e)
        return s, e
    if kind == "star":
        s, e = nfa.new_state(), nfa.new_state()
        bs, be = _build_nfa(node[1], nfa)
        nfa.eps[s] += [bs, e]
        nfa.eps[be] += [bs, e]
        return s, e
    if kind == "plus":
        return _build_nfa(("cat", [node[1], ("star", node[1])]), nfa)
    if kind == "opt":
        s, e = nfa.new_state(), nfa.new_state()
        bs, be = _build_nfa(node[1], nfa)
        nfa.eps[s] += [bs, e]
        nfa.eps[be].append(e)
        return s, e
    if kind == "rep":
        _, sub, lo, hi = node
        items = [sub] * lo
        if hi is None:
            items.append(("star", sub))
        else:
            items += [("opt", sub)] * (hi - lo)
        if not items:
            return _build_nfa(("empty",), nfa)
        return _build_nfa(("cat", items) if len(items) > 1 else items[0], nfa)
    raise ValueError(f"unknown node {kind}")


# ---------------------------------------------------------------------- DFA
class DFA:
    """Deterministic automaton with interval transitions.

    states: 0..n-1, state 0 = start. transitions[s] = sorted list of
    (lo, hi, dst). accepting = frozenset of states. Dead state = implicit
    (no transition)."""

    def __init__(self, transitions, accepting: FrozenSet[int]):
        self.transitions = transitions
        self.accepting = accepting

    def step(self, state: int, cp: int) -> int:
        """Returns next state or -1 (dead)."""
        for lo, hi, dst in self.transitions[state]:
            if lo <= cp <= hi:
                return dst
            if cp < lo:
                return -1
        return -1

    def walk(self, state: int, text: str) -> int:
        for ch in text:
            if state < 0:
                return -1
            state = self.step(state, ord(ch))
        return state

    @property
    def num_states(self) -> int:
        return len(self.transitions)


def compile_regex(pattern: str) -> DFA:
    ast = _Parser(pattern).parse()
    nfa = _NFA()
    start, end = _build_nfa(ast, nfa)

    def eps_closure(states: FrozenSet[int]) -> FrozenSet[int]:
        stack = list(states)
        seen = set(states)
        while stack:
            s = stack.pop()
            for t in nfa.eps[s]:
                if t not in seen:
                    seen.add(t)
                    stack.append(t)
        return frozenset(seen)

    start_set = eps_closure(frozenset([start]))
    index: Dict[FrozenSet[int], int] = {start_set: 0}
    order = [start_set]
    transitions: List[List[Tuple[int, int, int]]] = []
    accepting = set()

    i = 0
    while i < len(order):
        cur = order[i]
        if end in cur:
            accepting.add(i)
        # Collect boundary points from all outgoing intervals.
        points = set()
        edges = []
        for s in cur:
            for iv, dst in nfa.trans[s]:
                for lo, hi in iv:
                    points.add(lo)
                    points.add(hi + 1)
                    edges.append((lo, hi, dst))
        trans_out: List[Tuple[int, int, int]] = []
        pts = sorted(points)
        for j in range(len(pts) - 1):
            lo, hi = pts[j], pts[j + 1] - 1
            targets = frozenset(d for (elo, ehi, d) in edges if elo <= lo and hi <= ehi)
            if not targets:
                continue
            tgt = eps_closure(targets)
            if tgt not in index:
                index[tgt] = len(order)
                order.append(tgt)
            dst_id = index[tgt]
            if trans_out and trans_out[-1][2] == dst_id and trans_out[-1][1] + 1 == lo:
                trans_out[-1] = (trans_out[-1][0], hi, dst_id)
            else:
                trans_out.append((lo, hi, dst_id))
        transitions.append(trans_out)
        i += 1

    return DFA(transitions, frozenset(accepting))
