"""Structural-tag constrained decoding.

The reference serves `structural_tag` sampling params through xgrammar's
structural-tag compiler (srt/constrained/xgrammar_backend.py:45, spec carried
by sampling/sampling_params.py): generation is FREE text until one of the
`triggers` strings is emitted; from that point output must follow one of the
`structures` whose `begin` starts with that trigger — `begin` literal, then
content matching `schema` (a JSON schema), then the `end` literal — after
which generation is free again. Spec format (OpenAI/xgrammar convention):

    {"type": "structural_tag",
     "structures": [{"begin": "<function=get_weather>", "schema": {...},
                     "end": "</function>"}],
     "triggers": ["<function="]}

TPU-native design: instead of a pushdown matcher we compose the existing
char-DFA pipeline (regex_engine.py + token_fsm.py). Each structure compiles
to one DFA for `escape(begin) + schema_regex + escape(end)`; at runtime a
small KMP scanner watches the decoded stream for triggers. On a completed
trigger the matching structures' DFAs are advanced through the trigger chars
and the grammar enters CONSTRAINED mode (token masks from TokenFSM); when a
DFA accepts (the `end` literal completed) the grammar returns to FREE mode.

Boundary semantics: a token whose characters complete a trigger but whose
remaining characters contradict every candidate `begin` is treated as free
text (the trigger was incidental), mirroring the forgiving behavior users
get from xgrammar's earliest-match triggers without requiring per-state
full-vocab masks in free mode.
"""

from __future__ import annotations

import json
from typing import List, Optional, Tuple

import numpy as np

from ltp_sglang_tpu.constrained.json_schema import schema_to_regex
from ltp_sglang_tpu.constrained.regex_engine import compile_regex
from ltp_sglang_tpu.constrained.token_fsm import TokenFSM, VocabTrie

_REGEX_SPECIAL = set(".^$*+?()[]{}|\\/")


def _escape(s: str) -> str:
    return "".join("\\" + c if c in _REGEX_SPECIAL else c for c in s)


def parse_structural_tag(value: str) -> Tuple[List[dict], List[str]]:
    spec = json.loads(value) if isinstance(value, str) else value
    if spec.get("type") != "structural_tag":
        raise ValueError("structural_tag spec must have type='structural_tag'")
    structures = spec.get("structures") or []
    triggers = spec.get("triggers") or []
    if not structures or not triggers:
        raise ValueError("structural_tag needs non-empty structures and triggers")
    for s in structures:
        if "begin" not in s or "end" not in s:
            raise ValueError("each structure needs 'begin' and 'end'")
        if not any(s["begin"].startswith(t) for t in triggers):
            raise ValueError(
                f"structure begin {s['begin']!r} matches no trigger"
            )
    return structures, triggers


class StructuralTagFSM:
    """Compiled, sharable (cached per spec) part: the per-structure DFAs."""

    def __init__(self, value: str, trie: VocabTrie, vocab_size: int, eos_ids):
        self.structures, self.triggers = parse_structural_tag(value)
        self.vocab_size = vocab_size
        self.eos_ids = list(eos_ids)
        # One union DFA over all structures keeps mid-token ambiguity (two
        # begins sharing a prefix) inside ordinary DFA determinization.
        pattern = "|".join(
            "("
            + _escape(s["begin"])
            + (schema_to_regex(json.dumps(s["schema"])) if s.get("schema") else "")
            + _escape(s["end"])
            + ")"
            for s in self.structures
        )
        self.dfa = compile_regex(pattern)
        self.token_fsm = TokenFSM(self.dfa, trie, vocab_size, eos_ids=[])


class StructuralTagGrammar:
    """Per-request matcher (BaseGrammarObject contract analog,
    constrained/base_grammar_backend.py:29-103)."""

    def __init__(self, fsm: StructuralTagFSM, token_strings):
        self.fsm = fsm
        self.token_strings = token_strings
        # FREE-mode trigger tracking: per trigger, length of the longest
        # suffix of emitted text that is a prefix of the trigger.
        self._trig_pos = [0] * len(fsm.triggers)
        # CONSTRAINED mode: current DFA state, or None when free.
        self.dfa_state: Optional[int] = None
        self.finished = False
        self.history: List[Tuple[Optional[int], Tuple[int, ...]]] = []

    # ------------------------------------------------------------ free scan
    def _advance_trigger(self, pos: int, trigger: str, ch: str) -> int:
        """KMP-free incremental prefix match (triggers are short; fall back
        by rescanning the buffered prefix)."""
        buf = trigger[:pos] + ch
        # Longest suffix of buf that is a prefix of trigger.
        for L in range(min(len(buf), len(trigger)), 0, -1):
            if trigger.startswith(buf[-L:]):
                return L
        return 0

    def _walk_chars(self, text: str) -> bool:
        """Advance through one token's characters. Returns False only when the
        token is invalid in CONSTRAINED mode."""
        dfa = self.fsm.dfa
        i = 0
        n = len(text)
        while i < n:
            ch = text[i]
            if self.dfa_state is not None:
                ns = dfa.step(self.dfa_state, ord(ch))
                if ns < 0:
                    return False
                self.dfa_state = ns
                if ns in dfa.accepting:
                    # end literal completed: structure closed, back to free.
                    self.dfa_state = None
                    self._trig_pos = [0] * len(self.fsm.triggers)
                i += 1
                continue
            # FREE mode: advance trigger trackers.
            completed = -1
            for t_idx, trig in enumerate(self.fsm.triggers):
                self._trig_pos[t_idx] = self._advance_trigger(
                    self._trig_pos[t_idx], trig, ch
                )
                if self._trig_pos[t_idx] == len(trig):
                    completed = t_idx
            i += 1
            if completed >= 0:
                trig = self.fsm.triggers[completed]
                st = 0
                ok = True
                for c in trig:
                    st = dfa.step(st, ord(c))
                    if st < 0:
                        ok = False
                        break
                if not ok:
                    # trigger not actually a begin-prefix (spec validated, so
                    # schema regex may have rejected); stay free.
                    self._trig_pos[completed] = 0
                    continue
                # Speculatively enter constrained mode; if the rest of this
                # token contradicts the structures, treat the whole token as
                # free text (see module docstring).
                save_trig = list(self._trig_pos)
                self.dfa_state = st
                rest = text[i:]
                j = 0
                okrest = True
                while j < len(rest) and self.dfa_state is not None:
                    ns2 = dfa.step(self.dfa_state, ord(rest[j]))
                    if ns2 < 0:
                        okrest = False
                        break
                    self.dfa_state = ns2
                    if ns2 in dfa.accepting:
                        self.dfa_state = None
                        self._trig_pos = [0] * len(self.fsm.triggers)
                    j += 1
                if not okrest:
                    # Incidental trigger: rewind to free mode and keep
                    # scanning the remaining chars as free text.
                    self.dfa_state = None
                    self._trig_pos = save_trig
                    self._trig_pos[completed] = 0
                    continue
                i += j
        return True

    # ------------------------------------------------------- grammar iface
    def accept_token(self, token_id: int) -> bool:
        if token_id in self.fsm.eos_ids:
            if self.dfa_state is None:
                self.finished = True
                return True
            return False  # EOS inside a structure
        s = (
            self.token_strings[token_id]
            if token_id < len(self.token_strings)
            else None
        )
        if s is None:
            # Special tokens end free text legitimately; forbidden mid-tag.
            return self.dfa_state is None
        self.history.append((self.dfa_state, tuple(self._trig_pos)))
        if not self._walk_chars(s):
            self.history.pop()
            return False
        return True

    def rollback(self, n: int):
        for _ in range(n):
            self.dfa_state, trig = self.history.pop()
            self._trig_pos = list(trig)

    def fill_vocab_mask(self, mask_row: np.ndarray):
        """mask_row: bool [V], True = FORBIDDEN."""
        if self.dfa_state is None:
            mask_row[: self.fsm.vocab_size] = False
            return
        allowed = self.fsm.token_fsm.allowed_mask(self.dfa_state)
        np.logical_not(allowed, out=mask_row[: len(allowed)])
        for e in self.fsm.eos_ids:
            mask_row[e] = True

    def window_stable_mask(self):
        # Free text can flip into a structure mid-window; always run K=1.
        return None

    def is_terminated(self) -> bool:
        return self.finished

    @property
    def num_allowed(self) -> int:
        if self.dfa_state is None:
            return self.fsm.vocab_size
        return int(self.fsm.token_fsm.allowed_mask(self.dfa_state).sum())
