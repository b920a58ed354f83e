"""Token-level FSM over a character DFA.

The counterpart of xgrammar's GrammarMatcher + token bitmask
(constrained/xgrammar_backend.py:45-101): per DFA state, the set of vocab
tokens whose character walk survives, computed by a single DFS over the
(vocab trie x DFA) product and cached per state. EOS is allowed exactly at
accepting states.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ltp_sglang_tpu.constrained.regex_engine import DFA


class VocabTrie:
    """Character trie over token strings; built once per tokenizer."""

    def __init__(self, token_strings: List[Optional[str]]):
        # children: list of dict char -> node; token_ids_at: tokens ending at node
        self.children: List[Dict[str, int]] = [{}]
        self.tokens_at: List[List[int]] = [[]]
        for tid, s in enumerate(token_strings):
            if not s:  # None or empty: never maskable-in (handled separately)
                continue
            node = 0
            for ch in s:
                nxt = self.children[node].get(ch)
                if nxt is None:
                    nxt = len(self.children)
                    self.children[node][ch] = nxt
                    self.children.append({})
                    self.tokens_at.append([])
                node = nxt
            self.tokens_at[node].append(tid)


class TokenFSM:
    def __init__(self, dfa: DFA, trie: VocabTrie, vocab_size: int, eos_ids):
        self.dfa = dfa
        self.trie = trie
        self.vocab_size = vocab_size
        self.eos_ids = list(eos_ids)
        self._mask_cache: Dict[int, np.ndarray] = {}
        self._stable_cache: Dict[int, Optional[np.ndarray]] = {}

    def allowed_mask(self, state: int) -> np.ndarray:
        """bool [V]: True = ALLOWED from this DFA state."""
        m = self._mask_cache.get(state)
        if m is not None:
            return m
        mask = np.zeros((self.vocab_size,), dtype=bool)
        # DFS over (trie node, dfa state).
        stack = [(0, state)]
        children = self.trie.children
        tokens_at = self.trie.tokens_at
        dfa = self.dfa
        while stack:
            node, s = stack.pop()
            for tid in tokens_at[node]:
                mask[tid] = True
            for ch, nxt in children[node].items():
                ns = dfa.step(s, ord(ch))
                if ns >= 0:
                    stack.append((nxt, ns))
        if state in dfa.accepting:
            for e in self.eos_ids:
                mask[e] = True
        self._mask_cache[state] = mask
        return mask

    def stable_mask(self, state: int, max_states: int = 64):
        """If every char-reachable DFA state from `state` has an IDENTICAL
        allowed-token mask, return that mask — it then stays valid for any
        number of decode steps, so the scheduler can run a whole K-step
        device window under one constant vocab mask (the reference applies
        per-step masks on device, sampling_batch_info.py:171-223; this is
        the window-program analog). Returns None when masks diverge within
        the closure or the closure exceeds `max_states` (fall back to
        per-token masking, K=1)."""
        if state in self._stable_cache:
            return self._stable_cache[state]
        seen = {state}
        stack = [state]
        trans = self.dfa.transitions
        while stack:
            s = stack.pop()
            for _, _, dst in trans[s]:
                if dst not in seen:
                    if len(seen) >= max_states:
                        self._stable_cache[state] = None
                        return None
                    seen.add(dst)
                    stack.append(dst)
        base = self.allowed_mask(state)
        for s in seen:
            if s != state and not np.array_equal(self.allowed_mask(s), base):
                self._stable_cache[state] = None
                return None
        self._stable_cache[state] = base
        return base


class RegexGrammar:
    """Per-request grammar object (BaseGrammarObject contract:
    constrained/base_grammar_backend.py:29-103)."""

    def __init__(self, fsm: TokenFSM, token_strings: List[Optional[str]]):
        self.fsm = fsm
        self.token_strings = token_strings
        self.state = 0
        self.history: List[int] = []
        self.finished = False

    def accept_token(self, token_id: int) -> bool:
        if token_id in self.fsm.eos_ids:
            if self.state in self.fsm.dfa.accepting:
                self.finished = True
                return True
            return False
        s = self.token_strings[token_id]
        if not s:
            return False
        ns = self.fsm.dfa.walk(self.state, s)
        if ns < 0:
            return False
        self.history.append(self.state)
        self.state = ns
        return True

    def rollback(self, n: int):
        for _ in range(n):
            self.state = self.history.pop()

    def fill_vocab_mask(self, mask_row: np.ndarray):
        """mask_row: bool [V], True = FORBIDDEN (runner semantics)."""
        allowed = self.fsm.allowed_mask(self.state)
        np.logical_not(allowed, out=mask_row[: len(allowed)])

    def window_stable_mask(self):
        """Forbidden-mask [V] valid for arbitrarily many steps from the
        current state, or None (see TokenFSM.stable_mask)."""
        allowed = self.fsm.stable_mask(self.state)
        if allowed is None:
            return None
        return ~allowed

    def is_terminated(self) -> bool:
        return self.finished

    @property
    def num_allowed(self) -> int:
        return int(self.fsm.allowed_mask(self.state).sum())
