"""Grammar backend: compile + cache constraints per (type, value) key.

Counterpart of BaseGrammarBackend + cache (constrained/base_grammar_backend.py:
111-167). Compilation runs in a single worker thread (`compile_async`); the
scheduler parks requests in a grammar_queue until the future resolves,
mirroring the reference's async compile + `move_ready_grammar_requests`
(managers/scheduler.py:2017-2081), so a pathological schema never stalls
running decodes.
"""

from __future__ import annotations

import concurrent.futures
import logging
from typing import Dict, List, Optional, Tuple

from ltp_sglang_tpu.constrained.json_schema import schema_to_regex
from ltp_sglang_tpu.constrained.regex_engine import compile_regex
from ltp_sglang_tpu.constrained.token_fsm import RegexGrammar, TokenFSM, VocabTrie

logger = logging.getLogger(__name__)


def _token_strings_from_tokenizer(tokenizer) -> List[Optional[str]]:
    """Decoded text of each vocab id (None for specials)."""
    size = len(tokenizer)
    special_ids = set(getattr(tokenizer, "all_special_ids", []) or [])
    strings: List[Optional[str]] = [None] * size
    # Batch-decode in chunks for speed.
    for start in range(0, size, 4096):
        ids = list(range(start, min(start + 4096, size)))
        for i in ids:
            if i in special_ids:
                continue
            try:
                s = tokenizer.decode([i])
            except Exception:
                s = None
            strings[i] = s if s else None
    return strings


class GrammarBackend:
    def __init__(self, tokenizer, vocab_size: int, eos_ids):
        self.tokenizer = tokenizer
        self.vocab_size = vocab_size
        self.eos_ids = set(eos_ids)
        self._trie: Optional[VocabTrie] = None
        self._token_strings: Optional[List[Optional[str]]] = None
        self._fsm_cache: Dict[Tuple[str, str], object] = {}
        # Single worker serializes compiles: the cache and trie are then only
        # mutated from one thread; dict get/set are GIL-atomic for readers.
        self._executor: Optional[concurrent.futures.ThreadPoolExecutor] = None

    def _ensure_vocab(self):
        if self._trie is None:
            if self.tokenizer is None:
                raise ValueError("grammar constraints require a tokenizer")
            self._token_strings = _token_strings_from_tokenizer(self.tokenizer)
            self._trie = VocabTrie(self._token_strings)

    def get_grammar(self, key: Tuple[str, str]):
        """key: ("regex"|"json_schema"|"ebnf"|"structural_tag", value).
        Synchronous compile (used by tests and the async worker)."""
        self._ensure_vocab()
        fsm = self._fsm_cache.get(key)
        if fsm is None:
            kind, value = key
            if kind == "structural_tag":
                from ltp_sglang_tpu.constrained.structural_tag import (
                    StructuralTagFSM,
                )

                fsm = StructuralTagFSM(
                    value, self._trie, self.vocab_size, self.eos_ids
                )
                self._fsm_cache[key] = fsm
                logger.info(
                    "compiled structural_tag (%d DFA states)", fsm.dfa.num_states
                )
            else:
                if kind == "regex":
                    pattern = value
                elif kind == "json_schema":
                    pattern = schema_to_regex(value)
                elif kind == "ebnf":
                    from ltp_sglang_tpu.constrained.ebnf import (
                        ebnf_is_recursive,
                        ebnf_to_regex,
                    )

                    if ebnf_is_recursive(value):
                        # Recursive grammars get the exact PDA engine
                        # (unbounded nesting; pda.py). Non-recursive ones
                        # keep the DFA pipeline — full inlining is exact and
                        # its per-state masks precompute.
                        from ltp_sglang_tpu.constrained.pda import (
                            PDAGrammarSpec,
                            PDATokenFSM,
                        )

                        spec = PDAGrammarSpec(value)
                        fsm = PDATokenFSM(
                            spec, self._trie, self.vocab_size, self.eos_ids
                        )
                        self._fsm_cache[key] = fsm
                        logger.info(
                            "compiled recursive EBNF as PDA (%d rules)",
                            len(spec.rules),
                        )
                        return self._instantiate(fsm)
                    pattern = ebnf_to_regex(value, max_depth=64)
                else:
                    raise ValueError(f"unsupported grammar kind: {kind}")
                dfa = compile_regex(pattern)
                fsm = TokenFSM(dfa, self._trie, self.vocab_size, self.eos_ids)
                self._fsm_cache[key] = fsm
                logger.info(
                    "compiled grammar %s (%d DFA states)", kind, dfa.num_states
                )
        return self._instantiate(fsm)

    def _instantiate(self, fsm):
        from ltp_sglang_tpu.constrained.pda import PDAGrammar, PDATokenFSM
        from ltp_sglang_tpu.constrained.structural_tag import (
            StructuralTagFSM,
            StructuralTagGrammar,
        )

        if isinstance(fsm, StructuralTagFSM):
            return StructuralTagGrammar(fsm, self._token_strings)
        if isinstance(fsm, PDATokenFSM):
            return PDAGrammar(fsm, self._token_strings)
        return RegexGrammar(fsm, self._token_strings)

    def try_get_cached(self, key: Tuple[str, str]):
        """Fast path: a fresh grammar object if the FSM is already compiled
        (no thread hop), else None."""
        fsm = self._fsm_cache.get(key)
        if fsm is None:
            return None
        return self._instantiate(fsm)

    def compile_async(self, key: Tuple[str, str]) -> concurrent.futures.Future:
        """Compile on the worker thread; resolves to a grammar object."""
        if self._executor is None:
            self._executor = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="grammar-compile"
            )
        return self._executor.submit(self.get_grammar, key)
