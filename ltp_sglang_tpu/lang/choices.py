"""Selection methods for sgl.select().

Counterpart of python/sglang/lang/choices.py: score every choice's token
logprobs (via the engine's input_token_logprobs / logprob_start_len API) and
pick per method:

- token_length_normalized (reference default): mean token logprob.
- greedy_token_selection: eliminate choices whose t-th token is not the
  greedy argmax among the still-alive choices.
- unconditional_likelihood_normalized: mean of (conditional - unconditional)
  token logprobs — corrects for choices that are a priori common strings.

The TPU-native default for select() remains grammar-constrained generation
("grammar"): one decode pass, no per-choice scoring requests; these methods
are for reference-faithful selection semantics.
"""

from __future__ import annotations

from typing import Any, Dict, List

CHOICES_METHODS = (
    "token_length_normalized",
    "greedy_token_selection",
    "unconditional_likelihood_normalized",
)


def _meta(out: Dict[str, Any]) -> Dict[str, Any]:
    return out.get("meta_info", out)


def _score(backend, text: str) -> List[float]:
    """Token logprobs of `text` (first token unscored -> dropped)."""
    out = backend.generate(
        prompt=text,
        sampling_params={"max_new_tokens": 1, "temperature": 0.0},
        return_logprob=True,
        logprob_start_len=0,
    )
    ilps = _meta(out).get("input_token_logprobs")
    if ilps is None:
        raise RuntimeError(
            "backend does not return input_token_logprobs; choices methods "
            "need a ltp_sglang_tpu engine or server (got a bare generate)"
        )
    return [e[0] for e in ilps], len(ilps)


def _prompt_tokens(backend, prompt: str) -> int:
    out = backend.generate(
        prompt=prompt,
        sampling_params={"max_new_tokens": 1, "temperature": 0.0},
    )
    n = _meta(out).get("prompt_tokens")
    if n is None:
        raise RuntimeError("backend does not report prompt_tokens")
    return int(n)


def select_by_logprobs(
    backend, prompt: str, choices: List[str], method: str
) -> Dict[str, Any]:
    if method not in CHOICES_METHODS:
        raise ValueError(f"unknown choices method {method!r}; one of {CHOICES_METHODS}")
    n_prompt = _prompt_tokens(backend, prompt)
    cond: List[List[float]] = []
    for c in choices:
        lps, _total = _score(backend, prompt + c)
        span = [lp for lp in lps[n_prompt:] if lp is not None]
        if not span:  # boundary merge: the choice fused into the last token
            span = [lp for lp in lps if lp is not None][-1:]
        cond.append(span)

    if method == "token_length_normalized":
        scores = [sum(s) / max(len(s), 1) for s in cond]
    elif method == "greedy_token_selection":
        alive = list(range(len(choices)))
        t = 0
        max_t = max(len(s) for s in cond)
        while len(alive) > 1 and t < max_t:
            lps_t = {
                i: (cond[i][t] if t < len(cond[i]) else float("-inf"))
                for i in alive
            }
            best = max(lps_t.values())
            alive = [i for i in alive if lps_t[i] >= best - 1e-9]
            t += 1
        scores = [
            (sum(s) / max(len(s), 1)) if i in alive else float("-inf")
            for i, s in enumerate(cond)
        ]
    else:  # unconditional_likelihood_normalized
        scores = []
        for c, s in zip(choices, cond):
            u_lps, _ = _score(backend, c)
            u = [lp for lp in u_lps if lp is not None]
            u_mean = sum(u) / max(len(u), 1)
            scores.append(sum(s) / max(len(s), 1) - u_mean)

    best = max(range(len(choices)), key=lambda i: scores[i])
    return {
        "choice": choices[best],
        "index": best,
        "scores": scores,
        "token_logprobs": cond,
    }
