"""Decode-window sampling features: penalties, logprobs, and grammar masks
run IN the K-step window program instead of collapsing to K=1 per-token host
sync (VERDICT item 6; reference applies these per step on device,
sampling_batch_info.py:171-223)."""

import tempfile

import numpy as np
import pytest

from tiny_configs import write_tiny_model_dir


@pytest.fixture(scope="module")
def dummy_dir():
    d = tempfile.mkdtemp(prefix="dummy_llama_")
    write_tiny_model_dir(d, with_weights=False)
    return d


def make_engine(dummy_dir, **kw):
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    defaults = dict(
        model_path=dummy_dir,
        load_format="dummy",
        dtype="float32",
        max_total_tokens=2048,
        max_running_requests=16,
    )
    defaults.update(kw)
    return Engine(ServerArgs(**defaults))


@pytest.fixture(scope="module")
def eng_window(dummy_dir):
    return make_engine(dummy_dir, decode_window_size=8)


@pytest.fixture(scope="module")
def eng_single(dummy_dir):
    return make_engine(dummy_dir, decode_window_size=1)


def test_penalties_window_parity(eng_window, eng_single):
    """Greedy + frequency/presence/repetition penalties must be identical
    between K=8 windows (in-loop count updates) and K=1 single steps."""
    sp = {
        "max_new_tokens": 24,
        "temperature": 0.0,
        "frequency_penalty": 0.9,
        "presence_penalty": 0.4,
        "repetition_penalty": 1.3,
        "ignore_eos": True,
    }
    a = eng_window.generate(input_ids=[1, 2, 3, 4], sampling_params=sp)
    b = eng_single.generate(input_ids=[1, 2, 3, 4], sampling_params=sp)
    assert a["output_ids"] == b["output_ids"]
    # Penalties actually bite: without them the dummy model repeats.
    c = eng_window.generate(
        input_ids=[1, 2, 3, 4],
        sampling_params={"max_new_tokens": 24, "temperature": 0.0, "ignore_eos": True},
    )
    assert a["output_ids"] != c["output_ids"]


def test_penalties_window_pipeline_chain(dummy_dir):
    """Pipelined continuation windows chain penalty counts device-to-device;
    result must match the unpipelined engine."""
    eng_p = make_engine(dummy_dir, decode_window_size=4)
    eng_np = make_engine(dummy_dir, decode_window_size=4, disable_window_pipeline=True)
    sp = {
        "max_new_tokens": 32,
        "temperature": 0.0,
        "frequency_penalty": 0.7,
        "ignore_eos": True,
    }
    a = eng_p.generate(input_ids=[3, 1, 4, 1, 5], sampling_params=sp)
    b = eng_np.generate(input_ids=[3, 1, 4, 1, 5], sampling_params=sp)
    assert a["output_ids"] == b["output_ids"]


def test_logprobs_window_parity(eng_window, eng_single):
    sp = {"max_new_tokens": 12, "temperature": 0.0, "ignore_eos": True}
    a = eng_window.generate(
        input_ids=[5, 6, 7], sampling_params=sp, return_logprob=True, top_logprobs_num=3
    )
    b = eng_single.generate(
        input_ids=[5, 6, 7], sampling_params=sp, return_logprob=True, top_logprobs_num=3
    )
    assert a["output_ids"] == b["output_ids"]
    la = a["meta_info"]["output_token_logprobs"]
    lb = b["meta_info"]["output_token_logprobs"]
    assert len(la) == len(lb) == 12
    for (va, ta, _), (vb, tb, _) in zip(la, lb):
        assert ta == tb
        assert abs(va - vb) < 1e-3
    ta = a["meta_info"]["output_top_logprobs"]
    tb = b["meta_info"]["output_top_logprobs"]
    assert len(ta) == len(tb) == 12
    for (vals_a, ids_a), (vals_b, ids_b) in zip(ta, tb):
        assert ids_a == ids_b
        np.testing.assert_allclose(vals_a, vals_b, atol=1e-3)


def test_grammar_stable_mask_api():
    """stable_mask: a self-looping state set with one shared mask windows;
    a counting regex whose masks differ along the walk does not."""
    from ltp_sglang_tpu.constrained.regex_engine import compile_regex
    from ltp_sglang_tpu.constrained.token_fsm import TokenFSM, VocabTrie

    tokens = [None, "a", "b", "c", "ab", "ba"]
    trie = VocabTrie(tokens)

    dfa = compile_regex(r"[ab]*")
    fsm = TokenFSM(dfa, trie, vocab_size=len(tokens), eos_ids=[0])
    m = fsm.stable_mask(0)
    assert m is not None
    assert m[1] and m[2] and m[4] and m[5] and not m[3]

    dfa2 = compile_regex(r"[ab]{3}c")
    fsm2 = TokenFSM(dfa2, trie, vocab_size=len(tokens), eos_ids=[0])
    assert fsm2.stable_mask(0) is None  # masks change when the 'c' nears


def test_grammar_window_generation(dummy_dir):
    """Constrained generation stays correct whether or not the grammar
    permits windowing, across window sizes."""
    import re

    from tiny_configs import write_tiny_tokenizer

    write_tiny_tokenizer(dummy_dir)
    eng_w = make_engine(dummy_dir, decode_window_size=8)
    eng_s = make_engine(dummy_dir, decode_window_size=1)
    for pattern in (r"[ab]+", r"(?:ab|ba){2,6}", r"[abc]{4}-[abc]{4}"):
        outs = []
        for eng in (eng_w, eng_s):
            out = eng.generate(
                prompt="x",
                sampling_params={
                    "max_new_tokens": 24,
                    "temperature": 0.0,
                    "regex": pattern,
                },
            )
            assert re.fullmatch(pattern, out["text"]) is not None, (
                pattern, out["text"])
            outs.append(out["text"])
        assert outs[0] == outs[1]
    # The stable-state grammar ([ab]+ after its first token self-loops with a
    # constant mask) must actually have engaged the window path: a masked
    # window fn (feats has_mask=True) was compiled.
    cache = eng_w.model_runner._step_cache  # noqa: SLF001
    masked_windows = [
        k for k in cache
        if k[0] == "window" and isinstance(k[-2], tuple) and k[-2][1]
    ]
    assert masked_windows, list(cache)


def test_mixed_chunk_equivalence_and_mode():
    """--enable-mixed-chunk: running decodes ride prefill programs as
    1-token extends (ForwardMode.MIXED). Outputs must be bit-identical to
    the unmixed scheduler, and MIXED batches must actually be produced."""
    import tempfile

    from tiny_configs import write_tiny_model_dir

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine
    from ltp_sglang_tpu.model_executor.forward_batch import ForwardMode

    d = tempfile.mkdtemp(prefix="mixed_llama_")
    write_tiny_model_dir(d)

    def mk(mixed):
        return Engine(ServerArgs(
            model_path=d, dtype="float32",
            max_total_tokens=4096, max_running_requests=8,
            chunked_prefill_size=8, enable_mixed_chunk=mixed,
            disable_window_pipeline=True, decode_window_size=1,
        ))

    base, mixed = mk(False), mk(True)
    seen_modes = set()
    orig = mixed.scheduler.run_batch

    def spy(batch):
        seen_modes.add(batch.forward_mode)
        return orig(batch)

    mixed.scheduler.run_batch = spy

    rng = np.random.default_rng(0)
    prompts = [
        [int(x) for x in rng.integers(3, 500, size=n)]
        for n in (30, 21, 26, 17)
    ]
    sp = {"max_new_tokens": 12, "temperature": 0.0, "ignore_eos": True}

    # Stagger submissions so decodes are running when later prefills arrive.
    def run(eng):
        outs = []
        import threading
        results = [None] * len(prompts)

        def worker(i):
            results[i] = eng.generate(input_ids=prompts[i], sampling_params=dict(sp))

        threads = []
        for i in range(len(prompts)):
            t = threading.Thread(target=worker, args=(i,))
            t.start()
            threads.append(t)
        for t in threads:
            t.join(timeout=60)
        return results

    ref = run(base)
    got = run(mixed)
    for r, g in zip(ref, got):
        assert g["output_ids"] == r["output_ids"], (g["output_ids"], r["output_ids"])
    assert ForwardMode.MIXED in seen_modes, seen_modes
