"""Embedding (encode), score, and rerank APIs.

Reference analogs: Engine.encode (entrypoints/engine.py:290), the score API
(serving_score.py), and rerank (serving_rerank.py). Parity is checked against
HF hidden states / next-token distributions on a tiny random llama.
"""

import tempfile

import numpy as np
import pytest

from tiny_configs import TINY_LLAMA_CFG, write_tiny_model_dir


@pytest.fixture(scope="module")
def tiny_model_dir():
    d = tempfile.mkdtemp(prefix="tiny_llama_emb_")
    write_tiny_model_dir(d)
    return d


@pytest.fixture(scope="module")
def engine(tiny_model_dir):
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    return Engine(
        ServerArgs(
            model_path=tiny_model_dir,
            dtype="float32",
            max_total_tokens=4096,
            max_running_requests=16,
        )
    )


@pytest.fixture(scope="module")
def hf_model(tiny_model_dir):
    import torch
    from transformers import AutoModelForCausalLM

    return AutoModelForCausalLM.from_pretrained(
        tiny_model_dir, dtype=torch.float32
    ).eval()


def hf_last_hidden(hf_model, ids):
    import torch

    with torch.no_grad():
        out = hf_model(torch.tensor([ids]), output_hidden_states=True)
    # hidden_states[-1] is post-final-norm for HF llama.
    return out.hidden_states[-1][0, -1].numpy(), out.logits[0, -1].numpy()


def test_encode_last_pooling_matches_hf(engine, hf_model):
    ids = [1, 5, 7, 9, 100, 200, 31]
    out = engine.encode(input_ids=ids)
    emb = np.asarray(out["embedding"], dtype=np.float32)
    ref, _ = hf_last_hidden(hf_model, ids)
    assert emb.shape == ref.shape
    np.testing.assert_allclose(emb, ref, rtol=2e-3, atol=2e-3)
    assert out["meta_info"]["prompt_tokens"] == len(ids)


def test_encode_batch_and_cache_reuse(engine):
    a = engine.encode(input_ids=[[2, 3, 4, 5], [2, 3, 4, 9, 11]])
    assert len(a) == 2
    # Repeat (radix-cache prefix hit) must return identical vectors.
    b = engine.encode(input_ids=[2, 3, 4, 5])
    np.testing.assert_allclose(
        np.asarray(a[0]["embedding"]), np.asarray(b["embedding"]), rtol=1e-5
    )


def test_score_label_probs_match_hf(engine, hf_model):
    ids = [1, 17, 42, 63]
    labels = [7, 99, 250]
    scores = engine.score(
        query_ids=ids, items_ids=[[]], label_token_ids=labels, apply_softmax=False
    )
    _, logits = hf_last_hidden(hf_model, ids)
    logprobs = logits - (np.log(np.exp(logits - logits.max()).sum()) + logits.max())
    ref = np.exp(logprobs[labels])
    np.testing.assert_allclose(np.asarray(scores[0]), ref, rtol=2e-3, atol=1e-5)
    # Softmax variant normalizes over the label set.
    sm = engine.score(
        query_ids=ids, items_ids=[[]], label_token_ids=labels, apply_softmax=True
    )
    assert abs(sum(sm[0]) - 1.0) < 1e-6


def test_rerank_orders_by_similarity(engine, tiny_model_dir):
    # Token-id variant exercised through encode directly (rerank uses text,
    # which needs a tokenizer; tiny dir has one written by write_tiny_model_dir).
    q = engine.encode(input_ids=[5, 6, 7, 8])
    d_same = engine.encode(input_ids=[5, 6, 7, 8])
    d_diff = engine.encode(input_ids=[300, 301, 302])

    def cos(a, b):
        a = np.asarray(a)
        b = np.asarray(b)
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))

    assert cos(q["embedding"], d_same["embedding"]) > cos(
        q["embedding"], d_diff["embedding"]
    )


def test_embedding_and_generation_interleave(engine):
    """Generation and embedding requests on one engine must not corrupt each
    other (homogeneous-batch guard in get_new_batch_prefill)."""
    gen = engine.generate(
        input_ids=[1, 2, 3], sampling_params={"max_new_tokens": 4, "temperature": 0.0}
    )
    emb = engine.encode(input_ids=[1, 2, 3])
    gen2 = engine.generate(
        input_ids=[1, 2, 3], sampling_params={"max_new_tokens": 4, "temperature": 0.0}
    )
    assert gen["output_ids"] == gen2["output_ids"]
    assert len(emb["embedding"]) > 0


def test_bert_encoder_embedding_parity():
    """BertModel (encoder-only, bidirectional) through the encode API vs HF
    last_hidden_state with cls/mean pooling."""
    import json
    import os

    import torch
    from transformers import BertConfig, BertModel as HFBert

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    cfg = BertConfig(
        vocab_size=512, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=128,
        max_position_embeddings=128, type_vocab_size=2,
    )
    torch.manual_seed(9)
    hf = HFBert(cfg).to(torch.float32).eval()
    d = tempfile.mkdtemp(prefix="tiny_bert_")
    hf.save_pretrained(d, safe_serialization=True)
    with open(os.path.join(d, "config.json")) as f:
        raw = json.load(f)
    raw["architectures"] = ["BertModel"]
    raw["pooling_type"] = "cls"
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(raw, f)

    eng = Engine(ServerArgs(
        model_path=d, dtype="float32",
        max_total_tokens=1024, max_running_requests=8,
        chunked_prefill_size=-1,
    ))
    ids = [[101, 7, 9, 11, 102], [101, 30, 40, 102]]
    out = eng.encode(input_ids=ids)
    with torch.no_grad():
        for row, o in zip(ids, out):
            hstate = hf(
                input_ids=torch.tensor([row]),
                attention_mask=torch.ones((1, len(row)), dtype=torch.long),
            ).last_hidden_state[0]
            np.testing.assert_allclose(
                np.asarray(o["embedding"]), hstate[0].numpy(),
                rtol=2e-4, atol=2e-4,
            )
