"""Gemma-3 VLM: SigLIP tower + avg-pool projector + bidirectional image
spans, HF greedy parity."""

import json
import os
import tempfile

import numpy as np

IMG_TOKEN = 500
S = 16  # image size -> 4x4 patches -> 4 mm tokens (2x2 pool)
N_IMG_TOK = 4

TEXT_CFG = {
    "model_type": "gemma3_text",
    "hidden_size": 128,
    "intermediate_size": 256,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "head_dim": 32,
    "vocab_size": 512,
    "max_position_embeddings": 512,
    "rms_norm_eps": 1e-5,
    "rope_theta": 1000000.0,
    "rope_local_base_freq": 10000.0,
    "query_pre_attn_scalar": 32,
    "sliding_window": 64,  # > image span (ring-layer bidir caveat-free)
    "layer_types": ["sliding_attention", "full_attention"],
    "tie_word_embeddings": True,
}

VISION_CFG = {
    "model_type": "siglip_vision_model",
    "hidden_size": 64,
    "num_hidden_layers": 2,
    "num_attention_heads": 2,
    "intermediate_size": 128,
    "image_size": S,
    "patch_size": 4,
    "layer_norm_eps": 1e-6,
    "hidden_act": "gelu_pytorch_tanh",
}


def _make_dir():
    import torch
    from transformers import Gemma3Config, Gemma3ForConditionalGeneration

    cfg = Gemma3Config(
        text_config=dict(TEXT_CFG),
        vision_config=dict(VISION_CFG),
        image_token_id=IMG_TOKEN,
        boi_token_index=498,
        eoi_token_index=499,
        mm_tokens_per_image=N_IMG_TOK,
    )
    torch.manual_seed(3)
    model = Gemma3ForConditionalGeneration(cfg).to(torch.float32).eval()
    d = tempfile.mkdtemp(prefix="tiny_gemma3vlm_")
    model.save_pretrained(d, safe_serialization=True)
    with open(os.path.join(d, "config.json")) as f:
        raw = json.load(f)
    raw["architectures"] = ["Gemma3ForConditionalGeneration"]
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(raw, f)
    with open(os.path.join(d, "preprocessor_config.json"), "w") as f:
        json.dump({
            "size": {"shortest_edge": S},
            "crop_size": {"height": S, "width": S},
            "image_mean": [0.5, 0.5, 0.5], "image_std": [0.5, 0.5, 0.5],
        }, f)
    return d, model


PROMPT = [2, 9, 8, 498, IMG_TOKEN, 499, 7, 6, 5]
SP = {"max_new_tokens": 10, "temperature": 0.0, "ignore_eos": True}


def test_gemma3_vlm_hf_parity():
    import torch

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d, hf = _make_dir()
    eng = Engine(ServerArgs(
        model_path=d, dtype="float32",
        max_total_tokens=2048, max_running_requests=8,
    ))
    assert eng.model_runner.model.mm_bidirectional
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(S, S, 3), dtype=np.uint8)
    px = eng.mm_processor.preprocessor(img)

    i = PROMPT.index(IMG_TOKEN)
    expanded = PROMPT[:i] + [IMG_TOKEN] * N_IMG_TOK + PROMPT[i + 1:]
    tt = [1 if t == IMG_TOKEN else 0 for t in expanded]
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values=torch.tensor(px[None]),
            token_type_ids=torch.tensor([tt]),
            attention_mask=torch.ones((1, len(expanded)), dtype=torch.long),
            max_new_tokens=SP["max_new_tokens"], do_sample=False,
        )[0].tolist()[len(expanded):]

    out = eng.generate(input_ids=PROMPT, sampling_params=dict(SP),
                       image_data=img)
    assert out["output_ids"] == ref, (out["output_ids"], ref)

    # Text-only on the VLM still serves and matches HF.
    t_prompt = [2, 4, 6, 8]
    with torch.no_grad():
        tref = hf.generate(
            input_ids=torch.tensor([t_prompt]),
            attention_mask=torch.ones((1, 4), dtype=torch.long),
            max_new_tokens=8, do_sample=False,
        )[0].tolist()[4:]
    tout = eng.generate(input_ids=t_prompt,
                        sampling_params=dict(SP, max_new_tokens=8))
    assert tout["output_ids"] == tref, (tout["output_ids"], tref)
