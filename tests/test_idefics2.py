"""Idefics2 serving (SigLIP tower + perceiver resampler over mistral):
HF greedy parity through the generic multimodal pipeline."""

import json
import os
import tempfile

import numpy as np
import pytest

from tiny_configs import TINY_MISTRAL_CFG

IMG_TOKEN = 500
N_LATENTS = 4
VISION_CFG = {
    "hidden_size": 32,
    "num_hidden_layers": 2,
    "num_attention_heads": 2,
    "intermediate_size": 64,
    "image_size": 16,
    "patch_size": 8,  # -> 4 patches of context
    "num_channels": 3,
    "hidden_act": "gelu_pytorch_tanh",
    "layer_norm_eps": 1e-6,
}
PERCEIVER_CFG = {
    "hidden_act": "silu",
    "hidden_size": 64,  # = text hidden
    "rms_norm_eps": 1e-6,
    "resampler_n_latents": N_LATENTS,
    "resampler_depth": 2,
    "resampler_n_heads": 2,
    "num_key_value_heads": 1,
    "resampler_head_dim": 16,
}


def _make_dir():
    import torch
    from transformers import Idefics2Config, Idefics2ForConditionalGeneration

    text_cfg = {k: v for k, v in TINY_MISTRAL_CFG.items() if k != "architectures"}
    cfg = Idefics2Config(
        vision_config=dict(VISION_CFG),
        perceiver_config=dict(PERCEIVER_CFG),
        text_config=text_cfg,
        image_token_id=IMG_TOKEN,
        tie_word_embeddings=False,
    )
    torch.manual_seed(51)
    model = Idefics2ForConditionalGeneration(cfg).to(torch.float32).eval()
    d = tempfile.mkdtemp(prefix="tiny_idefics2_")
    model.save_pretrained(d, safe_serialization=True)
    with open(os.path.join(d, "preprocessor_config.json"), "w") as f:
        json.dump({
            "size": {"shortest_edge": 16}, "crop_size": {"height": 16, "width": 16},
            "image_mean": [0.5, 0.5, 0.5], "image_std": [0.5, 0.5, 0.5],
        }, f)
    return d, model


@pytest.fixture(scope="module")
def ide_bits():
    return _make_dir()


def _image(seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, size=(16, 16, 3), dtype=np.uint8)


PROMPT = [1, 9, 8, IMG_TOKEN, 7, 6, 5, 11, 12]
SP = {"max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True}


def _hf_greedy(model, input_ids, img_u8, max_new):
    import torch

    mean = np.float32(0.5)
    px = (img_u8.astype(np.float32) / 255.0 - mean) / mean
    px = px.transpose(2, 0, 1)
    i = input_ids.index(IMG_TOKEN)
    expanded = input_ids[:i] + [IMG_TOKEN] * N_LATENTS + input_ids[i + 1:]
    with torch.no_grad():
        out = model.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values=torch.tensor(px[None, None]),  # [B, n_img, 3, H, W]
            attention_mask=torch.ones((1, len(expanded)), dtype=torch.long),
            max_new_tokens=max_new, do_sample=False,
        )
    return out[0].tolist()[len(expanded):]


def test_idefics2_hf_parity(ide_bits):
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d, hf = ide_bits
    img = _image(7)
    want = _hf_greedy(hf, PROMPT, img, SP["max_new_tokens"])
    eng = Engine(ServerArgs(
        model_path=d, dtype="float32",
        max_total_tokens=2048, max_running_requests=8,
    ))
    try:
        m = eng.model_runner.model
        assert m.num_image_tokens == N_LATENTS
        got = eng.generate(input_ids=PROMPT, sampling_params=SP,
                           image_data=[img])["output_ids"]
    finally:
        eng.shutdown()
    assert got == want
