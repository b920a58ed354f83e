"""Pixtral tower serving (LlavaForConditionalGeneration + pixtral
vision_config): HF greedy parity including the [IMG_BREAK]/[IMG_END] row
layout, and registry dispatch on the tower type."""

import json
import os
import tempfile

import numpy as np
import pytest

from tiny_configs import TINY_LLAMA_CFG

IMG_TOKEN = 500
BRK_TOKEN = 501
END_TOKEN = 502
VISION_CFG = {
    "model_type": "pixtral",
    "hidden_size": 32,
    "num_hidden_layers": 2,
    "num_attention_heads": 2,
    "head_dim": 16,
    "intermediate_size": 64,
    "image_size": 16,
    "patch_size": 8,  # -> 2x2 patch grid, 6 tokens with break/end
    "rope_theta": 10000.0,
}
SIDE = 2
N_IMG_TOKENS = SIDE * (SIDE + 1)


def _make_dir():
    import torch
    from transformers import LlavaConfig, LlavaForConditionalGeneration

    text_cfg = {k: v for k, v in TINY_LLAMA_CFG.items() if k != "architectures"}
    cfg = LlavaConfig(
        vision_config=dict(VISION_CFG),
        text_config=text_cfg,
        image_token_index=IMG_TOKEN,
        vision_feature_layer=-1,
        vision_feature_select_strategy="full",
        projector_hidden_act="gelu",
    )
    torch.manual_seed(41)
    model = LlavaForConditionalGeneration(cfg).to(torch.float32).eval()
    d = tempfile.mkdtemp(prefix="tiny_pixtral_")
    model.save_pretrained(d, safe_serialization=True)
    with open(os.path.join(d, "config.json")) as f:
        raw = json.load(f)
    raw["image_break_token_id"] = BRK_TOKEN
    raw["image_end_token_id"] = END_TOKEN
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(raw, f)
    with open(os.path.join(d, "preprocessor_config.json"), "w") as f:
        json.dump({
            "size": {"shortest_edge": 16}, "crop_size": {"height": 16, "width": 16},
            "image_mean": [0.5, 0.5, 0.5], "image_std": [0.5, 0.5, 0.5],
        }, f)
    return d, model


@pytest.fixture(scope="module")
def pix_bits():
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
    # Reference prompt layout: per patch row [IMG]*cols + [IMG_BREAK],
    # [IMG_END] replacing the final break.
    img_block = ([IMG_TOKEN] * SIDE + [BRK_TOKEN]) * SIDE
    img_block[-1] = END_TOKEN
    expanded = input_ids[:i] + img_block + input_ids[i + 1:]
    with torch.no_grad():
        out = model.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values=torch.tensor(px[None]),
            attention_mask=torch.ones((1, len(expanded)), dtype=torch.long),
            max_new_tokens=max_new, do_sample=False,
        )
    return out[0].tolist()[len(expanded):]


def test_registry_dispatches_pixtral(pix_bits):
    from ltp_sglang_tpu.models.registry import resolve_model_cls

    d, _ = pix_bits
    with open(os.path.join(d, "config.json")) as f:
        raw = json.load(f)
    cls = resolve_model_cls(["LlavaForConditionalGeneration"], raw)
    assert cls.__name__ == "PixtralLlavaForConditionalGeneration"


def test_pixtral_hf_parity(pix_bits):
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d, hf = pix_bits
    img = _image(5)
    want = _hf_greedy(hf, PROMPT, img, SP["max_new_tokens"])
    eng = Engine(ServerArgs(
        model_path=d, dtype="float32",
        max_total_tokens=2048, max_running_requests=8,
    ))
    try:
        assert eng.model_runner.model.num_image_tokens == N_IMG_TOKENS
        got = eng.generate(input_ids=PROMPT, sampling_params=SP,
                           image_data=[img])["output_ids"]
    finally:
        eng.shutdown()
    assert got == want
