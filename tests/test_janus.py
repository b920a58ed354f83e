"""Janus-Pro understanding path: HF greedy parity (fused-qkv vision tower +
aligner MLP over the llama body)."""

import json
import os
import tempfile

import numpy as np
import pytest

from tiny_configs import TINY_LLAMA_CFG

IMG_TOKEN = 500
VISION_CFG = {
    "hidden_size": 32,
    "num_hidden_layers": 2,
    "num_attention_heads": 2,
    "mlp_ratio": 2.0,
    "image_size": 16,
    "patch_size": 8,  # -> 4 image tokens
    "layer_norm_eps": 1e-6,
    "hidden_act": "gelu",
    "depth": 2,
    "projection_dim": 128,  # = text hidden
    "num_channels": 3,
    "num_image_tokens": 4,
}
N_IMG = 4


def _make_dir():
    import torch
    from transformers import JanusConfig, JanusForConditionalGeneration
    from transformers.models.janus.configuration_janus import (
        JanusVisionConfig,
        JanusVQVAEConfig,
    )

    text_cfg = {k: v for k, v in TINY_LLAMA_CFG.items() if k != "architectures"}
    vq = JanusVQVAEConfig(
        embed_dim=32, num_embeddings=16, base_channels=32,
        channel_multiplier=[1, 1], num_res_blocks=1, latent_channels=32,
        num_patches=4, projection_dim=32, image_token_embed_dim=32,
        num_hidden_layers=1,
    )
    cfg = JanusConfig(
        vision_config=JanusVisionConfig(**VISION_CFG).to_dict(),
        text_config=text_cfg,
        vq_config=vq.to_dict(),
        image_token_id=IMG_TOKEN,
    )
    torch.manual_seed(61)
    model = JanusForConditionalGeneration(cfg).to(torch.float32).eval()
    d = tempfile.mkdtemp(prefix="tiny_janus_")
    model.save_pretrained(d, safe_serialization=True)
    with open(os.path.join(d, "preprocessor_config.json"), "w") as f:
        json.dump({
            "size": {"shortest_edge": 16}, "crop_size": {"height": 16, "width": 16},
            "image_mean": [0.5, 0.5, 0.5], "image_std": [0.5, 0.5, 0.5],
        }, f)
    return d, model


@pytest.fixture(scope="module")
def janus_bits():
    return _make_dir()


PROMPT = [1, 9, 8, IMG_TOKEN, 7, 6, 5, 11, 12]
SP = {"max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True}


def test_janus_hf_parity(janus_bits):
    import torch

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d, hf = janus_bits
    rng = np.random.default_rng(9)
    img = rng.integers(0, 255, size=(16, 16, 3), dtype=np.uint8)
    mean = np.float32(0.5)
    px = ((img.astype(np.float32) / 255.0 - mean) / mean).transpose(2, 0, 1)
    i = PROMPT.index(IMG_TOKEN)
    expanded = PROMPT[:i] + [IMG_TOKEN] * N_IMG + PROMPT[i + 1:]
    with torch.no_grad():
        want = hf.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values=torch.tensor(px[None]),
            attention_mask=torch.ones((1, len(expanded)), dtype=torch.long),
            max_new_tokens=SP["max_new_tokens"], do_sample=False,
            generation_mode="text",
        )[0].tolist()[len(expanded):]
    eng = Engine(ServerArgs(
        model_path=d, dtype="float32",
        max_total_tokens=2048, max_running_requests=8,
    ))
    try:
        assert eng.model_runner.model.num_image_tokens == N_IMG
        got = eng.generate(input_ids=PROMPT, sampling_params=SP,
                           image_data=[img])["output_ids"]
    finally:
        eng.shutdown()
    assert got == want
