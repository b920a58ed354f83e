"""Qwen2-VL / Qwen2.5-VL: HF greedy parity with image injection + M-RoPE,
windowed ViT, and the mrope position builder units."""

import json
import os
import tempfile

import numpy as np
import pytest

IMG_TOKEN = 500
VSTART = 499  # vision_start_token_id (HF's get_rope_index anchors on it)
S = 32  # fixed image resolution -> 8x8 patch grid -> 16 llm tokens
N_IMG_TOK = 16

TEXT_CFG = {
    "hidden_size": 128,
    "intermediate_size": 256,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "head_dim": 32,
    "vocab_size": 512,
    "max_position_embeddings": 512,
    "rms_norm_eps": 1e-5,
    "rope_theta": 10000.0,
    "tie_word_embeddings": False,
    "rope_scaling": {"type": "mrope", "mrope_section": [8, 4, 4]},
}

VISION_CFG_25 = {
    "depth": 2,
    "hidden_size": 64,
    "intermediate_size": 128,
    "num_heads": 2,
    "in_channels": 3,
    "patch_size": 4,
    "spatial_merge_size": 2,
    "temporal_patch_size": 2,
    "window_size": 16,  # -> 2x2 llm cells per window
    "fullatt_block_indexes": [1],
    "out_hidden_size": 128,
}


def _make_dir(v25: bool):
    import torch

    if v25:
        from transformers import (
            Qwen2_5_VLConfig as Cfg,
            Qwen2_5_VLForConditionalGeneration as Model,
        )

        vision = dict(VISION_CFG_25)
    else:
        from transformers import (
            Qwen2VLConfig as Cfg,
            Qwen2VLForConditionalGeneration as Model,
        )

        vision = {
            "depth": 2, "embed_dim": 64, "hidden_size": 128, "num_heads": 2,
            "in_channels": 3, "patch_size": 4, "spatial_merge_size": 2,
            "temporal_patch_size": 2, "mlp_ratio": 2,
        }
    cfg = Cfg(
        text_config=dict(TEXT_CFG),
        vision_config=vision,
        image_token_id=IMG_TOKEN,
        video_token_id=501,
        vision_start_token_id=VSTART,
        vision_end_token_id=498,
    )
    torch.manual_seed(5)
    model = Model(cfg).to(torch.float32).eval()
    d = tempfile.mkdtemp(prefix=f"tiny_qwenvl{25 if v25 else 2}_")
    model.save_pretrained(d, safe_serialization=True)
    # Force our processor to the fixed square + identity normalization.
    with open(os.path.join(d, "config.json")) as f:
        raw = json.load(f)
    raw["ltp_image_size"] = S
    raw["architectures"] = [type(model).__name__]
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(raw, f)
    with open(os.path.join(d, "preprocessor_config.json"), "w") as f:
        json.dump({
            "size": {"shortest_edge": S},
            "crop_size": {"height": S, "width": S},
            "image_mean": [0.5, 0.5, 0.5], "image_std": [0.5, 0.5, 0.5],
        }, f)
    return d, model


def _engine(d, **kw):
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    return Engine(ServerArgs(
        model_path=d, dtype="float32",
        max_total_tokens=2048, max_running_requests=8, **kw,
    ))


def _image(seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, size=(S, S, 3), dtype=np.uint8)


def _hf_pixel_patches(px):
    """Replicate Qwen2VLImageProcessor's patch flattening on our normalized
    [3, S, S] pixels: duplicate to 2 frames, reshape to the merge-unit-major
    patch sequence [g*g, C*T*P*P]."""
    P, m = 4, 2
    g = S // P
    x = np.tile(px[None], (2, 1, 1, 1))  # [T, C, H, W]
    x = x.reshape(1, 2, 3, g // m, m, P, g // m, m, P)
    x = x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    return np.ascontiguousarray(x).reshape(g * g, 3 * 2 * P * P)


PROMPT = [1, 9, 8, VSTART, IMG_TOKEN, 7, 6, 5, 11, 12]
SP = {"max_new_tokens": 10, "temperature": 0.0, "ignore_eos": True}


def _hf_greedy(model, input_ids, px, max_new):
    import torch

    i = input_ids.index(IMG_TOKEN)
    expanded = input_ids[:i] + [IMG_TOKEN] * N_IMG_TOK + input_ids[i + 1:]
    with torch.no_grad():
        out = model.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values=torch.tensor(_hf_pixel_patches(px)),
            image_grid_thw=torch.tensor([[1, S // 4, S // 4]]),
            attention_mask=torch.ones((1, len(expanded)), dtype=torch.long),
            max_new_tokens=max_new, do_sample=False,
        )
    return out[0].tolist()[len(expanded):]


@pytest.mark.parametrize("v25", [True, False], ids=["qwen2_5_vl", "qwen2_vl"])
def test_qwen_vl_hf_parity(v25):
    d, hf = _make_dir(v25)
    eng = _engine(d)
    assert eng.model_runner.model.needs_mrope
    img = _image(0)
    px = eng.mm_processor.preprocessor(img)
    ref = _hf_greedy(hf, PROMPT, px, SP["max_new_tokens"])
    out = eng.generate(input_ids=PROMPT, sampling_params=dict(SP),
                       image_data=img)
    assert out["output_ids"] == ref, (out["output_ids"], ref)
    # Text-only requests on the mrope model also serve (delta = 0 path).
    t = eng.generate(input_ids=[1, 2, 3, 4], sampling_params=dict(SP))
    with_hf = hf.generate(
        __import__("torch").tensor([[1, 2, 3, 4]]),
        attention_mask=__import__("torch").ones((1, 4), dtype=int),
        max_new_tokens=10, do_sample=False,
    )[0].tolist()[4:]
    assert t["output_ids"] == with_hf, (t["output_ids"], with_hf)


def test_qwen_vl_chunked_prefill_and_radix():
    d, hf = _make_dir(True)
    eng = _engine(d, chunked_prefill_size=8)  # image span [4, 20) splits
    img = _image(3)
    px = eng.mm_processor.preprocessor(img)
    ref = _hf_greedy(hf, PROMPT, px, SP["max_new_tokens"])
    out = eng.generate(input_ids=PROMPT, sampling_params=dict(SP),
                       image_data=img)
    assert out["output_ids"] == ref, (out["output_ids"], ref)
    out2 = eng.generate(input_ids=PROMPT, sampling_params=dict(SP),
                        image_data=img)  # radix reuse across the image
    assert out2["output_ids"] == ref


def test_mrope_window_decode_parity():
    """K-step decode windows on an M-RoPE model are EXACT: decode mrope ids
    are pos + mrope_delta in all three rows, so the window paths run plain
    rope at the delta-shifted position (DecodeWindowBatch.rope_delta). The
    argmax of this tiny model is position-insensitive, so compare chosen-token
    LOGPROBS between K=8 windows and K=1 — with the delta dropped (pre-fix
    behavior) they drift by ~7e-3; with it they agree exactly."""
    d, _ = _make_dir(True)
    img = _image(0)

    def run(ws):
        eng = _engine(d, decode_window_size=ws)
        out = eng.generate(input_ids=PROMPT, sampling_params=dict(SP),
                           image_data=img, return_logprob=True)
        lps = np.array([x[0] for x in out["meta_info"]["output_token_logprobs"]])
        wkeys = [k for k in eng.model_runner._step_cache if k[0] == "window"]
        return out["output_ids"], lps, wkeys

    ids8, lp8, wkeys = run(8)
    ids1, lp1, _ = run(1)
    assert wkeys, "K=8 run never built a window fn (gate regressed?)"
    assert ids8 == ids1
    np.testing.assert_allclose(lp8, lp1, atol=1e-5)


def test_mrope_position_builder():
    from ltp_sglang_tpu.multimodal.mrope import build_mrope_positions

    class It:
        def __init__(self, offset, length, grid):
            self.offset, self.length, self.llm_grid = offset, length, grid

    # prompt: 3 text, image 1x2x2 (4 tokens), 2 text
    pos, delta = build_mrope_positions(9, [It(3, 4, (1, 2, 2))])
    # text 0..2
    np.testing.assert_array_equal(pos[:, :3], np.tile(np.arange(3), (3, 1)))
    # image at running pos 3: t = 3; h = 3 + [0,0,1,1]; w = 3 + [0,1,0,1]
    np.testing.assert_array_equal(pos[0, 3:7], [3, 3, 3, 3])
    np.testing.assert_array_equal(pos[1, 3:7], [3, 3, 4, 4])
    np.testing.assert_array_equal(pos[2, 3:7], [3, 4, 3, 4])
    # text resumes at 3 + max(1,2,2) = 5
    np.testing.assert_array_equal(pos[:, 7:], np.tile([5, 6], (3, 1)))
    # delta: last pos 6 -> next generated = 7 = 9 + delta
    assert delta == 7 - 9
