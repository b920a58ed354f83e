"""Multimodal (LLaVA) serving: HF greedy parity with image injection,
hash-keyed radix reuse across different images, and processor units."""

import json
import os
import tempfile

import numpy as np
import pytest

from tiny_configs import TINY_LLAMA_CFG

IMG_TOKEN = 500  # image_token_index inside the tiny vocab
VISION_CFG = {
    "hidden_size": 32,
    "num_hidden_layers": 2,
    "num_attention_heads": 2,
    "intermediate_size": 64,
    "image_size": 16,
    "patch_size": 8,  # -> 4 patches, 4 image tokens
    "layer_norm_eps": 1e-5,
    "hidden_act": "quick_gelu",
    "projection_dim": 32,
    "num_channels": 3,
    "model_type": "clip_vision_model",
}


def _make_llava_dir():
    import torch
    from transformers import LlavaConfig, LlavaForConditionalGeneration

    text_cfg = {k: v for k, v in TINY_LLAMA_CFG.items() if k != "architectures"}
    cfg = LlavaConfig(
        vision_config=dict(VISION_CFG),
        text_config=text_cfg,
        image_token_index=IMG_TOKEN,
        vision_feature_layer=-2,
        vision_feature_select_strategy="default",
        projector_hidden_act="gelu",
    )
    torch.manual_seed(11)
    model = LlavaForConditionalGeneration(cfg).to(torch.float32).eval()
    d = tempfile.mkdtemp(prefix="tiny_llava_")
    model.save_pretrained(d, safe_serialization=True)
    # Preprocessor config for our ClipImagePreprocessor.
    with open(os.path.join(d, "preprocessor_config.json"), "w") as f:
        json.dump({
            "size": {"shortest_edge": 16}, "crop_size": {"height": 16, "width": 16},
            "image_mean": [0.5, 0.5, 0.5], "image_std": [0.5, 0.5, 0.5],
        }, f)
    return d, model


@pytest.fixture(scope="module")
def llava_bits():
    return _make_llava_dir()


def _image(seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, size=(16, 16, 3), dtype=np.uint8)


def _engine(d, **kw):
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    return Engine(ServerArgs(
        model_path=d, dtype="float32",
        max_total_tokens=2048, max_running_requests=8, **kw,
    ))


PROMPT = [1, 9, 8, IMG_TOKEN, 7, 6, 5, 11, 12]
SP = {"max_new_tokens": 10, "temperature": 0.0, "ignore_eos": True}


def _hf_greedy(model, input_ids, pixel_values, max_new):
    import torch

    n_img = 4
    i = input_ids.index(IMG_TOKEN)
    expanded = input_ids[:i] + [IMG_TOKEN] * n_img + input_ids[i + 1:]
    with torch.no_grad():
        out = model.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values=torch.tensor(pixel_values[None]),
            attention_mask=torch.ones((1, len(expanded)), dtype=torch.long),
            max_new_tokens=max_new, do_sample=False,
        )
    return out[0].tolist()[len(expanded):]


def test_llava_hf_parity(llava_bits):
    d, hf = llava_bits
    eng = _engine(d)
    img = _image(0)
    # Feed HF OUR preprocessed pixels so the comparison isolates the model
    # (resize is a no-op at 16x16; normalization identical by construction).
    px = eng.mm_processor.preprocessor(img)
    ref = _hf_greedy(hf, PROMPT, px, SP["max_new_tokens"])
    out = eng.generate(input_ids=PROMPT, sampling_params=dict(SP),
                       image_data=img)
    assert out["output_ids"] == ref, (out["output_ids"], ref)


def test_llava_radix_distinguishes_images(llava_bits):
    d, hf = llava_bits
    eng = _engine(d)
    img_a, img_b = _image(1), _image(2)
    out_a1 = eng.generate(input_ids=PROMPT, sampling_params=dict(SP),
                          image_data=img_a)
    out_b = eng.generate(input_ids=PROMPT, sampling_params=dict(SP),
                         image_data=img_b)
    out_a2 = eng.generate(input_ids=PROMPT, sampling_params=dict(SP),
                          image_data=img_a)  # radix hit on image-a prefix
    # Same image twice -> identical outputs (and a radix prefix hit);
    # different image -> (with random weights) different continuation.
    assert out_a1["output_ids"] == out_a2["output_ids"]
    px_b = eng.mm_processor.preprocessor(img_b)
    ref_b = _hf_greedy(hf, PROMPT, px_b, SP["max_new_tokens"])
    assert out_b["output_ids"] == ref_b

    # The prefix tree distinguishes the images: pad values differ.
    ids_a, items_a = eng.mm_processor.process(list(PROMPT), [img_a])
    ids_b, items_b = eng.mm_processor.process(list(PROMPT), [img_b])
    assert items_a[0].pad_value != items_b[0].pad_value
    assert ids_a != ids_b


def test_llava_chunked_prefill_splits_image(llava_bits):
    """A chunk boundary inside the image span must still inject the right
    embedding rows (chunked prefill slices mm items)."""
    d, hf = llava_bits
    eng = _engine(d, chunked_prefill_size=4)  # image span [3, 7) splits at 4
    img = _image(3)
    px = eng.mm_processor.preprocessor(img)
    ref = _hf_greedy(hf, PROMPT, px, SP["max_new_tokens"])
    out = eng.generate(input_ids=PROMPT, sampling_params=dict(SP),
                       image_data=img)
    assert out["output_ids"] == ref, (out["output_ids"], ref)


def test_processor_units(llava_bits):
    import base64
    import io

    from PIL import Image

    from ltp_sglang_tpu.multimodal.processor import (
        MultimodalProcessor, hash_feature, load_image,
    )

    d, _ = llava_bits
    eng = _engine(d)
    proc = eng.mm_processor
    img = _image(4)

    # load_image accepts arrays, PIL, bytes, base64, data URIs.
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    raw = buf.getvalue()
    b64 = base64.b64encode(raw).decode()
    for form in (img, Image.fromarray(img), raw, b64, f"data:image/png;base64,{b64}"):
        assert np.array_equal(load_image(form), img)

    ids, items = proc.process(list(PROMPT), [img])
    assert len(items) == 1
    it = items[0]
    assert it.length == 4 and it.offset == 3
    assert ids[3:7] == [it.pad_value] * 4
    assert it.pad_value >= TINY_LLAMA_CFG["vocab_size"]
    assert hash_feature(it.feature) == hash_feature(it.feature)
    with pytest.raises(ValueError):
        proc.process(list(PROMPT), [img, img])  # count mismatch
