"""Architecture registry: HF config.architectures -> model class.

Counterpart of models/registry.py in the reference (which imports every module
in models/); we register explicitly to keep import time low.
"""

from __future__ import annotations

import importlib
import logging
from typing import Dict, Tuple

logger = logging.getLogger(__name__)

# architecture name -> (module, class)
_MODEL_REGISTRY: Dict[str, Tuple[str, str]] = {
    "LlamaForCausalLM": ("ltp_sglang_tpu.models.llama", "LlamaForCausalLM"),
    "LlamaModel": ("ltp_sglang_tpu.models.llama", "LlamaForCausalLM"),
    "Qwen2ForCausalLM": ("ltp_sglang_tpu.models.qwen2", "Qwen2ForCausalLM"),
    "Qwen3ForCausalLM": ("ltp_sglang_tpu.models.qwen3", "Qwen3ForCausalLM"),
    "Gemma2ForCausalLM": ("ltp_sglang_tpu.models.gemma2", "Gemma2ForCausalLM"),
    "Gemma3ForCausalLM": ("ltp_sglang_tpu.models.gemma3", "Gemma3ForCausalLM"),
    "Gemma3TextModel": ("ltp_sglang_tpu.models.gemma3", "Gemma3ForCausalLM"),
    "Gemma3ForConditionalGeneration": (
        "ltp_sglang_tpu.models.gemma3", "Gemma3ForConditionalGeneration"
    ),
    "MistralForCausalLM": ("ltp_sglang_tpu.models.mistral", "MistralForCausalLM"),
    "Qwen2MoeForCausalLM": ("ltp_sglang_tpu.models.qwen2_moe", "Qwen2MoeForCausalLM"),
    "Qwen3MoeForCausalLM": ("ltp_sglang_tpu.models.qwen3_moe", "Qwen3MoeForCausalLM"),
    "MixtralForCausalLM": ("ltp_sglang_tpu.models.mixtral", "MixtralForCausalLM"),
    "Llama4ForCausalLM": ("ltp_sglang_tpu.models.llama4", "Llama4ForCausalLM"),
    "Llama4ForConditionalGeneration": (
        "ltp_sglang_tpu.models.llama4", "Llama4ForConditionalGeneration"
    ),
    "GptOssForCausalLM": ("ltp_sglang_tpu.models.gpt_oss", "GptOssForCausalLM"),
    "DeepseekV2ForCausalLM": ("ltp_sglang_tpu.models.deepseek_v2", "DeepseekV2ForCausalLM"),
    "DeepseekV3ForCausalLM": ("ltp_sglang_tpu.models.deepseek_v2", "DeepseekV2ForCausalLM"),
    "Phi3ForCausalLM": ("ltp_sglang_tpu.models.phi3", "Phi3ForCausalLM"),
    "GemmaForCausalLM": ("ltp_sglang_tpu.models.gemma", "GemmaForCausalLM"),
    "Starcoder2ForCausalLM": (
        "ltp_sglang_tpu.models.starcoder2", "Starcoder2ForCausalLM"
    ),
    "LlavaForConditionalGeneration": (
        "ltp_sglang_tpu.models.llava", "LlavaForConditionalGeneration"
    ),
    "LlavaLlamaForCausalLM": (
        "ltp_sglang_tpu.models.llava", "LlavaForConditionalGeneration"
    ),
    "ArceeForCausalLM": ("ltp_sglang_tpu.models.arcee", "ArceeForCausalLM"),
    "MllamaForCausalLM": ("ltp_sglang_tpu.models.mllama", "MllamaForCausalLM"),
    "ExaoneForCausalLM": ("ltp_sglang_tpu.models.exaone", "ExaoneForCausalLM"),
    "HunYuanMoEV1ForCausalLM": (
        "ltp_sglang_tpu.models.hunyuan", "HunYuanMoEV1ForCausalLM"
    ),
    "JanusForConditionalGeneration": (
        "ltp_sglang_tpu.models.janus", "JanusForConditionalGeneration"
    ),
    "MultiModalityCausalLM": (
        "ltp_sglang_tpu.models.janus", "JanusForConditionalGeneration"
    ),
    "Idefics2ForConditionalGeneration": (
        "ltp_sglang_tpu.models.idefics2", "Idefics2ForConditionalGeneration"
    ),
    "LlavaNextVideoForConditionalGeneration": (
        "ltp_sglang_tpu.models.llavavid", "LlavaNextVideoForConditionalGeneration"
    ),
    "LlavaVidForCausalLM": (
        "ltp_sglang_tpu.models.llavavid", "LlavaNextVideoForConditionalGeneration"
    ),
    "Qwen2_5_VLForConditionalGeneration": (
        "ltp_sglang_tpu.models.qwen2_5_vl", "Qwen2_5_VLForConditionalGeneration"
    ),
    "Qwen2VLForConditionalGeneration": (
        "ltp_sglang_tpu.models.qwen2_5_vl", "Qwen2VLForConditionalGeneration"
    ),
    "Qwen2AudioForConditionalGeneration": (
        "ltp_sglang_tpu.models.qwen2_audio", "Qwen2AudioForConditionalGeneration"
    ),
    "InternVLForConditionalGeneration": (
        "ltp_sglang_tpu.models.internvl", "InternVLForConditionalGeneration"
    ),
    "OlmoForCausalLM": ("ltp_sglang_tpu.models.olmo", "OlmoForCausalLM"),
    "Olmo2ForCausalLM": ("ltp_sglang_tpu.models.olmo", "Olmo2ForCausalLM"),
    "GraniteForCausalLM": ("ltp_sglang_tpu.models.granite", "GraniteForCausalLM"),
    "CohereForCausalLM": ("ltp_sglang_tpu.models.cohere", "CohereForCausalLM"),
    "Cohere2ForCausalLM": ("ltp_sglang_tpu.models.cohere", "Cohere2ForCausalLM"),
    "GlmForCausalLM": ("ltp_sglang_tpu.models.glm4", "GlmForCausalLM"),
    "Glm4MoeForCausalLM": ("ltp_sglang_tpu.models.glm4_moe", "Glm4MoeForCausalLM"),
    "Ernie4_5_MoeForCausalLM": (
        "ltp_sglang_tpu.models.glm4_moe", "Ernie4_5_MoeForCausalLM"
    ),
    "Glm4ForCausalLM": ("ltp_sglang_tpu.models.glm4", "Glm4ForCausalLM"),
    "SmolLM3ForCausalLM": ("ltp_sglang_tpu.models.smollm3", "SmolLM3ForCausalLM"),
    "NemotronForCausalLM": (
        "ltp_sglang_tpu.models.nemotron", "NemotronForCausalLM"
    ),
    "StableLmForCausalLM": (
        "ltp_sglang_tpu.models.stablelm", "StableLmForCausalLM"
    ),
    "GPT2LMHeadModel": ("ltp_sglang_tpu.models.gpt_classics", "GPT2LMHeadModel"),
    "GPTJForCausalLM": ("ltp_sglang_tpu.models.gpt_classics", "GPTJForCausalLM"),
    "GPTNeoXForCausalLM": (
        "ltp_sglang_tpu.models.gpt_classics", "GPTNeoXForCausalLM"
    ),
    "OPTForCausalLM": ("ltp_sglang_tpu.models.gpt_classics", "OPTForCausalLM"),
    "PhiForCausalLM": ("ltp_sglang_tpu.models.gpt_classics", "PhiForCausalLM"),
    "BloomForCausalLM": (
        "ltp_sglang_tpu.models.gpt_classics", "BloomForCausalLM"
    ),
    "FalconForCausalLM": (
        "ltp_sglang_tpu.models.gpt_classics", "FalconForCausalLM"
    ),
    "RWForCausalLM": (
        "ltp_sglang_tpu.models.gpt_classics", "FalconForCausalLM"
    ),
    "GPTBigCodeForCausalLM": (
        "ltp_sglang_tpu.models.gpt_classics", "GPTBigCodeForCausalLM"
    ),
    "MptForCausalLM": ("ltp_sglang_tpu.models.gpt_classics", "MptForCausalLM"),
    "PersimmonForCausalLM": (
        "ltp_sglang_tpu.models.gpt_classics", "PersimmonForCausalLM"
    ),
    "ApertusForCausalLM": ("ltp_sglang_tpu.models.apertus", "ApertusForCausalLM"),
    "HunYuanDenseV1ForCausalLM": (
        "ltp_sglang_tpu.models.hunyuan", "HunYuanDenseV1ForCausalLM"
    ),
    # Helium (kyutai): verified identical to the llama body (GQA, optional
    # qkv bias via attention_bias, unbiased o_proj, silu gated MLP).
    "HeliumForCausalLM": ("ltp_sglang_tpu.models.llama", "LlamaForCausalLM"),
    "MPTForCausalLM": ("ltp_sglang_tpu.models.gpt_classics", "MptForCausalLM"),
    "OlmoeForCausalLM": ("ltp_sglang_tpu.models.olmoe", "OlmoeForCausalLM"),
    "Olmo3ForCausalLM": ("ltp_sglang_tpu.models.olmo3", "Olmo3ForCausalLM"),
    "Exaone4ForCausalLM": ("ltp_sglang_tpu.models.exaone4", "Exaone4ForCausalLM"),
    "SeedOssForCausalLM": ("ltp_sglang_tpu.models.seed_oss", "SeedOssForCausalLM"),
    "Ernie4_5ForCausalLM": ("ltp_sglang_tpu.models.seed_oss", "Ernie4_5ForCausalLM"),
    "GraniteMoeForCausalLM": (
        "ltp_sglang_tpu.models.granitemoe", "GraniteMoeForCausalLM"
    ),
    "GraniteMoeSharedForCausalLM": (
        "ltp_sglang_tpu.models.granitemoe", "GraniteMoeSharedForCausalLM"
    ),
    "DbrxForCausalLM": ("ltp_sglang_tpu.models.dbrx", "DbrxForCausalLM"),
    "PhimoeForCausalLM": ("ltp_sglang_tpu.models.phimoe", "PhiMoEForCausalLM"),
    "PhiMoEForCausalLM": ("ltp_sglang_tpu.models.phimoe", "PhiMoEForCausalLM"),
    "BertModel": ("ltp_sglang_tpu.models.bert", "BertModel"),
    "BertForMaskedLM": ("ltp_sglang_tpu.models.bert", "BertModel"),
    "XLMRobertaModel": ("ltp_sglang_tpu.models.bert", "BertModel"),
    "RobertaModel": ("ltp_sglang_tpu.models.bert", "BertModel"),
    "XLMRobertaForSequenceClassification": (
        "ltp_sglang_tpu.models.bert", "XLMRobertaForSequenceClassification"
    ),
    "LlamaForSequenceClassification": (
        "ltp_sglang_tpu.models.classification", "LlamaForSequenceClassification"
    ),
    "Qwen2ForSequenceClassification": (
        "ltp_sglang_tpu.models.classification", "Qwen2ForSequenceClassification"
    ),
    "Qwen2ForRewardModel": (
        "ltp_sglang_tpu.models.classification", "Qwen2ForRewardModel"
    ),
    "InternLM2ForCausalLM": (
        "ltp_sglang_tpu.models.internlm2", "InternLM2ForCausalLM"
    ),
    "InternLM2ForRewardModel": (
        "ltp_sglang_tpu.models.classification", "InternLM2ForRewardModel"
    ),
    "Gemma2ForSequenceClassification": (
        "ltp_sglang_tpu.models.classification", "Gemma2ForSequenceClassification"
    ),
    "BaichuanForCausalLM": ("ltp_sglang_tpu.models.baichuan", "BaichuanForCausalLM"),
    "BaiChuanForCausalLM": ("ltp_sglang_tpu.models.baichuan", "BaichuanForCausalLM"),
    "QWenLMHeadModel": ("ltp_sglang_tpu.models.qwen", "QWenLMHeadModel"),
    "ChatGLMModel": ("ltp_sglang_tpu.models.chatglm", "ChatGLMForCausalLM"),
    "ChatGLMForCausalLM": ("ltp_sglang_tpu.models.chatglm", "ChatGLMForCausalLM"),
    "ChatGLMForConditionalGeneration": (
        "ltp_sglang_tpu.models.chatglm", "ChatGLMForCausalLM"
    ),
    "XverseForCausalLM": ("ltp_sglang_tpu.models.xverse", "XverseForCausalLM"),
    "XverseMoeForCausalLM": (
        "ltp_sglang_tpu.models.xverse", "XverseMoeForCausalLM"
    ),
    "MiMoForCausalLM": ("ltp_sglang_tpu.models.mimo", "MiMoForCausalLM"),
    "Grok1ForCausalLM": ("ltp_sglang_tpu.models.grok", "Grok1ForCausalLM"),
    "Grok1ModelForCausalLM": ("ltp_sglang_tpu.models.grok", "Grok1ForCausalLM"),
    "MiniCPMForCausalLM": ("ltp_sglang_tpu.models.minicpm", "MiniCPMForCausalLM"),
    "MiniCPM3ForCausalLM": (
        "ltp_sglang_tpu.models.minicpm3", "MiniCPM3ForCausalLM"
    ),
}


def resolve_model_cls(architectures, hf_config=None):
    for arch in architectures:
        if arch in _MODEL_REGISTRY:
            module_name, cls_name = _MODEL_REGISTRY[arch]
            # Pixtral ships under the generic LlavaForConditionalGeneration
            # arch; the tower type lives in vision_config (reference
            # model_config.py resolves the same way).
            if (
                cls_name == "LlavaForConditionalGeneration"
                and isinstance(hf_config, dict)
                and hf_config.get("vision_config", {}).get("model_type")
                == "pixtral"
            ):
                module_name = "ltp_sglang_tpu.models.pixtral"
                cls_name = "PixtralLlavaForConditionalGeneration"
            module = importlib.import_module(module_name)
            return getattr(module, cls_name)
    raise ValueError(
        f"No registered model class for architectures {architectures}. "
        f"Known: {sorted(_MODEL_REGISTRY)}"
    )


def register_model(arch: str, module: str, cls: str):
    _MODEL_REGISTRY[arch] = (module, cls)
