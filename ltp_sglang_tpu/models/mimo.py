"""MiMo (Xiaomi) — MiMoForCausalLM.

Reference: python/sglang/srt/models/mimo.py. The serving model is the qwen2
body verbatim (MiMoModel subclasses Qwen2Model, reference :31-44); the
checkpoint additionally carries MTP draft layers (``model.mtp_layers.*``)
which the main model skips at load (reference :110-127 drops "mtp_layers"
names). The MTP head itself rides the NEXTN speculative path when
configured, like the reference's mimo_mtp.py.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ltp_sglang_tpu.models.qwen2 import Qwen2ForCausalLM


class MiMoForCausalLM(Qwen2ForCausalLM):
    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        weights = {
            k: v
            for k, v in weights.items()
            if "mtp_layers" not in k and "rotary_emb" not in k
        }
        return super().convert_hf_weights(weights)
