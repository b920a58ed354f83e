"""XVERSE — XverseForCausalLM.

Reference: python/sglang/srt/models/xverse.py. Verified against it: the
architecture is the llama body exactly — separate q/k/v/o projections with
llama names, SwiGLU mlp with gate/up/down, RMSNorm pre-norms, full-width
neox rope (reference :84-160 mirrors its llama.py line for line, GQA via
num_key_value_heads). Checkpoints use llama leaf names, so the base
converter applies unchanged.
"""

from __future__ import annotations

from ltp_sglang_tpu.models.llama import LlamaForCausalLM


class XverseForCausalLM(LlamaForCausalLM):
    pass
