from ltp_sglang_tpu.layers.quantization.int4 import (
    unpack_awq_to_internal,
    unpack_gptq_to_internal,
    dequantize_int4,
    quantized_matmul_ref,
)
