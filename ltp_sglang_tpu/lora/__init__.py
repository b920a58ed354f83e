from ltp_sglang_tpu.lora.lora_manager import LoRAManager
