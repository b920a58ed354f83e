from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.config.server_args import ServerArgs
