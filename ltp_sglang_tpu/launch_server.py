"""`python -m ltp_sglang_tpu.launch_server --model-path ...`

Counterpart of python/sglang/launch_server.py.
"""

import logging
import sys

from ltp_sglang_tpu.config.server_args import prepare_server_args
from ltp_sglang_tpu.entrypoints.http_server import launch_server

if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    server_args = prepare_server_args(sys.argv[1:])
    launch_server(server_args)
