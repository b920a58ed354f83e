"""CLI entrypoint: ``python -m ltp_sglang_tpu.router.launch_router``.

Counterpart of the reference's ``sglang_router.launch_router``
(sgl-router/py_src/sglang_router/launch_router.py); all flags live on
router.py's main().
"""

from ltp_sglang_tpu.router.router import main

if __name__ == "__main__":
    main()
