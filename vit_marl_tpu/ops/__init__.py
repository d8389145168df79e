"""Pallas TPU kernels and fused transforms for the hot paths."""

from vit_marl_tpu.ops.book_kernel import (  # noqa: F401
    pallas_process_step,
    finalize_trade_log_from_records,
)
