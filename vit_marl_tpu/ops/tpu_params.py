"""Shared Mosaic compiler parameters for the row-tiled ViT kernels.

Why this exists: Mosaic guards kernel-internal ("scoped") VMEM behind a
16 MB default limit (``xla_tpu_scoped_vmem_limit_kib``).  The fused
MLP/attention/block kernels keep a row-tile's full hidden activation and
the f32 attention intermediates in VMEM by design — at their measured-
fastest block sizes (ROW_BLOCK=2048, EB=64) that is 23-32 MB of scratch,
well inside v5e's 128 MB of physical VMEM but over the default guard.
Observed on hardware (runs/r4/selfcheck.txt, bench_vit_fused.txt):
``Scoped allocation with size 31.36M and limit 16.00M exceeded``.

``row_grid_params`` raises the guard and declares the 1-D row grid
parallel (every block is independent — lets Mosaic overlap the HBM
copies of neighbouring grid steps without cross-step ordering).

CPU interpret mode (the test path) accepts and ignores these params.
"""

from __future__ import annotations

from jax.experimental.pallas import tpu as pltpu

# Scratch headroom for the fused kernels; << v5e's 128 MB physical VMEM
# so the pipeline's double-buffered block copies still fit comfortably.
VMEM_LIMIT_BYTES = 96 * 1024 * 1024


def row_grid_params(ndims: int = 1) -> pltpu.CompilerParams:
    """CompilerParams for an embarrassingly-parallel row-block grid."""
    return pltpu.CompilerParams(
        dimension_semantics=("parallel",) * ndims,
        vmem_limit_bytes=VMEM_LIMIT_BYTES,
    )
