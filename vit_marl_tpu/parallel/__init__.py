"""Device-mesh scale-out (replaces the reference's pmap script)."""

from vit_marl_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    shard_params,
    replicate,
)
