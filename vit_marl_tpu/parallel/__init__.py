"""Device-mesh scale-out (replaces the reference's pmap script)."""

from vit_marl_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    shard_params,
    replicate,
)
from vit_marl_tpu.parallel.distributed import (  # noqa: F401
    initialize_distributed,
    make_hybrid_mesh,
)
