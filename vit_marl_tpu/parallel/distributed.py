"""Multi-host (multi-process) scale-out over DCN.

The reference's distributed story stops at single-host pmap
(ref: gymnax_exchange/jaxrl/MARL/ippo_rnn_JAXMARL_pmap.py:786-788 — one
``lax.pmean`` over the local devices).  The TPU-native path to more than
one host is:

1. every process calls :func:`initialize_distributed` (a thin
   ``jax.distributed.initialize`` wrapper — on TPU pods the coordinator,
   process id and count come from the TPU metadata, so zero-arg works);
2. build the mesh with :func:`make_hybrid_mesh`, which places a leading
   ``dcn_data`` axis across *hosts* (slow network: keep only
   bandwidth-light collectives there — the once-per-update gradient
   all-reduce) and the remaining axes across each host's local devices
   (ICI: env-batch ``data`` sharding and optional ``model`` tensor
   parallelism);
3. pass the mesh to ``make_train(..., mesh=...)`` unchanged —
   ``shard_batch`` splits the env batch over every axis named ``*data``
   and GSPMD routes each collective over the matching link.

Degenerate (single-host) shapes are exercised by the CPU test suite; the
hybrid layout follows ``jax.experimental.mesh_utils.create_hybrid_device_mesh``,
the standard recipe for DCN+ICI topologies.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Join (or start) a multi-process JAX runtime.

    On TPU pods all arguments are auto-detected; on other platforms pass
    them explicitly.  Safe to call when already initialized (no-op) and in
    single-process runs (``num_processes=1`` or nothing to detect).

    MUST run before anything initializes the XLA backends (jax refuses to
    form the cluster afterwards) — so prior-init detection reads the
    distributed client state directly instead of ``jax.process_count()``,
    which would itself initialize the backends.
    """
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except (ValueError, RuntimeError) as e:
        # single-process run with nothing to auto-detect: stay local.
        # (RuntimeError also fires when backends are already initialized —
        # surface that loudly rather than silently degrading a pod run.)
        if num_processes not in (None, 1):
            raise
        import sys
        print(f"initialize_distributed: staying single-process ({e})",
              file=sys.stderr)


def make_hybrid_mesh(ici_shape: Optional[Tuple[int, ...]] = None,
                     ici_axes: Sequence[str] = ("data",),
                     dcn_axis: str = "dcn_data") -> Mesh:
    """Mesh with a leading per-host DCN axis and ICI axes within each host.

    ``ici_shape``/``ici_axes`` describe the per-host layout (default: all
    of one host's devices on a ``data`` axis).  The DCN axis length is
    ``jax.process_count()``; with one process this degenerates to a
    size-1 leading axis, so the same training code runs anywhere.
    """
    n_proc = jax.process_count()
    devices = jax.devices()
    per_host = len(devices) // n_proc
    if not ici_shape:
        ici_shape = (per_host,)
    n_ici = int(np.prod(ici_shape))
    if n_ici > per_host:
        raise ValueError(
            f"ici_shape={ici_shape} needs {n_ici} devices per host but "
            f"each of the {n_proc} hosts has {per_host}")
    # group rows strictly by owning process — device-id order is not
    # guaranteed process-contiguous on every topology, and a mixed row
    # would put "ICI" axes across hosts (per-step collectives over DCN)
    devices = sorted(devices, key=lambda d: (d.process_index, d.id))
    arr = np.asarray(devices).reshape(n_proc, per_host)[:, :n_ici]
    arr = arr.reshape((n_proc,) + tuple(ici_shape))
    return Mesh(arr, axis_names=(dcn_axis,) + tuple(ici_axes))
