"""vit_marl_tpu: a TPU-native multi-agent RL framework for high-frequency trading.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the ViT-MARL stack
(jaxob matching engine, LOBSTER replay environments, market-making/execution
agents, IPPO-RNN training, vision order-book observations), designed TPU-first:

- The limit-order-book matching engine is a *branch-free, fully vectorized*
  kernel: message dispatch, matching, cancellation and trade logging are dense
  masked array ops (priority-comparison matrix + masked prefix sums), not
  data-dependent ``while_loop``s.  Under ``vmap`` over thousands of
  environments every lane does identical dense work, which is exactly what the
  TPU's VPU/MXU want.
- Scale-out is ``jax.sharding.Mesh`` + ``shard_map``/``pjit`` with XLA
  collectives over ICI, not ``pmap``.
- The book->image rasterizer and the ViT encoder run on-device with bf16
  matmuls and fp32 accumulation.

Layer map (mirrors SURVEY.md section 1):

- :mod:`vit_marl_tpu.lob`      -- L0 matching engine
- :mod:`vit_marl_tpu.data`     -- L1 LOBSTER ingestion + synthetic data
- :mod:`vit_marl_tpu.env`      -- L2 world + agent environments
- :mod:`vit_marl_tpu.models`   -- L3 networks (GRU actor-critic, ViT)
- :mod:`vit_marl_tpu.rl`       -- L4 IPPO training
- :mod:`vit_marl_tpu.eval`     -- L5 baselines + evaluation matrix
- :mod:`vit_marl_tpu.utils`    -- L6 pytree / integer utilities
- :mod:`vit_marl_tpu.config`   -- L7 configuration system
- :mod:`vit_marl_tpu.parallel` -- device mesh / sharding
- :mod:`vit_marl_tpu.ops`      -- Pallas kernels and fused transforms
"""

__version__ = "0.1.0"
