"""Training CLI (replaces the reference's hydra entry point,
ref: gymnax_exchange/jaxrl/MARL/ippo_rnn_JAXMARL.py:840-1022).

Usage:
  python -m vit_marl_tpu.train --config configs/ippo_2player.yaml
  python -m vit_marl_tpu.train --config configs/ippo_vision_dual_ppo.yaml \
      --set NUM_ENVS=512 --set TOTAL_TIMESTEPS=1e6
"""

from __future__ import annotations

import argparse
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None, help="YAML run config")
    p.add_argument("--set", action="append", default=[],
                   metavar="KEY=VALUE", help="override a top-level config key")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--timing", action="store_true",
                   help="report steps/sec after training "
                        "(ref: ippo_rnn_JAXMARL.py Timing mode)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (env vars don't override the "
                        "preset axon platform; jax.config does)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import yaml

    from vit_marl_tpu.config import make_config
    from vit_marl_tpu.env import make_world_env
    from vit_marl_tpu.rl.ppo import make_train
    from vit_marl_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    raw = {}
    if args.config:
        with open(args.config) as f:
            raw = yaml.safe_load(f) or {}
    from vit_marl_tpu.utils.cli import apply_set_overrides
    apply_set_overrides(raw, args.set)

    ma_config, train_config = make_config(raw)
    if args.seed is not None:
        import dataclasses
        train_config = dataclasses.replace(train_config, seed=args.seed)

    print(f"devices: {jax.devices()}")
    print(f"world: {ma_config.world.stock} {ma_config.world.time_period} "
          f"ep_type={ma_config.world.ep_type} "
          f"msgs/step={ma_config.num_msgs_per_step}")
    print(f"train: envs={train_config.num_envs} steps={train_config.num_steps} "
          f"updates={train_config.num_updates} networks={train_config.network}")

    env = make_world_env(ma_config)
    if jax.default_backend() == "tpu":
        from vit_marl_tpu.ops.book_kernel import ENV_BLOCK
        if not env.pallas_ok:
            print("WARNING: fused Pallas book kernel DISABLED "
                  f"(cancel_mode={ma_config.world.cancel_mode}, "
                  f"n_orders={ma_config.world.n_orders} must be %8==0); "
                  "training falls back to the slow XLA engine.")
        elif train_config.num_envs % ENV_BLOCK != 0:
            print(f"WARNING: NUM_ENVS={train_config.num_envs} is not a "
                  f"multiple of {ENV_BLOCK}; the fused Pallas book kernel "
                  "is DISABLED and training falls back to the XLA engine.")
        else:
            print("pallas book kernel: ENABLED")

    mesh = None
    if train_config.mesh_shape:
        import numpy as np

        from vit_marl_tpu.parallel import make_mesh

        need = int(np.prod(train_config.mesh_shape))
        have = len(jax.devices())
        if have < need:
            raise SystemExit(
                f"MESH_SHAPE={train_config.mesh_shape} needs {need} devices "
                f"but only {have} are visible. For a virtual CPU mesh set "
                f"XLA_FLAGS=--xla_force_host_platform_device_count={need} "
                "and force the cpu backend.")
        mesh = make_mesh(tuple(train_config.mesh_shape),
                         train_config.mesh_axes)
        print(f"mesh: {dict(zip(train_config.mesh_axes, train_config.mesh_shape))} "
              f"over {need} {jax.devices()[0].platform} devices "
              "(GSPMD data-parallel training)")

    train = make_train(ma_config, train_config, env=env, mesh=mesh)
    t0 = time.time()
    out = train(jax.random.PRNGKey(train_config.seed))
    wall = time.time() - t0
    n_steps = (train_config.num_envs * train_config.num_steps
               * len(out["metrics"]))
    print(f"done: {len(out['metrics'])} updates, {n_steps} env-steps "
          f"in {wall:.1f}s")
    if args.timing:
        print(f"throughput: {n_steps / wall:.0f} env-steps/s (incl. compile)")
    return out


if __name__ == "__main__":
    main()
