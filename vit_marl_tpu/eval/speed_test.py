"""Throughput grid harness (rebuild of ref: gymnax_exchange/jaxen/
Speed_test.py:41-276).

Sweeps agents-per-type x data-messages-per-step over vmapped rollouts,
reporting env-steps/sec per configuration, and writes a CSV.
"""

from __future__ import annotations

import csv
import time
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from vit_marl_tpu.config import (
    ExecutionConfig,
    MarketMakingConfig,
    MultiAgentConfig,
    WorldConfig,
)
from vit_marl_tpu.env import make_world_env


def run_speed_grid(
    agents_grid: Sequence[Tuple[int, int]] = ((1, 1), (5, 5), (10, 10)),
    n_data_msgs: Sequence[int] = (100, 1),
    # the reference grid uses 4000 envs (Speed_test.py); we round up to
    # 4096 so the batch is an ENV_BLOCK (128) multiple and the fused
    # Pallas engine actually engages — at 4000 step_vec silently fell
    # back to the XLA scan and the grid measured the slow path
    num_envs: int = 4096,
    num_steps: int = 50,
    csv_path: Optional[str] = None,
) -> List[dict]:
    rows = []
    for n_mm, n_exec in agents_grid:
        for n_msg in n_data_msgs:
            wcfg = WorldConfig(n_data_msg_per_step=max(n_msg, 1),
                               ep_type="fixed_steps", episode_time=num_steps,
                               start_resolution=num_steps,
                               n_orders=128, n_trades=128,  # Pallas-eligible
                               n_messages_per_synthetic_day=max(
                                   30_000, n_msg * num_steps * 10))
            ma = MultiAgentConfig(
                world=wcfg,
                agents=(MarketMakingConfig(), ExecutionConfig()),
                n_agents_per_type=(n_mm, n_exec))
            env = make_world_env(ma)
            params = env.default_params
            keys = jax.random.split(jax.random.PRNGKey(0), num_envs)
            obs, state = jax.jit(jax.vmap(env.reset, in_axes=(0, None)))(
                keys, params)
            actions = [jnp.zeros((num_envs, n_mm), jnp.int32).squeeze(),
                       jnp.zeros((num_envs, n_exec), jnp.int32).squeeze()]
            step = jax.jit(env.step_vec)
            out = step(keys[0], state, actions, params)
            float(jax.device_get(out[2][0]).sum())
            t0 = time.time()
            st = state
            for i in range(num_steps):
                obs, st, rew, dones, info = step(
                    jax.random.fold_in(keys[0], i), st, actions, params)
            # host fetch: block_until_ready does not reliably synchronise
            float(jax.device_get(rew[0]).sum())
            float(jax.device_get(st.world.mid_price).sum())
            dt = time.time() - t0
            rate = num_envs * num_steps / dt
            rows.append({
                "n_mm": n_mm, "n_exec": n_exec, "n_data_msg": n_msg,
                "num_envs": num_envs, "num_steps": num_steps,
                "msgs_per_step": env.num_msgs_per_step,
                "seconds": round(dt, 3), "env_steps_per_sec": round(rate, 1),
            })
            print(rows[-1])
    if csv_path:
        with open(csv_path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0]))
            w.writeheader()
            w.writerows(rows)
    return rows


if __name__ == "__main__":
    from vit_marl_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    run_speed_grid(csv_path="speed_test_results.csv")
