"""Worker process for the true 2-process DCN-seam test.

Launched by ``tests/test_parallel.py::test_two_process_dcn_update`` as
``python tests/dcn_worker.py <coordinator> <num_procs> <proc_id> <out.npz>``.

Each process joins the cluster via ``initialize_distributed`` (the
framework's own wrapper — the thing under test), builds the hybrid
``(dcn_data, data)`` mesh with ``make_hybrid_mesh`` and runs ONE sharded
IPPO update of the smallest real world-env config.  Process 0 dumps the
updated (replicated) parameters so the parent can compare them against a
single-process golden on an identically-shaped mesh.

The reference's multi-device story is a single-host pmap
(ref: gymnax_exchange/jaxrl/MARL/ippo_rnn_JAXMARL_pmap.py:786-788); this
exercises the beyond-reference multi-host path end to end.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    coordinator, n_proc, pid, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    from vit_marl_tpu.parallel import initialize_distributed, make_hybrid_mesh

    # must run before any backend use (the wrapper refuses afterwards)
    initialize_distributed(coordinator_address=coordinator,
                           num_processes=n_proc, process_id=pid)
    assert jax.process_count() == n_proc, jax.process_count()
    assert jax.local_device_count() == 4, jax.local_device_count()
    assert jax.device_count() == 4 * n_proc, jax.device_count()

    mesh = make_hybrid_mesh((4,), ("data",))
    assert mesh.shape == {"dcn_data": n_proc, "data": 4}, mesh.shape

    import numpy as np

    from vit_marl_tpu.config import (
        MarketMakingConfig,
        MultiAgentConfig,
        TrainConfig,
        WorldConfig,
    )
    from vit_marl_tpu.rl.ppo import make_train

    wcfg = WorldConfig(n_data_msg_per_step=2, ep_type="fixed_steps",
                       episode_time=4, start_resolution=4,
                       n_messages_per_synthetic_day=300)
    ma = MultiAgentConfig(world=wcfg, agents=(MarketMakingConfig(),),
                          n_agents_per_type=(1,))
    tc = TrainConfig(num_envs=8, num_steps=2, num_minibatches=1,
                     update_epochs=1, total_timesteps=16, network="gru",
                     hidden_size=32, fc_dim=32, log_backend="none",
                     rollout_mode="scan")
    out = make_train(ma, tc, mesh=mesh)(jax.random.PRNGKey(0))

    ts = out["runner_state"][0][0]
    if pid == 0:
        # params are replicated over the mesh -> fully addressable here
        flat = {f"p{i}": np.asarray(jax.device_get(leaf))
                for i, leaf in enumerate(jax.tree.leaves(ts.params))}
        flat["actor_loss"] = np.asarray(
            out["metrics"][0]["MM/actor_loss"])
        np.savez(out_path, **flat)
    print(f"worker {pid}: OK", flush=True)


if __name__ == "__main__":
    main()
