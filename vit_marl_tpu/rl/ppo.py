"""IPPO with recurrent (and ViT-vision) policies.

PureJaxRL-style rebuild of the reference trainer
(ref: gymnax_exchange/jaxrl/MARL/ippo_rnn_JAXMARL.py:138-835): one network,
optimizer and hidden-state per *agent type*; a single jitted ``update_step``
runs rollout (``lax.scan`` of policies + ``vmap(env.step)``), per-type GAE
(reverse scan, unroll=16), and per-type clipped-PPO minibatch epochs; the
Python-level loop handles checkpointing and logging.

Beyond the reference, the ``"vit_gru"`` network consumes the dual
``{"obs", "vision_obs"}`` observation — closing the trainer-side half of the
fork's "FIXME: APPLY VISION" gap — and continuous Box actions
(policy_blending) train through a squashed-Gaussian head.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.training.train_state import TrainState

from vit_marl_tpu.config import MultiAgentConfig, TrainConfig
from vit_marl_tpu.env.spaces import Box, Discrete
from vit_marl_tpu.env.world import WorldEnv
from vit_marl_tpu.models.rnn import ActorCriticRNN, ScannedGRU
from vit_marl_tpu.models.vit import VIT_PRESETS, ViTActorCriticRNN
from vit_marl_tpu.rl.logger import Logger

Array = jax.Array


class Transition(NamedTuple):
    """(ref: ippo_rnn_JAXMARL.py:119-128)"""

    global_done: Array
    done: Array
    action: Array
    value: Array
    reward: Array
    log_prob: Array
    obs: Any


def batchify(x, num_actors: int):
    return jax.tree.map(
        lambda v: v.reshape((num_actors,) + v.shape[2:]), x)


def global_done_for_actors(done_all: jax.Array, n_per_type: int) -> jax.Array:
    """Broadcast the per-env ``__all__`` done flag to the actor axis in
    ``batchify``'s ENV-MAJOR layout (actor k belongs to env k // n).

    The reference uses ``jnp.tile`` here, which is correct for ITS
    agent-major batchify (ref: ippo_rnn_JAXMARL.py:96-101 stacks agents
    first); our batchify reshapes (E, n, ...) row-major, so tile would
    hand actor k the done flag of env k % E instead — misaligning GAE's
    episode-boundary masks with rewards whenever n_per_type > 1."""
    return jnp.repeat(done_all, n_per_type)


def _per_type(val, i: int):
    if isinstance(val, (tuple, list)):
        return val[i % len(val)]
    return val


def _reduce_info(info):
    """Per-step device-side reduction of the env info pytree to scalars.

    Observability parity with the reference's wandb callback, which logs
    the mean/std of every agent info field and the mean of every world
    info field each update (ref: ippo_rnn_JAXMARL.py:707-723). Reducing
    per step keeps the rollout's stacked side-channel at a few dozen
    scalars instead of (steps, actors) arrays; `_update_from_traj` folds
    the per-step moments into whole-rollout mean/std.
    """
    agents = []
    for inf in info["agents"]:
        d = {}
        for k, v in inf.items():
            v = jnp.asarray(v, jnp.float32)
            d[k] = jnp.stack([v.mean(), jnp.square(v).mean()])
        agents.append(d)
    world = {k: jnp.asarray(v, jnp.float32).mean()
             for k, v in info["world"].items()}
    return {"agents": agents, "world": world}


def _action_metrics(action, space, prefix, out):
    """Per-update action-distribution metrics
    (ref: ippo_rnn_JAXMARL.py:689-696 — unique-count percentages).

    Discrete spaces get one percentage per action id; continuous (Box)
    spaces — which the reference's int-only unique() path would crash on —
    get mean/std of the sampled actions instead.
    """
    if isinstance(space, Discrete):
        counts = jnp.bincount(action.ravel().astype(jnp.int32),
                              length=space.n)
        pct = 100.0 * counts / action.size
        for a in range(space.n):
            out[f"{prefix}/action_pct_{a}"] = pct[a]
    else:
        af = jnp.asarray(action, jnp.float32)
        out[f"{prefix}/action_mean"] = af.mean()
        out[f"{prefix}/action_std"] = af.std()


def _fold_info_stats(info_stats, names, out, prefix=""):
    """Fold stacked per-step info moments into per-update mean/std metrics.

    ``info_stats`` leaves are (steps, 2) [mean, mean-of-squares] for agent
    fields and (steps,) means for world fields. Every step reduces an
    equal element count, so the mean of per-step moments equals the
    whole-rollout moment and std = sqrt(E[x^2] - E[x]^2) exactly.
    """
    for i, name in enumerate(names):
        for k, ms in info_stats["agents"][i].items():
            mean = ms[:, 0].mean()
            var = jnp.maximum(ms[:, 1].mean() - jnp.square(mean), 0.0)
            out[f"{prefix}{name}/info_{k}_mean"] = mean
            out[f"{prefix}{name}/info_{k}_std"] = jnp.sqrt(var)
    for k, v in info_stats["world"].items():
        out[f"{prefix}world/{k}_mean"] = v.mean()


def make_network(cfg: TrainConfig, i: int, action_space, obs_space):
    """Build the per-type policy network (gru | vit_gru)."""
    kind = _per_type(cfg.network, i)
    continuous = isinstance(action_space, Box)
    if continuous:
        action_dim = int(action_space.shape[0])
        low, high = action_space.low, action_space.high
    else:
        action_dim = int(action_space.n)
        low = high = None
    if kind == "vit_gru":
        import dataclasses as _dc
        vit_cfg = VIT_PRESETS[cfg.vit_preset]
        if (cfg.vit_fused_block != vit_cfg.fused_block
                or cfg.vit_fused_block_full != vit_cfg.fused_block_full
                or cfg.vit_attn_kernel != vit_cfg.attn_kernel
                or cfg.vit_attn_bwd_kernel != vit_cfg.attn_bwd_kernel
                or cfg.vit_attn_env_block != vit_cfg.attn_env_block
                or cfg.vit_attn_ln_fold != vit_cfg.attn_ln_fold):
            vit_cfg = _dc.replace(
                vit_cfg,
                fused_block=cfg.vit_fused_block,
                fused_block_full=cfg.vit_fused_block_full,
                attn_kernel=cfg.vit_attn_kernel,
                attn_bwd_kernel=cfg.vit_attn_bwd_kernel,
                attn_env_block=cfg.vit_attn_env_block,
                attn_ln_fold=cfg.vit_attn_ln_fold)
        return ViTActorCriticRNN(
            action_dim=action_dim, vit=vit_cfg,
            fc_dim=cfg.fc_dim, hidden_size=cfg.hidden_size,
            continuous=continuous, action_low=low, action_high=high)
    if kind == "cnn_gru":
        from vit_marl_tpu.models.cnn import CNNActorCriticRNN
        return CNNActorCriticRNN(
            action_dim=action_dim, fc_dim=cfg.fc_dim,
            hidden_size=cfg.hidden_size, continuous=continuous,
            action_low=low, action_high=high)
    return ActorCriticRNN(
        action_dim=action_dim, fc_dim=cfg.fc_dim,
        hidden_size=cfg.hidden_size, continuous=continuous,
        action_low=low, action_high=high)


def _dummy_obs(space, num_envs: int):
    """Zero observation with a leading (time=1, num_actors) shape."""
    if hasattr(space, "spaces"):  # Dict space
        return {k: jnp.zeros((1, num_envs) + tuple(s.shape))
                for k, s in space.spaces.items()}
    return jnp.zeros((1, num_envs) + tuple(space.shape))


def _make_eval_env(ma_config: MultiAgentConfig, cfg: TrainConfig,
                   train_env: WorldEnv) -> WorldEnv:
    """Held-out evaluation env (ref: ippo_rnn_JAXMARL.py:195-221 builds the
    eval env on a different ``timePeriod``).

    LOBSTER data: ``cfg.eval_time_period`` selects the held-out period.
    Synthetic data: ``cfg.eval_data_seed`` (auto: world seed + 1) drives a
    different generated day.  Falls back to the training env only when the
    data source admits no held-out variant.
    """
    import dataclasses

    wcfg = ma_config.world
    if cfg.eval_time_period and wcfg.data_path:
        ew = dataclasses.replace(wcfg, time_period=cfg.eval_time_period)
        return WorldEnv(dataclasses.replace(ma_config, world=ew))
    if not wcfg.data_path:  # synthetic: a different generator seed
        seed = cfg.eval_data_seed if cfg.eval_data_seed >= 0 else wcfg.seed + 1
        ew = dataclasses.replace(wcfg, seed=seed)
        return WorldEnv(dataclasses.replace(ma_config, world=ew))
    if cfg.eval_allow_in_sample:
        import sys
        print("WARNING: eval env shares the TRAINING data "
              "(EVAL_ALLOW_IN_SAMPLE=true) — eval curves are in-sample.",
              file=sys.stderr)
        return train_env
    raise ValueError(
        "LOBSTER data is configured but EVAL_TIME_PERIOD is unset: the "
        "eval env would silently share the TRAINING data and every eval "
        "curve would be in-sample. Set EVAL_TIME_PERIOD to a held-out "
        "period, or opt in explicitly with EVAL_ALLOW_IN_SAMPLE=true "
        "(smoke runs only).")


def _resume(ckpt, runner_state):
    """Restore params + optimizer state + step counters from the latest
    checkpoint into the live (possibly mesh-sharded) train states.

    The checkpoint stores host numpy (CheckpointManager.restore's
    no-template path, so a TPU-saved checkpoint restores on any topology);
    every leaf is re-placed with the matching live leaf's sharding.  Older
    checkpoints that predate opt-state saving resume params-only with a
    fresh optimizer (warned).  Returns (runner_state, start_update).
    """
    import sys

    latest = ckpt.latest_step()
    restored = ckpt.restore(latest)

    def place(live, saved):
        saved = jnp.asarray(saved, dtype=live.dtype)
        if jnp.shape(saved) != jnp.shape(live):
            raise ValueError(
                f"resume: checkpoint leaf shape {jnp.shape(saved)} does not "
                f"match the live network's {jnp.shape(live)} — the network "
                "architecture changed since the checkpoint was written "
                "(hidden_size/fc_dim/preset?). Start fresh or match the "
                "original config.")
        if hasattr(live, "sharding"):
            saved = jax.device_put(saved, live.sharding)
        return saved

    new_ts = []
    for i, ts in enumerate(runner_state[0]):
        params = jax.tree.map(place, ts.params, restored["params"][i])
        kwargs = {"params": params}
        if "opt_leaves" in restored:
            live_leaves, treedef = jax.tree.flatten(ts.opt_state)
            saved_leaves = jax.tree.leaves(restored["opt_leaves"][i])
            if len(live_leaves) != len(saved_leaves):
                raise ValueError(
                    f"resume: optimizer structure changed since the "
                    f"checkpoint was written (agent type {i}: "
                    f"{len(saved_leaves)} saved leaves vs "
                    f"{len(live_leaves)} live — did anneal_lr / the optax "
                    "chain change?). Start fresh or restore params-only.")
            kwargs["opt_state"] = jax.tree.unflatten(
                treedef, [place(lv, sv) for lv, sv
                          in zip(live_leaves, saved_leaves)])
            if "step" in restored:  # save() allows opt_states without steps
                kwargs["step"] = place(jnp.asarray(ts.step),
                                       restored["step"][i])
        else:
            print("WARNING: checkpoint predates optimizer-state saving; "
                  "resuming params-only with a fresh optimizer",
                  file=sys.stderr)
        new_ts.append(ts.replace(**kwargs))
    print(f"resumed from checkpoint update {latest} "
          f"(next update: {latest + 1})")
    return (tuple(new_ts),) + tuple(runner_state[1:]), latest + 1


def make_train(ma_config: MultiAgentConfig, cfg: TrainConfig,
               env: Optional[WorldEnv] = None,
               logger: Optional[Logger] = None,
               mesh=None,
               eval_env: Optional[WorldEnv] = None):
    """Build the training function (ref: ippo_rnn_JAXMARL.py:138-221).

    When ``mesh`` is given, the environment batch (env states, observations,
    hidden states, dones) is sharded over the mesh's ``data`` axis and
    parameters are replicated; GSPMD derives the gradient all-reduce over
    ICI — the pjit-native replacement for the reference's pmap script
    (ref: ippo_rnn_JAXMARL_pmap.py).
    """
    env = env or WorldEnv(ma_config)
    env_step_fn = env.step_vec
    if mesh is not None and getattr(mesh, "size", 1) > 1:
        # GSPMD cannot partition pallas_call ops — under pjit auto-sharding
        # they get REPLICATED (all-gather input, full batch on every chip).
        # Both Pallas paths therefore go through explicit shard_maps over
        # the data axes: the env step via parallel/shard_step.py (each
        # device runs the fused book kernel on its LOCAL env shard), and
        # the ViT attention kernel via the mesh context set around train()
        # below (ops/attention_kernel.py::short_attention) — per-shard
        # tiling permitting, with the XLA attention as the fallback.
        from vit_marl_tpu.parallel.shard_step import make_sharded_step
        env_step_fn = make_sharded_step(env, mesh)
    if cfg.eval_every and eval_env is None:
        eval_env = _make_eval_env(ma_config, cfg, env)
    logger = logger or Logger(cfg.log_backend, cfg.log_path)
    n_types = len(env.agent_types)
    num_actors = [n * cfg.num_envs for n in env.n_per_type]
    num_updates = max(cfg.num_updates, 1)
    # Dict obs requires a vision-capable network; guard early.
    for i, sp in enumerate(env.observation_spaces):
        if (hasattr(sp, "spaces")
                and _per_type(cfg.network, i) not in ("vit_gru", "cnn_gru")):
            raise ValueError(
                f"agent type {i} emits dict observations; set network[{i}] "
                f"to 'vit_gru' or 'cnn_gru'")

    def linear_schedule(lr, count):
        n_mb = cfg.num_minibatches * cfg.update_epochs
        frac = 1.0 - (count // n_mb) / num_updates
        return lr * frac

    def train(rng: Array):
        env_params = env.default_params

        # ---- per-type init (ref: ippo_rnn_JAXMARL.py:237-274) ----
        networks, train_states, hstates = [], [], []
        for i in range(n_types):
            network = make_network(cfg, i, env.action_spaces[i],
                                   env.observation_spaces[i])
            networks.append(network)
            rng, _rng = jax.random.split(rng)
            init_x = (_dummy_obs(env.observation_spaces[i], cfg.num_envs),
                      jnp.zeros((1, cfg.num_envs)))
            init_h = ScannedGRU.initialize_carry(cfg.num_envs, cfg.hidden_size)
            # jitted: un-jitted flax init runs op-by-op and compiles every
            # initializer separately (~10s+ of tiny XLA compiles on a cold
            # cache); one jit collapses it into a single small compile
            params = jax.jit(network.init)(_rng, init_h, init_x)
            lr_i = _per_type(cfg.lr, i)
            if cfg.anneal_lr:
                lr_fn = functools.partial(linear_schedule, lr_i)
            else:
                lr_fn = lr_i
            tx = optax.chain(
                optax.clip_by_global_norm(_per_type(cfg.max_grad_norm, i)),
                optax.adam(learning_rate=lr_fn, eps=1e-5))
            train_states.append(TrainState.create(
                apply_fn=network.apply, params=params, tx=tx))
            hstates.append(ScannedGRU.initialize_carry(num_actors[i],
                                                       cfg.hidden_size))

        rng, _rng = jax.random.split(rng)
        reset_rng = jax.random.split(_rng, cfg.num_envs)
        obsv, env_state = jax.vmap(env.reset, in_axes=(0, None))(
            reset_rng, env_params)
        init_dones = [jnp.zeros((num_actors[i],), bool) for i in range(n_types)]

        # ---- one PPO update (ref: ippo_rnn_JAXMARL.py:276-576) ----
        def _env_step(rs, _):
            train_states, env_state, last_obs, last_done, h_states, rng = rs
            rng, _rng = jax.random.split(rng)
            actions, values, log_probs, new_h = [], [], [], []
            for i, ts in enumerate(train_states):
                obs_i = batchify(last_obs[i], num_actors[i])
                ac_in = (jax.tree.map(lambda v: v[None], obs_i),
                         last_done[i][None])
                h, pi, value = ts.apply_fn(ts.params, h_states[i], ac_in)
                new_h.append(h)
                values.append(value)
                action = pi.sample(seed=_rng)
                log_probs.append(pi.log_prob(action))
                # (1, num_actors, ...) -> (num_envs, n_agents, ...)
                a = action.reshape((cfg.num_envs, env.n_per_type[i])
                                   + action.shape[2:])
                actions.append(a.squeeze() if env.n_per_type[i] == 1
                               else a)
            rng, _rng = jax.random.split(rng)
            obsv, env_state, reward, done, info = env_step_fn(
                _rng, env_state, actions, env_params)
            transitions = []
            new_dones = []
            for i in range(n_types):
                done_i = batchify(done["agents"][i],
                                  num_actors[i]).squeeze()
                new_dones.append(done_i)
                transitions.append(Transition(
                    global_done=global_done_for_actors(
                        done["__all__"], env.n_per_type[i]),
                    done=last_done[i],
                    action=batchify(actions[i].reshape(
                        (cfg.num_envs, env.n_per_type[i])
                        + (actions[i].shape[2:]
                           if env.n_per_type[i] > 1
                           else actions[i].shape[1:])), num_actors[i]),
                    value=values[i].squeeze(0),
                    reward=batchify(reward[i], num_actors[i]).squeeze(),
                    log_prob=log_probs[i].squeeze(0),
                    obs=batchify(obsv[i], num_actors[i]),
                ))
            rs = (train_states, env_state, obsv, new_dones, new_h, rng)
            # info side-channel: the env computes per-agent/world info every
            # step; reduce it to scalars here instead of discarding it
            # (observability parity — ref: ippo_rnn_JAXMARL.py:680-763)
            stats = _reduce_info(info) if cfg.log_env_info else {}
            return rs, (transitions, stats)

        def _update_from_traj(rollout_state, initial_hstates, traj_batch,
                              update_idx, info_stats):
            """GAE + PPO epochs given a collected trajectory."""
            train_states, env_state, last_obs, last_dones, h_new, rng = rollout_state

            # ---- GAE per type (ref: ippo_rnn_JAXMARL.py:372-413) ----
            def _gae(gamma, lam, traj, last_val):
                def scan_fn(carry, tr):
                    gae, next_value = carry
                    delta = (tr.reward + gamma * next_value
                             * (1 - tr.global_done) - tr.value)
                    gae = delta + gamma * lam * (1 - tr.global_done) * gae
                    return (gae, tr.value), gae
                _, adv = jax.lax.scan(scan_fn,
                                      (jnp.zeros_like(last_val), last_val),
                                      traj, reverse=True, unroll=16)
                return adv, adv + traj.value

            advantages, targets = [], []
            for i, ts in enumerate(train_states):
                obs_i = batchify(last_obs[i], num_actors[i])
                ac_in = (jax.tree.map(lambda v: v[None], obs_i),
                         last_dones[i][None])
                _, _, last_val = ts.apply_fn(ts.params, h_new[i], ac_in)
                adv, tgt = _gae(_per_type(cfg.gamma, i),
                                _per_type(cfg.gae_lambda, i),
                                traj_batch[i], last_val.squeeze(0))
                advantages.append(adv)
                targets.append(tgt)

            # ---- PPO epochs per type (ref: ippo_rnn_JAXMARL.py:419-540) ----
            loss_infos = []
            new_train_states = list(train_states)
            for i in range(n_types):
                clip_eps = _per_type(cfg.clip_eps, i)
                vf_coef = _per_type(cfg.vf_coef, i)
                ent_coef = _per_type(cfg.ent_coef, i)

                def _loss_fn(params, init_h, traj, gae, tgts, ts=train_states[i]):
                    _, pi, value = ts.apply_fn(params, init_h.squeeze(0),
                                               (traj.obs, traj.done))
                    log_prob = pi.log_prob(traj.action)
                    v_clip = traj.value + (value - traj.value).clip(
                        -clip_eps, clip_eps)
                    v_loss = 0.5 * jnp.maximum(
                        jnp.square(value - tgts),
                        jnp.square(v_clip - tgts)).mean()
                    logratio = log_prob - traj.log_prob
                    ratio = jnp.exp(logratio)
                    gae = (gae - gae.mean()) / (gae.std() + 1e-8)
                    l1 = ratio * gae
                    l2 = jnp.clip(ratio, 1 - clip_eps, 1 + clip_eps) * gae
                    actor_loss = -jnp.minimum(l1, l2).mean()
                    entropy = pi.entropy().mean()
                    approx_kl = ((ratio - 1) - logratio).mean()
                    clip_frac = jnp.mean(jnp.abs(ratio - 1) > clip_eps)
                    total = actor_loss + vf_coef * v_loss - ent_coef * entropy
                    return total, (v_loss, actor_loss, entropy, approx_kl,
                                   clip_frac)

                def _update_minbatch(ts, batch):
                    init_h, traj, gae, tgts = batch
                    grad_fn = jax.value_and_grad(_loss_fn, has_aux=True)
                    loss, grads = grad_fn(ts.params, init_h, traj, gae, tgts)
                    return ts.apply_gradients(grads=grads), loss

                def _update_epoch(carry, _):
                    ts, init_h, traj, gae, tgts, rng = carry
                    rng, _rng = jax.random.split(rng)
                    init_h_r = jax.tree.map(
                        lambda v: v.reshape((1, num_actors[i]) + v.shape[1:]),
                        init_h)
                    batch = (init_h_r, traj, gae.squeeze(), tgts.squeeze())
                    perm = jax.random.permutation(_rng, num_actors[i])
                    shuffled = jax.tree.map(
                        lambda v: jnp.take(v, perm, axis=1), batch)
                    minibatches = jax.tree.map(
                        lambda v: jnp.swapaxes(jnp.reshape(
                            v, [v.shape[0], cfg.num_minibatches, -1]
                            + list(v.shape[2:])), 1, 0), shuffled)
                    ts, losses = jax.lax.scan(_update_minbatch, ts, minibatches)
                    return (ts, init_h, traj, gae, tgts, rng), losses

                rng, _rng = jax.random.split(rng)
                carry = (train_states[i], initial_hstates[i], traj_batch[i],
                         advantages[i], targets[i], _rng)
                carry, losses = jax.lax.scan(_update_epoch, carry, None,
                                             cfg.update_epochs)
                new_train_states[i] = carry[0]
                total, (v_loss, a_loss, entropy, kl, clip_frac) = losses
                loss_infos.append({
                    "total_loss": total.mean(),
                    "value_loss": v_loss.mean(),
                    "actor_loss": a_loss.mean(),
                    "entropy": entropy.mean(),
                    "approx_kl": kl.mean(),
                    "clip_frac": clip_frac.mean(),
                })

            # ---- metrics ----
            metrics = {"update_step": update_idx}
            type_names = [a.cfg.short_name for a in env.agent_types]
            for i in range(n_types):
                name = type_names[i]
                metrics[f"{name}/mean_reward"] = traj_batch[i].reward.mean()
                for k, v in loss_infos[i].items():
                    metrics[f"{name}/{k}"] = v
                if cfg.log_env_info:
                    _action_metrics(traj_batch[i].action,
                                    env.action_spaces[i], name, metrics)
            if cfg.log_env_info:
                _fold_info_stats(info_stats, type_names, metrics)
            runner_state = (tuple(new_train_states), env_state, last_obs,
                            last_dones, h_new, rng)
            return runner_state, metrics


        def _update_step(runner_state, update_idx):
            """Fused single-jit update (rollout scan + GAE + PPO)."""
            initial_hstates = runner_state[-2]
            rollout_state, (traj_batch, info_stats) = jax.lax.scan(
                _env_step, runner_state, None, cfg.num_steps)
            return _update_from_traj(rollout_state, initial_hstates,
                                     traj_batch, update_idx, info_stats)

        update_jit = jax.jit(_update_step)
        env_step_jit = jax.jit(lambda rs: _env_step(rs, None))
        update_from_traj_jit = jax.jit(_update_from_traj)

        def _make_pipeline_collector():
            """Split-batch software-pipelined rollout (rl/pipeline.py):
            each device program packs the env step for one half-batch with
            the policy forward for the other, so the HBM/VPU-bound engine
            and the MXU-bound encoder can interleave.  Per-env math is
            unchanged; batch-shaped RNG draws are a documented perf-mode
            divergence (identically distributed — like any batch-size
            change).  Requires an even NUM_ENVS and no multi-device mesh."""
            from vit_marl_tpu.rl.pipeline import (
                concat_halves,
                make_pipelined_runner,
                split_half,
            )
            half = cfg.num_envs // 2
            h_actors = [n * half for n in env.n_per_type]

            def policy_half(params_list, pol_state, pol_in):
                prng, hs = pol_state
                obs_h, done_h = pol_in
                prng, _rng = jax.random.split(prng)
                hs = list(hs)
                acts_env, pouts = [], []
                for i in range(n_types):
                    obs_i = batchify(obs_h[i], h_actors[i])
                    ac_in = (jax.tree.map(lambda v: v[None], obs_i),
                             done_h[i][None])
                    hs[i], pi, value = networks[i].apply(params_list[i],
                                                         hs[i], ac_in)
                    action = pi.sample(seed=_rng)
                    log_prob = pi.log_prob(action)
                    a = action.reshape((half, env.n_per_type[i])
                                       + action.shape[2:])
                    acts_env.append(a.squeeze() if env.n_per_type[i] == 1
                                    else a)
                    # (action, value, log_prob, done-input) — the policy-side
                    # Transition fields, already in the batched actor layout
                    pouts.append((action[0], value.squeeze(0),
                                  log_prob.squeeze(0), done_h[i]))
                return (prng, tuple(hs)), acts_env, tuple(pouts)

            def env_half(params_list, env_carry, acts):
                erng, st = env_carry
                erng, _rng = jax.random.split(erng)
                obsv, st, reward, done, info = env.step_vec(
                    _rng, st, acts, env_params)
                new_dones = [batchify(done["agents"][i],
                                      h_actors[i]).squeeze()
                             for i in range(n_types)]
                eouts = (
                    [batchify(reward[i], h_actors[i]).squeeze()
                     for i in range(n_types)],
                    [global_done_for_actors(done["__all__"],
                                            env.n_per_type[i])
                     for i in range(n_types)],
                    [batchify(obsv[i], h_actors[i]) for i in range(n_types)],
                    _reduce_info(info) if cfg.log_env_info else {},
                )
                return (erng, st), (obsv, new_dones), eouts

            run = make_pipelined_runner(policy_half, env_half, merged=True)

            def collect(runner_state):
                train_states, env_state, obsv, dones, hstates, rng = \
                    runner_state
                rng, kp, ke = jax.random.split(rng, 3)
                kps, kes = jax.random.split(kp, 2), jax.random.split(ke, 2)
                params_list = [ts.params for ts in train_states]
                pol_states = [
                    (kps[h], tuple(split_half(hstates[i], h, h_actors[i])
                                   for i in range(n_types)))
                    for h in (0, 1)]
                env_states = [(kes[h], split_half(env_state, h, half))
                              for h in (0, 1)]
                pol_ins = [
                    ([split_half(obsv[i], h, half) for i in range(n_types)],
                     [split_half(dones[i], h, h_actors[i])
                      for i in range(n_types)])
                    for h in (0, 1)]
                pol_f, env_f, in_f, pouts, eouts = run(
                    params_list, pol_states, env_states, pol_ins,
                    cfg.num_steps)

                def transition_at(h, t):
                    p, e = pouts[h][t], eouts[h][t]
                    rew, gdone, obs_b, _ = e
                    return [Transition(global_done=gdone[i], done=p[i][3],
                                       action=p[i][0], value=p[i][1],
                                       reward=rew[i], log_prob=p[i][2],
                                       obs=obs_b[i])
                            for i in range(n_types)]

                traj_h = [jax.tree.map(
                    lambda *v: jnp.stack(v),
                    *[transition_at(h, t) for t in range(cfg.num_steps)])
                    for h in (0, 1)]
                traj_batch = jax.tree.map(
                    lambda a, b: jnp.concatenate([a, b], axis=1),
                    traj_h[0], traj_h[1])
                if cfg.log_env_info:
                    # per-step moments over equal half sizes: the mean of
                    # the two halves is the full-batch moment exactly
                    st_h = [jax.tree.map(
                        lambda *v: jnp.stack(v),
                        *[eouts[h][t][3] for t in range(cfg.num_steps)])
                        for h in (0, 1)]
                    info_stats = jax.tree.map(lambda a, b: (a + b) / 2,
                                              st_h[0], st_h[1])
                else:
                    info_stats = {}
                env_state_f = concat_halves(env_f[0][1], env_f[1][1])
                obs_f = [concat_halves(in_f[0][0][i], in_f[1][0][i])
                         for i in range(n_types)]
                dones_f = [concat_halves(in_f[0][1][i], in_f[1][1][i])
                           for i in range(n_types)]
                h_f = [concat_halves(pol_f[0][1][i], pol_f[1][1][i])
                       for i in range(n_types)]
                rollout_state = (train_states, env_state_f, obs_f, dones_f,
                                 h_f, rng)
                return rollout_state, traj_batch, info_stats

            return collect

        use_pipeline = cfg.rollout_mode == "pipeline"
        if use_pipeline:
            if mesh is not None and getattr(mesh, "size", 1) > 1:
                raise ValueError(
                    "rollout_mode=pipeline does not compose with a "
                    "multi-device mesh yet; use loop/scan (the mesh path "
                    "shards the whole step instead)")
            if cfg.num_envs % 2:
                raise ValueError(
                    "rollout_mode=pipeline needs an even NUM_ENVS")
            pipeline_collect = _make_pipeline_collector()

        # ---- periodic greedy evaluation (ref: ippo_rnn_JAXMARL.py:579-678)
        def _eval_rollout(params_list, rng):
            n_ev = cfg.eval_envs or cfg.num_envs
            ev_actors = [n * n_ev for n in eval_env.n_per_type]
            eval_params = eval_env.default_params
            rng, r0 = jax.random.split(rng)
            keys0 = jax.random.split(r0, n_ev)
            obs, st = jax.vmap(eval_env.reset, in_axes=(0, None))(
                keys0, eval_params)
            hs = [ScannedGRU.initialize_carry(ev_actors[i], cfg.hidden_size)
                  for i in range(n_types)]
            dns = [jnp.zeros((ev_actors[i],), bool) for i in range(n_types)]

            def step_fn(carry, _):
                rng, st, obs, dns, hs = carry
                rng, kstep = jax.random.split(rng)
                acts = []
                hs2 = list(hs)
                for i in range(n_types):
                    obs_i = jax.tree.map(
                        lambda v: v.reshape((ev_actors[i],) + v.shape[2:])[None],
                        obs[i])
                    hs2[i], pi, _ = networks[i].apply(
                        params_list[i], hs[i], (obs_i, dns[i][None]))
                    a = jax.tree.map(lambda v: v[0], pi.mode())
                    a = a.reshape((n_ev, eval_env.n_per_type[i]) + a.shape[1:])
                    acts.append(a.squeeze() if eval_env.n_per_type[i] == 1
                                else a)
                obs, st, rew, done, infos = eval_env.step_vec(
                    kstep, st, acts, eval_params)
                dns2 = [done["agents"][i].reshape((ev_actors[i],))
                        for i in range(n_types)]
                out = ([r.mean() for r in rew],
                       _reduce_info(infos) if cfg.log_env_info else {})
                return (rng, st, obs, dns2, hs2), (out, acts)

            (_, st, obs, dns, hs), ((rews, estats), acts) = jax.lax.scan(
                step_fn, (rng, st, obs, dns, hs), None, cfg.eval_steps)
            # eval twins of the training observability metrics
            # (ref: ippo_rnn_JAXMARL.py:726-760 "eval_agent_*" keys)
            extra = {}
            if cfg.log_env_info:
                names = [a.cfg.short_name for a in eval_env.agent_types]
                for i in range(n_types):
                    _action_metrics(acts[i], eval_env.action_spaces[i],
                                    f"eval_{names[i]}", extra)
                _fold_info_stats(estats, names, extra, prefix="eval_")
            return [r.mean() for r in rews], extra

        eval_jit = jax.jit(_eval_rollout) if cfg.eval_every else None

        if mesh is not None:
            from vit_marl_tpu.parallel.mesh import shard_batch, shard_params
            # replicates when the mesh has no (or a size-1) "model" axis;
            # otherwise Megatron-style tensor-parallel weight placement
            train_states = shard_params(train_states, mesh)
            env_state = shard_batch(env_state, mesh)
            obsv = shard_batch(obsv, mesh)
            init_dones = shard_batch(init_dones, mesh)
            hstates = shard_batch(hstates, mesh)

        runner_state = (tuple(train_states), env_state, obsv, init_dones,
                        hstates, rng)
        metrics_history = []
        ckpt = None
        start_update = 0
        if cfg.checkpoint_dir:
            from vit_marl_tpu.rl.checkpoint import CheckpointManager
            ckpt = CheckpointManager(cfg.checkpoint_dir,
                                     max_to_keep=cfg.checkpoint_max_to_keep)
        if cfg.resume and ckpt is None:
            raise ValueError(
                "RESUME=true needs CHECKPOINT_DIR set — with no checkpoint "
                "directory there is nothing to resume from (refusing to "
                "silently restart at update 0)")
        if ckpt is not None and cfg.resume and ckpt.latest_step() is not None:
            runner_state, start_update = _resume(ckpt, runner_state)
        use_loop = cfg.rollout_mode == "loop" or (
            cfg.rollout_mode == "auto" and jax.default_backend() == "tpu")
        # VIT_MARL_PHASE_TIMING=1: print per-update rollout/update wall times
        # (host-fetch synced; perturbs pipelining, for profiling only)
        import os
        import time as _time
        phase_timing = os.environ.get("VIT_MARL_PHASE_TIMING") == "1"
        for u in range(start_update, num_updates):
            if use_pipeline:
                t0 = _time.time()
                initial_hstates = runner_state[-2]
                rs, traj_batch, info_stats = pipeline_collect(runner_state)
                if phase_timing:
                    float(jax.device_get(traj_batch[0].reward.sum()))
                    t1 = _time.time()
                runner_state, metrics = update_from_traj_jit(
                    rs, initial_hstates, traj_batch, u, info_stats)
                if phase_timing:
                    float(jax.device_get(
                        jnp.asarray(metrics[next(iter(metrics))])))
                    t2 = _time.time()
                    print(f"# update {u}: rollout {t1 - t0:.3f}s "
                          f"update {t2 - t1:.3f}s")
            elif use_loop:
                # Python-dispatched rollout: each step is one jitted call
                # (async-pipelined); avoids the fused-scan rollout, which
                # is substantially slower on some TPU runtimes.
                t0 = _time.time()
                initial_hstates = runner_state[-2]
                rs = runner_state
                steps = []
                for _t in range(cfg.num_steps):
                    rs, out = env_step_jit(rs)
                    steps.append(out)
                traj_batch, info_stats = jax.tree.map(
                    lambda *v: jnp.stack(v), *steps)
                if phase_timing:
                    float(jax.device_get(traj_batch[0].reward.sum()))
                    t1 = _time.time()
                runner_state, metrics = update_from_traj_jit(
                    rs, initial_hstates, traj_batch, u, info_stats)
                if phase_timing:
                    float(jax.device_get(
                        jnp.asarray(metrics[next(iter(metrics))])))
                    t2 = _time.time()
                    print(f"# update {u}: rollout {t1 - t0:.3f}s "
                          f"update {t2 - t1:.3f}s")
            else:
                runner_state, metrics = update_jit(runner_state, u)
            if eval_jit is not None and (u + 1) % cfg.eval_every == 0:
                rng, ev_rng = jax.random.split(rng)
                ev, ev_extra = eval_jit(
                    [ts.params for ts in runner_state[0]], ev_rng)
                for i in range(n_types):
                    name = eval_env.agent_types[i].cfg.short_name
                    metrics[f"{name}/eval_mean_reward"] = ev[i]
                metrics.update(ev_extra)
            logger.log(jax.device_get(metrics))
            metrics_history.append(jax.device_get(metrics))
            if ckpt is not None and ((u + 1) % cfg.checkpoint_every == 0
                                     or u == num_updates - 1):
                ckpt.save(u, [ts.params for ts in runner_state[0]],
                          metrics=metrics_history[-1],
                          opt_states=[ts.opt_state
                                      for ts in runner_state[0]],
                          train_steps=[ts.step for ts in runner_state[0]])
        if ckpt is not None:
            ckpt.close()
        return {"runner_state": runner_state, "metrics": metrics_history,
                "networks": networks}

    def train_with_mesh_ctx(rng: Array):
        # Activate (or clear) the mesh-sharded attention context for the
        # duration of this run: every jit trace under train() sees the
        # right context, and concurrent/later single-device runs are not
        # polluted (set/restore, ops/attention_kernel.py).
        from vit_marl_tpu.ops.attention_kernel import (
            restore_attention_mesh,
            set_attention_mesh,
        )
        prev = set_attention_mesh(
            mesh if (mesh is not None and getattr(mesh, "size", 1) > 1
                     and (cfg.vit_attn_kernel or cfg.vit_attn_ln_fold))
            else None)
        try:
            return train(rng)
        finally:
            restore_attention_mesh(prev)

    return train_with_mesh_ctx
