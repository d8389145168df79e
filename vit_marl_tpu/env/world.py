"""The multi-agent world environment.

Rebuild of ``MARLEnv`` (ref: gymnax_exchange/jaxen/marl_env.py:84) on the
vectorized engine.  One ``WorldEnv`` composes the data-replay core with N
agent types x M instances; the step pipeline follows the reference's stages
(labels A-K, ref: marl_env.py:241-662):

  data msgs -> per-type vmap(get_messages) -> central order-id assignment
  (+ optional shuffle) -> concat [cancels, actions, data] -> fused engine
  scan saving best bid/ask -> ffill best prices -> per-type vmap(get_reward)
  -> world-state update -> per-type vmap(update_state) -> dones
  ("__all__" = all agents done) -> infos -> per-type vmap(get_observation)
  with obs of done agents zero-masked.

Auto-reset on "__all__" via tree-select (ref: marl_env.py:737-766).
"""

from __future__ import annotations

from functools import partial
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp

from vit_marl_tpu.config import CancelMode, MultiAgentConfig, MsgCol
from vit_marl_tpu.data.lobster import LoadedData
from vit_marl_tpu.env import base as env_base
from vit_marl_tpu.env.common import ffill_best_prices
from vit_marl_tpu.env.execution import ExecutionAgent
from vit_marl_tpu.env.mm import MarketMakingAgent
from vit_marl_tpu.env.structs import (
    MultiAgentParams,
    MultiAgentState,
    WorldState,
)
from vit_marl_tpu.lob import book as bk
from vit_marl_tpu.lob import engine

Array = jax.Array

AGENT_REGISTRY = {
    "market_making": MarketMakingAgent,
    "execution": ExecutionAgent,
}


class WorldEnv:
    def __init__(self, ma_config: MultiAgentConfig,
                 data: Optional[LoadedData] = None,
                 key: Optional[Array] = None):
        self.config = ma_config
        self.wcfg = ma_config.world
        self.agent_types = [
            AGENT_REGISTRY[acfg.agent_kind](acfg, self.wcfg)
            for acfg in ma_config.agents
        ]
        self.n_per_type = tuple(ma_config.n_agents_per_type)
        self.num_agents = sum(self.n_per_type)
        self.num_msgs_per_step = ma_config.num_msgs_per_step
        self.num_action_msgs_per_step = sum(
            acfg.num_action_messages * n
            for acfg, n in zip(ma_config.agents, self.n_per_type))
        key = key if key is not None else jax.random.PRNGKey(self.wcfg.seed)
        # test hook: run the fused Pallas step in interpreter mode on CPU
        # (set immediately after construction, before the first jitted step)
        self._force_pallas_interpret = False
        # multi-device guard (set by rl.ppo.make_train for mesh.size > 1):
        # GSPMD cannot partition a pallas_call — under pjit auto-sharding
        # it REPLICATES the op (all-gather input, full batch on every
        # chip; verified empirically), so mesh training routes the engine
        # through the vmapped XLA scan, which shards cleanly.  shard_map
        # around the env step is the roadmap for keeping the kernel on
        # pods (docs/DESIGN.md).
        self._disable_pallas = False
        # perf-ablation hook (profiling only, NOT semantics-preserving):
        # VIT_MARL_ABLATE=reset,obs,build skips those step_vec stages
        import os
        self._ablate = set(filter(None, os.environ.get(
            "VIT_MARL_ABLATE", "").split(",")))
        if self._ablate:
            import sys
            print(f"WARNING: VIT_MARL_ABLATE={sorted(self._ablate)} — "
                  "step stages are SKIPPED in the jitted step. This is a "
                  "profiling mode; semantics are broken (zeroed messages/"
                  "observations). Unset the env var for real runs.",
                  file=sys.stderr)
        self._world_params = env_base.make_world_params(self.wcfg, key, data)
        self.n_windows = int(
            self._world_params.init_states.window_index.shape[0])

        for a in self.agent_types:
            # message-stream observations carry the WORLD's combined stream
            # (all agents + data, post-shuffle) — agents need the total to
            # declare the right obs-space shape
            a.total_msgs_per_step = self.num_msgs_per_step
        self.action_spaces = [a.action_space() for a in self.agent_types]
        self.observation_spaces = [a.observation_space() for a in self.agent_types]

    # ------------------------------------------------------------------

    @property
    def default_params(self) -> MultiAgentParams:
        """(ref: marl_env.py:139-172)"""
        agent_params = []
        next_tid = self.wcfg.trader_id_range_start
        for agent, n in zip(self.agent_types, self.n_per_type):
            p, next_tid = agent.default_params(next_tid, n)
            agent_params.append(p)
        return MultiAgentParams(world=self._world_params,
                                agents=tuple(agent_params))

    # ------------------------------------------------------------------

    @partial(jax.jit, static_argnums=(0,))
    def reset_env(self, key: Array, params: MultiAgentParams
                  ) -> Tuple[List[Any], MultiAgentState]:
        """(ref: marl_env.py:168-237)"""
        keys = jax.random.split(key, len(self.agent_types) + 1)
        world_key, agent_keys = keys[-1], keys[:-1]

        idx = env_base.pick_window(self.wcfg, world_key, self.n_windows)
        load_state = env_base.gather_reset_state(params.world, idx)

        best_ask, best_bid = bk.best_bid_and_ask_incl_quants(
            self.wcfg, load_state.asks, load_state.bids)
        bestbids = jnp.tile(best_bid[None, :], (self.num_msgs_per_step, 1))
        bestasks = jnp.tile(best_ask[None, :], (self.num_msgs_per_step, 1))
        mid_price = jnp.float32((best_bid[0] + best_ask[0]) / 2)

        world = WorldState(
            asks=load_state.asks, bids=load_state.bids,
            trades=load_state.trades, init_time=load_state.init_time,
            window_index=load_state.window_index,
            max_steps_in_episode=load_state.max_steps_in_episode,
            start_index=load_state.start_index,
            step_counter=load_state.step_counter,
            best_bids=bestbids, best_asks=bestasks,
            time=load_state.init_time,
            order_id_counter=jnp.asarray(
                self.wcfg.order_id_counter_start, jnp.int32),
            mid_price=mid_price, delta_time=jnp.float32(0.0))

        obs_list, state_list = [], []
        for agent, ap, ak, n in zip(self.agent_types, params.agents,
                                    agent_keys, self.n_per_type):
            # NOTE: one key per *type* (all instances share it), matching the
            # reference's vmap in_axes (ref: marl_env.py:217).
            obs, st = jax.vmap(agent.reset, in_axes=(0, None, None, None))(
                ap, ak, world, self.num_msgs_per_step)
            obs_list.append(obs)
            state_list.append(st)
        return obs_list, MultiAgentState(world=world, agents=tuple(state_list))

    # ------------------------------------------------------------------

    def _build_messages(self, key: Array, state: MultiAgentState,
                        actions: List[Any], params: MultiAgentParams):
        """Stages A-C: data slice, per-type action/cancel messages, central
        order-id assignment and shuffle (ref: marl_env.py:241-344)."""
        wcfg = self.wcfg
        world = state.world
        needs_lob_before = any(
            getattr(a.cfg, "observation_space", "") in
            ("messages", "messages_tokenized") for a in self.agent_types)
        lob_state_before = (bk.get_l2_state(wcfg, 10, world.asks, world.bids)
                            if needs_lob_before else None)

        if "data" in self._ablate:
            data_msgs = jnp.zeros((wcfg.n_data_msg_per_step, 8), jnp.int32)
        else:
            data_msgs = env_base.get_data_messages(
                wcfg, params.world.message_data, world.start_index,
                world.step_counter, world.init_time[0] + wcfg.episode_time)

        all_action, all_cancel = [], []
        for i, (agent, n) in enumerate(zip(self.agent_types, self.n_per_type)):
            a = actions[i]
            if n == 1:
                a = jnp.expand_dims(a, 0)  # single agents pass unbatched actions
            key, k_type = jax.random.split(key)
            inst_keys = jax.random.split(k_type, n)
            if "agents" in self._ablate:
                msgs_a = jnp.zeros((n, agent.cfg.num_messages // 2, 8),
                                   jnp.int32)
                msgs_c = jnp.zeros_like(msgs_a)
            else:
                msgs_a, msgs_c = jax.vmap(
                    agent.get_messages, in_axes=(0, None, 0, 0, 0))(
                    a, world, state.agents[i], params.agents[i], inst_keys)
            all_action.append(msgs_a.reshape(-1, 8))
            all_cancel.append(msgs_c.reshape(-1, 8))
        action_msgs = jnp.vstack(all_action)
        cancel_msgs = jnp.vstack(all_cancel)

        # central order-id assignment (ref: marl_env.py:313-324)
        n_act = self.num_action_msgs_per_step
        new_ids = jnp.arange(0, -n_act, -1) + world.order_id_counter
        action_msgs = action_msgs.at[:, MsgCol.OID].set(new_ids)
        new_id_counter = world.order_id_counter - n_act
        if wcfg.shuffle_action_messages and "shuffle" not in self._ablate:
            key, sk = jax.random.split(key)
            action_msgs = jax.random.permutation(sk, action_msgs, axis=0)

        combined = jnp.concatenate([cancel_msgs, action_msgs, data_msgs],
                                   axis=0)
        return combined, new_id_counter, lob_state_before

    def _zero_obs(self, i: int):
        """Ablation stand-in observation (profiling only)."""
        space = self.observation_spaces[i]
        n = self.n_per_type[i]
        if hasattr(space, "spaces"):
            return {k: jnp.zeros((n,) + tuple(s.shape), jnp.float32)
                    for k, s in space.spaces.items()}
        return jnp.zeros((n,) + tuple(space.shape), jnp.float32)

    def _post_engine(self, state: MultiAgentState, params: MultiAgentParams,
                     book: bk.BookState, bestasks: Array, bestbids: Array,
                     combined: Array, lob_state_before, new_id_counter,
                     summaries=None, skip_ffill: bool = False):
        """Stages E-K: rewards, state updates, dones, infos, observations
        (ref: marl_env.py:420-662).

        ``summaries``: optional per-type list of TradeSummary pytrees (one
        instance axis per leaf) from the fused kernel's aggregate mode; when
        given, rewards consume the sums directly and the trade log is never
        read."""
        wcfg = self.wcfg
        world = state.world
        if not skip_ffill:
            bestasks = ffill_best_prices(bestasks, world.best_asks[-1, 0])
            bestbids = ffill_best_prices(bestbids, world.best_bids[-1, 0])
        final_time = combined[-1, -2:]

        rewards, extras_list = [], []
        for i, agent in enumerate(self.agent_types):
            if summaries is None:
                r, ex = jax.vmap(
                    agent.get_reward,
                    in_axes=(None, 0, 0, None, None, None, None))(
                    world, state.agents[i], params.agents[i], book.trades,
                    bestasks, bestbids, final_time)
            else:
                r, ex = jax.vmap(
                    agent.get_reward,
                    in_axes=(None, 0, 0, None, None, None, None, 0))(
                    world, state.agents[i], params.agents[i], book.trades,
                    bestasks, bestbids, final_time, summaries[i])
            rewards.append(r)
            extras_list.append(ex)

        old_time = world.time
        old_mid = world.mid_price
        new_world = world.replace(
            asks=book.asks, bids=book.bids, trades=book.trades,
            best_asks=bestasks, best_bids=bestbids, time=final_time,
            order_id_counter=new_id_counter,
            step_counter=world.step_counter + 1,
            mid_price=(bestbids[-1, 0] + bestasks[-1, 0]) / 2,
            delta_time=(final_time[0] + final_time[1] / 1e9
                        - world.time[0] - world.time[1] / 1e9))

        new_agent_states, dones_list, infos_list = [], [], []
        for i, agent in enumerate(self.agent_types):
            st, dn, inf = jax.vmap(
                agent.update_state, in_axes=(None, 0, 0))(
                new_world, state.agents[i], extras_list[i])
            new_agent_states.append(st)
            dones_list.append(dn)
            infos_list.append(inf)

        new_state = MultiAgentState(world=new_world,
                                    agents=tuple(new_agent_states))
        all_dones = jnp.concatenate(dones_list)
        done_all = jnp.all(all_dones)
        dones = {"__all__": done_all, "agents": dones_list}

        world_info = {
            "window_index": new_world.window_index,
            "end_mid_price": new_world.mid_price,
            "step_counter": new_world.step_counter,
            "time": new_world.time,
            "order_id_counter": new_world.order_id_counter,
            "average_best_ask": new_world.best_asks[:, 0].mean(),
            "average_best_bid": new_world.best_bids[:, 0].mean(),
            "delta_time": new_world.delta_time,
            "current_step": new_world.step_counter,
        }
        if wcfg.debug_mode:
            world_info.update(
                trades=book.trades, total_msgs=combined,
                lob_state=bk.get_l2_state(wcfg, 10, new_world.asks,
                                          new_world.bids))
        info = {"world": world_info, "agents": infos_list}

        obs_list = []
        for i, agent in enumerate(self.agent_types):
            if "obs" in self._ablate:
                obs_list.append(self._zero_obs(i))
                continue
            obs = jax.vmap(
                agent.get_observation,
                in_axes=(None, 0, 0, None, None, None, None, None, None))(
                new_world, new_agent_states[i], params.agents[i], combined,
                old_time, old_mid, lob_state_before, agent.cfg.normalize, True)
            mask = jnp.logical_and(dones_list[i], jnp.logical_not(done_all))

            def apply_mask(o):
                m = jnp.reshape(mask, mask.shape + (1,) * (o.ndim - mask.ndim))
                return jnp.where(m, jnp.zeros_like(o), o)

            obs_list.append(jax.tree.map(apply_mask, obs))

        return obs_list, new_state, rewards, dones, info

    @partial(jax.jit, static_argnums=(0,))
    def step_env(self, key: Array, state: MultiAgentState, actions: List[Any],
                 params: MultiAgentParams):
        """Per-env step (ref: marl_env.py:241-662); vmap-compatible."""
        wcfg = self.wcfg
        world = state.world
        # independent keys: reusing one key would correlate the engine's
        # random-cancel draws with the action/shuffle randomness
        key_build, key_engine = jax.random.split(key)
        combined, new_id_counter, lob_before = self._build_messages(
            key_build, state, actions, params)
        book0 = bk.BookState(asks=world.asks, bids=world.bids,
                             trades=bk.init_trades(wcfg.n_trades))
        book, (bestasks, bestbids) = engine.process_messages_save_bidask(
            wcfg, key_engine, combined, book0, self.num_msgs_per_step)
        return self._post_engine(state, params, book, bestasks, bestbids,
                                 combined, lob_before, new_id_counter)

    # ------------------------------------------------------------------
    # Batched step: routes the message scan through the fused Pallas
    # kernel (TPU-only hot path; identical semantics for cancel modes <= 1)
    # ------------------------------------------------------------------

    @property
    def pallas_ok(self) -> bool:
        # every cancel mode is kernel-eligible: the random-cancel fallbacks
        # consume per-message uniforms computed from the same keys the XLA
        # path would split (ops/book_kernel.py::_per_message_uniforms).
        # Exception: debug_mode + random cancels stays on the XLA path so
        # the debug trade log keeps its historical exactness (the kernel's
        # records path caps fills per message at REC_K).
        if (self.wcfg.debug_mode
                and self.wcfg.cancel_mode >= CancelMode.CANCEL_UNIFORM):
            return False
        if self._disable_pallas:
            return False
        return (self.wcfg.n_orders % 8 == 0
                and (jax.default_backend() == "tpu"
                     or self._force_pallas_interpret))

    @partial(jax.jit, static_argnums=(0,))
    def step_vec(self, key: Array, states: MultiAgentState,
                 actions: List[Any], params: MultiAgentParams):
        """Batched auto-resetting step over a leading env axis.

        Pre/post stages vmap over envs; the engine runs as one fused Pallas
        kernel over the whole batch when eligible (TPU, deterministic cancel
        modes, batch a multiple of 128), else the vmapped XLA scan.
        """
        E = states.world.step_counter.shape[0]
        key, key_step, key_reset = jax.random.split(key, 3)
        step_keys = jax.random.split(key_step, E)
        reset_keys = jax.random.split(key_reset, E)
        return self.step_vec_presplit(step_keys, reset_keys, states,
                                      actions, params)

    @partial(jax.jit, static_argnums=(0,))
    def step_vec_presplit(self, step_keys: Array, reset_keys: Array,
                          states: MultiAgentState, actions: List[Any],
                          params: MultiAgentParams):
        """``step_vec`` with the per-env key arrays supplied by the caller.

        The split exists for multi-device sharding: per-env keys ride WITH
        their envs through a ``shard_map`` over the batch axis
        (parallel/shard_step.py::make_sharded_step), so each shard computes
        exactly the rows the unsharded call would — bit-equal results while
        the Pallas engine runs per-shard instead of being replicated by
        GSPMD (which cannot partition a pallas_call).
        """
        from vit_marl_tpu.env.common import summary_from_aggs
        from vit_marl_tpu.ops.book_kernel import (
            ENV_BLOCK,
            finalize_trade_log_from_records,
            pallas_process_step,
            pallas_process_step_aggs,
        )

        wcfg = self.wcfg
        E = states.world.step_counter.shape[0]
        # per-env (build, engine) keys, derived exactly like step_env's
        # internal split so step_vec stays bit-equal to vmap(step_env);
        # engine randomness must not correlate with the build/shuffle draws
        sub = jax.vmap(lambda k: jax.random.split(k))(step_keys)
        build_keys, engine_keys = sub[:, 0], sub[:, 1]

        if "build" in self._ablate:
            combined = jnp.zeros((E, self.num_msgs_per_step, 8), jnp.int32)
            new_id_counter = states.world.order_id_counter
            lob_before = None
        else:
            combined, new_id_counter, lob_before = jax.vmap(
                self._build_messages,
                in_axes=(0, 0, [0] * len(self.agent_types), None))(
                build_keys, states, actions, params)

        book0 = bk.BookState(
            asks=states.world.asks, bids=states.world.bids,
            trades=jnp.broadcast_to(bk.init_trades(wcfg.n_trades),
                                    (E, wcfg.n_trades, 8)))
        summaries = None
        if self.pallas_ok and E % ENV_BLOCK == 0:
            prev = jnp.stack([states.world.best_asks[:, -1, 0],
                              states.world.best_bids[:, -1, 0]], axis=1)
            interp = self._force_pallas_interpret
            # the deterministic modes consume no randomness — keep their
            # call signature (and compiled program) unchanged
            ekeys = (engine_keys
                     if wcfg.cancel_mode >= CancelMode.CANCEL_UNIFORM
                     else None)
            if wcfg.debug_mode:
                # debug wants a full trade log: records path (fills per
                # message capped at REC_K; counts expose truncation)
                book, (bestasks, bestbids), (recs, counts) = \
                    pallas_process_step(wcfg, combined, book0, prev, interp,
                                        engine_keys=ekeys)
                trades = jax.vmap(finalize_trade_log_from_records)(
                    book0.trades, recs, combined, counts)
                book = book.replace(trades=trades)
            else:
                # training hot path: exact in-kernel per-trader aggregates —
                # no records DMA, no trade-log finalize, rewards consume sums
                tids = jnp.concatenate(
                    [jnp.atleast_1d(p.trader_id) for p in params.agents])
                book, (bestasks, bestbids), (per_agent, totals) = \
                    pallas_process_step_aggs(wcfg, combined, book0, tids,
                                             prev, wcfg.tick_size, interp,
                                             engine_keys=ekeys)
                summaries, off = [], 0
                for n in self.n_per_type:
                    summaries.append(summary_from_aggs(
                        per_agent[:, off:off + n],
                        jnp.broadcast_to(totals[:, None, :],
                                         (E, n, totals.shape[-1]))))
                    off += n
            ffill_done = True
        else:
            ffill_done = False
            book, (bestasks, bestbids) = jax.vmap(
                lambda k, m, b: engine.process_messages_save_bidask(
                    wcfg, k, m, b, self.num_msgs_per_step))(
                engine_keys, combined, book0)

        post = partial(self._post_engine, skip_ffill=ffill_done)
        obs_st, st_st, rewards, dones, infos = jax.vmap(
            post, in_axes=(0, None, 0, 0, 0, 0,
                           0 if lob_before is not None else None, 0,
                           None if summaries is None else 0))(
            states, params, book, bestasks, bestbids, combined, lob_before,
            new_id_counter, summaries)

        if "reset" in self._ablate:
            return obs_st, st_st, rewards, dones, infos
        # vectorized auto-reset (ref: marl_env.py:737-766)
        obs_re, st_re = jax.vmap(self.reset_env, in_axes=(0, None))(
            reset_keys, params)
        done = dones["__all__"]

        def sel(x, y):
            d = jnp.reshape(done, done.shape + (1,) * (x.ndim - 1))
            return jnp.where(d, x, y)

        new_states = jax.tree.map(sel, st_re, st_st)
        obs = jax.tree.map(sel, obs_re, obs_st)
        return obs, new_states, rewards, dones, infos

    # ------------------------------------------------------------------

    @partial(jax.jit, static_argnums=(0,))
    def reset(self, key: Array, params: MultiAgentParams):
        return self.reset_env(key, params)

    @partial(jax.jit, static_argnums=(0,))
    def step(self, key: Array, state: MultiAgentState, actions: List[Any],
             params: MultiAgentParams):
        """Step with in-graph auto-reset (ref: marl_env.py:737-766)."""
        key, key_reset = jax.random.split(key)
        obs_st, st_st, rewards, dones, infos = self.step_env(
            key, state, actions, params)
        obs_re, st_re = self.reset_env(key_reset, params)
        done = dones["__all__"]
        states = jax.tree.map(lambda x, y: jax.lax.select(done, x, y),
                              st_re, st_st)
        obs = jax.tree.map(lambda x, y: jax.lax.select(done, x, y),
                           obs_re, obs_st)
        return obs, states, rewards, dones, infos

    def action_space(self):
        return self.action_spaces

    def observation_space(self):
        return self.observation_spaces


def make_world_env(ma_config: Optional[MultiAgentConfig] = None,
                   data: Optional[LoadedData] = None,
                   key: Optional[Array] = None) -> WorldEnv:
    """Convenience constructor with the default 2-player MM+Exec setup."""
    return WorldEnv(ma_config or MultiAgentConfig(), data=data, key=key)
