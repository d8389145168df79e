"""State and parameter pytrees for the environment layer.

Rebuild of the reference's schema (ref: gymnax_exchange/jaxen/
StatesandParams.py:58-162) on top of the struct-of-arrays book:

- :class:`LoadedState`  — per-window precomputed reset state
- :class:`WorldState`   — shared market state
- :class:`MMState` / :class:`ExecState` — per-agent-instance states
- :class:`MultiAgentState` — world + tuple of per-type stacked agent states
- parameter pytrees (data arrays + per-instance parameter vectors)
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
from flax import struct

from vit_marl_tpu.lob.book import SideState

Array = jax.Array


@struct.dataclass
class LoadedState:
    """Replayed book state at a window start (ref: StatesandParams.py:58-68)."""

    asks: SideState
    bids: SideState
    trades: Array           # (n_trades, 8)
    init_time: Array        # (2,) [s, ns]
    window_index: Array
    max_steps_in_episode: Array
    start_index: Array      # index of first data message of the window
    step_counter: Array


@struct.dataclass
class WorldState(LoadedState):
    """Shared market state (ref: StatesandParams.py:71-80)."""

    best_bids: Array        # (num_msgs_per_step, 2) [price, quant]
    best_asks: Array        # (num_msgs_per_step, 2)
    time: Array             # (2,)
    order_id_counter: Array
    mid_price: Array        # float32
    delta_time: Array       # float32


@struct.dataclass
class MMState:
    """Market-making agent state (ref: StatesandParams.py:92-97)."""

    inventory: Array
    total_PnL: Array
    cash_balance: Array


@struct.dataclass
class ExecState:
    """Execution agent state (ref: StatesandParams.py:99-114)."""

    init_price: Array
    task_to_execute: Array
    quant_executed: Array
    total_revenue: Array
    drift_return: Array
    advantage_return: Array
    slippage_rm: Array
    price_adv_rm: Array
    price_drift_rm: Array
    vwap_rm: Array
    is_sell_task: Array
    trade_duration: Array


@struct.dataclass
class MultiAgentState:
    world: WorldState
    agents: Tuple[Any, ...]   # per-type stacked agent states


# --------------------------------------------------------------------------
# Params
# --------------------------------------------------------------------------


@struct.dataclass
class WorldParams:
    """Loaded data as pytree params (ref: StatesandParams.py LoadedEnvParams)."""

    message_data: Array       # (N, 8) int32
    init_states: LoadedState  # stacked over windows


@struct.dataclass
class MMParams:
    """Per-instance market-maker params, leading axis = instances."""

    trader_id: Array
    time_delay_obs_act: Array
    normalize: Array


@struct.dataclass
class ExecParams:
    """Per-instance execution params, leading axis = instances.

    ``trader_id``/``task_size``/``reward_lambda``/``time_delay_obs_act``
    are consumed per instance (heterogeneous agents may override the
    vectors).  ``normalize`` is carried for reference parity but the obs
    pipeline branches on the STATIC ``cfg.normalize`` (shape-changing
    normalization cannot be a traced per-instance value)."""

    trader_id: Array
    task_size: Array
    reward_lambda: Array
    time_delay_obs_act: Array
    normalize: Array


@struct.dataclass
class MultiAgentParams:
    world: WorldParams
    agents: Tuple[Any, ...]
