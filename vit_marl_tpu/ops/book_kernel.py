"""Fused Pallas kernel: a whole step's message scan in VMEM.

The XLA engine (:mod:`vit_marl_tpu.lob.engine`) materializes every
intermediate of every message to HBM — ~50 buffers per message over a
112-message step.  This kernel keeps the entire book resident in VMEM
across the scan and lowers each message to ~100 register-level tile ops:

- layout: slots on sublanes, environments on lanes — every book field is a
  ``(slots, 128-env)`` int32 tile; per-message fields are ``(1, 128)``
  row vectors broadcast across slots;
- matching uses a log-shift prefix sum (``pltpu.roll``), insertion the same
  hole-arena single-shift scheme as the XLA engine;
- per-message best bid/ask write to a small VMEM output;
- per-message match records stream to an HBM output through a
  double-buffered async DMA, so trade-log construction (one gather) stays
  outside the kernel (:func:`finalize_trade_log_from_records`).

Semantics are identical to ``engine._process_message_core`` for every
cancel mode.  The random-cancel fallbacks (CANCEL_UNIFORM /
CANCEL_UNIFORM_AND_LARGE) consume one uniform draw per message computed
OUTSIDE the kernel from the same per-message PRNG keys the XLA engine
splits (``u = uniform(split(key_m)[0])``, see ``engine._random_id_pick``),
so both paths see bit-identical randomness; the candidate CDF is a prefix
sum of 0/1 weights (exact in f32), making the pick itself bit-exact.  The
stages are statically gated on ``cfg.cancel_mode`` — deterministic modes
compile the exact same kernel as before.  Differential tests assert
bit-equality of final books, best-price sequences and trade logs against
the XLA engine for all modes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_marl_tpu.config import CancelMode, EngineConfig, EMPTY_SLOT
from vit_marl_tpu.lob.book import BookState, SideState

Array = jax.Array

ENV_BLOCK = 128      # environments per kernel instance (lane dimension)
N_REC_PLANES = 4     # record planes: price, signed quant, passive oid, tid

# field indices inside the stacked (2, 6, slots, E) book tensor
PRICE, QUANT, OID, TID, TS, TNS = range(6)
ASK, BID = 0, 1


def _prefix_sum(x: Array) -> Array:
    """Inclusive prefix sum along axis 0 (sublanes) via log-shifts."""
    n = x.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    k = 1
    while k < n:
        x = x + jnp.where(idx >= k, pltpu.roll(x, k, 0), 0)
        k *= 2
    return x


def _first_idx(mask: Array, default: int) -> Array:
    """(1, E) index of the first True along axis 0, else ``default``."""
    iota = jax.lax.broadcasted_iota(jnp.int32, mask.shape, 0)
    return jnp.min(jnp.where(mask, iota, default), axis=0, keepdims=True)


def _last_idx(mask: Array, default: int) -> Array:
    iota = jax.lax.broadcasted_iota(jnp.int32, mask.shape, 0)
    return jnp.max(jnp.where(mask, iota, default), axis=0, keepdims=True)


REC_GROUP = 16       # messages per record-DMA (amortises DMA overhead)
REC_K = 16           # max recorded fills per message (in-kernel compaction)

# per-agent aggregate stat planes (mirrors env.common.TradeSummary; all
# notionals in tick units — raw price*quant wraps int32 at LOBSTER scale)
AGG_STATS = 8        # buy_q, sell_q, buy_pqt, sell_pqt, a_q, a_pqt, dur, signed
AGG_TOTALS = 2       # total_q, total_pq_tick


def _make_kernel(cfg: EngineConfig, n_msgs: int, n_slots: int,
                 n_agg: int = 0, want_records: bool = True, tick: int = 100,
                 rec_k: int = REC_K):
    """Build the fused scan kernel.

    Two trade outputs, either or both:
    - ``want_records``: per-message rank-compacted match records streamed to
      HBM (trade-log reconstruction; capped at REC_K fills per message);
    - ``n_agg > 0``: exact in-kernel per-trader aggregate sums in VMEM (the
      TradeSummary stats rewards consume) — no cap, no DMA, no trade log.
    """
    maxint = cfg.maxint
    include_inits = cfg.cancel_mode >= CancelMode.INCLUDE_INITS
    cancel_uniform = cfg.cancel_mode >= CancelMode.CANCEL_UNIFORM
    cancel_large = cfg.cancel_mode >= CancelMode.CANCEL_UNIFORM_AND_LARGE
    n_groups = (n_msgs + REC_GROUP - 1) // REC_GROUP
    n_acc = AGG_STATS * n_agg + AGG_TOTALS

    def kernel(*refs):
        # random-cancel modes prepend a (M, E) f32 uniform-draw input
        if cancel_uniform:
            u_ref, *refs = refs
        else:
            u_ref = None
        if want_records and n_agg:
            (msgs_ref, book_in_ref, prev_ref, tids_ref, book_out_ref,
             bidask_ref, rec_ref, agg_ref, book, rec_stage, send_sems,
             acc) = refs
        elif want_records:
            (msgs_ref, book_in_ref, prev_ref, book_out_ref, bidask_ref,
             rec_ref, book, rec_stage, send_sems) = refs
            tids_ref = agg_ref = acc = None
        else:
            (msgs_ref, book_in_ref, prev_ref, tids_ref, book_out_ref,
             bidask_ref, agg_ref, book, acc) = refs
            rec_ref = rec_stage = send_sems = None
        S = n_slots
        blk = pl.program_id(0)
        iota = jax.lax.broadcasted_iota(jnp.int32, (S, ENV_BLOCK), 0)

        book[...] = book_in_ref[...]
        if n_agg:
            acc[...] = jnp.zeros((n_acc, ENV_BLOCK), jnp.int32)

        def msg_body(m, prev):
            prev_a, prev_b = prev
            msg = msgs_ref[pl.ds(m, 1)].reshape(8, ENV_BLOCK)
            t = msg[0:1, :]
            s = msg[1:2, :]
            quant = msg[2:3, :]
            price = msg[3:4, :]
            oid = msg[4:5, :]
            tid = msg[5:6, :]
            ts = msg[6:7, :]
            tns = msg[7:8, :]

            index = ((((s == -1) & (t == 1)) | ((s == 1) & (t == 4))) * 0
                     + (((s == 1) & (t == 1)) | ((s == -1) & (t == 4))) * 1
                     + (((s == -1) & (t == 2)) | ((s == -1) & (t == 3))) * 2
                     + (((s == 1) & (t == 2)) | ((s == 1) & (t == 3))) * 3
                     + ((s == 0) & (t == 0)) * 4)
            is_bid_lim = index == 1
            is_lim = (index == 0) | is_bid_lim
            is_bid_cancel = index == 3
            is_cancel = (index == 2) | is_bid_cancel
            bid_frame = is_bid_lim | is_bid_cancel    # (1, E)

            def read_xy(f):
                a = book[ASK, f]
                b = book[BID, f]
                return jnp.where(bid_frame, a, b), jnp.where(bid_frame, b, a)

            Xp, Yp = read_xy(PRICE)
            Xq, Yq = read_xy(QUANT)
            Xo, Yo = read_xy(OID)
            Xt, Yt = read_xy(TID)
            Xs, Ys = read_xy(TS)
            Xn, Yn = read_xy(TNS)

            # ---- cancel pass on Y (identity unless cancelling) ----
            # NOTE: within the message loop only the PRICE plane marks
            # emptiness; quant/oid/tid/time wipes are deferred to one
            # canonicalisation after the loop (saves ~10 tile ops/message).
            # Holes may carry stale values, so every read below guards on
            # occupancy (price != EMPTY_SLOT).
            c_quant = jnp.where(is_cancel, quant, 0)
            c_oid = jnp.where(is_cancel, oid, 0)
            occ_y0 = Yp != EMPTY_SLOT
            idx1 = _first_idx((Yo == c_oid) & occ_y0, S)
            if include_inits:
                m2 = ((Yp == price) & (Yo <= cfg.init_id) & (Yq >= c_quant)
                      & occ_y0)
                idx2 = _first_idx(m2, S)
                cidx = jnp.where(idx1 < S, idx1, idx2)
            else:
                cidx = idx1
            if cancel_uniform:
                # uniform pick among candidates, by order id (mirrors
                # engine._random_id_pick bit-exactly: same outside-computed
                # uniform draw; the CDF is a prefix sum of 0/1 weights —
                # exact in f32 — and the picked slot redirects to the FIRST
                # live slot holding that oid, which matters for duplicate
                # ids like the shared INITID).  Stale holes carry old
                # prices/oids in-kernel (deferred wipes), so every mask
                # guards on occupancy — the XLA engine's fully-wiped holes
                # (price -1, oid -1) can never match a real cancel price.
                u_raw = u_ref[pl.ds(m, 1)].reshape(1, ENV_BLOCK)   # (1, E)

                def _cdf_pick(cand):
                    w = cand.astype(jnp.float32)
                    total = jnp.sum(w, axis=0, keepdims=True)
                    uu = u_raw * jnp.maximum(total, 1.0)
                    cdf = _prefix_sum(w)
                    hit = cdf > uu
                    # f32 corner: u*total can round UP to total (u = largest
                    # f32 < 1, power-of-two candidate count), making `hit`
                    # all-False.  The engine's argmax then yields slot 0 and
                    # its masked-ids read gives ids[0] (= oid if slot 0 is a
                    # candidate, else 0 -> no-op); mirror those semantics
                    # exactly instead of _first_idx's silent S default.
                    pick = jnp.where(jnp.any(hit, axis=0, keepdims=True),
                                     _first_idx(hit, S), 0)
                    chosen = jnp.sum(
                        jnp.where((iota == pick) & cand, Yo, 0),
                        axis=0, keepdims=True)
                    idx = _first_idx((Yo == chosen) & occ_y0, S)
                    return jnp.where(total > 0, idx, S)

                m3 = ((Yp == price) & (Yq >= c_quant) & occ_y0
                      & (Yo != 0))
                cidx = jnp.where(cidx < S, cidx, _cdf_pick(m3))
                if cancel_large:
                    m3b = (Yp == price) & occ_y0 & (Yo != 0)
                    cidx = jnp.where(cidx < S, cidx, _cdf_pick(m3b))
            found = cidx < S
            at_pos = iota == cidx
            q_at = jnp.sum(jnp.where(at_pos, Yq, 0), axis=0, keepdims=True)
            new_q = q_at - c_quant
            dec = found & at_pos
            Yq = jnp.where(dec, new_q, Yq)
            wipe_c = dec & (new_q <= 0)
            Yp = jnp.where(wipe_c, EMPTY_SLOT, Yp)

            # ---- limit pass: match against X ----
            lim_quant = jnp.where(is_lim, quant, 0)
            occupied = Xp != EMPTY_SLOT
            crossing = occupied & ((bid_frame & (Xp <= price))
                                   | (~bid_frame & (Xp >= price)))
            q = jnp.where(crossing, Xq, 0)
            cum = _prefix_sum(q)
            matched = jnp.where(crossing,
                                jnp.clip(lim_quant - (cum - q), 0, q), 0)
            total_matched = jnp.sum(matched, axis=0, keepdims=True)
            was = matched > 0

            n_new = None
            if want_records:
                # records: compact the matched slots to REC_K rank-ordered
                # rows in VMEM (masked rank-select reduces), staged in groups
                # of REC_GROUP messages and DMA'd to HBM double-buffered.
                grp = m // REC_GROUP
                slot = grp % 2
                within = m % REC_GROUP

                @pl.when((within == 0) & (grp >= 2))
                def _():
                    pltpu.make_async_copy(rec_stage.at[slot],
                                          rec_ref.at[blk, grp - 2],
                                          send_sems.at[slot]).wait()

                rank = _prefix_sum(was.astype(jnp.int32))     # inclusive
                n_new = jnp.max(rank, axis=0, keepdims=True)  # fills this msg
                # clear the validity (price) plane, then fill only the ranks
                # that occur anywhere in the block (typically <= 4 of rec_k)
                rec_stage[slot, within, 0] = jnp.full(
                    (rec_k, ENV_BLOCK), EMPTY_SLOT, jnp.int32)
                n_max = jnp.max(n_new)
                for k in range(rec_k):
                    @pl.when(k < n_max)
                    def _(k=k):
                        sel = was & (rank == k + 1)
                        has_k = k + 1 <= n_new                # (1, E)
                        p_k = jnp.sum(jnp.where(sel, Xp, 0), axis=0,
                                      keepdims=True)
                        q_k = -s * jnp.sum(jnp.where(sel, matched, 0), axis=0,
                                           keepdims=True)
                        o_k = jnp.sum(jnp.where(sel, Xo, 0), axis=0,
                                      keepdims=True)
                        t_k = jnp.sum(jnp.where(sel, Xt, 0), axis=0,
                                      keepdims=True)
                        rec_stage[slot, within, 0, k:k + 1] = jnp.where(
                            has_k, p_k, EMPTY_SLOT)
                        rec_stage[slot, within, 1, k:k + 1] = q_k
                        rec_stage[slot, within, 2, k:k + 1] = o_k
                        rec_stage[slot, within, 3, k:k + 1] = t_k

                @pl.when(within == REC_GROUP - 1)
                def _():
                    pltpu.make_async_copy(rec_stage.at[slot],
                                          rec_ref.at[blk, grp],
                                          send_sems.at[slot]).start()

            if n_agg:
                # exact per-trader aggregates (env.common.TradeSummary): the
                # trade log never materialises — rewards consume these sums.
                # Buy/sell role per fill: the aggressor buys iff it is the
                # bid side (s == 1); passive fills are the opposite role.
                @pl.when(jnp.max(total_matched) > 0)
                def _():
                    def rsum(mask, v):
                        return jnp.sum(jnp.where(mask, v, 0), axis=0,
                                       keepdims=True)

                    mpt = matched * (Xp // tick)
                    mt = matched * Xt
                    s_pos = s == 1                 # (1, E)

                    def bump(i, v):
                        acc[i:i + 1] = acc[i:i + 1] + v

                    bump(n_acc - 2, total_matched)
                    bump(n_acc - 1, rsum(was, mpt))
                    for k in range(n_agg):
                        tk = tids_ref[k:k + 1, :]       # (1, E)
                        pmask = was & (Xt == tk)
                        agr_rows = was & (tid == tk)
                        involved = pmask | agr_rows

                        @pl.when(jnp.max(involved.astype(jnp.int32)) > 0)
                        def _(k=k, tk=tk, pmask=pmask, agr_rows=agr_rows,
                              involved=involved):
                            buy_rows = (s_pos & agr_rows) | (~s_pos & pmask)
                            sell_rows = (s_pos & pmask) | (~s_pos & agr_rows)
                            o = AGG_STATS * k
                            bump(o + 0, rsum(buy_rows, matched))
                            bump(o + 1, rsum(sell_rows, matched))
                            bump(o + 2, rsum(buy_rows, mpt))
                            bump(o + 3, rsum(sell_rows, mpt))
                            bump(o + 4, rsum(involved, matched))
                            bump(o + 5, rsum(involved, mpt))
                            bump(o + 6, rsum(involved, mt))
                            bump(o + 7, -s * rsum(involved, matched))

            Xq = Xq - matched
            wipe_m = was & (Xq <= 0)
            Xp = jnp.where(wipe_m, EMPTY_SLOT, Xp)

            # ---- insert remainder into Y (hole-arena sorted insert) ----
            add_q = jnp.maximum(0, lim_quant - total_matched)
            do_ins = add_q > 0
            occ_y = Yp != EMPTY_SLOT
            hole = ~occ_y
            # Y is the bid side when bid_frame: descending price key
            pk = jnp.where(bid_frame, -Yp, Yp)
            nk = jnp.where(bid_frame, -price, price)
            before = occ_y & ((pk < nk) | ((pk == nk) & (
                (Ys < ts) | ((Ys == ts) & (Yn <= tns)))))
            worse = occ_y & ~before
            fw = _first_idx(worse, S)
            lb = _last_idx(before, -1)
            in_win = hole & (iota > lb) & (iota < fw)
            case_a = jnp.any(in_win, axis=0, keepdims=True)
            pos_a = _first_idx(in_win, S)
            hole_after = hole & (iota >= fw)
            case_bh = jnp.any(hole_after, axis=0, keepdims=True)
            ha = jnp.where(case_bh, _first_idx(hole_after, S - 1), S - 1)
            hole_before = hole & (iota <= lb)
            case_c = jnp.any(hole_before, axis=0, keepdims=True)
            hb = _last_idx(hole_before, 0)
            use_b = ~case_a & (case_bh | ~case_c)
            fw_b = jnp.where(case_bh, fw, jnp.minimum(fw, S - 1))

            def place(x, val):
                out_a = jnp.where(iota == pos_a, val, x)
                right = pltpu.roll(x, 1, 0)
                out_b = jnp.where((iota > fw_b) & (iota <= ha), right, x)
                out_b = jnp.where(iota == fw_b, val, out_b)
                left = pltpu.roll(x, n_slots - 1, 0)  # circular -1
                out_c = jnp.where((iota >= hb) & (iota < lb), left, x)
                out_c = jnp.where(iota == lb, val, out_c)
                out = jnp.where(case_a, out_a,
                                jnp.where(use_b, out_b, out_c))
                return jnp.where(do_ins, out, x)

            Yp = place(Yp, price)
            Yq = place(Yq, add_q)
            Yo = place(Yo, oid)
            Yt = place(Yt, tid)
            Ys = place(Ys, ts)
            Yn = place(Yn, tns)

            # ---- write back through the frame ----
            book[ASK, PRICE] = jnp.where(bid_frame, Xp, Yp)
            book[BID, PRICE] = jnp.where(bid_frame, Yp, Xp)
            book[ASK, QUANT] = jnp.where(bid_frame, Xq, Yq)
            book[BID, QUANT] = jnp.where(bid_frame, Yq, Xq)
            book[ASK, OID] = jnp.where(bid_frame, Xo, Yo)
            book[BID, OID] = jnp.where(bid_frame, Yo, Xo)
            book[ASK, TID] = jnp.where(bid_frame, Xt, Yt)
            book[BID, TID] = jnp.where(bid_frame, Yt, Xt)
            book[ASK, TS] = jnp.where(bid_frame, Xs, Ys)
            book[BID, TS] = jnp.where(bid_frame, Ys, Xs)
            book[ASK, TNS] = jnp.where(bid_frame, Xn, Yn)
            book[BID, TNS] = jnp.where(bid_frame, Yn, Xn)

            # ---- best bid/ask (ref: get_best_bid_and_ask_inclQuants) ----
            ap = book[ASK, PRICE]
            bp = book[BID, PRICE]
            best_a = jnp.min(jnp.where(ap == EMPTY_SLOT, maxint, ap),
                             axis=0, keepdims=True)
            best_a = jnp.where(best_a == maxint, EMPTY_SLOT, best_a)
            best_b = jnp.max(bp, axis=0, keepdims=True)
            a_q = jnp.sum(jnp.where(ap == best_a, book[ASK, QUANT], 0),
                          axis=0, keepdims=True)
            b_q = jnp.sum(jnp.where(bp == best_b, book[BID, QUANT], 0),
                          axis=0, keepdims=True)
            # forward-fill invalid best prices across messages, seeded with
            # the previous step's last valid prices (in-kernel version of
            # env/common.py::ffill_best_prices, ref: marl_env.py:685-711)
            a_invalid = best_a == EMPTY_SLOT
            b_invalid = best_b == EMPTY_SLOT
            best_a = jnp.where(a_invalid, prev_a, best_a)
            a_q = jnp.where(a_invalid, 0, a_q)
            best_b = jnp.where(b_invalid, prev_b, best_b)
            b_q = jnp.where(b_invalid, 0, b_q)

            planes = [best_a, a_q, best_b, b_q]
            if want_records:
                planes.append(n_new)
            row = jnp.concatenate(planes, axis=0)
            bidask_ref[pl.ds(m, 1)] = row.reshape(1, len(planes), ENV_BLOCK)
            return (best_a, best_b)

        prev0 = (prev_ref[0:1, :], prev_ref[1:2, :])
        jax.lax.fori_loop(0, n_msgs, msg_body, prev0)
        if want_records:
            # flush a trailing partial group, then drain outstanding DMAs
            if n_msgs % REC_GROUP != 0:
                last_grp = n_msgs // REC_GROUP
                pltpu.make_async_copy(rec_stage.at[last_grp % 2],
                                      rec_ref.at[blk, last_grp],
                                      send_sems.at[last_grp % 2]).start()
            for s_ in range(2):
                last_grp_s = n_groups - 1 - ((n_groups - 1 - s_) % 2)
                if last_grp_s >= 0:
                    pltpu.make_async_copy(rec_stage.at[s_],
                                          rec_ref.at[blk, last_grp_s],
                                          send_sems.at[s_]).wait()
        if n_agg:
            agg_ref[...] = acc[...]
        # canonicalise: restore the all-planes-empty invariant at holes
        # (deferred from the per-message wipes; the env reads tid/quant
        # directly, e.g. make_cancel_msgs matches side.tid)
        for side_i in (ASK, BID):
            hole_f = book[side_i, PRICE] == EMPTY_SLOT
            for f in (QUANT, OID, TID, TS, TNS):
                book[side_i, f] = jnp.where(hole_f, EMPTY_SLOT,
                                            book[side_i, f])
        book_out_ref[...] = book[...]

    return kernel


def _per_message_uniforms(engine_keys: Array, n_msgs: int) -> Array:
    """(M, E) f32 uniform draws matching the XLA engine's randomness.

    The engine splits one key per message (``process_messages*``) and
    ``_random_id_pick`` then draws ``uniform(split(key_m)[0])``.  Computing
    the identical draws outside the kernel keeps the random-cancel pick
    bit-exact between the two paths.
    """
    def env_u(k):
        mk = jax.random.split(k, n_msgs)
        return jax.vmap(
            lambda kk: jax.random.uniform(jax.random.split(kk)[0]))(mk)

    return jnp.transpose(jax.vmap(env_u)(engine_keys), (1, 0))


def _uniform_input(cfg: EngineConfig, engine_keys, n_msgs: int):
    """([input], [in_spec]) for the random-cancel uniforms, or ([], [])."""
    if cfg.cancel_mode < CancelMode.CANCEL_UNIFORM:
        return [], []
    if engine_keys is None:
        raise ValueError(
            "cancel_mode >= CANCEL_UNIFORM needs per-env engine keys: pass "
            "engine_keys=(E,) PRNG keys (the same keys the XLA fallback "
            "would consume)")
    return ([_per_message_uniforms(engine_keys, n_msgs)],
            [pl.BlockSpec((n_msgs, ENV_BLOCK), lambda i: (0, i),
                          memory_space=pltpu.VMEM)])


@functools.partial(jax.jit, static_argnums=(0, 4, 5))
def pallas_process_step(cfg: EngineConfig, msgs: Array, book: BookState,
                        prev_prices: Array = None,
                        interpret: bool = False,
                        rec_k: int = REC_K,
                        engine_keys: Array = None
                        ) -> Tuple[BookState, Tuple[Array, Array], Array]:
    """Process one step's messages for a batch of environments.

    Args:
      msgs: (E, M, 8) int32 — per-env message streams.
      book: batched BookState with leading env axis (E, slots) per field.
      prev_prices: (E, 2) int32 [last ask, last bid] seeding the in-kernel
        best-price forward fill (omit for a -1 seed).
      rec_k: max recorded fills per message.  A message filling more than
        ``rec_k`` resting orders has its *records* truncated (the raw
        ``fill_counts`` output exposes the true count, so truncation is
        detectable); the book update itself is always exact.  Raise it
        (up to n_orders) when deep-sweep trade logs must be exact.
      engine_keys: (E,) per-env PRNG keys — required only for the
        random-cancel modes, matching the XLA engine's draws.

    Returns:
      (book', (bestasks (E, M, 2), bestbids (E, M, 2)) forward-filled,
       (records (E, M, rec_k, 4), fill_counts (E, M))).
    """
    E, M, _ = msgs.shape
    S = book.asks.price.shape[-1]
    assert E % ENV_BLOCK == 0, f"batch {E} must be a multiple of {ENV_BLOCK}"
    n_blocks = E // ENV_BLOCK

    # pack to kernel layout: (2, 6, S, E)
    def stack_side(side: SideState) -> Array:
        return jnp.stack([side.price, side.quant, side.oid, side.tid,
                          side.time_s, side.time_ns], axis=0)  # (6, E, S)

    packed = jnp.stack([stack_side(book.asks), stack_side(book.bids)], axis=0)
    packed = jnp.transpose(packed, (0, 1, 3, 2))               # (2,6,S,E)
    msgs_k = jnp.transpose(msgs, (1, 2, 0)).astype(jnp.int32)  # (M,8,E)
    if prev_prices is None:
        prev_prices = jnp.full((E, 2), EMPTY_SLOT, jnp.int32)
    prev_k = jnp.transpose(prev_prices, (1, 0)).astype(jnp.int32)  # (2,E)

    u_in, u_spec = _uniform_input(cfg, engine_keys, M)
    kernel = _make_kernel(cfg, M, S, rec_k=rec_k)
    book_out, bidask, records = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=u_spec + [
            pl.BlockSpec((M, 8, ENV_BLOCK), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 6, S, ENV_BLOCK), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, ENV_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((2, 6, S, ENV_BLOCK), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, 5, ENV_BLOCK), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((2, 6, S, E), jnp.int32),
            jax.ShapeDtypeStruct((M, 5, E), jnp.int32),
            jax.ShapeDtypeStruct(
                (n_blocks, (M + REC_GROUP - 1) // REC_GROUP, REC_GROUP,
                 N_REC_PLANES, rec_k, ENV_BLOCK), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 6, S, ENV_BLOCK), jnp.int32),
            pltpu.VMEM((2, REC_GROUP, N_REC_PLANES, rec_k, ENV_BLOCK),
                       jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*u_in, msgs_k, packed, prev_k)

    book_out = jnp.transpose(book_out, (0, 1, 3, 2))  # (2,6,E,S)

    def unpack_side(i: int) -> SideState:
        f = book_out[i]
        return SideState(price=f[PRICE], quant=f[QUANT], oid=f[OID],
                         tid=f[TID], time_s=f[TS], time_ns=f[TNS])

    new_book = BookState(asks=unpack_side(ASK), bids=unpack_side(BID),
                         trades=book.trades)
    bidask = jnp.transpose(bidask, (2, 0, 1))          # (E, M, 5)
    bestasks = bidask[:, :, 0:2]
    bestbids = bidask[:, :, 2:4]
    fill_counts = bidask[:, :, 4]                      # (E, M)
    # (n_blocks, n_groups, REC_GROUP, 4, REC_K, Eb) -> (E, M, REC_K, 4)
    nb, ng, rg, npl, k_, eb = records.shape
    records = records.reshape(nb, ng * rg, npl, k_, eb)
    records = jnp.transpose(records, (0, 4, 1, 3, 2)).reshape(
        E, ng * rg, k_, npl)[:, :M]
    return new_book, (bestasks, bestbids), (records, fill_counts)


@functools.partial(jax.jit, static_argnums=(0, 5, 6))
def pallas_process_step_aggs(cfg: EngineConfig, msgs: Array, book: BookState,
                             tids: Array, prev_prices: Array = None,
                             tick: int = 100, interpret: bool = False,
                             engine_keys: Array = None
                             ) -> Tuple[BookState, Tuple[Array, Array],
                                        Tuple[Array, Array]]:
    """Aggregate-mode step: per-trader TradeSummary sums instead of records.

    The trade log is never materialised: every fill is folded exactly into
    per-agent aggregate sums inside the kernel (no REC_K truncation, no
    records DMA, no finalize gather).  Rewards consume the sums directly.

    Args:
      tids: (n_agg,) int32 trader ids, ordered [type 0 instances..., type 1
        instances, ...] like ``WorldEnv.default_params`` assigns them.
      engine_keys: (E,) per-env PRNG keys — required only for the
        random-cancel modes, matching the XLA engine's draws.

    Returns:
      (book', (bestasks (E, M, 2), bestbids (E, M, 2)) forward-filled,
       (per_agent (E, n_agg, AGG_STATS), totals (E, AGG_TOTALS))).
    """
    E, M, _ = msgs.shape
    S = book.asks.price.shape[-1]
    assert E % ENV_BLOCK == 0, f"batch {E} must be a multiple of {ENV_BLOCK}"
    n_blocks = E // ENV_BLOCK
    n_agg = tids.shape[0]
    n_acc = AGG_STATS * n_agg + AGG_TOTALS

    def stack_side(side: SideState) -> Array:
        return jnp.stack([side.price, side.quant, side.oid, side.tid,
                          side.time_s, side.time_ns], axis=0)

    packed = jnp.stack([stack_side(book.asks), stack_side(book.bids)], axis=0)
    packed = jnp.transpose(packed, (0, 1, 3, 2))               # (2,6,S,E)
    msgs_k = jnp.transpose(msgs, (1, 2, 0)).astype(jnp.int32)  # (M,8,E)
    if prev_prices is None:
        prev_prices = jnp.full((E, 2), EMPTY_SLOT, jnp.int32)
    prev_k = jnp.transpose(prev_prices, (1, 0)).astype(jnp.int32)  # (2,E)
    tids_k = jnp.broadcast_to(tids.astype(jnp.int32)[:, None], (n_agg, E))

    u_in, u_spec = _uniform_input(cfg, engine_keys, M)
    kernel = _make_kernel(cfg, M, S, n_agg=n_agg, want_records=False,
                          tick=tick)
    book_out, bidask, aggs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=u_spec + [
            pl.BlockSpec((M, 8, ENV_BLOCK), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 6, S, ENV_BLOCK), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, ENV_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_agg, ENV_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((2, 6, S, ENV_BLOCK), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, 4, ENV_BLOCK), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_acc, ENV_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((2, 6, S, E), jnp.int32),
            jax.ShapeDtypeStruct((M, 4, E), jnp.int32),
            jax.ShapeDtypeStruct((n_acc, E), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 6, S, ENV_BLOCK), jnp.int32),
            pltpu.VMEM((n_acc, ENV_BLOCK), jnp.int32),
        ],
        interpret=interpret,
    )(*u_in, msgs_k, packed, prev_k, tids_k)

    book_out = jnp.transpose(book_out, (0, 1, 3, 2))  # (2,6,E,S)

    def unpack_side(i: int) -> SideState:
        f = book_out[i]
        return SideState(price=f[PRICE], quant=f[QUANT], oid=f[OID],
                         tid=f[TID], time_s=f[TS], time_ns=f[TNS])

    new_book = BookState(asks=unpack_side(ASK), bids=unpack_side(BID),
                         trades=book.trades)
    bidask = jnp.transpose(bidask, (2, 0, 1))          # (E, M, 4)
    bestasks = bidask[:, :, 0:2]
    bestbids = bidask[:, :, 2:4]
    aggs = jnp.transpose(aggs, (1, 0))                 # (E, n_acc)
    per_agent = aggs[:, :AGG_STATS * n_agg].reshape(E, n_agg, AGG_STATS)
    totals = aggs[:, AGG_STATS * n_agg:]
    return new_book, (bestasks, bestbids), (per_agent, totals)


def finalize_trade_log_from_records(trades0: Array, records: Array,
                                    msgs: Array,
                                    fill_counts: Array = None) -> Array:
    """Capped trade log from compacted kernel records + message fields.

    Per-env: records (M, REC_K, 4) planes (price, signed quant, pass_oid,
    pass_tid) joined with msgs (M, 8) for (agr_oid, time_s, time_ns,
    agr_tid).  Same semantics as ``engine.finalize_trade_log``.

    Because records are rank-compacted per message, the global-rank ->
    source-row mapping is closed-form given per-message fill counts: the
    t-th trade lives in the first message whose cumulative count exceeds t,
    at within-message row ``t - cum_before``.  ``fill_counts`` (M,) comes
    from the kernel; when omitted it is recomputed from record validity.
    NOTE: a single message records at most REC_K fills; counts are clamped
    accordingly (truncation is detectable from the raw kernel counts).
    """
    M, K, _ = records.shape
    cap = trades0.shape[0]
    flat = records.reshape(M * K, N_REC_PLANES)
    if fill_counts is None:
        fill_counts = jnp.sum((records[:, :, 0] != EMPTY_SLOT)
                              .astype(jnp.int32), axis=1)
    counts = jnp.minimum(fill_counts.astype(jnp.int32), K)
    cm = jnp.cumsum(counts)                       # (M,) cumulative fills
    total = cm[-1]
    tc0 = jnp.sum((trades0[:, 0] != EMPTY_SLOT).astype(jnp.int32))

    t = jnp.arange(cap, dtype=jnp.int32)
    new_rank = t - tc0
    # closed-form source row: message index + within-message offset
    def rank_to_src(r):
        m_of = jnp.sum((cm[:, None] <= r[None, :]).astype(jnp.int32), axis=0)
        m_c = jnp.minimum(m_of, M - 1)
        before = jnp.where(m_of > 0, cm[jnp.maximum(m_of - 1, 0)], 0)
        return m_c * K + (r - before), m_c

    src, msg_idx = rank_to_src(new_rank)
    overflow = total + tc0 > cap
    last_src, last_m = rank_to_src(jnp.full((cap,), total - 1))
    is_last_slot = (t == cap - 1) & overflow
    src = jnp.where(is_last_slot, last_src, src)
    msg_idx = jnp.where(is_last_slot, last_m, msg_idx)
    have_new = ((new_rank >= 0) & (new_rank < total)) | (
        is_last_slot & (total > 0))
    src_c = jnp.clip(src, 0, M * K - 1)
    planes = flat[src_c]                         # (cap, 4)
    msg_of = msgs[msg_idx]                       # (cap, 8)
    rows = jnp.stack([
        planes[:, 0], planes[:, 1], planes[:, 2], msg_of[:, 4],
        msg_of[:, 6], msg_of[:, 7], planes[:, 3], msg_of[:, 5],
    ], axis=1).astype(jnp.int32)
    return jnp.where(have_new[:, None], rows, trades0)
