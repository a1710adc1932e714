"""Exact linear-sum-assignment, pure JAX (jit/vmap-able).

The reference matcher ships every cost matrix to the CPU and calls
scipy.optimize.linear_sum_assignment per image (modeling/matcher.py:159-161) —
a device->host sync in the middle of every training step. Here the same
shortest-augmenting-path algorithm (Dijkstra with dual potentials, the one
scipy implements) runs on device inside the compiled step: the outer loop over
rows is a `lax.fori_loop`, the Dijkstra frontier scan is vectorized over
columns, and the whole solver vmaps over the batch.

Cost matrices here are tiny (num_targets x num_queries, ~20 x 200), so the
sequential depth is small; the win is keeping the step graph fusion-friendly
with no host round trip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["solve_lsap", "solve_lsap_batch"]

_INF = jnp.float32(1e18)


def solve_lsap(cost: jnp.ndarray) -> jnp.ndarray:
    """Minimum-cost assignment of R rows to C columns, R <= C.

    Args:
      cost: (R, C) float matrix, R <= C (static shapes).

    Returns:
      col4row: (R,) int32 — the column assigned to each row. The assignment
      minimizes sum(cost[r, col4row[r]]) and matches scipy's optimum (tie
      permutations may differ).
    """
    r, c = cost.shape
    assert r <= c, f"solve_lsap requires rows <= cols, got {cost.shape}"
    cost = cost.astype(jnp.float32)

    # Tie every loop-carry constant to `cost` so that under shard_map the
    # carries are "varying" over the manual axes from the start (otherwise the
    # while_loop input/output types disagree).
    zf = cost[0, 0] * 0.0  # varying float32 0
    zi = zf.astype(jnp.int32)  # varying int32 0
    zb = zf > 1.0  # varying bool False

    def outer(cur_row, state):
        u, v, row4col, col4row = state

        # --- Dijkstra from cur_row until a free column is reached ---
        def dij_cond(s):
            _, _, _, _, _, _, sink = s
            return sink < 0

        def dij_body(s):
            sr, sc, shortest, pred, i, min_val, _ = s
            sr = sr.at[i].set(True)
            reduced = min_val + cost[i] - u[i] - v  # (C,)
            upd = jnp.logical_and(~sc, reduced < shortest)
            shortest = jnp.where(upd, reduced, shortest)
            pred = jnp.where(upd, i, pred)

            masked = jnp.where(sc, _INF, shortest)
            j = jnp.argmin(masked).astype(jnp.int32)
            min_val = masked[j]
            sc = sc.at[j].set(True)
            owner = row4col[j]
            sink = jnp.where(owner < 0, j, -1)
            i_next = jnp.where(owner < 0, i, owner)
            return sr, sc, shortest, pred, i_next, min_val, sink

        sr0 = jnp.zeros((r,), bool) | zb
        sc0 = jnp.zeros((c,), bool) | zb
        shortest0 = jnp.full((c,), _INF) + zf
        pred0 = jnp.full((c,), -1, jnp.int32) + zi
        sr, sc, shortest, pred, _, min_val, sink = jax.lax.while_loop(
            dij_cond, dij_body, (sr0, sc0, shortest0, pred0, cur_row + zi, zf, -1 + zi)
        )

        # --- dual updates ---
        u = u.at[cur_row].add(min_val)
        others = jnp.logical_and(sr, jnp.arange(r) != cur_row)
        # shortest path value at the column currently matched to each scanned row
        sp_at_col = jnp.where(col4row >= 0, shortest[jnp.clip(col4row, 0)], 0.0)
        u = jnp.where(others, u + (min_val - sp_at_col), u)
        v = jnp.where(sc, v + (shortest - min_val), v)

        # --- augment along the alternating path back from sink ---
        def aug_cond(s):
            _, _, j, done = s
            return ~done

        def aug_body(s):
            row4col_, col4row_, j, _ = s
            i = pred[j]
            row4col_ = row4col_.at[j].set(i)
            j_next = col4row_[i]
            col4row_ = col4row_.at[i].set(j)
            return row4col_, col4row_, j_next, i == cur_row

        row4col, col4row, _, _ = jax.lax.while_loop(
            aug_cond, aug_body, (row4col, col4row, sink, zb)
        )
        return u, v, row4col, col4row

    u0 = jnp.zeros((r,)) + zf
    v0 = jnp.zeros((c,)) + zf
    row4col0 = jnp.full((c,), -1, jnp.int32) + zi
    col4row0 = jnp.full((r,), -1, jnp.int32) + zi
    _, _, _, col4row = jax.lax.fori_loop(0, r, outer, (u0, v0, row4col0, col4row0))
    return col4row


solve_lsap_batch = jax.vmap(solve_lsap)
