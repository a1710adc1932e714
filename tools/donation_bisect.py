"""Bisect the stage-5 donation kernel fault between the minimal repro
(tools/repro_donation_fault.py — does NOT crash) and the full program
(tools/stage5_donation_harness.py gather+donate — crashes), by adding full-
program components to the minimal gather-head program one at a time
(VERDICT r4 #8).

Components under suspicion (what the full program has and the minimal lacks):

  --aux N          deep supervision: N independent gather-head forwards
                   summed into the loss (the production decoder runs 10
                   prediction heads -> 10 scatter-add grads into the same
                   donated kernel)
  --bystander-mb M frozen bystander parameters (~M MB of f32 tensors) carried
                   through the donated state untouched — HBM buffer pressure
                   + pass-through aliasing alongside the aliased giant kernel
  --freeze-opt     optax.multi_transform partition (adamw for the head,
                   set_to_zero for the bystanders) — the production
                   optimizer's label routing (engine/optim.py)
  --matcher        a per-image LSAP while-loop on a (Q, T) cost built from
                   the head logits (losses/lsap.py), between forward and loss

Run ONE variant per process on the real chip; a crash kills the worker (and
can contaminate the next run — verify with a known-clean control after any
crash). Prints marks + one final JSON line; absence of the line = crash.

  python tools/donation_bisect.py                      # base: known clean
  python tools/donation_bisect.py --aux 10
  python tools/donation_bisect.py --bystander-mb 800
  python tools/donation_bisect.py --aux 10 --bystander-mb 800 --freeze-opt
"""

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

HIDDEN, COLS, B, Q = 256, 22000 * 8 + 1, 8, 200

t0 = time.perf_counter()


def mark(m):
    print(f"[+{time.perf_counter() - t0:7.1f}s] {m}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--aux", type=int, default=1,
                    help="number of gather-head forwards summed in the loss")
    ap.add_argument("--bystander-mb", type=int, default=0)
    ap.add_argument("--freeze-opt", action="store_true")
    ap.add_argument("--matcher", action="store_true")
    ap.add_argument("--nodonate", action="store_true")
    ap.add_argument("--head", choices=("gather", "onehot"), default="gather")
    args = ap.parse_args()
    tag = (f"aux{args.aux}_by{args.bystander_mb}mb"
           f"{'_freezeopt' if args.freeze_opt else ''}"
           f"{'_matcher' if args.matcher else ''}_{args.head}"
           f"{'_nodonate' if args.nodonate else ''}")

    rng = np.random.RandomState(0)
    params = {
        "head": {
            "kernel": jnp.asarray(
                rng.randn(HIDDEN, COLS).astype(np.float32) * 0.02),
            "bias": jnp.zeros((COLS,), jnp.float32),
        }
    }
    if args.bystander_mb:
        # frozen pass-through tensors, ~Swin-L-shaped chunks of 8 MB each
        n_chunks = args.bystander_mb // 8
        params["frozen"] = {
            f"w{i}": jnp.asarray(rng.randn(1024, 2048).astype(np.float32))
            for i in range(n_chunks)
        }
    # aux heads read different dec inputs (like the decoder's per-layer
    # prediction heads reading successive decoder states)
    dec = jnp.asarray(rng.randn(args.aux, B, Q, HIDDEN).astype(np.float32))
    goc = jnp.asarray(rng.randint(0, 22000, (B,)), jnp.int32)
    tgt = jnp.asarray(rng.randint(0, 9, (B, Q)), jnp.int32)

    def head_forward(hp, d, goc):
        base = goc[:, None] * 8
        cols = base + jnp.arange(8, dtype=base.dtype)[None, :]
        cols = jnp.concatenate(
            [cols, jnp.full((B, 1), COLS - 1, cols.dtype)], axis=-1)
        if args.head == "gather":
            k = jnp.take(hp["kernel"], cols, axis=1)
            k = jnp.transpose(k, (1, 0, 2))
            b_ = jnp.take(hp["bias"], cols, axis=0)
        else:
            oh = jax.nn.one_hot(cols, COLS, dtype=hp["kernel"].dtype)
            k = jnp.einsum("hc,bpc->bhp", hp["kernel"], oh)
            b_ = jnp.einsum("c,bpc->bp", hp["bias"], oh)
        return jnp.einsum("bqc,bcp->bqp", d, k) + b_[:, None, :]

    def loss_fn(params, dec, goc, tgt):
        total = 0.0
        for a in range(args.aux):
            logits = head_forward(params["head"], dec[a], goc)
            if args.matcher and a == 0:
                from partdistillation_tpu.losses.lsap import solve_lsap

                cost = -jax.nn.log_softmax(logits, axis=-1)[..., :8]
                cost = cost[:, :8, :]  # (B, 8, 8) square assignment
                assign = jax.vmap(solve_lsap)(cost)
                tgt_a = jnp.take_along_axis(
                    tgt[:, :8], assign.astype(jnp.int32), axis=1)
                tgt_full = jnp.concatenate([tgt_a, tgt[:, 8:]], axis=1)
            else:
                tgt_full = tgt
            total = total + optax.softmax_cross_entropy_with_integer_labels(
                logits, tgt_full).mean()
        if "frozen" in params:
            # touch the frozen tree so it's a real (stopped) program input
            total = total + 0.0 * jax.lax.stop_gradient(
                params["frozen"]["w0"].mean())
        return total / args.aux

    if args.freeze_opt:
        labels = {"head": "train",
                  **({"frozen": "freeze"} if "frozen" in params else {})}
        tx = optax.multi_transform(
            {"train": optax.adamw(1e-4), "freeze": optax.set_to_zero()},
            param_labels=labels)
    else:
        tx = optax.adamw(1e-4)
    opt_state = tx.init(params)
    mark(f"built {tag}")

    @partial(jax.jit, donate_argnums=() if args.nodonate else (0, 1))
    def step(params, opt_state, dec, goc, tgt):
        loss, grads = jax.value_and_grad(loss_fn)(params, dec, goc, tgt)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    for i in range(3):
        params, opt_state, loss = step(params, opt_state, dec, goc, tgt)
        print(f"{tag} step {i} ok loss={float(loss):.6f}", flush=True)
    print(json.dumps({"variant": tag, "ok": True}), flush=True)


if __name__ == "__main__":
    main()
