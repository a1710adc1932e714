"""Minimal repro for the stage-5 donation kernel fault (PERF.md round-3
negative result #1; VERDICT r3 #7).

Observed: any DONATED single-chip program that AdamW-updates the
(256, 176001) part-classifier kernel whose forward GATHERS 9 columns per
image (`jnp.take(kernel, cols, axis=1)`, models/transformer_decoder.py:246)
kills the remote TPU worker at first execution ("kernel fault"). The
non-donated byte-identical program runs clean, as does the same donated
program with a small head.

This script isolates the smallest such program. One VARIANT per process —
the fault kills the worker, so chaining variants in one process measures
nothing:

  python tools/repro_donation_fault.py gather_donated      # expected: CRASH
  python tools/repro_donation_fault.py gather_nodonate     # control: clean
  python tools/repro_donation_fault.py onehot_donated      # scatter-free?
  python tools/repro_donation_fault.py gather_sgd_donated  # Adam needed?
  python tools/repro_donation_fault.py small_donated       # size needed?

Each variant prints one line: VARIANT ok loss=... — absence of the line
(worker crash) is the signal. Run on the real TPU (axon); CPU does not
reproduce.

ROUND-4 RESULT: none of these minimal variants crash — gather_donated runs
clean (3 steps, loss finite), so the head-in-isolation is NOT sufficient;
the fault needs the full stage-5 program (buffer pressure / scheduling).
The smallest KNOWN repro is tools/stage5_donation_harness.py (full program;
gather+donate crashed 1/1 in r4 and 3/3 in r3; onehot+donate clean at identical speed). Kept for
upstream bisection.
"""

import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

HIDDEN, COLS, B, Q, P1 = 256, 22000 * 8 + 1, 8, 200, 9


def build(head: str, small: bool):
    cols_total = 1793 if small else COLS  # small control: 224*8+1

    rng = np.random.RandomState(0)
    params = {
        "kernel": jnp.asarray(rng.randn(HIDDEN, cols_total).astype(np.float32)
                              * 0.02),
        "bias": jnp.zeros((cols_total,), jnp.float32),
    }
    dec = jnp.asarray(rng.randn(B, Q, HIDDEN).astype(np.float32))
    goc = jnp.asarray(rng.randint(0, (cols_total - 1) // 8, (B,)), jnp.int32)
    tgt = jnp.asarray(rng.randint(0, P1, (B, Q)), jnp.int32)

    def forward(params, dec, goc):
        base = goc[:, None] * 8
        cols = base + jnp.arange(8, dtype=base.dtype)[None, :]
        cols = jnp.concatenate(
            [cols, jnp.full((B, 1), cols_total - 1, cols.dtype)], axis=-1)
        if head == "gather":
            # backward = scatter-add into the giant kernel (the suspect)
            k = jnp.take(params["kernel"], cols, axis=1)  # (hidden, B, P+1)
            k = jnp.transpose(k, (1, 0, 2))
            b_ = jnp.take(params["bias"], cols, axis=0)
        else:  # onehot: slice via 0/1 matmul — backward is a dense matmul
            oh = jax.nn.one_hot(cols, cols_total, dtype=params["kernel"].dtype)
            k = jnp.einsum("hc,bpc->bhp", params["kernel"], oh)
            b_ = jnp.einsum("c,bpc->bp", params["bias"], oh)
        return jnp.einsum("bqc,bcp->bqp", dec, k) + b_[:, None, :]

    def loss_fn(params, dec, goc, tgt):
        logits = forward(params, dec, goc)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, tgt).mean()

    return params, (dec, goc, tgt), loss_fn


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "gather_donated"
    head = "onehot" if variant.startswith("onehot") else "gather"
    small = variant.startswith("small")
    sgd = "sgd" in variant
    donate = variant.endswith("donated") and "nodonate" not in variant

    params, (dec, goc, tgt), loss_fn = build(head, small)
    tx = optax.sgd(1e-3) if sgd else optax.adamw(1e-4)
    opt_state = tx.init(params)

    @partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def step(params, opt_state, dec, goc, tgt):
        loss, grads = jax.value_and_grad(loss_fn)(params, dec, goc, tgt)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    for i in range(3):
        params, opt_state, loss = step(params, opt_state, dec, goc, tgt)
        print(f"{variant} step {i} ok loss={float(loss):.6f}", flush=True)
    print(f"{variant} ok", flush=True)


if __name__ == "__main__":
    main()
