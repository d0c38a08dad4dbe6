#!/usr/bin/env python
"""Train-step time breakdown at the flagship shape (batch 6, T=2048).

The full step was 126 ms while the dense+attention FLOPs argue ~70 ms; this
isolates where the rest goes. Parts, all chained on-device back-to-back in one
process (CLAUDE.md measurement rules):

  A. eval forward (dropout off)                 — pure model fwd
  B. train forward (dropout on, threefry)       — A + ~50 dropout masks
  C. train forward (dropout on, rbg PRNG)       — cheaper random bits
  D. value_and_grad, no optimizer               — B + backward
  E. full train step (grad + Adam + metrics)    — production program
  F. full train step with rbg dropout keys

Measured on v5e (2026-08-16): A 19.8 | B 32.5 | C 24.2 | E 121.3 | F 84.8 ms.
Threefry dropout bit-generation was ~30% of the whole step (regenerated in
the backward too); TrainConfig.rng_impl="rbg" (now the default) captures the
36 ms. Two hard-won measurement rules encoded here: perturb the scan input
with the carry or XLA hoists loop-invariant forwards out of the chain, and
consume every gradient leaf or DCE deletes most of the backward.

Known backend issue: variant G (histogram telemetry inside the 20-length
scan) reproducibly CRASHES the v5e worker on this box ("TPU worker process
crashed"). Production is unaffected — the Trainer runs the histogram step
standalone on its 1/1000 cadence (train.py smoke passes, including the
step-1 histogram step); only the scanned x20 formulation trips it.

H (unsafe_rbg) measured IDENTICAL to rbg (84.2 vs 84.3 ms/step standalone
A/B, 2026-08-17) — rbg's per-key determinism costs nothing here, so it
stays the default and no unsafe knob is exposed.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_CHAIN = 20
BATCH, T = 6, 2048


def _sync(x):
    np.asarray(jax.tree.leaves(x)[0])


def timed(fn, *args, reps=3):
    _sync(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / N_CHAIN


def main():
    from repurpose_tpu.config import ModelConfig, TrainConfig
    from repurpose_tpu.data.batching import Batch
    from repurpose_tpu.train.state import create_train_state
    from repurpose_tpu.train.step import _loss_fn, make_train_step
    from repurpose_tpu.models import build_model

    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)
    cfg = ModelConfig()
    tc = TrainConfig(batch_size=BATCH, buckets=(T,))
    model = build_model(cfg)
    state, tx, sched = create_train_state(cfg, tc, 100, jax.random.key(1))

    rng = np.random.default_rng(0)
    mask = np.zeros((BATCH, T), bool)
    durs = [1800, 1313, 900, 1800, 600, 1500][:BATCH]
    for i, d in enumerate(durs):
        mask[i, :d] = True
    batch = Batch(
        jax.device_put(rng.normal(0, 1, (BATCH, T, cfg.vis_dim)).astype(np.float32)),
        jax.device_put(rng.normal(0, 1, (BATCH, T, cfg.aud_dim)).astype(np.float32)),
        jax.device_put(rng.normal(0, 1, (BATCH, T, cfg.text_dim)).astype(np.float32)),
        jax.device_put(mask),
        jax.device_put((rng.uniform(size=(BATCH, T)) < 0.3).astype(np.float32)),
        jax.device_put(np.abs(rng.normal(0, 10, (BATCH, T, 2))).astype(np.float32)),
        jax.device_put(np.asarray(durs, np.int32)),
    )

    def chain(step_fn, carry0):
        @jax.jit
        def run(carry, batch):
            def body(c, _):
                return step_fn(c, batch), ()
            c, _ = jax.lax.scan(body, carry, None, length=N_CHAIN)
            return c
        return run, carry0

    key_tf = jax.random.key(2)
    key_rbg = jax.random.key(2, impl="rbg")

    def _perturb(b: Batch, c):
        # carry-dependent input defeats XLA loop-invariant hoisting inside the
        # scan (same trick as bench.py); 1e-6 on standard-normal features is
        # numerically invisible
        return b._replace(visual=b.visual + c * 1e-6)

    def fwd_eval(c, b):
        loss, _ = _loss_fn(model, tc, state.params, _perturb(b, c), None, False)
        return c + loss

    def fwd_train(key):
        def f(c, b):
            loss, _ = _loss_fn(
                model, tc, state.params, _perturb(b, c),
                jax.random.fold_in(key, 0), True,
            )
            return c + loss
        return f

    def grad_only(key):
        import optax

        g = jax.grad(
            lambda p, b: _loss_fn(model, tc, p, b, jax.random.fold_in(key, 0), True)[0]
        )
        def f(c, b):
            grads = g(state.params, _perturb(b, c))
            # consume EVERY gradient leaf — reading one scalar lets XLA
            # dead-code-eliminate most of the backward
            return c + optax.global_norm(grads)
        return f

    results = {}
    for name, step_fn in [
        ("A fwd eval (no dropout)", fwd_eval),
        ("B fwd train threefry", fwd_train(key_tf)),
        ("C fwd train rbg", fwd_train(key_rbg)),
        ("D grad only threefry", grad_only(key_tf)),
    ]:
        try:
            run, c0 = chain(step_fn, jnp.float32(0.0))
            ms = timed(run, c0, batch) * 1e3
        except Exception as e:  # e.g. PRNG impl unsupported on this backend
            print(f"{name:28s} FAILED: {type(e).__name__}: {e}", file=sys.stderr)
            continue
        results[name] = ms
        print(f"{name:28s} {ms:8.2f} ms", file=sys.stderr)

    key_urbg = jax.random.key(2, impl="unsafe_rbg")
    for name, key, tel in [
        ("E full step threefry", key_tf, False),
        ("F full step rbg", key_rbg, False),
        ("G full step rbg + telemetry", key_rbg, True),
        ("H full step unsafe_rbg", key_urbg, False),
    ]:
        step = make_train_step(
            cfg, tc, tx, sched, donate=False,
            per_layer_grad_norms=tel, grad_histograms=tel,
        )

        @jax.jit
        def train_chain(st, b, key=key, step=step):
            def body(s, _):
                s2, m = step(s, b, key)
                # consume EVERY metric (incl. telemetry tensors) — dropping
                # them inside the scan would let XLA DCE their computation,
                # which the production Trainer (which fetches them) cannot
                consumed = sum(
                    jnp.sum(v).astype(jnp.float32) for v in m.values()
                )
                return s2, consumed
            s2, losses = jax.lax.scan(body, st, None, length=N_CHAIN)
            return losses[-1]

        try:
            ms = timed(train_chain, state, batch) * 1e3
        except Exception as e:
            print(f"{name:28s} FAILED: {type(e).__name__}: {e}", file=sys.stderr)
            continue
        results[name] = ms
        print(f"{name:28s} {ms:8.2f} ms", file=sys.stderr)

    print(results)


if __name__ == "__main__":
    main()
