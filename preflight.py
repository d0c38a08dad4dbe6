#!/usr/bin/env python
"""Pre-flight validation suite (the reference's test_multi_gpu.py, run before
training by its launchers). Checks, in order:

1. device inventory + mesh construction,
2. collective self-check (psum == device count),
3. model construction with a reduced config (2 layers),
4. synthetic data flow through collate + one jitted train step,
5. (optional, --full) flagship-dims forward compile.

Exit code 0 = good to train; non-zero aborts launch scripts.
"""

from __future__ import annotations

import argparse
import sys
import time


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--full", action="store_true", help="also compile flagship dims")
    p.add_argument("--output-json", default=None,
                   help="also write results as JSON (reference detect_gpu_setup.py flag)")
    args = p.parse_args()

    results: list[tuple[str, bool, str]] = []

    def check(name):
        def deco(fn):
            t0 = time.time()
            try:
                detail = fn() or ""
                results.append((name, True, f"{detail} ({time.time()-t0:.1f}s)"))
            except Exception as e:
                results.append((name, False, str(e)))
            return fn

        return deco

    import jax

    from repurpose_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()

    @check("devices + mesh")
    def _devices():
        from repurpose_tpu.parallel.mesh import create_mesh, describe_mesh

        mesh = create_mesh()
        print(describe_mesh(mesh))
        return f"{mesh.devices.size} x {jax.devices()[0].device_kind}"

    @check("collective self-check")
    def _collectives():
        from repurpose_tpu.parallel.mesh import create_mesh, mesh_self_check

        return f"psum={mesh_self_check(create_mesh())}"

    @check("reduced model + train step")
    def _model():
        from repurpose_tpu.config import ModelConfig, TrainConfig
        from repurpose_tpu.data.batching import collate
        from repurpose_tpu.data.synthetic import SyntheticDataset
        from repurpose_tpu.train.state import create_train_state
        from repurpose_tpu.train.step import make_train_step

        mc = ModelConfig(self_num_layers=2)
        tc = TrainConfig(batch_size=2, buckets=(256,))
        ds = SyntheticDataset([100, 150], mc, seed=0)
        batch = collate([ds[0], ds[1]], tc.buckets, 2)
        state, tx, sched = create_train_state(mc, tc, 1, jax.random.key(0))
        step = make_train_step(mc, tc, tx, sched, donate=False)
        _, m = step(state, batch, jax.random.key(1))
        loss = float(m["loss"])
        assert loss > 0 and loss < 1e9
        return f"loss={loss:.2f}"

    if len(jax.devices()) >= 2 and len(jax.devices()) % 2 == 0:

        @check("pipeline-parallel step (dp x pp)")
        def _pipeline():
            from repurpose_tpu.config import MeshConfig, ModelConfig, TrainConfig
            from repurpose_tpu.data.batching import collate
            from repurpose_tpu.data.synthetic import SyntheticDataset
            from repurpose_tpu.parallel.mesh import create_mesh
            from repurpose_tpu.parallel.pipeline import PipelinedMMCT
            from repurpose_tpu.train.state import create_train_state
            from repurpose_tpu.train.step import make_train_step

            mesh = create_mesh(MeshConfig(data=-1, pipe=2))
            dp = mesh.devices.size // 2
            bs = dp * 2  # divisible by data axis x 2 microbatches
            mc = ModelConfig(self_num_layers=2, attention_impl="xla")
            tc = TrainConfig(batch_size=bs, buckets=(256,))
            ds = SyntheticDataset([100 + i for i in range(bs)], mc, seed=0)
            batch = collate([ds[i] for i in range(bs)], tc.buckets, bs)
            state, tx, sched = create_train_state(mc, tc, 1, jax.random.key(0))
            step = make_train_step(
                mc, tc, tx, sched, donate=False,
                model=PipelinedMMCT(mc, mesh, n_microbatches=2),
            )
            _, m = step(state, batch, jax.random.key(1))
            loss = float(m["loss"])
            assert loss > 0 and loss < 1e9
            return f"stages=2 dp={dp} loss={loss:.2f}"

    @check("HBM capacity model")
    def _capacity():
        """Memory-requirement model (reference detect_gpu_setup.py:192-205):
        analytic per-(bucket, batch) fit table for the FLAGSHIP train step
        and the max safe bucket — printed before any multi-minute compile."""
        from repurpose_tpu.config import ModelConfig, TrainConfig
        from repurpose_tpu.utils.capacity import (
            capacity_table,
            hbm_bytes_per_device,
            max_safe_bucket,
        )

        mc = ModelConfig()
        tc = TrainConfig()
        hbm = hbm_bytes_per_device()
        print(f"  HBM/device: {hbm/1e9:.1f} GB (flagship, batch {tc.batch_size})")
        for row in capacity_table(mc, tc.batch_size, tc.buckets, hbm):
            print(
                f"    bucket {row['bucket']:>5}: est {row['est_gb']:>6.2f} GB "
                f"-> {'fits' if row['fits'] else 'DOES NOT FIT'}"
            )
        best = max_safe_bucket(mc, tc.batch_size, hbm)
        remat_best = max_safe_bucket(
            __import__("dataclasses").replace(mc, remat=True), tc.batch_size, hbm
        )
        accum_best = max_safe_bucket(
            mc, tc.batch_size, hbm,
            grad_accum_steps=tc.batch_size, grad_accum_dtype="bfloat16",
        )
        print(
            f"    max safe bucket: {best} (remat=true extends to {remat_best}; "
            f"grad_accum_steps={tc.batch_size} + bf16 accumulators to "
            f"{accum_best})"
        )
        return f"max_bucket={best} remat_max={remat_best} accum_max={accum_best}"

    if args.full:

        @check("flagship forward compile")
        def _flagship():
            import __graft_entry__ as g

            fn, fargs = g.entry()
            out = jax.jit(fn)(*fargs)
            return f"out={[tuple(o.shape) for o in out]}"

        @check("flagship compiled memory (bucket 2048)")
        def _compiled_mem():
            from repurpose_tpu.config import ModelConfig, TrainConfig
            from repurpose_tpu.utils.capacity import compiled_memory

            mem = compiled_memory(ModelConfig(), TrainConfig(), 2048)
            return f"XLA total {mem['total_bytes']/1e9:.2f} GB (temp {mem['temp_bytes']/1e9:.2f})"

    print("\n=== preflight summary ===")
    ok = True
    for name, passed, detail in results:
        print(f"  [{'PASS' if passed else 'FAIL'}] {name}: {detail}")
        ok &= passed
    if args.output_json:
        import json

        with open(args.output_json, "w") as f:
            json.dump(
                [{"check": n, "passed": p, "detail": d} for n, p, d in results], f,
                indent=2,
            )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
