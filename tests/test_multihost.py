"""Multi-host (multi-process) training smoke: 2 processes x 4 virtual CPU
devices, one global (data=8) mesh.

Each process runs its own BatchLoader shard (the DistributedSampler analog),
assembles the global batch via make_global_batch, and takes jitted train
steps over the cross-process mesh (collectives ride Gloo on CPU). Both
processes must observe identical finite losses.
"""

import os
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> str:
    """OS-assigned free port: hardcoded ports collide across concurrent test
    sessions (and with workers leaked by a previous timed-out run)."""
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        return str(s.getsockname()[1])


def _communicate_all(procs, timeout=420):
    """communicate() on every worker, killing ALL of them on any failure so a
    hung run cannot leak port-holding processes into later tests."""
    try:
        return [p.communicate(timeout=timeout)[0] for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()


WORKER = r"""
import os, sys
pid = int(sys.argv[1])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address="localhost:" + os.environ["COORD_PORT"], num_processes=2, process_id=pid
)
import numpy as np
sys.path.insert(0, os.environ["REPO"])
from repurpose_tpu.config import MeshConfig, ModelConfig, TrainConfig
from repurpose_tpu.data.loader import BatchLoader
from repurpose_tpu.data.synthetic import SyntheticDataset
from repurpose_tpu.parallel.mesh import create_mesh, mesh_self_check
from repurpose_tpu.parallel.sharding import make_global_batch, shard_params
from repurpose_tpu.train.state import create_train_state
from repurpose_tpu.train.step import make_train_step
import dataclasses

mc = ModelConfig(vis_dim=8, aud_dim=12, text_dim=4, d_model=16, self_num_layers=1,
                 num_heads=2, d_ff=32, hidden_dim=8, compute_dtype="float32",
                 attention_impl="xla")
tc = TrainConfig(batch_size=4, buckets=(64,), epochs=1)  # 4 per process -> global 8

mesh = create_mesh(MeshConfig(data=-1))
assert mesh.devices.size == 8, mesh.devices.size
mesh_self_check(mesh)

ds = SyntheticDataset([50, 40, 60, 55], mc, seed=4)
loader = BatchLoader(ds, batch_size=4, buckets=tc.buckets, shuffle=False,
                     process_index=jax.process_index(), process_count=2)
state, tx, sched = create_train_state(mc, tc, 2, jax.random.key(0))
state = dataclasses.replace(state, params=shard_params(state.params, mesh))
step = make_train_step(mc, tc, tx, sched, donate=False)
losses = []
for epoch in range(3):
    for batch in loader.epoch(epoch):
        gb = make_global_batch(batch, mesh)
        assert gb.visual.shape[0] == 8  # global batch spans both processes
        state, m = step(state, gb, jax.random.key(1))
        losses.append(float(m["loss"]))
print("LOSSES", " ".join(f"{l:.6f}" for l in losses), flush=True)
"""


EVAL_WORKER = r"""
import os, sys, json
pid = int(sys.argv[1])
workdir = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address="localhost:" + os.environ["COORD_PORT"], num_processes=2, process_id=pid
)
sys.path.insert(0, os.environ["REPO"])
from tests.test_multihost import eval_trainer_config, make_eval_datasets
from repurpose_tpu.train.loop import Trainer

cfg = eval_trainer_config(mesh_model=2)  # TP-sharded params exercise the gather
train_ds, test_ds = make_eval_datasets(cfg.model)
trainer = Trainer(cfg, workdir + f"/p{pid}", train_ds, test_ds=test_ds)
out = trainer.evaluate()
print("EVAL " + json.dumps(out, sort_keys=True), flush=True)
"""


def eval_trainer_config(mesh_model: int = 1, mesh_data: int = 1):
    from repurpose_tpu.config import (
        Config, MeshConfig, ModelConfig, TestConfig, TrainConfig,
    )

    return Config(
        model=ModelConfig(
            vis_dim=8, aud_dim=12, text_dim=4, d_model=16, self_num_layers=1,
            num_heads=2, d_ff=32, hidden_dim=8, compute_dtype="float32",
            attention_impl="xla",
        ),
        train=TrainConfig(batch_size=2, buckets=(128,), epochs=1, lr=1e-3),
        mesh=MeshConfig(data=mesh_data if mesh_model == 1 else -1, model=mesh_model),
        test_cfg=TestConfig(
            pre_nms_topk=64, pre_nms_thresh=0.2, duration_thresh=0.001,
            duration_thresh_max=90.0, max_seg_per_min=1.0,
        ),
    )


def make_eval_datasets(model_cfg):
    from repurpose_tpu.data.synthetic import SyntheticDataset

    train_ds = SyntheticDataset([100, 90], model_cfg, seed=1)
    # 5 videos: the 2-process shards are unequal (3 vs 2), exercising the
    # sum/count (not mean-of-means) metric reduction.
    test_ds = SyntheticDataset([120, 100, 80, 110, 95], model_cfg, seed=3)
    return train_ds, test_ds


@pytest.mark.slow
def test_two_process_evaluate_matches_single_host(tmp_path):
    """In-run eval under multi-host must return the single-host tIoU
    (VERDICT r1 item 1: the reference evaluates in-run under DDP,
    main.py:571-705; round 1 raised NotImplementedError here)."""
    import json

    from repurpose_tpu.train.loop import Trainer

    # single-host reference result, computed in-process (CPU-pinned conftest)
    cfg = eval_trainer_config()
    train_ds, test_ds = make_eval_datasets(cfg.model)
    trainer = Trainer(cfg, str(tmp_path / "single"), train_ds, test_ds=test_ds)
    expected = trainer.evaluate()
    trainer.close()
    assert expected["tiou/mean"] >= 0.0 and len(expected) == 6

    script = tmp_path / "eval_worker.py"
    script.write_text(EVAL_WORKER)
    env = dict(
        os.environ,
        REPO=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        PALLAS_AXON_POOL_IPS="",
        COORD_PORT=_free_port(),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for i in range(2)
    ]
    outs = _communicate_all(procs)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    evals = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("EVAL ")]
        assert lines, out[-1000:]
        evals.append(json.loads(lines[0][5:]))
    # both processes report the identical global metric...
    assert evals[0] == evals[1]
    # ...and it matches the single-host run (fp32 reduction-order tolerance)
    for k, v in expected.items():
        assert evals[0][k] == pytest.approx(v, rel=1e-5, abs=1e-6), (k, evals[0], expected)


@pytest.mark.slow
def test_two_process_training(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(
        os.environ,
        REPO=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        PALLAS_AXON_POOL_IPS="",  # keep the TPU-tunnel plugin out of workers
        COORD_PORT=_free_port(),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for i in range(2)
    ]
    outs = _communicate_all(procs)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    loss_lines = [
        [l for l in out.splitlines() if l.startswith("LOSSES")] for out in outs
    ]
    assert loss_lines[0] and loss_lines[1], (outs[0][-500:], outs[1][-500:])
    assert loss_lines[0][0] == loss_lines[1][0]  # identical global losses
    values = [float(v) for v in loss_lines[0][0].split()[1:]]
    assert len(values) == 3 and all(v > 0 for v in values)
    assert values[-1] < values[0]  # training progresses


PP_WORKER = r"""
import os, sys
pid = int(sys.argv[1])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address="localhost:" + os.environ["COORD_PORT"], num_processes=2, process_id=pid
)
import numpy as np
sys.path.insert(0, os.environ["REPO"])
from repurpose_tpu.config import MeshConfig, ModelConfig, TrainConfig
from repurpose_tpu.data.loader import BatchLoader
from repurpose_tpu.data.synthetic import SyntheticDataset
from repurpose_tpu.parallel.mesh import create_mesh, mesh_self_check
from repurpose_tpu.parallel.pipeline import PipelinedMMCT
from repurpose_tpu.parallel.sharding import make_global_batch
from repurpose_tpu.train.state import create_train_state
from repurpose_tpu.train.step import make_train_step

mc = ModelConfig(vis_dim=8, aud_dim=12, text_dim=4, d_model=16, self_num_layers=4,
                 num_heads=2, d_ff=32, hidden_dim=8, compute_dtype="float32",
                 attention_impl="xla")
tc = TrainConfig(batch_size=4, buckets=(64,), epochs=1,
                 pipeline_microbatches=2)  # global batch 8 over dp=2 x M=2

mesh = create_mesh(MeshConfig(data=2, model=1, seq=1, pipe=4))
assert mesh.devices.size == 8, mesh.devices.size
mesh_self_check(mesh)

ds = SyntheticDataset([50, 40, 60, 55], mc, seed=4)
loader = BatchLoader(ds, batch_size=4, buckets=tc.buckets, shuffle=False,
                     process_index=jax.process_index(), process_count=2)
state, tx, sched = create_train_state(mc, tc, 2, jax.random.key(0))
step = make_train_step(mc, tc, tx, sched, donate=False,
                       model=PipelinedMMCT(mc, mesh, tc.pipeline_microbatches))
losses = []
for epoch in range(2):
    for batch in loader.epoch(epoch):
        gb = make_global_batch(batch, mesh)
        assert gb.visual.shape[0] == 8
        state, m = step(state, gb, jax.random.key(1))
        losses.append(float(m["loss"]))
print("LOSSES", " ".join(f"{l:.6f}" for l in losses), flush=True)

# 1F1B over the same cross-process mesh: the explicit backward's
# reverse-ppermute gradient hops ride the inter-process fabric too. At
# dropout 0 its loss must equal the GPipe step's exactly.
import dataclasses
from repurpose_tpu.parallel.pipeline_1f1b import make_1f1b_train_step
d0 = dataclasses.replace(mc, dropout=0.0)
state0, tx0, sched0 = create_train_state(d0, tc, 2, jax.random.key(0))
gp0 = make_train_step(d0, tc, tx0, sched0, donate=False,
                      model=PipelinedMMCT(d0, mesh, tc.pipeline_microbatches))
f1b = make_1f1b_train_step(d0, tc, tx0, sched0, mesh=mesh,
                           n_microbatches=tc.pipeline_microbatches, donate=False)
gb0 = make_global_batch(next(iter(loader.epoch(0))), mesh)
_, m_gp = gp0(state0, gb0, jax.random.key(1))
_, m_f1b = f1b(state0, gb0, jax.random.key(1))
assert abs(float(m_gp["loss"]) - float(m_f1b["loss"])) < 1e-5, (
    float(m_gp["loss"]), float(m_f1b["loss"]))
print("F1B", f"{float(m_f1b['loss']):.6f}", flush=True)
"""


@pytest.mark.slow
def test_two_process_pipeline_training(tmp_path):
    """GPipe over a CROSS-PROCESS mesh: 2 hosts x 4 devices, {data:2, pipe:4}
    — the ppermute stage hops ride the inter-process fabric. Both processes
    must see identical finite losses."""
    script = tmp_path / "pp_worker.py"
    script.write_text(PP_WORKER)
    env = dict(
        os.environ,
        REPO=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        PALLAS_AXON_POOL_IPS="",
        COORD_PORT=_free_port(),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for i in range(2)
    ]
    outs = _communicate_all(procs)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    rows = []
    f1b_rows = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("LOSSES ")]
        assert lines, out[-1000:]
        rows.append([float(x) for x in lines[0].split()[1:]])
        f1b = [l for l in out.splitlines() if l.startswith("F1B ")]
        assert f1b, out[-1000:]
        f1b_rows.append(float(f1b[0].split()[1]))
    assert rows[0] == rows[1]
    assert all(np.isfinite(v) for v in rows[0]) and len(rows[0]) >= 2
    # both processes agree on the 1F1B loss (worker already asserted it
    # equals the GPipe loss at dropout 0)
    assert f1b_rows[0] == f1b_rows[1] and np.isfinite(f1b_rows[0])
