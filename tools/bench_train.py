"""Measure the POCO-CLIFF training step (fwd+bwd+Adam) on one chip.

Usage: python tools/bench_train.py [16|32] [batch]
Protocol: dependency-chained steps (state threads through), per-step
cost = slope between 2-step and 12-step windows (cancels dispatch/fetch
overhead over the axon tunnel), best of 3. Full-width model: HRNet-W48
+ CLIFF + SMPL(6890) + uncert + flow, synthetic batch."""
import sys, time
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from poco_tpu.utils.comp_cache import enable_compilation_cache
enable_compilation_cache()
from poco_tpu.losses.losses import LossConfig
from poco_tpu.models.poco import build_poco_cliff, init_poco, make_dummy_batch
from poco_tpu.smpl.assets import synthetic_smpl_model
from poco_tpu.train.state import create_train_state, make_optimizer
from poco_tpu.train.step import make_train_step

prec = sys.argv[1] if len(sys.argv) > 1 else "16"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
dtype = jnp.bfloat16 if prec == "16" else jnp.float32
from poco_tpu.models.poco import POCO, PocoConfig
model = POCO(cfg=PocoConfig(), dtype=dtype)
smpl = synthetic_smpl_model(num_verts=6890)
variables = init_poco(model, jax.random.PRNGKey(0), smpl, batch_size=1)
tx = make_optimizer(lr=1e-4)
state = create_train_state(model, variables, tx)
train_step = make_train_step(model, LossConfig(), donate=False)
batch = make_dummy_batch(model.cfg, B, include_gt=True)
batch.update(
    pose=jnp.zeros((B, 72), jnp.float32),
    betas=jnp.zeros((B, 10), jnp.float32),
    has_smpl=jnp.ones((B,), jnp.float32),
    has_pose_3d=jnp.ones((B,), jnp.float32),
    keypoints=jnp.zeros((B, 49, 3), jnp.float32),
)
rng = jax.random.PRNGKey(1)
# warm/compile
state, metrics = train_step(state, batch, smpl, rng)
_ = float(metrics["loss/total_loss"])
def run(n):
    global state
    s = state
    for _ in range(n):
        s, m = train_step(s, batch, smpl, rng)
    return float(m["loss/total_loss"])
run(1)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter(); run(2); d2 = time.perf_counter() - t0
    t0 = time.perf_counter(); run(12); d12 = time.perf_counter() - t0
    best = min(best, max(d12 - d2, 1e-9) / 10)
print(f"train step precision={prec} batch={B}: {best*1e3:.1f} ms -> {B/best:.0f} crops/s/chip")
