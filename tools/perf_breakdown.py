#!/usr/bin/env python
"""Reproducible perf breakdown of the patch-optimization step on the
current devices. Chained (dependency-serialized) timing with a single
host sync per series — honest numbers even when block_until_ready is
unreliable (remote-relay backends)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu import attack, train as T
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.models import build_network, fold_bn, init_params, yolov3_blocks
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.parallel.mesh import batch_sharding, make_mesh, replicated

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N = 30
mesh = make_mesh()
exp = T.ExperimentConfig(name="perf", img_size=608, patch_size=224,
                         batch_size=B, compute_dtype="bfloat16")
net = build_network(yolov3_blocks())
params = jax.device_put(fold_bn(net, init_params(net, jax.random.PRNGKey(1))),
                        replicated(mesh))
state = jax.device_put(T.init_train_state(exp, jax.random.PRNGKey(0)),
                       replicated(mesh))
step = T.make_train_step(net, exp, mesh=mesh)
imgs = jax.device_put(np.random.rand(B, 608, 608, 3).astype(np.float32),
                      batch_sharding(mesh))
labs = jax.device_put(np.full((B, 252, 5), 1e-6, np.float32),
                      batch_sharding(mesh))
lr = jnp.float32(0.03)
for _ in range(3):
    state, aux = step(state, params, imgs, labs, lr)
np.asarray(aux["loss"])
t0 = time.perf_counter()
for _ in range(N):
    state, aux = step(state, params, imgs, labs, lr)
np.asarray(aux["loss"])
dt = (time.perf_counter() - t0) / N
print(f"batch {B}: {dt*1e3:.1f} ms/step  {B/dt:.1f} img/s  "
      f"{60/dt:.0f} steps/min  devices={mesh.devices.size}")
