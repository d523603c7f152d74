"""Subprocess worker for the multi-host test: one emulated 'host' with
4 virtual CPU devices, joined to a 2-process jax.distributed cluster.

Usage: python tests/_multihost_worker.py <process_id> <num_processes> <port>
Prints one JSON line {mean, loss, loss2} computed on the global mesh.
"""
import json
import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)  # before ANY jax op runs
jax.config.update("jax_compilation_cache_dir", "/tmp/aten_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# must run before ANY jax call that could initialize the backend —
# including aten_tpu imports (module-level constants touch the device)
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nproc,
    process_id=pid,
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from aten_tpu.parallel import mesh as pm  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from aten_tpu.scene.scenedefs import cornell_box  # noqa: E402

W, H = 32, 32
scene, cam = cornell_box(W, H)
ca = cam.arrays()
mesh = pm.make_global_mesh()
assert mesh.shape["hosts"] == nproc and mesh.shape["chips"] == 4

scene_g = pm.replicate_global(mesh, scene)
ca_g = pm.replicate_global(mesh, ca)

img = pm.render_tiled(
    scene_g, ca_g, W, H, jnp.uint32(0), jnp.uint32(0),
    spp=1, max_depth=2, rr_depth=1, mesh=mesh, axis=pm.HOST_AXES,
)
mean = float(jax.jit(jnp.mean)(img))

# full train step: grads pmean'd over (hosts, chips); two steps so the
# updated scene crosses back through the pipeline once
step = pm.make_train_step(
    W, H, spp=1, max_depth=2, rr_depth=1, mesh=mesh, axis=pm.HOST_AXES,
)
rows = H // nproc
target_local = np.zeros((rows, W, 3), np.float32)
target = pm.shard_rows_global(mesh, pm.HOST_AXES, target_local)
loss, scene2 = step(scene_g, ca_g, target, jnp.uint32(0))
loss2, _ = step(scene2, ca_g, target, jnp.uint32(1))

print(json.dumps({
    "pid": pid,
    "mean": mean,
    "loss": float(loss),
    "loss2": float(loss2),
}), flush=True)
