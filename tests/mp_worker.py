"""Multi-process (multi-HOST stand-in) worker: joins a 2-process x
4-virtual-CPU-device distributed runtime, then runs the SAME sharded
programs the single-process path uses — conversion sharded over triangles
and one data-parallel training step with gradient psum — over the
process-spanning 8-device mesh.

Spawned by test_multiprocess.py; prints machine-readable result lines.
The reference has no distributed story at all (SURVEY.md section 2.5); this
exercises the framework's new multi-host capability on CPU+gloo, which
shares the code path a real TPU pod slice would take via ICI/DCN.
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]

# force EXACTLY 4 virtual devices per process (the pytest parent exports 8)
flags = [
    f for f in os.environ.get("XLA_FLAGS", "").split()
    if "xla_force_host_platform_device_count" not in f
]
flags.append("--xla_force_host_platform_device_count=4")
os.environ["XLA_FLAGS"] = " ".join(flags)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # sitecustomize pins axon

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from mesh2splat_tpu.parallel.sharding import (  # noqa: E402
    convert_sharded, global_mesh, init_distributed, put_global,
)
from mesh2splat_tpu.ops.conversion import ConversionConfig, convert  # noqa: E402
from mesh2splat_tpu.train.fit import SplatParams, train_step_fn  # noqa: E402
from __graft_entry__ import _demo_scene  # noqa: E402

init_distributed(f"localhost:{port}", num_processes=2, process_id=pid,
                 platform="cpu")
assert len(jax.devices()) == 8, f"expected 8 global devices, got {len(jax.devices())}"
assert len(jax.local_devices()) == 4
mesh = global_mesh((8,), ("dp",))

geom, material, cameras = _demo_scene(n_views=8, img=16)
lo, hi = geom.bbox()
cfg = ConversionConfig(resolution=16, layers=2)

# 1) conversion sharded over triangles across BOTH processes
splats_g = convert_sharded(geom, material, lo, hi, cfg, mesh, axis="dp")
n_valid = jax.jit(lambda s: jnp.sum(s.valid.astype(jnp.int32)))(splats_g)
print(f"RESULT valid {int(np.asarray(jax.device_get(n_valid)))}", flush=True)

# 2) one data-parallel training step over the process-spanning mesh:
#    params replicated, views sharded over 'dp', loss pmean'd (gradient psum
#    crosses the process boundary through gloo)
splats_local = convert(geom, material, lo, hi, cfg)
params = SplatParams.from_splats(splats_local)
valid = splats_local.valid
tx = optax.adam(1e-2)
opt_state = tx.init(params)
targets = np.zeros((8, 16, 16, 3), np.float32)

params = put_global(params, mesh, P())
opt_state = put_global(opt_state, mesh, P())
valid = put_global(valid, mesh, P())
cameras = put_global(cameras, mesh, P("dp"))
targets_g = put_global(targets, mesh, P("dp"))

step = jax.jit(train_step_fn(tx, 16, 16, std_dev=cfg.scale_multiplier,
                             mesh=mesh))
params, opt_state, loss = step(params, opt_state, valid, cameras, targets_g)
loss_val = float(np.asarray(loss.addressable_shards[0].data))
assert np.isfinite(loss_val)
print(f"RESULT loss {loss_val:.9f}", flush=True)

jax.distributed.shutdown()
