"""Multi-HOST (multi-process) path: 2 processes x 4 virtual CPU devices run
the sharded conversion + data-parallel train step over ONE process-spanning
8-device mesh, and agree with the single-process 8-device result.

This is the template-mandated new capability (SURVEY.md section 2.5,
VERDICT round 1 item 4) — the reference is single-process/single-GPU.
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _parse(out: str) -> dict:
    res = {}
    for kind, val in re.findall(r"RESULT (\w+) ([-\d.e+]+)", out):
        res[kind] = float(val)
    return res


def test_two_process_mesh_matches_single_process():
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=REPO,
        )
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=840)
        assert p.returncode == 0, (
            f"worker {i} failed (rc={p.returncode})\nstdout:\n{out}\n"
            f"stderr:\n{err[-4000:]}"
        )
        outs.append(_parse(out))

    # both processes observed the same global program results
    assert outs[0] and outs[1]
    assert outs[0]["valid"] == outs[1]["valid"] > 0
    np.testing.assert_allclose(outs[0]["loss"], outs[1]["loss"], rtol=1e-6)

    # and they match the single-process 8-virtual-device reference
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import PartitionSpec as P

    from __graft_entry__ import _demo_scene
    from mesh2splat_tpu.ops.conversion import ConversionConfig, convert
    from mesh2splat_tpu.parallel.sharding import (
        convert_sharded, make_mesh, replicate, shard_batch,
    )
    from mesh2splat_tpu.train.fit import SplatParams, train_step_fn

    geom, material, cameras = _demo_scene(n_views=8, img=16)
    lo, hi = geom.bbox()
    cfg = ConversionConfig(resolution=16, layers=2)
    mesh = make_mesh(8)

    splats_g = convert_sharded(geom, material, lo, hi, cfg, mesh, axis="dp")
    n_valid = int(jnp.sum(splats_g.valid.astype(jnp.int32)))
    assert n_valid == int(outs[0]["valid"])

    splats = convert(geom, material, lo, hi, cfg)
    params = SplatParams.from_splats(splats)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    targets = jnp.zeros((8, 16, 16, 3), jnp.float32)

    params = replicate(params, mesh)
    valid = replicate(splats.valid, mesh)
    cams = shard_batch(cameras, mesh, "dp")
    targets = shard_batch(targets, mesh, "dp")

    step = jax.jit(train_step_fn(tx, 16, 16, std_dev=cfg.scale_multiplier,
                                 mesh=mesh))
    _, _, loss = step(params, opt_state, valid, cams, targets)
    np.testing.assert_allclose(float(loss), outs[0]["loss"], rtol=1e-5)
