"""Scaling-efficiency harness: DP training step over 1..N devices.

Runs the full differentiable pipeline (project -> tiled rasterize -> L2 loss
-> backward with gradient psum) at fixed per-device batch (weak scaling) and
reports step time + efficiency vs 1 device. On CPU it uses virtual devices
(methodology check only — virtual-device times are not hardware numbers);
on a real multi-chip slice the same script produces the BASELINE.md
scaling-efficiency metric.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python scripts/scaling.py [--views-per-device 2] [--img 64]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main():
    import os

    if os.environ.get("JAX_PLATFORMS"):
        # sitecustomize may pre-register a tunneled TPU backend; the config
        # update (not just the env var) is what makes CPU stick.
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    ap = argparse.ArgumentParser()
    ap.add_argument("--views-per-device", type=int, default=2)
    ap.add_argument("--img", type=int, default=64)
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sys.path.insert(0, ".")
    from __graft_entry__ import _demo_scene
    from mesh2splat_tpu.ops.conversion import ConversionConfig, convert
    from mesh2splat_tpu.train.fit import SplatParams, train_step_fn

    devs = jax.devices()
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devs)]
    print(f"platform={devs[0].platform}, devices={len(devs)}", file=sys.stderr)

    base_time = None
    for n in sizes:
        mesh_dev = Mesh(np.asarray(devs[:n]), ("dp",))
        geom, material, cameras = _demo_scene(
            n_views=n * args.views_per_device, img=args.img
        )
        lo, hi = geom.bbox()
        cfg = ConversionConfig(resolution=args.res, layers=2)
        splats = convert(geom, material, lo, hi, cfg)

        params = SplatParams.from_splats(splats)
        valid = splats.valid
        tx = optax.adam(1e-2)
        opt_state = tx.init(params)
        targets = jnp.zeros(
            (n * args.views_per_device, args.img, args.img, 3), jnp.float32
        )

        step = jax.jit(
            train_step_fn(
                tx, args.img, args.img, std_dev=cfg.scale_multiplier,
                mesh=mesh_dev,
            )
        )
        sh_dp = NamedSharding(mesh_dev, P("dp"))
        sh_rep = NamedSharding(mesh_dev, P())
        cameras = jax.tree.map(lambda a: jax.device_put(a, sh_dp), cameras)
        targets = jax.device_put(targets, sh_dp)
        params = jax.tree.map(lambda a: jax.device_put(a, sh_rep), params)
        valid = jax.device_put(valid, sh_rep)

        params, opt_state, loss = step(params, opt_state, valid, cameras, targets)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            params, opt_state, loss = step(
                params, opt_state, valid, cameras, targets
            )
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / args.iters

        if base_time is None:
            base_time = dt
        # weak scaling: perfect = constant step time as devices grow
        eff = base_time / dt
        print(
            f"n={n:3d}  step={dt*1e3:8.2f} ms  "
            f"views/step={n*args.views_per_device:3d}  "
            f"weak-scaling efficiency={eff*100:6.1f}%"
        )


if __name__ == "__main__":
    main()
