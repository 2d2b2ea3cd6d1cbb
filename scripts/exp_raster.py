"""One-shot A/B experiment round 2: composite plane-eval mode dissection +
K_SLOTS retest. Temporary (results get folded into the defaults)."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *a, iters=10):
    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from bench import synth_mesh
    from mesh2splat_tpu.ops.conversion import ConversionConfig, calibrate, convert
    from mesh2splat_tpu.ops.projection import project_splats
    from mesh2splat_tpu.render import binning as B
    from mesh2splat_tpu.render import composite as C
    from mesh2splat_tpu.types import RenderMode, SplatFormat, make_camera

    mesh, mat = synth_mesh()
    lo, hi = mesh.bbox()
    cfg = calibrate(mesh, lo, hi, ConversionConfig(resolution=512, layers=6))
    sp = jax.jit(lambda m: convert(m, mat, lo, hi, cfg))(mesh)
    wpx, hpx = 1920, 1080
    cam = make_camera(eye=[0, 0, 3.2], center=[0, 0, 0], up=[0, 1, 0],
                      fov_y_rad=np.pi / 3, width=wpx, height=hpx)
    proj = jax.jit(lambda s: project_splats(
        s, cam, std_dev=cfg.scale_multiplier,
        render_mode=RenderMode.ALBEDO,
        splat_format=SplatFormat.MESH2SPLAT))(sp)
    jax.block_until_ready(proj)

    # ---- K_SLOTS retest with per-K calibration ---------------------------
    for k in (3, 2):
        B.K_SLOTS = k
        need = jax.jit(
            lambda p: B.required_overflow.__wrapped__(p, wpx, hpx)
        )(proj)
        c_cap = max(-(-int(need) // 8192) * 8192, 8192)
        f = jax.jit(lambda p, cc=c_cap: B.bin_pairs(
            p, wpx, hpx, cc, variant="albedo"))
        bn = f(proj)
        jax.block_until_ready(bn.fields)
        ms = timeit(f, proj)
        ms2 = timeit(f, proj)
        print(f"bin K_SLOTS={k}: {ms:7.2f}/{ms2:7.2f} ms  rows={bn.capacity} "
              f"live={int(bn.num_pairs)} dropped={int(bn.dropped_pairs)} "
              f"c_cap={c_cap}", flush=True)
    B.K_SLOTS = 3
    c_cap = B.calibrate_overflow(proj, wpx, hpx)
    binned = jax.jit(lambda p: B.bin_pairs(p, wpx, hpx, c_cap,
                                           variant="albedo"))(proj)
    jax.block_until_ready(binned.fields)

    # ---- composite: plane-eval sweep (CHUNK 128/256, prod transmit) -------
    ty, tx = B.tiles_for(wpx, hpx)
    h_arr = jnp.asarray([hpx], jnp.int32)
    ref = None
    for chunk, ev in ((128, "mxu"), (128, "vpu"), (128, "hybrid"),
                      (256, "hybrid"), (256, "vpu")):
        C.CHUNK = chunk
        C.PLANE_EVAL = ev
        C.TRANSMIT = "prod"
        fwd = jax.jit(lambda f, s: C.composite_tiles(
            f, s, h_arr, ty, tx, False, True))
        out = fwd(binned.fields, binned.tile_starts)
        jax.block_until_ready(out)
        if ref is None:
            ref = np.asarray(out[:4])
            dmax = 0.0
        else:
            dmax = float(np.max(np.abs(np.asarray(out[:4]) - ref)))
        t_f = timeit(fwd, binned.fields, binned.tile_starts)

        def loss(f):
            return jnp.mean(C.composite_tiles(
                f, binned.tile_starts, h_arr, ty, tx, False, True)[:4])

        gr = jax.jit(jax.grad(loss))
        jax.block_until_ready(gr(binned.fields))
        t_g = timeit(gr, binned.fields)
        print(f"comp CHUNK={chunk:4d} {ev:6s}: fwd {t_f:7.2f} ms  "
              f"fwd+bwd {t_g:7.2f} ms  maxdiff={dmax:.2e}", flush=True)


if __name__ == "__main__":
    main()
