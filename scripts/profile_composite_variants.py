"""Time composite-kernel variants on the bench pair data (real TPU).

Usage: python scripts/profile_composite_variants.py  (spawns one subprocess
per variant so the module-level env knobs re-evaluate)."""
import os
import subprocess
import sys

VARIANTS = [
    {"MS_COMP_PRECISION": "highest", "MS_COMP_EVAL": "mxu", "MS_COMP_SCAN": "1"},
    {"MS_COMP_PRECISION": "high", "MS_COMP_EVAL": "mxu", "MS_COMP_SCAN": "1"},
    {"MS_COMP_PRECISION": "high", "MS_COMP_EVAL": "vpu", "MS_COMP_SCAN": "1"},
    {"MS_COMP_PRECISION": "high", "MS_COMP_EVAL": "vpu", "MS_COMP_SCAN": "0"},
    {"MS_COMP_PRECISION": "high", "MS_COMP_EVAL": "mxu", "MS_COMP_SCAN": "0"},
]

INNER = r"""
import sys, time
sys.path.insert(0, ".")
import dataclasses
import jax, jax.numpy as jnp
import numpy as np
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
    render_mode=RenderMode.ALBEDO, splat_format=SplatFormat.MESH2SPLAT))(sp)
c_cap = B.calibrate_overflow(proj, wpx, hpx)
binned = jax.jit(lambda p: B.bin_pairs(p, wpx, hpx, c_cap,
                                       variant="albedo"))(proj)
jax.block_until_ready(binned.fields)
ty, tx = B.tiles_for(wpx, hpx)
h_arr = jnp.asarray([hpx], jnp.int32)
salts = [jax.device_put(np.float32(i * 1e-7)) for i in range(16)]
comp_f = jax.jit(lambda e, f, s: C.composite_tiles(f + e, s, h_arr, ty, tx,
                                                   False, True))
out = comp_f(salts[9], binned.fields, binned.tile_starts)
jax.block_until_ready(out)
t0 = time.perf_counter()
for i in range(8):
    out = comp_f(salts[i], binned.fields, binned.tile_starts)
jax.block_until_ready(out)
print(f"VARIANT_MS {(time.perf_counter() - t0) / 8 * 1e3:.2f}", flush=True)
"""

which = [int(a) for a in sys.argv[1:]] or list(range(len(VARIANTS)))
for i in which:
    v = VARIANTS[i]
    env = dict(os.environ, **v)
    r = subprocess.run([sys.executable, "-c", INNER], env=env,
                       capture_output=True, text=True, timeout=1200)
    ms = [ln for ln in r.stdout.splitlines() if ln.startswith("VARIANT_MS")]
    tag = " ".join(f"{k.split('_')[-1]}={val}" for k, val in v.items())
    if ms:
        print(f"[{i}] {tag:44s}: {ms[0].split()[1]} ms", flush=True)
    else:
        print(f"[{i}] {tag:44s}: FAILED\n{r.stderr[-2000:]}", flush=True)
