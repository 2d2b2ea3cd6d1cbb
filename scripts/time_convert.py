"""Delta-timing of convert() on the bench mesh: robust to the axon tunnel's
unreliable block_until_ready (measures (t[N+1 iters] - t[1 iter]) / N with a
forced scalar readback)."""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp
from bench import synth_mesh
from mesh2splat_tpu.ops.conversion import ConversionConfig, calibrate, convert

mesh, mat = synth_mesh()
lo, hi = mesh.bbox()
cfg = calibrate(mesh, lo, hi, ConversionConfig(resolution=512, layers=6))
fn = jax.jit(lambda m: convert(m, mat, lo, hi, cfg))

def run(n):
    t0 = time.perf_counter()
    for _ in range(n):
        sp = fn(mesh)
    _ = float(np.asarray(sp.count()))
    return time.perf_counter() - t0

run(2)
t1 = min(run(1) for _ in range(3))
tn = min(run(21) for _ in range(2))
print(f"convert: {(tn - t1)/20*1e3:.2f} ms/iter  (1-iter incl RTT: {t1*1e3:.1f} ms)")
