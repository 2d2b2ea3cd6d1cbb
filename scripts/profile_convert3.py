import sys, time, dataclasses
import jax, jax.numpy as jnp
sys.path.insert(0, ".")
from bench import synth_mesh
from mesh2splat_tpu.ops import segments
from mesh2splat_tpu.ops.conversion import ConversionConfig, convert, calibrate
import numpy as np

def timeit(f, *args, iters=20):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3

mesh, mat = synth_mesh()
lo, hi = mesh.bbox()
cfg = ConversionConfig(resolution=512, layers=6)
cal = calibrate(mesh, lo, hi, cfg)
print("cap:", cal.capacity, "row_cap:", cal.row_capacity)

full = jax.jit(lambda m: convert(m, mat, lo, hi, cal))
print(f"full convert calibrated: {timeit(full, mesh):7.2f} ms")

# scan variants at 1.5M
cap = cal.capacity
rng = np.random.default_rng(0)
T = 300_000
counts = jnp.asarray(rng.integers(0, 10, T, dtype=np.int32))
offsets = jnp.cumsum(counts) - counts
extra = jnp.asarray(rng.integers(0, 1 << 24, (3, T), dtype=np.int32))

e3 = jax.jit(lambda o, c: segments.expand_to_slots(o, c, cap))
e6 = jax.jit(lambda o, c, e: segments.expand_to_slots(o, c, cap, extra=e))
print(f"expand 3ch last_set: {timeit(e3, offsets, counts):7.2f} ms")
print(f"expand 6ch last_set: {timeit(e6, offsets, counts, extra):7.2f} ms")

# cummax variant
def expand_cummax(offsets, counts, capacity):
    t = offsets.shape[0]
    starts = jnp.where(counts > 0, offsets, capacity)
    idx = jnp.clip(starts, 0, capacity)
    ids = jnp.arange(1, t + 1, dtype=jnp.int32)
    def scat(v):
        return jnp.zeros((capacity + 1,), jnp.int32).at[idx].max(v)[:capacity]
    a = jax.lax.cummax(scat(ids))
    b = jax.lax.cummax(scat(offsets + 1))
    c = jax.lax.cummax(scat(offsets + counts))
    return a - 1, b - 1, c

ec = jax.jit(lambda o, c: expand_cummax(o, c, cap))
print(f"expand 3ch cummax:   {timeit(ec, offsets, counts):7.2f} ms")

# single-channel scans for scaling reference
one = jax.jit(lambda x: jax.lax.cummax(x))
x = jnp.asarray(rng.integers(0, 100, cap, dtype=np.int32))
print(f"single cummax 1.5M:  {timeit(one, x):7.2f} ms")
onea = jax.jit(lambda x: jax.lax.associative_scan(jnp.maximum, x))
print(f"single ascan 1.5M:   {timeit(onea, x):7.2f} ms")
