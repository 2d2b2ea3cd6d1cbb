"""Isolated lax.sort cost at bench-scene row/operand counts (real TPU)."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import numpy as np

rows = 1536000 * 3 + 483328
key = np.random.default_rng(0).integers(0, 2**31, rows).astype(np.uint32)
keyj = jnp.asarray(key)
vals9 = [jnp.asarray(np.random.rand(rows).astype(np.float32)) for _ in range(9)]
rowid = jnp.arange(rows, dtype=jnp.int32)


def timeit(f, *a, iters=10):
    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "1"):
    f = jax.jit(lambda k, *v: jax.lax.sort((k, *v), num_keys=1))
    print(f"sort 1k+9v   : {timeit(f, keyj, *vals9):8.2f} ms  rows={rows}", flush=True)
if which in ("all", "2"):
    f = jax.jit(lambda k, r, *v: jax.lax.sort((k, r, *v), num_keys=1))
    print(f"sort 1k+r+9v : {timeit(f, keyj, rowid, *vals9):8.2f} ms", flush=True)
if which in ("all", "3"):
    key2 = jnp.asarray((key >> 11).astype(np.int32))
    f = jax.jit(lambda a, b, *v: jax.lax.sort((a, b, *v), num_keys=2))
    print(f"sort 2k+9v   : {timeit(f, key2, keyj, *vals9):8.2f} ms", flush=True)
if which in ("all", "4"):
    f = jax.jit(lambda k: jax.lax.sort((k,), num_keys=1))
    print(f"sort key only: {timeit(f, keyj):8.2f} ms", flush=True)
if which in ("all", "5"):
    # key + packed-value pairs: 9 f32 -> 5 ops (simulate bf16 packing)
    vals5 = vals9[:5]
    f = jax.jit(lambda k, *v: jax.lax.sort((k, *v), num_keys=1))
    print(f"sort 1k+5v   : {timeit(f, keyj, *vals5):8.2f} ms", flush=True)
