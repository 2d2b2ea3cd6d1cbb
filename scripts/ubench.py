"""Microbenchmarks of the TPU primitive costs that the binning design rests
on: gather/scatter per-row cost vs width, lax.sort vs operand count, cummax
fills, histograms. Run on real TPU; numbers feed render/binning.py design
comments."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import numpy as np

P = 3_538_944
N = 1_556_480

def timeit(f, *a, iters=20):
    out = f(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3

key = jax.random.PRNGKey(0)
idxP = jax.random.randint(key, (P,), 0, N, jnp.int32)
idxP_sorted = jnp.sort(idxP)
tblN32 = jax.random.normal(key, (N, 32), jnp.float32)
tblN16 = tblN32[:, :16]
tblN8 = tblN32[:, :8]
col1 = jax.random.randint(key, (N,), 0, 1 << 30, jnp.int32)
valsP = jax.random.randint(key, (P,), 0, 1 << 30, jnp.int32)
f32P = jax.random.normal(key, (P,), jnp.float32)
tiny = jnp.arange(2026, dtype=jnp.int32)
tileP = jax.random.randint(key, (P,), 0, 2026, jnp.int32)
f32N = jax.random.normal(key, (N,), jnp.float32)
offN = jnp.sort(jax.random.randint(key, (N,), 0, P, jnp.int32))
rowsP8 = jnp.take(tblN8, idxP % N, axis=0)
tileP_sorted = jnp.sort(tileP)

bench = {
    "gather (P,32)f32": (lambda i: tblN32[i], idxP),
    "gather (P,16)f32": (lambda i: tblN16[i], idxP),
    "gather (P,8)f32": (lambda i: tblN8[i], idxP),
    "gather (P,)i32": (lambda i: col1[i], idxP),
    "gather sorted-idx (P,32)": (lambda i: tblN32[i], idxP_sorted),
    "gather tiny-table (P,)": (lambda i: tiny[i], tileP),
    "take axis1 (32,P)": (lambda i: jnp.take(tblN32.T, i, axis=1), idxP),
    "scatter-set 1D P": (
        lambda d, v: jnp.zeros((P,), jnp.int32).at[d].set(v), valsP % P, valsP),
    "scatter-set (P,8)rows": (
        lambda d, v: jnp.zeros((P, 8), jnp.float32).at[d].set(v),
        valsP % P, rowsP8),
    "scatter-add 1D P->2026": (
        lambda t: jnp.zeros((2026,), jnp.int32).at[t].add(1), tileP),
    "sort P 1op": (lambda k: jax.lax.sort((k,), num_keys=1)[0], valsP),
    "sort P 2op": (lambda k, v: jax.lax.sort((k, v), num_keys=1)[0], valsP, idxP),
    "sort P 2key3op": (
        lambda k, v, w: jax.lax.sort((k, v, w), num_keys=2)[0],
        tileP, valsP, idxP),
    "sort P 1key+8f32": (
        lambda k, *vs: jax.lax.sort((k, *vs), num_keys=1)[0],
        valsP, *(f32P + i for i in range(8))),
    "sort N 1key+2op": (
        lambda k, a, b: jax.lax.sort((k, a, b), num_keys=1)[0],
        col1, jnp.arange(N, dtype=jnp.int32), col1),
    "argsort N f32": (lambda k: jnp.argsort(k), f32N),
    "cummax P": (jax.lax.cummax, valsP),
    "cumsum P": (jnp.cumsum, valsP),
    "fill N->P (scatter+cummax)": (
        lambda off, v: jax.lax.cummax(
            jnp.zeros((P + 1,), jnp.int32).at[off].max(v + 1)[:P]) - 1,
        offN, col1),
    "searchsorted 2027 in P": (
        lambda s: jnp.searchsorted(s, jnp.arange(2027, dtype=jnp.int32)),
        tileP_sorted),
    "onehot-matmul hist": (
        lambda t: jnp.sum(
            jax.nn.one_hot(t.reshape(-1, 512) % 2048, 2048, dtype=jnp.float32),
            axis=(0, 1)), tileP[: (P // 512) * 512]),
    "write (P,32) copy": (lambda x: x * 2.0, rowsP8),
    "gather+reshape (P,32)->128": (lambda i: tblN32[i].reshape(-1, 128), idxP),
}

for name, (fn, *args) in bench.items():
    try:
        print(f"{name:28s}: {timeit(jax.jit(fn), *args):8.2f} ms", flush=True)
    except Exception as e:
        print(f"{name:28s}: FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)
