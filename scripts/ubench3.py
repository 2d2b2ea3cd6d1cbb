"""Trustworthy sort/gather microbenchmarks: each iteration's input depends on
the previous iteration's output (feedback chain), and timing ends with a
scalar host readback — immune to async-dispatch artifacts."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import numpy as np

P = 3_538_944
N = 1_556_480
key = jax.random.PRNGKey(0)
k0 = jax.random.randint(key, (P,), 0, 1 << 30, jnp.int32)
vs = [jax.random.normal(jax.random.PRNGKey(i + 1), (P,), jnp.float32)
      for i in range(16)]

def timeit_chain(f, state, iters=8):
    """f(state) -> state. Chained; returns ms/iter."""
    s = f(state)
    _ = float(jax.tree_util.tree_leaves(s)[0].ravel()[0])
    t0 = time.perf_counter()
    for _i in range(iters):
        s = f(s)
    _ = float(jax.tree_util.tree_leaves(s)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def report(name, f, state):
    try:
        print(f"{name:18s}: {timeit_chain(f, state):8.2f} ms", flush=True)
    except Exception as e:
        print(f"{name:18s}: FAIL {str(e)[:100]}", flush=True)


# rotate the key by xor so each iteration's input differs but shape/dtype fixed
report("noop-xor", jax.jit(lambda k: (k ^ 12345,)), (k0,))
report("sort key-only", jax.jit(lambda k: jax.lax.sort((k ^ 1,), num_keys=1)), (k0,))

def mk_sort(nv, num_keys=1):
    @jax.jit
    def f(state):
        k, *vv = state
        out = jax.lax.sort((k ^ 1, *vv), num_keys=num_keys)
        return out
    return f

for nv in (1, 2, 4, 8, 16):
    report(f"sort key+{nv}f32", mk_sort(nv), (k0, *vs[:nv]))

report("sort 2key+8", jax.jit(
    lambda s: jax.lax.sort((s[0] ^ 1, s[1], *s[2:]), num_keys=2)),
    (k0 % 2048, k0, *vs[:8]))

# N-scale sort with 16 values (the depth pre-sort of splat fields)
kN = k0[:N]
report("sortN key+16f32", mk_sort(16), (kN, *[v[:N] for v in vs]))

# gathers/scatters with chained indices
tbl = jax.random.normal(key, (N, 16), jnp.float32)
@jax.jit
def g16(state):
    idx, = state
    out = tbl[idx % N]
    return (idx ^ out[:, 0].astype(jnp.int32),)
report("gather (P,16)", g16, (k0,))

@jax.jit
def sc1(state):
    idx, = state
    out = jnp.zeros((P,), jnp.int32).at[idx % P].set(idx)
    return (out,)
report("scatter1 P", sc1, (k0,))
