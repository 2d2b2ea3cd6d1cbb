"""Micro-benchmarks for 1M-row gathers on the real device."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

CAP = 1 << 20
N = 512 * 512


def timeit(f, *args, iters=30):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


rng = np.random.default_rng(0)
idx_rand = jnp.asarray(rng.integers(0, N, CAP, dtype=np.int32))
# coherent indices: sorted-ish blocks (like per-triangle UV coherence)
blk = rng.integers(0, N - 64, CAP // 64, dtype=np.int32)
idx_coh = jnp.asarray((blk[:, None] + np.arange(64)[None, :]).reshape(-1).astype(np.int32))

for k in (16, 40):
    tab32 = jnp.asarray(rng.standard_normal((N, k)).astype(np.float32))
    tab16 = tab32.astype(jnp.bfloat16)

    f32 = jax.jit(lambda i, t=tab32: t[i].sum())
    f16 = jax.jit(lambda i, t=tab16: t[i].astype(jnp.float32).sum())
    print(f"k={k:3d} f32 rand: {timeit(f32, idx_rand):7.2f} ms   coh: {timeit(f32, idx_coh):7.2f} ms")
    print(f"k={k:3d} bf16 rand: {timeit(f16, idx_rand):7.2f} ms   coh: {timeit(f16, idx_coh):7.2f} ms")

# small-table gather (record gather, 20k rows)
tabs = jnp.asarray(rng.standard_normal((20000, 52)).astype(np.float32))
idx_sorted = jnp.sort(jnp.asarray(rng.integers(0, 20000, CAP, dtype=np.int32)))
fs = jax.jit(lambda i: tabs[i].sum())
print(f"small-table 52c rand: {timeit(fs, idx_rand % 20000):7.2f} ms  sorted: {timeit(fs, idx_sorted):7.2f} ms")

# one-hot matmul gather for SORTED indices (window trick):
# block of S slots spans at most S+1 distinct producers.
S, W = 512, 520
B = CAP // S


@jax.jit
def onehot_gather(idx, tab):
    t = tab.shape[0]
    tab_p = jnp.pad(tab, ((0, W), (0, 0)))
    idx_b = idx.reshape(B, S)
    base = idx_b[:, 0]  # window start per block

    def body(carry, ib):
        i, b0 = ib
        win = jax.lax.dynamic_slice(tab_p, (b0, 0), (W, tab.shape[1]))
        oh = (i[:, None] - b0 == jnp.arange(W)[None, :]).astype(jnp.float32)
        return carry, oh @ win

    _, out = jax.lax.scan(body, 0, (idx_b, base))
    return out.reshape(CAP, tab.shape[1]).sum()


print(f"onehot matmul (sorted, 52c): {timeit(onehot_gather, idx_sorted, tabs):7.2f} ms")

# same with bf16 matmul operands (one-hot exact; values rounded)
@jax.jit
def onehot_gather_bf16(idx, tab):
    tab_p = jnp.pad(tab, ((0, W), (0, 0))).astype(jnp.bfloat16)
    idx_b = idx.reshape(B, S)
    base = idx_b[:, 0]

    def body(carry, ib):
        i, b0 = ib
        win = jax.lax.dynamic_slice(tab_p, (b0, 0), (W, tab.shape[1]))
        oh = (i[:, None] - b0 == jnp.arange(W)[None, :]).astype(jnp.bfloat16)
        return carry, jnp.dot(oh, win, preferred_element_type=jnp.float32)

    _, out = jax.lax.scan(body, 0, (idx_b, base))
    return out.reshape(CAP, tab.shape[1]).sum()


print(f"onehot matmul bf16 (sorted, 52c): {timeit(onehot_gather_bf16, idx_sorted, tabs):7.2f} ms")

print("--- table-size scaling (16c f32, 1M indices) ---")
for n in (16_384, 65_536, 131_072, 262_144, 1_048_576):
    tab = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))
    f = jax.jit(lambda i, t=tab: t[i].sum())
    ix = jnp.asarray(rng.integers(0, n, CAP, dtype=np.int32))
    print(f"table rows {n:8d}: {timeit(f, ix):7.2f} ms")

print("--- index-count scaling (262k-row table, 16c) ---")
tab = jnp.asarray(rng.standard_normal((N, 16)).astype(np.float32))
for m in (131_072, 262_144, 524_288, 1_048_576):
    f = jax.jit(lambda i, t=tab: t[i].sum())
    ix = jnp.asarray(rng.integers(0, N, m, dtype=np.int32))
    print(f"indices {m:8d}: {timeit(f, ix):7.2f} ms")
