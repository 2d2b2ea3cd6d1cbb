"""Small unit tests for round-5 utility surfaces: budget rounding, mip
geometry invariants, TRS composition, and the compile-cache helper."""

import numpy as np
import jax.numpy as jnp

from mesh2splat_tpu.ops import fragment
from mesh2splat_tpu.render.binning import round_pow2_budget
from mesh2splat_tpu.types import compose_trs


def test_round_pow2_budget():
    # effective floor is 2*8192 (the max() applies before bit_length)
    assert round_pow2_budget(0) == 16384
    assert round_pow2_budget(1) == 16384
    assert round_pow2_budget(16384) == 16384
    assert round_pow2_budget(16385) == 32768
    assert round_pow2_budget(1_000_000) == 1 << 20
    # exact powers of two stay put (the -1 in the policy)
    assert round_pow2_budget(1 << 20) == 1 << 20
    # always sufficient and never more than 2x the need
    for n in (3, 9000, 123456, (1 << 20) + 1):
        b = round_pow2_budget(n)
        assert b >= n and b < 2 * max(n, 16384)


def test_mip_geometry_invariants():
    """Levels halve exactly, offsets are contiguous per layer count, and
    the shift-based kernel math (w0 >> lvl) matches every level dim."""
    for h, w, k, m in [(512, 512, 2, 1), (96, 96, 1, 3), (64, 128, 4, 2)]:
        geom = fragment.mip_geometry(h, w, k, mips=True, n_layers=m)
        off_expect = 0
        for lvl, (off, lh, lw, hw_pad) in enumerate(geom):
            assert lh == h >> lvl and lw == w >> lvl  # exact halving
            assert hw_pad % k == 0 and hw_pad >= lh * lw
            assert off == off_expect
            off_expect += m * hw_pad // k
        # chain stops before odd/too-small dims
        lh_last, lw_last = geom[-1][1], geom[-1][2]
        assert lh_last % 2 or lw_last % 2 or lh_last < 16 or lw_last < 16 \
            or len(geom) == 8

    # mips off -> single level
    assert len(fragment.mip_geometry(512, 512, 2, mips=False)) == 1


def test_mip_dims_odd_stops():
    # 96 halves to 48, 24, 12 (24 >= 16 so 12 is produced), then stops
    assert fragment.mip_dims(96, 96, True) == [
        (96, 96), (48, 48), (24, 24), (12, 12)]
    # odd dimension stops immediately
    assert fragment.mip_dims(97, 96, True) == [(97, 96)]


def test_compose_trs_orthonormal_rotation():
    m = np.asarray(compose_trs(
        translation=(1, 2, 3), rotation_wxyz=(0.9, 0.1, 0.4, -0.1),
        scale=(2.0, 2.0, 2.0),
    ))
    r = m[:3, :3] / 2.0  # remove the uniform scale
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(m[:3, 3], [1, 2, 3], atol=1e-7)
    np.testing.assert_allclose(m[3], [0, 0, 0, 1], atol=0)
    # unnormalized quaternions are normalized on use
    m2 = np.asarray(compose_trs(rotation_wxyz=(1.8, 0.2, 0.8, -0.2)))
    np.testing.assert_allclose(
        m2, np.asarray(compose_trs(rotation_wxyz=(0.9, 0.1, 0.4, -0.1))),
        atol=1e-6,
    )


def test_enable_compile_cache_idempotent(tmp_path):
    from mesh2splat_tpu.utils.cache import enable_compile_cache

    d = str(tmp_path / "cache")
    assert enable_compile_cache(d) == d
    assert enable_compile_cache(d) == d  # idempotent


def test_bf16_pack_unpack_roundtrip():
    """build_pair_atlas(packed=True) lanes survive _unpack_taps at bf16
    precision, and the bit patterns are normal-range (denormal-safe)."""
    rng = np.random.default_rng(5)
    stack = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 10)).astype(np.float32))
    packed, geom = fragment.build_pair_atlas(stack, k=1, packed=True)
    ref, _ = fragment.build_pair_atlas(stack, k=1, packed=False)
    assert packed.dtype == jnp.int32
    un = fragment._unpack_taps(packed)
    got = np.asarray(un)
    want = np.asarray(ref.astype(jnp.bfloat16).astype(jnp.float32))
    np.testing.assert_array_equal(got, want)
