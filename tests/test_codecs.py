"""Codec round trips for the reference's numeric conventions
(SURVEY.md section 2.3)."""

import numpy as np
import jax.numpy as jnp

from mesh2splat_tpu import types as T


def test_sigmoid_roundtrip():
    a = jnp.linspace(0.01, 0.99, 50)
    np.testing.assert_allclose(T.sigmoid(T.inv_sigmoid(a)), a, atol=1e-5)


def test_sh0_roundtrip():
    c = jnp.linspace(0.0, 1.0, 30)
    np.testing.assert_allclose(T.sh0_to_color(T.color_to_sh0(c)), c, atol=1e-6)
    # spot value: color 1.0 -> sh = 0.5/SH_C0
    np.testing.assert_allclose(
        T.color_to_sh0(jnp.float32(1.0)), 0.5 / T.SH_C0, rtol=1e-6
    )


def test_normal_encode_roundtrip():
    n = jnp.asarray(np.random.default_rng(0).normal(size=(20, 3)))
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    np.testing.assert_allclose(T.decode_normal(T.encode_normal(n)), n, atol=1e-6)


def test_oct_roundtrip():
    rng = np.random.default_rng(1)
    n = rng.normal(size=(200, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    dec = np.asarray(T.oct_decode(T.oct_encode(jnp.asarray(n))))
    cos = np.sum(dec * n, axis=-1)
    assert np.all(cos > 0.999)


def test_exponential_depth():
    # at near plane -> exp(0)=1; at far -> exp(-20)
    assert float(T.exponential_depth(0.1, 0.1, 100.0)) == 1.0
    np.testing.assert_allclose(
        float(T.exponential_depth(100.0, 0.1, 100.0)), np.exp(-20.0), rtol=1e-5
    )


def test_srgb_roundtrip():
    c = jnp.linspace(0.0, 1.0, 64)
    np.testing.assert_allclose(
        T.linear_to_srgb(T.srgb_to_linear(c)), c, atol=1e-5
    )


def test_camera_matrices():
    cam = T.make_camera(
        eye=[0, 0, 5], center=[0, 0, 0], up=[0, 1, 0],
        fov_y_rad=np.pi / 3, width=640, height=480,
    )
    # a point at the origin should be at view z = -5
    p = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    v = cam.world_to_view @ p
    np.testing.assert_allclose(v[2], -5.0, atol=1e-6)
    clip = cam.view_to_clip @ v
    ndc = clip[:3] / clip[3]
    np.testing.assert_allclose(ndc[:2], 0.0, atol=1e-6)


def test_splats_compact():
    sp = T.Splats.zeros(8)
    valid = jnp.asarray([False, True, False, True, True, False, False, True])
    pos = jnp.arange(24, dtype=jnp.float32).reshape(8, 3)
    sp = T.Splats(pos=pos, color=sp.color, scale=sp.scale, normal=sp.normal,
                  quat=sp.quat, pbr=sp.pbr, valid=valid)
    c = sp.compact()
    assert int(c.count()) == 4
    np.testing.assert_array_equal(np.asarray(c.valid)[:4], True)
    np.testing.assert_array_equal(np.asarray(c.pos)[:4], np.asarray(pos)[[1, 3, 4, 7]])


def test_block_atlas_sampling_exact():
    """Blocked tap atlas sampling (alternative gather layout) is bit-exact
    vs direct bilinear sampling."""
    import numpy as np
    import jax.numpy as jnp

    from mesh2splat_tpu.ops.sampling import (
        build_block_atlas, sample_bilinear, sample_bilinear_block_atlas)

    rng = np.random.default_rng(0)
    tex = jnp.asarray(rng.uniform(0, 1, (32, 32, 4)).astype(np.float32))
    uv = jnp.asarray(rng.uniform(-0.2, 1.2, (2000, 2)).astype(np.float32))
    ref = sample_bilinear(tex, uv)
    out = sample_bilinear_block_atlas(build_block_atlas(tex), 32, 32, 4, uv)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
