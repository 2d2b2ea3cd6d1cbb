"""Cubemap shadow + PCF tests (reference H14 + deferredPS:70-99)."""

import numpy as np
import jax.numpy as jnp

from mesh2splat_tpu.types import Splats
from mesh2splat_tpu.render import shadows as SH


def blob(pos, scale=0.05, n_pad=0):
    pos = np.atleast_2d(np.asarray(pos, np.float32))
    n = pos.shape[0]
    total = n + n_pad
    return Splats(
        pos=jnp.asarray(np.pad(pos, ((0, n_pad), (0, 0)))),
        color=jnp.asarray(np.tile([1, 1, 1, 1.0], (total, 1)).astype(np.float32)),
        scale=jnp.full((total, 3), scale),
        normal=jnp.asarray(np.tile([0, 0, 1.0], (total, 1)).astype(np.float32)),
        quat=jnp.asarray(np.tile([1.0, 0, 0, 0], (total, 1)).astype(np.float32)),
        pbr=jnp.zeros((total, 2)),
        valid=jnp.asarray(np.arange(total) < n),
    )


def test_dominant_face():
    d = jnp.asarray([
        [1, 0.1, 0.1], [-1, 0, 0], [0.1, 2, 0], [0, -3, 0.1], [0, 0, 5], [0.1, 0, -4],
    ])
    np.testing.assert_array_equal(np.asarray(SH.dominant_face(d)), [0, 1, 2, 3, 4, 5])


def test_occluder_casts_shadow():
    """Splat between light and a query point -> shadowed; the opposite
    direction -> lit."""
    light = [0.0, 0.0, 0.0]
    # occluder at distance 1 along +X; blocker must cover the direction cone
    sp = blob([[1.0, 0, 0]], scale=0.2)
    cm = SH.render_shadow_cubemap(sp, light, far=10.0, std_dev=1.0, size=64)
    # the +X face stores radial depth ~0.1 at its center
    face_px = np.asarray(cm.faces[0])
    assert face_px[32, 32] < 0.2
    # behind the occluder at distance 3 along +X -> in shadow
    shadow = SH.pcf_shadow_factor(cm, jnp.asarray([[3.0, 0.0, 0.0]]))
    assert float(shadow[0]) > 0.9
    # in front of the occluder (distance 0.5) -> lit
    lit = SH.pcf_shadow_factor(cm, jnp.asarray([[0.5, 0.0, 0.0]]))
    assert float(lit[0]) < 0.1
    # other direction (-X) -> lit
    lit2 = SH.pcf_shadow_factor(cm, jnp.asarray([[-3.0, 0.0, 0.0]]))
    assert float(lit2[0]) < 0.1


def test_empty_scene_all_lit():
    sp = blob([[1.0, 0, 0]], n_pad=4)
    sp = Splats(pos=sp.pos, color=sp.color, scale=sp.scale, normal=sp.normal,
                quat=sp.quat, pbr=sp.pbr, valid=jnp.zeros_like(sp.valid))
    cm = SH.render_shadow_cubemap(sp, [0, 0, 0], far=10.0, std_dev=1.0, size=32)
    np.testing.assert_allclose(np.asarray(cm.faces), 1.0)
    s = SH.pcf_shadow_factor(cm, jnp.asarray([[2.0, 1.0, 0.5]]))
    assert float(s[0]) == 0.0


def test_cubemap_sample_roundtrip():
    """Value written at a face center reads back for that direction."""
    faces = jnp.ones((6, 16, 16))
    faces = faces.at[2, 8, 8].set(0.25)  # +Y face center
    v = SH.sample_cubemap(faces, jnp.asarray([[0.0, 1.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(v), [0.25])


def test_tiled_shadow_matches_dense():
    """Production (tiled first-hit) shadow faces match the dense min
    rasterizer on an opaque test scene."""
    import numpy as np
    import jax.numpy as jnp

    from mesh2splat_tpu.render.shadows import render_shadow_cubemap
    from mesh2splat_tpu.types import Splats

    rng = np.random.default_rng(7)
    n = 400
    pos = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    sp = Splats(
        pos=jnp.asarray(pos),
        color=jnp.concatenate(
            [jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
             jnp.ones((n, 1))], -1),
        scale=jnp.full((n, 3), 0.03, jnp.float32),
        normal=jnp.broadcast_to(jnp.asarray([0, 0, 1.0]), (n, 3)),
        quat=jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0]), (n, 4)),
        pbr=jnp.full((n, 2), 0.5, jnp.float32),
        valid=jnp.ones((n,), bool),
    )
    light, far = [0.0, 0.0, 3.0], 10.0
    dense = render_shadow_cubemap(sp, light, far, std_dev=1.0, size=64,
                                  method="dense")
    tiled = render_shadow_cubemap(sp, light, far, std_dev=1.0, size=64,
                                  method="tiled")
    d = np.asarray(dense.faces)
    t = np.asarray(tiled.faces)
    # identical coverage, and depth agrees where covered (first-hit vs exact
    # min differ only on sub-pixel z/radial order inversions)
    cov_d, cov_t = d < 1.0, t < 1.0
    assert (cov_d == cov_t).mean() > 0.999
    both = cov_d & cov_t
    # radial-sorted first hit == exact min up to the kernel's 0.9999 alpha
    # clamp (1e-4 relative)
    assert np.abs(d[both] - t[both]).max() < 2e-3


def test_shadow_model_transform_equals_baked():
    """Shadows honor the per-model transform (G9 applies the model matrix
    before face binning): a translated model must produce the same cubemap
    as splats with the translation baked into their positions."""
    import dataclasses

    import numpy as np
    import jax.numpy as jnp

    from mesh2splat_tpu.render.shadows import render_shadow_cubemap
    from mesh2splat_tpu.types import Splats, compose_trs

    rng = np.random.default_rng(11)
    n = 200
    pos = rng.uniform(-0.8, 0.8, (n, 3)).astype(np.float32)
    sp = Splats(
        pos=jnp.asarray(pos),
        color=jnp.concatenate(
            [jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
             jnp.ones((n, 1))], -1),
        scale=jnp.full((n, 3), 0.05, jnp.float32),
        normal=jnp.broadcast_to(jnp.asarray([0, 0, 1.0]), (n, 3)),
        quat=jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0]), (n, 4)),
        pbr=jnp.full((n, 2), 0.5, jnp.float32),
        valid=jnp.ones((n,), bool),
    )
    d = np.array([0.3, -0.1, 0.2], np.float32)
    light, far = [0.0, 0.5, 3.0], 10.0

    moved = render_shadow_cubemap(
        sp, light, far, std_dev=1.0, size=64, method="tiled",
        model_to_world=compose_trs(translation=d),
    )
    baked = render_shadow_cubemap(
        dataclasses.replace(sp, pos=sp.pos + d), light, far,
        std_dev=1.0, size=64, method="tiled",
    )
    np.testing.assert_allclose(np.asarray(moved.faces),
                               np.asarray(baked.faces), atol=1e-5)
    # and the transform must actually change the map vs identity
    base = render_shadow_cubemap(sp, light, far, std_dev=1.0, size=64,
                                 method="tiled")
    assert np.abs(np.asarray(moved.faces) - np.asarray(base.faces)).max() > 1e-3

    # full TRS (rotation + non-uniform scale): the fused single-pass
    # projection's model-rotation fold and model_scale^2 decode must match
    # the dense path, which routes through ops/projection.py verbatim
    trs = compose_trs(translation=(0.1, 0.2, -0.1),
                      rotation_wxyz=(0.9, 0.1, 0.4, -0.1),
                      scale=(1.2, 0.8, 1.05))
    fused = render_shadow_cubemap(sp, light, far, std_dev=1.0, size=64,
                                  method="tiled", model_to_world=trs)
    dense = render_shadow_cubemap(sp, light, far, std_dev=1.0, size=64,
                                  method="dense", model_to_world=trs)
    f, dn = np.asarray(fused.faces), np.asarray(dense.faces)
    cov_f, cov_d = f < 1.0, dn < 1.0
    assert cov_f.mean() > 0.005  # scene actually covers pixels
    assert (cov_f == cov_d).mean() > 0.995
    both = cov_f & cov_d
    np.testing.assert_allclose(f[both], dn[both], atol=5e-3)
