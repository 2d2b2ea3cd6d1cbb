"""Native C++ PLY codec vs the numpy reference implementation: byte-exact."""

import numpy as np
import pytest

from mesh2splat_tpu.io import native, ply
from tests.test_ply import make_arrays


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native library unavailable (no toolchain)")
    return True


@pytest.mark.parametrize("fmt", [0, 1, 2])
def test_native_encode_matches_python(lib_ok, fmt):
    """Bit-identical to the numpy writer except for <=1 ULP in the opacity
    inv-sigmoid (libm log vs numpy log rounding)."""
    arrs = make_arrays(101, seed=fmt)
    mult = 0.25
    py_writer = {0: ply.write_ply_standard, 1: ply.write_ply_pbr,
                 2: ply.write_ply_compressed}[fmt]
    expected = py_writer(arrs, mult)
    body = native.encode(fmt, arrs, mult)
    assert body is not None
    got = ply._header(101, ply._FMT_PROPS[fmt]) + body
    assert len(got) == len(expected)
    if got == expected:
        return
    eb = expected.partition(b"end_header\n")[2]
    if fmt in (0, 1):
        stride = 62 if fmt == 0 else 19
        # transcendental columns: opacity inv-sigmoid + log scales
        ulp_cols = {54, 55, 56, 57} if fmt == 0 else {11, 12, 13, 14}
        e = np.frombuffer(eb, "<f4").reshape(101, stride)
        g = np.frombuffer(body, "<f4").reshape(101, stride)
        bad = np.argwhere(e != g)
        assert set(bad[:, 1].tolist()) <= ulp_cols, bad
        ei = e.view(np.int32)
        gi = g.view(np.int32)
        assert np.abs(ei - gi).max() <= 2
    else:
        dt = np.dtype(
            [("pos", "<f4", 3), ("rgba", "u1", 4), ("rot", "<f4", 4),
             ("scale", "<f4", 3), ("octa", "u1", 2), ("rm", "u1", 2)]
        )
        e = np.frombuffer(eb, dtype=dt)
        g = np.frombuffer(body, dtype=dt)
        for f in ("pos", "rgba", "rot", "octa", "rm"):
            np.testing.assert_array_equal(e[f], g[f], err_msg=f)
        assert np.abs(
            e["scale"].view(np.int32) - g["scale"].view(np.int32)
        ).max() <= 2  # log ULPs


def test_write_ply_uses_native_and_roundtrips(lib_ok, tmp_path):
    arrs = make_arrays(37, seed=9)
    p = tmp_path / "n.ply"
    ply.write_ply(p, arrs, fmt=1, scale_multiplier=0.5, use_native=True)
    out, has_pbr = ply.read_ply(p)
    assert has_pbr
    np.testing.assert_allclose(out["pos"], arrs["pos"], atol=1e-6)
    np.testing.assert_allclose(out["scale"], arrs["scale"] * 0.5, rtol=1e-4)


def test_native_opacity_one_is_inf(lib_ok):
    arrs = make_arrays(4, seed=1)
    arrs["color"][:, 3] = 1.0
    body = native.encode(1, arrs, 1.0)
    rec = np.frombuffer(body, dtype="<f4").reshape(4, 19)
    assert np.all(np.isinf(rec[:, 11]))  # opacity column


def test_native_decode_matches_python(lib_ok, tmp_path):
    arrs = make_arrays(53, seed=3)
    p = tmp_path / "d.ply"
    ply.write_ply(p, arrs, fmt=1, scale_multiplier=1.0)
    with open(p, "rb") as f:
        num, props, off, is_ascii = ply._parse_ply_header(f)
        body = np.fromfile(f, dtype="<f4").reshape(num, len(props))
    names = [n for n, _ in props]
    offsets = {
        "xyz": names.index("x"), "normal": names.index("nx"),
        "fdc": names.index("f_dc_0"), "opacity": names.index("opacity"),
        "scale": names.index("scale_0"), "rot": names.index("rot_0"),
        "metal": names.index("metallicFactor"),
        "rough": names.index("roughnessFactor"),
    }
    dec = native.decode_float_body(num, len(props), offsets, body)
    ref, _ = ply.read_ply(p)
    for k in ("pos", "color", "scale", "normal", "quat", "pbr"):
        np.testing.assert_allclose(dec[k], ref[k], rtol=1e-5, atol=1e-6, err_msg=k)


def test_native_accessor_decode_matches_numpy():
    import numpy as np

    from mesh2splat_tpu.io import native

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(0)
    # interleaved u16-normalized UVs with stride 12
    raw = rng.integers(0, 65535, (7, 6), dtype=np.uint16).tobytes()
    out = native.accessor_decode(raw, 7, 2, 5123, 12, True)
    ref = np.frombuffer(raw, np.uint16).reshape(7, 6)[:, :2] / 65535.0
    np.testing.assert_allclose(out, ref.astype(np.float32), atol=1e-7)

    # f32 strided
    raw = rng.standard_normal((5, 5)).astype(np.float32).tobytes()
    out = native.accessor_decode(raw, 5, 3, 5126, 20, False)
    ref = np.frombuffer(raw, np.float32).reshape(5, 5)[:, :3]
    np.testing.assert_array_equal(out, ref)


def test_native_assemble_matches_python_loader():
    """Native triangle assembly == the numpy path in io/gltf.py for a real
    GLB (incl. flat-normal and tangent fallbacks)."""
    import pathlib
    import tempfile

    import numpy as np

    from mesh2splat_tpu.io import native

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(1)
    v = rng.uniform(-1, 1, (30, 3)).astype(np.float32)
    idx = np.arange(30, dtype=np.uint32)
    world = np.eye(4, dtype=np.float32)
    world[:3, 3] = [0.5, -0.25, 2.0]
    nmat = np.eye(3, dtype=np.float32)
    uv = rng.uniform(0, 1, (30, 2)).astype(np.float32)

    tp, tn, tuv, tt = native.assemble_triangles(
        v, None, uv, None, idx, world, nmat
    )
    # positions transformed
    ref_pos = (v @ world[:3, :3].T + world[:3, 3])[idx.reshape(-1, 3)]
    np.testing.assert_allclose(tp, ref_pos, atol=1e-6)
    # flat normals: unit, orthogonal to both edges
    e1 = tp[:, 1] - tp[:, 0]
    e2 = tp[:, 2] - tp[:, 0]
    np.testing.assert_allclose(np.linalg.norm(tn[:, 0], axis=-1), 1, atol=1e-5)
    dot = np.abs(np.einsum("ij,ij->i", tn[:, 0], e1))
    assert dot.max() < 1e-4
    # tangent fallback: unit xyz, handedness +-1
    np.testing.assert_allclose(
        np.linalg.norm(tt[..., :3], axis=-1), 1, atol=1e-4
    )
    assert set(np.unique(np.abs(tt[..., 3]))) == {1.0}
