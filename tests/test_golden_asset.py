"""Golden-asset validation: a production-shaped multi-primitive GLB (three
textured PBR primitives under TRS nodes, written by io.gltf.write_glb_multi)
must convert and render to the committed golden values — the regression
guard for the full GLB -> convert -> render path (reference asset shape:
README.md:44 SciFiHelmet; cap semantics: ConversionPass.cpp:20-24)."""

import os

import numpy as np
import pytest

from golden_asset import build_helmet_glb

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "helmet_golden.npz")


@pytest.fixture(scope="module")
def helmet(tmp_path_factory):
    from mesh2splat_tpu.scene import Scene

    path = tmp_path_factory.mktemp("golden") / "helmet.glb"
    tris = build_helmet_glb(str(path))
    sc = Scene.from_glb(str(path))
    assert sum(m.tri_pos.shape[0] for m, _, _ in sc.primitives) == tris
    splats = sc.convert(resolution=256, layers=6)
    return sc, splats


def _live_rows(sp):
    v = np.asarray(sp.valid)
    rows = np.concatenate([np.asarray(sp.pos), np.asarray(sp.color),
                           np.asarray(sp.scale), np.asarray(sp.normal),
                           np.asarray(sp.quat), np.asarray(sp.pbr)], -1)[v]
    return rows[np.lexsort(rows.T)]


def test_golden_no_dropped_slots(helmet):
    """The production-shaped scene must convert with ZERO budget overflow
    (round-3 verdict #6: drops used to be silent)."""
    sc, sp = helmet
    sp2, stats = sc.convert(resolution=256, layers=6, return_stats=True)
    assert int(stats["dropped_rows"]) == 0
    assert int(stats["dropped_slots"]) == 0
    assert int(stats["dropped_window"]) == 0
    assert int(sp2.count()) == int(sp.count())


def test_golden_count_and_splats(helmet):
    """Exact splat count + decimated sorted sample against the golden file:
    catches any drift in coverage decisions, TRS baking, texture sampling,
    or attribute interpolation."""
    _, sp = helmet
    g = np.load(GOLDEN)
    assert int(sp.count()) == int(g["count"])
    sample = _live_rows(sp)[::97]
    assert sample.shape == g["sample"].shape
    np.testing.assert_allclose(sample, g["sample"], atol=2e-5, rtol=0)


def test_golden_render(helmet):
    """Rendered albedo frame matches the golden image."""
    from mesh2splat_tpu.types import RenderMode

    sc, sp = helmet
    img = np.asarray(sc.render(sp, eye=[0, 0.3, 3.5], width=160, height=120,
                               mode=RenderMode.ALBEDO))
    g = np.load(GOLDEN)
    np.testing.assert_allclose(img, g["image"], atol=1e-3, rtol=0)


def test_golden_ply_roundtrip(helmet, tmp_path):
    """Export the golden conversion to all three PLY formats and re-read:
    counts survive; the standard format round-trips values through the
    sigmoid/log/SH0 codecs (reference: parsers.cpp:431-514, 516-629)."""
    from mesh2splat_tpu.io import ply

    sc, sp = helmet
    n = int(sp.count())
    mult = sc.last_config.scale_multiplier
    arrs_all = ply.splats_to_arrays(sp)
    for fmt in (0, 1, 2):
        path = tmp_path / f"helmet_{fmt}.ply"
        ply.write_ply(str(path), arrs_all, fmt=fmt, scale_multiplier=mult)
        back, has_pbr = ply.read_ply(str(path))
        assert back["pos"].shape[0] == n
        assert has_pbr == (fmt in (1, 2))
    # format 0 value fidelity
    path = tmp_path / "helmet_0.ply"
    back, _ = ply.read_ply(str(path))
    order_a = np.lexsort(arrs_all["pos"].T)
    order_b = np.lexsort(back["pos"].T)
    np.testing.assert_allclose(
        arrs_all["pos"][order_a], back["pos"][order_b], atol=1e-6
    )
    np.testing.assert_allclose(
        arrs_all["color"][order_a], back["color"][order_b], atol=1e-5
    )
