"""Layer algebra Union/SymDifference/Identity (geo/layerops.py) invariants."""

import numpy as np
import pytest


def _layers(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.geo import wkb as W

    def rect(cx, cy, hx, hy):
        r = np.array(
            [[cx - hx, cy - hy], [cx + hx, cy - hy], [cx + hx, cy + hy],
             [cx - hx, cy + hy], [cx - hx, cy - hy]], dtype=np.float64)
        return W.encode_polygon([r])

    # a0 overlaps b0 and b1 (multi-partner reduction); a1 overlaps nothing;
    # a2 is fully covered by b2
    a = rd.from_items([
        {"fid": "a0", "wkb": rect(100.0, 100.0, 50.0, 50.0)},
        {"fid": "a1", "wkb": rect(1000.0, 1000.0, 40.0, 40.0)},
        {"fid": "a2", "wkb": rect(500.0, 500.0, 10.0, 10.0)},
    ])
    b = rd.from_items([
        {"fid": "b0", "wkb": rect(130.0, 100.0, 30.0, 30.0)},
        {"fid": "b1", "wkb": rect(70.0, 70.0, 20.0, 20.0)},
        {"fid": "b2", "wkb": rect(500.0, 500.0, 30.0, 30.0)},
    ])
    return a, b


def test_symdifference_areas(ray_session):
    from gdal_ray.geo.layerops import layer_boolean_areas

    a, b = _layers(ray_session)
    got = layer_boolean_areas(a, b, "symdifference", level=16).to_pandas()
    areas = dict(zip(got["fid"], got["area"]))
    # a0: 100x100 minus b0-overlap (50x60 clipped -> x[80,150]∩[50,150]=70 wide? 
    # exact: a0=[50,150]^2; b0 x[100,160] y[70,130] -> inter 50x60=3000;
    # b1 x[50,90] y[50,90] -> inter 40x40=1600; b0∩b1∩a0 empty (x disjoint)
    assert areas["a0"] == pytest.approx(10000 - 3000 - 1600)
    assert areas["a1"] == pytest.approx(6400)   # untouched passthrough
    assert areas["a2"] == pytest.approx(0.0)    # fully consumed
    assert areas["b0"] == pytest.approx(3600 - 3000)
    assert areas["b1"] == pytest.approx(1600 - 1600)
    assert areas["b2"] == pytest.approx(3600 - 400)
    assert set(got["src"]) == {"A", "B"}


def test_union_adds_pair_intersections(ray_session):
    from gdal_ray.geo.layerops import layer_boolean_areas

    a, b = _layers(ray_session)
    got = layer_boolean_areas(a, b, "union", level=16).to_pandas()
    ab = got[got["src"] == "AB"].set_index("fid")["area"]
    assert ab["a0|b0"] == pytest.approx(3000)
    assert ab["a0|b1"] == pytest.approx(1600)
    assert ab["a2|b2"] == pytest.approx(400)
    # total union area = sum of all pieces = area(A∪B) summed per component
    total = got["area"].sum()
    want = (10000 + 6400 + 400) + (3600 + 1600 + 3600) - (3000 + 1600 + 400)
    # pieces partition A∪B: residuals + intersections counted once
    assert total == pytest.approx(want)


def test_identity_emits_only_a_side(ray_session):
    from gdal_ray.geo.layerops import layer_boolean_areas

    a, b = _layers(ray_session)
    got = layer_boolean_areas(a, b, "identity", level=16).to_pandas()
    assert set(got["src"]) <= {"A", "AB"}
    areas = dict(zip(got["fid"], got["area"]))
    assert areas["a1"] == pytest.approx(6400)
    assert areas["a0|b0"] == pytest.approx(3000)


def test_union_skips_empty_intersections(ray_session):
    """Envelope-overlapping candidates with an EMPTY true intersection must
    not emit an AB pair row (reference ogrlayer.cpp Union/Identity emit a
    pair feature only when the geometries actually intersect): a rectangle
    sitting in the notch of an L-shape overlaps its envelope but not it."""
    import ray.data as rd

    from gdal_ray.geo import wkb as W
    from gdal_ray.geo.layerops import layer_boolean_areas

    lshape = np.array(
        [[0.0, 0.0], [100.0, 0.0], [100.0, 20.0], [20.0, 20.0],
         [20.0, 100.0], [0.0, 100.0], [0.0, 0.0]])
    a = rd.from_items([{"fid": "aL", "wkb": W.encode_polygon([lshape])}])
    notch = np.array(
        [[40.0, 40.0], [90.0, 40.0], [90.0, 90.0], [40.0, 90.0],
         [40.0, 40.0]])
    b = rd.from_items([{"fid": "bN", "wkb": W.encode_polygon([notch])}])
    got = layer_boolean_areas(a, b, "union", level=16).to_pandas()
    assert not (got["src"] == "AB").any()
    areas = dict(zip(got["fid"], got["area"]))
    assert areas["aL"] == pytest.approx(100 * 20 + 80 * 20)
    assert areas["bN"] == pytest.approx(50 * 50)


def test_erase_and_update(ray_session):
    from gdal_ray.geo.layerops import layer_boolean_areas

    a, b = _layers(ray_session)
    erase = layer_boolean_areas(a, b, "erase", level=16).to_pandas()
    assert set(erase["src"]) == {"A"}
    ea = dict(zip(erase["fid"], erase["area"]))
    assert ea["a0"] == pytest.approx(10000 - 3000 - 1600)
    assert ea["a1"] == pytest.approx(6400)
    assert ea["a2"] == pytest.approx(0.0)

    upd = layer_boolean_areas(a, b, "update", level=16).to_pandas()
    ua = dict(zip(upd["fid"], upd["area"]))
    # A side reduced exactly like erase; B features at FULL area
    assert ua["a0"] == pytest.approx(10000 - 3000 - 1600)
    assert ua["b0"] == pytest.approx(3600)
    assert ua["b1"] == pytest.approx(1600)
    assert ua["b2"] == pytest.approx(3600)
    # total equals area(A ∪ B) with B winning overlaps — which for a
    # partition is just sum(A\B) + sum(B)
    assert upd["area"].sum() == pytest.approx((10000 - 4600) + 6400 + 0 + 3600 + 1600 + 3600)
