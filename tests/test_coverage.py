"""Coverage-preserving simplification oracles (gdal vector simplify-coverage).

Reference: apps/gdalalg_vector_simplify_coverage.cpp (GEOS CoverageSimplifier,
Visvalingam-Whyatt over shared arcs; autotest
utilities/test_gdalalg_vector_simplify_coverage.py checks structure only, so
exactness here is pinned by scalar VW replicas and coverage invariants).
"""

import numpy as np
import pytest

from gdal_ray.geo.coverage import (
    canonical_arc,
    detect_nodes,
    simplify_coverage,
    split_ring,
    vw_simplify_mask,
)


def ring(*pts):
    a = np.asarray(pts, dtype=np.float64)
    return np.vstack([a, a[:1]])


def area(r):
    x, y = r[:-1, 0], r[:-1, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))


def zigzag_pair(h, rect_h=8.0, width=16.0):
    """Two rectangles sharing a zigzag edge y=±h along y=0."""
    shared = [(0.0, 0.0)]
    for i, x in enumerate(np.arange(2.0, width, 2.0)):
        shared.append((x, -h if i % 2 == 0 else h))
    shared.append((width, 0.0))
    top = ring(*shared, (width, rect_h), (0.0, rect_h))
    bot = ring(*shared[::-1], (0.0, -rect_h), (width, -rect_h))
    return [[top], [bot]]


class TestVW:
    def test_hand_example(self):
        # areas: (1,1)->0.5? pts (0,0),(1,1),(2,0),(3,3),(4,0): triangle
        # (0,0)(1,1)(2,0) area 1; (1,1)(2,0)(3,3)? after removal order...
        pts = np.array([[0, 0], [1, 1], [2, 0], [3, 3], [4, 0]], dtype=float)
        keep, removals = vw_simplify_mask(pts, 1.5)
        # effective areas: idx1 = 1.0 (removed), then idx2 recomputes vs
        # (0,0),(3,3): area of (0,0),(2,0),(3,3) = 3 >= 1.5 kept; idx3 area
        # of (2,0),(3,3),(4,0) = 3 kept.
        assert keep.tolist() == [True, False, True, True, True]
        assert [i for i, _ in removals] == [1]

    def test_monotone_floor(self):
        # staircase where naive recompute would drop below the removed area
        pts = np.array(
            [[0, 0], [1, 0.1], [2, 0], [3, 0.1], [4, 0], [10, 10]], dtype=float
        )
        keep, removals = vw_simplify_mask(pts, 5.0)
        areas = [a for _, a in removals]
        assert areas == sorted(areas)  # non-decreasing removal order

    def test_endpoints_pinned(self):
        pts = np.array([[0, 0], [1, 100], [2, 0]], dtype=float)
        keep, _ = vw_simplify_mask(pts, 1e9)
        assert keep[0] and keep[2] and not keep[1]

    def test_closed_floor_three(self):
        sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)
        keep, _ = vw_simplify_mask(sq, 1e9, closed=True)
        assert keep.sum() == 3 and keep[0]


class TestTopology:
    def test_nodes_of_shared_edge(self):
        polys = zigzag_pair(1.0)
        nodes = detect_nodes([r for p in polys for r in p])
        assert (0.0, 0.0) in nodes and (16.0, 0.0) in nodes
        assert (2.0, -1.0) not in nodes  # interior shared vertex: 2 neighbours
        assert (0.0, 8.0) not in nodes  # exterior corner

    def test_split_and_canonical_shared(self):
        polys = zigzag_pair(1.0)
        nodes = detect_nodes([r for p in polys for r in p])
        arcs_a = split_ring(polys[0][0], nodes)
        arcs_b = split_ring(polys[1][0], nodes)
        keys_a = {canonical_arc(p, c)[2] for p, c in arcs_a}
        keys_b = {canonical_arc(p, c)[2] for p, c in arcs_b}
        assert len(keys_a & keys_b) == 1  # exactly the shared zigzag arc

    def test_node_free_ring_is_closed_arc(self):
        sq = ring((0, 0), (4, 0), (4, 4), (0, 4))
        arcs = split_ring(sq, detect_nodes([sq]))
        assert len(arcs) == 1 and arcs[0][1] is True


class TestSimplifyCoverage:
    def test_zigzag_collapses_consistently(self):
        polys = zigzag_pair(1.0)
        a0 = area(polys[0][0]) + area(polys[1][0])
        out = simplify_coverage(polys, tolerance=np.sqrt(17.0))
        top, bot = out[0][0], out[1][0]
        # shared edge straightened: both rectangles are now plain 4-corner
        assert len(top) == 5 and len(bot) == 5
        assert area(top) == 16 * 8 and area(bot) == 16 * 8
        # coverage preserved: total area = outer envelope, no gap/overlap
        assert area(top) + area(bot) == 16.0 * 16.0
        # before simplification the two areas differed by the zigzag bias
        assert a0 == 16.0 * 16.0

    def test_below_threshold_untouched(self):
        polys = zigzag_pair(6.0)  # min effective area 3h=18 >= 17
        out = simplify_coverage(polys, tolerance=np.sqrt(17.0))
        for p_in, p_out in zip(polys, out):
            np.testing.assert_array_equal(p_in[0], p_out[0])

    def test_shared_edge_bitwise_equal(self):
        polys = zigzag_pair(1.0, rect_h=64.0)
        # tol^2=3.5: the two edge zigzag vertices (area 3h=3) drop, their
        # neighbours recompute to area 5 and survive -> partial simplify
        out = simplify_coverage(polys, tolerance=np.sqrt(3.5))
        top, bot = out[0][0], out[1][0]
        # extract each side's version of the shared boundary (y <= h band)
        t = {tuple(p) for p in top[:-1] if abs(p[1]) <= 1.0}
        b = {tuple(p) for p in bot[:-1] if abs(p[1]) <= 1.0}
        assert t == b and len(t) >= 2

    def test_preserve_boundary(self):
        # exterior arcs (use-count 1) keep every vertex incl. redundant ones
        polys = zigzag_pair(1.0)
        # add a redundant collinear vertex on A's exterior top edge
        top = polys[0][0]
        extra = np.vstack([top[:-3], [[8.0, 8.0]], top[-3:]])
        polys[0][0] = extra
        out = simplify_coverage(polys, np.sqrt(17.0), preserve_boundary=True)
        pts = {tuple(p) for p in out[0][0]}
        assert (8.0, 8.0) in pts  # exterior redundant vertex survived
        assert (2.0, -1.0) not in pts  # shared zigzag still simplified

    def test_island_shared_closed_ring(self):
        # B is an island: A's hole ring == B's outer ring (opposite winding)
        outer = ring((0, 0), (16, 0), (16, 16), (0, 16))
        hole_pts = [(4, 4), (4, 12), (7, 8), (12, 12), (12, 4), (8, 5)]
        hole = ring(*hole_pts)  # CW (hole) orientation
        island = ring(*hole_pts[::-1])  # CCW outer of B
        polys = [[outer, hole], [island]]
        tot = area(outer)
        out = simplify_coverage(polys, tolerance=4.0)
        a_out, a_hole = out[0][0], out[0][1]
        b_out = out[1][0]
        # island boundary stays identical between A's hole and B's outer
        assert {tuple(p) for p in a_hole} == {tuple(p) for p in b_out}
        assert len(b_out) < len(island)  # actually simplified
        # winding preserved on both uses
        sa = np.sign(
            np.dot(a_hole[:-1, 0], np.roll(a_hole[:-1, 1], -1))
            - np.dot(np.roll(a_hole[:-1, 0], -1), a_hole[:-1, 1])
        )
        sb = np.sign(
            np.dot(b_out[:-1, 0], np.roll(b_out[:-1, 1], -1))
            - np.dot(np.roll(b_out[:-1, 0], -1), b_out[:-1, 1])
        )
        assert sa == -sb
        # coverage: outer - hole + island == outer
        assert area(out[0][0]) - area(a_hole) + area(b_out) == tot

    def test_collapse_guard(self):
        # sliver triangle whose apex would be removed -> zero-area ring;
        # the guard must reinstate it, and its neighbour shares the arcs.
        base = ring((0, 0), (10, 0), (10, 10), (0, 10))
        sliver = ring((0, 0), (10, 0), (5, 0.1))
        neighbour = ring((0, 0), (5, 0.1), (10, 0), (10, -10), (0, -10))
        # tol^2=4: only the sliver apex (area 0.5) is sub-threshold
        out = simplify_coverage([[sliver], [neighbour], [base]], tolerance=2.0)
        sl = out[0][0]
        assert area(sl) > 0  # did not collapse
        # neighbour still shares the (possibly reinstated) boundary
        s_pts = {tuple(p) for p in sl}
        n_pts = {tuple(p) for p in out[1][0]}
        assert s_pts <= n_pts | s_pts  # no contradiction
        tot = sum(area(out[i][0]) for i in range(3))
        tot_in = area(base) + area(sliver) + area(neighbour)
        assert tot == pytest.approx(tot_in)

    def test_distributed_matches_kernel(self, ray_session):
        """simplify_coverage_ds (2-shuffle Ray plan) == in-memory kernel."""
        import pandas as pd
        import ray.data as rd

        from gdal_ray.geo.coverage import simplify_coverage_ds
        from gdal_ray.geo.wkb import decode_polygons, encode_polygon

        # 24 independent zigzag coverages (alternating collapse/keep h),
        # offset so nothing is shared ACROSS pairs, everything within
        polys, fids, hs = [], [], []
        for k in range(24):
            h = 1.0 if k % 2 == 0 else 6.0
            pair = zigzag_pair(h)
            dx, dy = 64.0 * (k % 8), 64.0 * (k // 8)
            for j, p in enumerate(pair):
                polys.append([p[0] + np.array([dx, dy])])
                fids.append(f"f{k:03d}{'tb'[j]}")
                hs.append(h)
        tol = float(np.sqrt(17.0))
        want = simplify_coverage(polys, tol)

        ds = rd.from_pandas(
            pd.DataFrame(
                {
                    "fid": fids,
                    "h": hs,
                    "geometry": [encode_polygon(p) for p in polys],
                }
            )
        ).repartition(6)
        got = (
            simplify_coverage_ds(ds, tol, id_col="fid", num_buckets=8)
            .to_pandas()
            .set_index("fid")
        )
        assert len(got) == len(fids)
        for fid, wpoly, h in zip(fids, want, hs):
            row = got.loc[fid]
            assert row["h"] == h  # attrs survived the co-shuffle
            gpoly = decode_polygons(bytes(row["geometry"]))[0]
            assert len(gpoly) == len(wpoly)
            np.testing.assert_array_equal(gpoly[0], wpoly[0])

    def test_distributed_collapse_raises(self, ray_session):
        import pandas as pd
        import pytest as _pt
        import ray.data as rd

        from gdal_ray.geo.coverage import simplify_coverage_ds
        from gdal_ray.geo.wkb import encode_polygon

        # same construction as test_collapse_guard: the sliver's apex sits
        # on an open arc (its base endpoints are 3-way nodes), so VW can
        # legally remove it and the ring collapses — the distributed form
        # must refuse rather than silently emit a zero-area ring
        base = ring((0, 0), (10, 0), (10, 10), (0, 10))
        sliver = ring((0, 0), (10, 0), (5, 0.1))
        neighbour = ring((0, 0), (5, 0.1), (10, 0), (10, -10), (0, -10))
        ds = rd.from_pandas(
            pd.DataFrame(
                {
                    "fid": ["s", "n", "b"],
                    "geometry": [
                        encode_polygon([g]) for g in (sliver, neighbour, base)
                    ],
                }
            )
        )
        out = simplify_coverage_ds(ds, 2.0, id_col="fid", num_buckets=2)
        with _pt.raises(Exception, match="collapsed"):
            out.to_pandas()

    def test_pipeline_step(self, ray_session):
        """simplify-coverage as a registered named step (CLI `pipeline`)."""
        import pandas as pd
        import ray.data as rd

        from gdal_ray.geo.wkb import decode_polygons, encode_polygon
        from gdal_ray.pipelines.registry import Pipeline

        polys = zigzag_pair(1.0)
        ds = rd.from_pandas(
            pd.DataFrame(
                {
                    "name": ["top", "bottom"],
                    "geometry": [encode_polygon(p) for p in polys],
                }
            )
        )
        out = Pipeline(
            [("simplify-coverage", {"tolerance": float(np.sqrt(17.0))})]
        ).run(ds).to_pandas()
        assert list(out["name"]) == ["top", "bottom"]
        for buf in out["geometry"]:
            ring_out = decode_polygons(bytes(buf))[0][0]
            assert len(ring_out) == 5 and area(ring_out) == 128.0

    def test_feature_order_and_count(self):
        polys = zigzag_pair(1.0)
        out = simplify_coverage(polys, 0.0)
        assert len(out) == 2 and all(len(p) == 1 for p in out)
        np.testing.assert_array_equal(out[0][0], polys[0][0])  # tol 0 = no-op
