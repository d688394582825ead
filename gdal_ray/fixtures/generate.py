"""Deterministic synthetic corpus generator (FIXTURES.md).

Produces the exact BASELINE.json input_hint table shape
``(image_id, bytes, w, h, fmt, caption, phash)`` plus the geospatial side
tables (placements, polygons, query_points, rasters) and precomputed oracle
tables. Everything is keyed by ``(seed, i)`` Philox streams so any row is
reproducible in isolation (generation can run inside Ray tasks at scale).

No external data; no GDAL at runtime. Oracles are computed with the
independent scalar implementations in ``gdal_ray.fixtures.oracle``.
Output is Parquet with Lance-identical schema (the ``lance`` package is not
available in this environment; swap writer when it is).
"""

from __future__ import annotations

import os
import pathlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from gdal_ray.fixtures import oracle as O
from gdal_ray.io import codec as C
from gdal_ray.io import phash as PH

__all__ = ["generate_corpus", "corpus_dir", "make_image"]

from gdal_ray.config import CELL_LEVEL, TILE_ZOOMS

FIXTURE_ROOT = os.environ.get("GDAL_RAY_FIXTURE_DIR", "/tmp/gdal_ray_fixtures")

# five fixed "urban" hotspots (lon, lat)
HOTSPOTS = [(-74.0, 40.7), (2.35, 48.85), (139.7, 35.7), (-43.2, -22.9), (77.2, 28.6)]
CATEGORIES = [f"cat{j}" for j in range(8)]


def _rng(seed: int, *key) -> np.random.Generator:
    k = [seed, 0, 0]
    k[1 : 1 + len(key)] = key
    packed = (np.uint64(k[0]) << np.uint64(32)) | np.uint64(k[1])
    return np.random.Generator(np.random.Philox(key=np.array([packed, np.uint64(k[2])], dtype=np.uint64)))


def make_image(seed: int, i: int, w: int, h: int) -> np.ndarray:
    """Seeded gradient + sines + mild noise RGB image, reproducible from i."""
    r = _rng(seed, 1, i)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    fx, fy = r.uniform(0.5, 4.0, 2)
    phase = r.uniform(0, 2 * np.pi, 3)
    base = (
        60 * np.sin(2 * np.pi * fx * xx / w + phase[0])
        + 60 * np.cos(2 * np.pi * fy * yy / h + phase[1])
        + 120 * (xx + yy) / (w + h)
    )
    # noise sigma=2: visible grain for the phash/near-dup fixtures while a
    # q92 4:4:4 JPEG round-trip still clears the 40 dB oracle gate (the
    # sigma=3/q97 combination doubled the entropy-decode cost for the same
    # coverage)
    img = np.stack(
        [base + 40 * np.sin(phase[2] + k) + r.normal(0, 2, (h, w)) for k in range(3)], axis=2
    )
    return np.clip(img + 96, 0, 255).astype(np.uint8)


def _image_rows(seed, lo, hi, size_idx_w, size_idx_h, is_jpeg, ref_dir):
    """Rows [lo, hi) of the images table — deterministic per (seed, i),
    callable inside Ray tasks for parallel corpus generation."""
    ids, blobs, ws, hs, fmts, captions, hashes = [], [], [], [], [], [], []
    sizes = np.array([64, 128, 256])
    for i in range(lo, hi):
        image_id = f"img{i:08d}"
        if i % 100 == 99 and i > lo:  # ~1% near-duplicates of the previous image
            # FIXTURES invariant: planted pairs have STORED phash hamming <= 2
            # (hashes are of the decoded payload, so the check runs after the
            # codec round trip; retries shrink the jitter, fallback = exact copy)
            w, h = int(ws[-1]), int(hs[-1])
            base = make_image(seed, i - 1, w, h)
            prev_hash = hashes[-1]
            img = None
            for attempt in range(3):
                jit = _rng(seed, 2, i * 4 + attempt).integers(-1, 2, base.shape, dtype=np.int16)
                if attempt > 0:
                    jit = jit * (attempt == 1)  # second try: zero jitter
                cand = np.clip(base.astype(np.int16) + jit, 0, 255).astype(np.uint8)
                blob_c = C.encode_jpeg(cand) if is_jpeg[i] else C.encode_png(cand)
                fmt_c = "jpeg" if is_jpeg[i] else "png"
                hh = int(PH.phash64(C.decode_image(blob_c, fmt_c)))
                from gdal_ray.io.phash import hamming64 as _ham

                if int(_ham(hh, prev_hash)) <= 2:
                    img = cand
                    break
            if img is None:  # copy previous row verbatim (hamming 0)
                ids.append(image_id)
                blobs.append(blobs[-1])
                ws.append(w)
                hs.append(h)
                fmts.append(fmts[-1])
                captions.append(
                    f"A synthetic scene {image_id}: {w}x{h} {fmts[-1]} tile with seeded gradients."
                )
                hashes.append(prev_hash)
                if ref_dir is not None:
                    np.save(ref_dir / f"{image_id}.npy", np.load(ref_dir / f"img{i-1:08d}.npy"))
                continue
        else:
            w = int(sizes[size_idx_w[i]])
            h = int(sizes[size_idx_h[i]])
            img = make_image(seed, i, w, h)
        if is_jpeg[i]:
            blob = C.encode_jpeg(img)
            fmt = "jpeg"
        else:
            blob = C.encode_png(img)
            fmt = "png"
        ids.append(image_id)
        blobs.append(blob)
        ws.append(w)
        hs.append(h)
        fmts.append(fmt)
        captions.append(f"A synthetic scene {image_id}: {w}x{h} {fmt} tile with seeded gradients.")
        hashes.append(int(PH.phash64(C.decode_image(blob, fmt))))
        if ref_dir is not None:
            np.save(ref_dir / f"{image_id}.npy", img)
    return ids, blobs, ws, hs, fmts, captions, hashes


def _gen_images(seed, n, out, pixel_refs: bool):
    r = _rng(seed, 0)
    size_idx_w = r.choice(3, size=n, p=[0.5, 0.35, 0.15])
    size_idx_h = r.choice(3, size=n, p=[0.5, 0.35, 0.15])
    is_jpeg = r.random(n) < 0.2
    ref_dir = out / "pixels_ref"
    if pixel_refs:
        ref_dir.mkdir(exist_ok=True)

    use_ray = False
    if n >= 4000:
        try:
            import ray

            use_ray = ray.is_initialized()
        except Exception:
            use_ray = False
    if use_ray:
        import ray

        # chunk boundaries on multiples of 100 so near-dup pairs (i%100==99
        # copies i-1) never straddle a chunk
        chunk = 1000
        gen = ray.remote(_image_rows)
        futs = [
            gen.remote(seed, lo, min(lo + chunk, n), size_idx_w, size_idx_h, is_jpeg,
                       ref_dir if pixel_refs else None)
            for lo in range(0, n, chunk)
        ]
        parts = ray.get(futs)
        ids = [x for p in parts for x in p[0]]
        blobs = [x for p in parts for x in p[1]]
        ws = [x for p in parts for x in p[2]]
        hs = [x for p in parts for x in p[3]]
        fmts = [x for p in parts for x in p[4]]
        captions = [x for p in parts for x in p[5]]
        hashes = [x for p in parts for x in p[6]]
    else:
        ids, blobs, ws, hs, fmts, captions, hashes = _image_rows(
            seed, 0, n, size_idx_w, size_idx_h, is_jpeg, ref_dir if pixel_refs else None
        )
    t = pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(fmts, pa.string()),
            "caption": pa.array(captions, pa.string()),
            "phash": pa.array(hashes, pa.int64()),
        }
    )
    # sharded layout: images.parquet is a DIRECTORY of part files so
    # distributed readers scan in parallel (single-file reads serialize on
    # one task); small row groups keep per-task splits fine-grained
    d = out / "images.parquet"
    d.mkdir(exist_ok=True)
    shard = 1000
    for si, lo in enumerate(range(0, t.num_rows, shard)):
        # compression=NONE: the payload column is already PNG/zlib —
        # snappy on top costs decode bandwidth for ~0 size win
        pq.write_table(
            t.slice(lo, shard), d / f"part-{si:05d}.parquet",
            row_group_size=256, compression="NONE",
        )
    return t


def _mixture_lonlat(r: np.random.Generator, n: int, p_cluster=0.7, lat_range=60.0):
    hot = np.asarray(HOTSPOTS)
    which = r.integers(0, len(hot), n)
    clustered = r.random(n) < p_cluster
    lon = np.where(clustered, hot[which, 0] + r.normal(0, 0.05, n), r.uniform(-179.9, 179.9, n))
    lat = np.where(clustered, hot[which, 1] + r.normal(0, 0.05, n), r.uniform(-lat_range, lat_range, n))
    return lon, lat


def _gen_placements(seed, n, ws, hs, out):
    r = _rng(seed, 3)
    lon, lat = _mixture_lonlat(r, n)
    res = np.exp(r.uniform(np.log(10.0), np.log(200.0), n))  # meters/px
    rotated = r.random(n) < 0.10
    theta = np.where(rotated, r.uniform(-np.pi / 18, np.pi / 18, n), 0.0)
    srs_4326 = r.random(n) < 0.05
    gts, srss = [], []
    for i in range(n):
        w, h = float(ws[i]), float(hs[i])
        if srs_4326[i]:
            rd = res[i] / 111319.49079327358  # meters -> approx degrees
            gt = (lon[i] - w / 2 * rd, rd, 0.0, lat[i] + h / 2 * rd, 0.0, -rd)
        else:
            mx, my = O.merc_latlon_to_meters(float(lat[i]), float(lon[i]))
            rm = float(res[i])
            ct, st = np.cos(theta[i]), np.sin(theta[i])
            # rotation * diag(rm, -rm); axis-aligned when theta == 0
            gt0 = mx - (w / 2 * rm * ct + h / 2 * rm * st)
            gt3 = my - (w / 2 * rm * st - h / 2 * rm * ct)
            gt = (gt0, rm * ct, rm * st, gt3, rm * st, -rm * ct)
        gts.append([float(v) for v in gt])
        srss.append("EPSG:4326" if srs_4326[i] else "EPSG:3857")
    t = pa.table(
        {
            "image_id": pa.array([f"img{i:08d}" for i in range(n)]),
            "gt": pa.array(gts, pa.list_(pa.float64(), 6)),
            "srs": pa.array(srss),
            "lon": pa.array(lon, pa.float64()),
            "lat": pa.array(lat, pa.float64()),
        }
    )
    # sharded 1:1 with images.parquet parts -> storage-co-partitioned join
    # (at corpus scale these would be columns of the same Lance table)
    d = out / "placements.parquet"
    d.mkdir(exist_ok=True)
    shard = 1000
    for si, lo in enumerate(range(0, t.num_rows, shard)):
        pq.write_table(t.slice(lo, shard), d / f"part-{si:05d}.parquet", row_group_size=256)
    return t


def _poly_rings(r: np.random.Generator, kind: str, cx: float, cy: float, radius: float):
    """Rings in EPSG:3857 meters. Returns list of polygons (list of rings)."""
    if kind == "convex":
        npt = int(r.integers(5, 13))
        ang = np.sort(r.uniform(0, 2 * np.pi, npt))
        rad = radius * (0.7 + 0.3 * r.random(npt))
        pts = np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1)
        # convex hull by construction of sorted angles around center is
        # star-shaped; take the hull via gift-wrap-free monotone chain
        pts = _convex_hull(pts)
        return [[_close(pts)]]
    if kind == "star":
        npt = int(r.integers(5, 9)) * 2
        ang = np.linspace(0, 2 * np.pi, npt, endpoint=False) + r.uniform(0, np.pi)
        rad = np.where(np.arange(npt) % 2 == 0, radius, radius * r.uniform(0.3, 0.5))
        pts = np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1)
        return [[_close(pts)]]
    if kind == "hole":
        outer = _square(cx, cy, radius, rot=r.uniform(0, np.pi / 2))
        inner = _square(cx, cy, radius * 0.4, rot=r.uniform(0, np.pi / 2))
        return [[_close(outer), _close(inner[::-1])]]
    if kind == "multi":
        a = _square(cx - 1.5 * radius, cy, radius * 0.8, rot=0.0)
        b = _square(cx + 1.5 * radius, cy, radius * 0.8, rot=0.3)
        return [[_close(a)], [_close(b)]]
    raise ValueError(kind)


def _square(cx, cy, half, rot=0.0):
    base = np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], dtype=np.float64) * half
    ct, st = np.cos(rot), np.sin(rot)
    rotm = np.array([[ct, -st], [st, ct]])
    return base @ rotm.T + [cx, cy]


def _close(pts):
    return np.vstack([pts, pts[:1]])


def _convex_hull(pts):
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(iterable):
        hull = []
        for p in iterable:
            while len(hull) >= 2 and np.cross(hull[-1] - hull[-2], p - hull[-2]) <= 0:
                hull.pop()
            hull.append(p)
        return hull

    lower = half(pts)
    upper = half(pts[::-1])
    return np.asarray(lower[:-1] + upper[:-1])


def _shoelace(ring):
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def _gen_polygons(seed, n_images, out):
    from gdal_ray.geo import wkb as W

    n = max(50, n_images // 100)
    r = _rng(seed, 4)
    lon, lat = _mixture_lonlat(r, n)
    kinds = r.choice(["convex", "star", "hole", "multi"], size=n, p=[0.60, 0.25, 0.10, 0.05])
    ids, wkbs, cats, areas = [], [], [], []
    for j in range(n):
        cx, cy = O.merc_latlon_to_meters(float(lat[j]), float(lon[j]))
        radius = float(np.exp(r.uniform(np.log(500.0), np.log(20000.0))))
        polys = _poly_rings(r, str(kinds[j]), cx, cy, radius)
        area = sum(abs(_shoelace(p[0])) - sum(abs(_shoelace(h)) for h in p[1:]) for p in polys)
        if len(polys) == 1:
            blob = W.encode_polygon(polys[0])
        else:
            blob = W.encode_multipolygon(polys)
        ids.append(f"poly{j:05d}")
        wkbs.append(blob)
        cats.append(CATEGORIES[int(r.integers(0, 8))])
        areas.append(area)
    # fixed hand-written edge cases (FIXTURES.md §3): the probe point
    # q_edgecase sits exactly ON a vertical edge, exactly AT a vertex of
    # another polygon, and a degenerate sliver passes through it — the
    # strict ogrlinearring.cpp:462 crossing rules decide all three, and the
    # decisive x-coordinates are trig-free so engine and scalar oracle agree
    pmx, pmy = O.merc_latlon_to_meters(EDGE_LAT, EDGE_LON)
    edge_polys = [
        # vertical LEFT edge passes exactly through (pmx, pmy)
        np.array([[pmx, pmy - 5000], [pmx + 9000, pmy - 5000],
                  [pmx + 9000, pmy + 5000], [pmx, pmy + 5000], [pmx, pmy - 5000]]),
        # vertex exactly at the probe point
        np.array([[pmx, pmy], [pmx + 7000, pmy + 2000], [pmx + 3000, pmy + 8000], [pmx, pmy]]),
        # degenerate sliver (zero-area spike) through the point
        np.array([[pmx - 4000, pmy], [pmx + 4000, pmy], [pmx - 4000, pmy],
                  [pmx - 4000, pmy]]),
    ]
    from gdal_ray.geo import wkb as _W

    for kk, ring in enumerate(edge_polys):
        ids.append(f"polyedge{kk}")
        wkbs.append(_W.encode_polygon([ring]))
        cats.append(CATEGORIES[0])
        areas.append(abs(_shoelace(np.vstack([ring, ring[:1]]) if (ring[0] != ring[-1]).any() else ring)))
    t = pa.table(
        {
            "poly_id": pa.array(ids),
            "wkb": pa.array(wkbs, pa.binary()),
            "category": pa.array(cats),
            "area": pa.array(areas, pa.float64()),
        }
    )
    pq.write_table(t, out / "polygons.parquet")
    return t


# fixed edge-case probes (FIXTURES.md §3): coordinates chosen so the
# decisive x comparisons are trig-free (mx = lon*originShift/180 exactly)
EDGE_LON, EDGE_LAT = 18.0, 10.0  # mx = originShift/10 exactly in any impl


def _gen_query_points(seed, n_images, out):
    n = max(20, n_images // 10)
    r = _rng(seed, 5)
    lon, lat = _mixture_lonlat(r, n)
    outlier = r.random(n) < 0.05
    lon = np.where(outlier, r.uniform(-179.0, 179.0, n), lon)
    lat = np.where(outlier, np.where(r.random(n) < 0.5, -82.0, 82.0), lat)
    k = r.choice([1, 4, 8], size=n).astype(np.int32)
    # append the fixed edge-case probe point
    ids = [f"q{i:06d}" for i in range(n)] + ["q_edgecase"]
    lon = np.append(lon, EDGE_LON)
    lat = np.append(lat, EDGE_LAT)
    k = np.append(k, np.int32(1)).astype(np.int32)
    t = pa.table(
        {
            "query_id": pa.array(ids),
            "lon": pa.array(lon, pa.float64()),
            "lat": pa.array(lat, pa.float64()),
            "k": pa.array(k, pa.int32()),
        }
    )
    pq.write_table(t, out / "query_points.parquet")
    return t


def _gen_rasters(seed, n_images, out):
    n = min(100, max(20, n_images // 100))
    r = _rng(seed, 6)
    ids, pix, ws, hs, gts = [], [], [], [], []
    for i in range(n):
        if i == 0:  # fixed diagonal-ambiguity case (polygonize.cpp:487-488)
            w = h = 8
            a = np.zeros((h, w), np.int32)
            a[1, 1] = a[2, 2] = 2
            a[4, 5] = a[5, 4] = 3
        else:
            w = int(r.integers(32, 129))
            h = int(r.integers(32, 129))
            a = np.zeros((h, w), np.int32)
            for _ in range(int(r.integers(2, 9))):
                v = int(r.integers(1, 6))
                x0 = int(r.integers(0, w - 4))
                y0 = int(r.integers(0, h - 4))
                bw = int(r.integers(3, max(4, w // 2)))
                bh = int(r.integers(3, max(4, h // 2)))
                a[y0 : y0 + bh, x0 : x0 + bw] = v
            if r.random() < 0.4:  # nodata patch
                x0 = int(r.integers(0, w - 3))
                y0 = int(r.integers(0, h - 3))
                a[y0 : y0 + 3, x0 : x0 + 3] = -1
        ids.append(f"ras{i:05d}")
        pix.append(a.ravel().tolist())
        ws.append(w)
        hs.append(h)
        gts.append([float(r.uniform(-1e6, 1e6)), 30.0, 0.0, float(r.uniform(-1e6, 1e6)), 0.0, -30.0])
    t = pa.table(
        {
            "raster_id": pa.array(ids),
            "pixels": pa.array(pix, pa.list_(pa.int32())),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "gt": pa.array(gts, pa.list_(pa.float64(), 6)),
        }
    )
    pq.write_table(t, out / "rasters.parquet")
    return t


def _image_bbox_meters(gt, srs, w, h):
    """Scalar bbox of an image in EPSG:3857 meters (corner loop)."""
    xs, ys = [], []
    for px, ln in ((0, 0), (w, 0), (0, h), (w, h)):
        gx = gt[0] + px * gt[1] + ln * gt[2]
        gy = gt[3] + px * gt[4] + ln * gt[5]
        if srs == "EPSG:4326":
            gx, gy = O.merc_latlon_to_meters(gy, gx)
        xs.append(gx)
        ys.append(gy)
    return min(xs), min(ys), max(xs), max(ys)


def _centroid_meters(gt, srs, w, h):
    gx = gt[0] + (w / 2.0) * gt[1] + (h / 2.0) * gt[2]
    gy = gt[3] + (w / 2.0) * gt[4] + (h / 2.0) * gt[5]
    if srs == "EPSG:4326":
        gx, gy = O.merc_latlon_to_meters(gy, gx)
    return gx, gy


def _gen_oracles(placements, polygons, query_points, rasters, out):
    from gdal_ray.geo import wkb as W

    pl = placements.to_pydict()
    n = len(pl["image_id"])

    # --- oracle_tiles: bbox cover per image, z in TILE_ZOOMS, XYZ ---
    rows = {"image_id": [], "z": [], "x": [], "y": []}
    cents = {}
    for i in range(n):
        gt = pl["gt"][i]
        srs = pl["srs"][i]
        # placements carry no w/h; join back from images by position
        w = _IMG_W[i]
        h = _IMG_H[i]
        bb = _image_bbox_meters(gt, srs, w, h)
        cents[pl["image_id"][i]] = _centroid_meters(gt, srs, w, h)
        for z in TILE_ZOOMS:
            for zz, x, y in O.tiles_for_bbox(*bb, z):
                rows["image_id"].append(pl["image_id"][i])
                rows["z"].append(zz)
                rows["x"].append(x)
                rows["y"].append(y)
    pq.write_table(
        pa.table({k: pa.array(v) for k, v in rows.items()}), out / "oracle_tiles.parquet"
    )

    # --- decode polygons once ---
    po = polygons.to_pydict()
    decoded = []
    for j in range(len(po["poly_id"])):
        polys = W.decode_polygons(po["wkb"][j])
        env = (
            min(r[:, 0].min() for p in polys for r in p[:1]),
            min(r[:, 1].min() for p in polys for r in p[:1]),
            max(r[:, 0].max() for p in polys for r in p[:1]),
            max(r[:, 1].max() for p in polys for r in p[:1]),
        )
        decoded.append((po["poly_id"][j], [[r.tolist() for r in p] for p in polys], env))

    # --- oracle_pip: image centroids + query points vs polygons ---
    qp = query_points.to_pydict()
    sources = [(iid, x, y) for iid, (x, y) in cents.items()] + [
        (qp["query_id"][i], *O.merc_latlon_to_meters(qp["lat"][i], qp["lon"][i]))
        for i in range(len(qp["query_id"]))
    ]
    prows = {"src_id": [], "poly_id": []}
    for sid, x, y in sources:
        for pid, polys, env in decoded:
            if not (env[0] <= x <= env[2] and env[1] <= y <= env[3]):
                continue
            if O.point_in_polygon_scalar(x, y, polys):
                prows["src_id"].append(sid)
                prows["poly_id"].append(pid)
    pq.write_table(pa.table(prows, schema=pa.schema([("src_id", pa.string()), ("poly_id", pa.string())])), out / "oracle_pip.parquet")

    # --- oracle_knn: per query point k nearest image centroids ---
    ids = list(cents.keys())
    cx = np.array([cents[i][0] for i in ids])
    cy = np.array([cents[i][1] for i in ids])
    order_ids = np.array(ids)
    krows = {"query_id": [], "rank": [], "image_id": [], "dist": []}
    for i in range(len(qp["query_id"])):
        x, y = O.merc_latlon_to_meters(qp["lat"][i], qp["lon"][i])
        d2 = (cx - x) ** 2 + (cy - y) ** 2
        k = int(qp["k"][i])
        # ties broken by image_id: lexsort on (d2, id)
        idx = np.lexsort((order_ids, d2))[:k]
        for rank, ii in enumerate(idx):
            krows["query_id"].append(qp["query_id"][i])
            krows["rank"].append(rank)
            krows["image_id"].append(str(order_ids[ii]))
            krows["dist"].append(float(np.sqrt(d2[ii])))
    pq.write_table(pa.table(krows), out / "oracle_knn.parquet")

    # --- oracle_raster_roundtrip ---
    ra = rasters.to_pydict()
    rr = {"raster_id": [], "n_regions": [], "checksum": [], "pixel_counts": []}
    for i in range(len(ra["raster_id"])):
        w, h = ra["w"][i], ra["h"][i]
        nlab, counts = O.label_regions_scalar(ra["pixels"][i], w, h, nodata=-1)
        rr["raster_id"].append(ra["raster_id"][i])
        rr["n_regions"].append(nlab)
        rr["checksum"].append(O.checksum_scalar(ra["pixels"][i]))
        rr["pixel_counts"].append(sorted(counts))
    pq.write_table(
        pa.table(
            {
                "raster_id": pa.array(rr["raster_id"]),
                "n_regions": pa.array(rr["n_regions"], pa.int32()),
                "checksum": pa.array(rr["checksum"], pa.int32()),
                "pixel_counts": pa.array(rr["pixel_counts"], pa.list_(pa.int32())),
            }
        ),
        out / "oracle_raster_roundtrip.parquet",
    )

    # --- oracle_agg: per-category polygon stats + centroid cell histogram ---
    catrows = {}
    for j in range(len(po["poly_id"])):
        c = po["category"][j]
        cnt, s = catrows.get(c, (0, 0.0))
        catrows[c] = (cnt + 1, s + po["area"][j])
    pq.write_table(
        pa.table(
            {
                "category": pa.array(sorted(catrows)),
                "n_polys": pa.array([catrows[c][0] for c in sorted(catrows)], pa.int64()),
                "area_sum": pa.array([catrows[c][1] for c in sorted(catrows)], pa.float64()),
            }
        ),
        out / "oracle_agg_category.parquet",
    )
    hist = {}
    for iid, (x, y) in cents.items():
        tx, ty = O.merc_meters_to_tile_tms(x, y, CELL_LEVEL)
        nside = 2**CELL_LEVEL
        tx = max(0, min(nside - 1, tx))
        ty = max(0, min(nside - 1, ty))
        cell = (CELL_LEVEL << 58) | (tx << 29) | O.tms_to_xyz(ty, CELL_LEVEL)
        hist[cell] = hist.get(cell, 0) + 1
    pq.write_table(
        pa.table(
            {
                "cell": pa.array(sorted(hist), pa.int64()),
                "n_images": pa.array([hist[c] for c in sorted(hist)], pa.int64()),
            }
        ),
        out / "oracle_cell_hist.parquet",
    )


_IMG_W = None
_IMG_H = None


def corpus_dir(n_images: int, seed: int = 42) -> str:
    # v3: real baseline-JPEG payloads (gdal_ray.io.jpeg) replaced the
    # round-2 qlossy stand-in; version bump invalidates cached corpora
    return os.path.join(FIXTURE_ROOT, f"n{n_images}_s{seed}_v4")


def generate_corpus(n_images: int, seed: int = 42, pixel_refs: bool | None = None, force=False) -> str:
    """Generate (or reuse cached) corpus; returns the directory path."""
    global _IMG_W, _IMG_H
    out_final = pathlib.Path(corpus_dir(n_images, seed))
    if (out_final / "_SUCCESS").exists() and not force:
        return str(out_final)
    if pixel_refs is None:
        pixel_refs = n_images <= 2000
    tmp = pathlib.Path(str(out_final) + ".tmp")
    if tmp.exists():
        import shutil

        shutil.rmtree(tmp)
    tmp.mkdir(parents=True)
    images = _gen_images(seed, n_images, tmp, pixel_refs)
    _IMG_W = images["w"].to_pylist()
    _IMG_H = images["h"].to_pylist()
    placements = _gen_placements(seed, n_images, _IMG_W, _IMG_H, tmp)
    polygons = _gen_polygons(seed, n_images, tmp)
    query_points = _gen_query_points(seed, n_images, tmp)
    rasters = _gen_rasters(seed, n_images, tmp)
    if n_images <= 5000:  # oracle tables only for test tiers (scalar loops)
        _gen_oracles(placements, polygons, query_points, rasters, tmp)
    (tmp / "_SUCCESS").touch()
    if out_final.exists():
        import shutil

        shutil.rmtree(out_final)
    tmp.rename(out_final)
    return str(out_final)


if __name__ == "__main__":
    import sys

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    print(generate_corpus(n))
