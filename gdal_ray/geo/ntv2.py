"""NTv2 datum grid shifts: .gsb reader/writer + vectorized transform.

The reference applies NTv2 grid-shift files through PROJ during datum
changes (``ogr/ogrct.cpp``) and also exposes the raw grids as a raster
format (``frmts/raw/ntv2dataset.cpp`` — 16-byte header records, 11
overview records starting ``NUM_OREC``, per-subgrid 11-record headers,
``GS_COUNT`` data records of four float32 values). This module gives the
engine an offline grid-shift path with the same published semantics:

- the file stores latitude/longitude SHIFTS IN ARCSECONDS on a regular
  lat/lon lattice; longitudes are POSITIVE WEST (the Canadian NTv2
  convention), rows run south to north and columns east to west;
- forward (source -> target datum): ``lat' = lat + dlat/3600``,
  ``lon' = lon - dlon/3600`` (the sign flip converts the positive-west
  shift to the positive-east frame), with the shift BILINEARLY
  interpolated from the four surrounding nodes;
- the inverse has no closed form: iterate "shift at current estimate"
  until convergence (PROJ's inverse hgrid iteration);
- when several subgrids cover a point, the DENSEST one wins (child
  grids refine their parent over sub-areas);
- points outside every subgrid pass through UNSHIFTED (flagged in the
  output so callers can tell "no coverage" from "zero shift").

Scale shape: a .gsb grid is small (MBs) next to the point corpus — the
parsed arrays are broadcast once via ``ray.put`` and every map_batches
task interpolates its own batch against the plasma-shared copy: the
canonical broadcast-small-side pattern, no shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["SubGrid", "Ntv2Grid", "read_gsb", "write_gsb", "ntv2_shift_batch"]

_REC = 16  # NUM_OREC record size (ntv2dataset.cpp knREGULAR_RECORD_SIZE)


class SubGrid:
    """One NTv2 subgrid: bounds in arcseconds (positive west for
    longitudes), increments, and (nrows, ncols) float64 shift fields in
    arcseconds (lat shift, lon shift)."""

    def __init__(self, name, parent, s_lat, n_lat, e_long, w_long,
                 lat_inc, long_inc, shift_lat, shift_lon):
        self.name = name
        self.parent = parent
        self.s_lat, self.n_lat = float(s_lat), float(n_lat)
        self.e_long, self.w_long = float(e_long), float(w_long)
        self.lat_inc, self.long_inc = float(lat_inc), float(long_inc)
        self.shift_lat = np.asarray(shift_lat, dtype=np.float64)
        self.shift_lon = np.asarray(shift_lon, dtype=np.float64)
        self.nrows, self.ncols = self.shift_lat.shape

    def contains(self, lon_sec_w, lat_sec):
        """Membership mask; bounds are inclusive (grid edges interpolate
        degenerately onto the edge nodes)."""
        return (
            (lat_sec >= self.s_lat) & (lat_sec <= self.n_lat)
            & (lon_sec_w >= self.e_long) & (lon_sec_w <= self.w_long)
        )

    def interpolate(self, lon_sec_w, lat_sec):
        """Bilinear shift (arcseconds) at positive-west arcsecond coords."""
        fr = (lat_sec - self.s_lat) / self.lat_inc
        fc = (lon_sec_w - self.e_long) / self.long_inc
        r0 = np.clip(np.floor(fr).astype(np.int64), 0, self.nrows - 2) \
            if self.nrows > 1 else np.zeros_like(fr, dtype=np.int64)
        c0 = np.clip(np.floor(fc).astype(np.int64), 0, self.ncols - 2) \
            if self.ncols > 1 else np.zeros_like(fc, dtype=np.int64)
        tr = np.clip(fr - r0, 0.0, 1.0)
        tc = np.clip(fc - c0, 0.0, 1.0)
        r1 = np.minimum(r0 + 1, self.nrows - 1)
        c1 = np.minimum(c0 + 1, self.ncols - 1)
        out = []
        for f in (self.shift_lat, self.shift_lon):
            v = (
                f[r0, c0] * (1 - tr) * (1 - tc)
                + f[r0, c1] * (1 - tr) * tc
                + f[r1, c0] * tr * (1 - tc)
                + f[r1, c1] * tr * tc
            )
            out.append(v)
        return out[0], out[1]


class Ntv2Grid:
    """A parsed .gsb file: subgrids + vectorized forward/inverse shifts
    in DEGREES (positive-east longitudes, the engine's frame)."""

    def __init__(self, subgrids):
        if not subgrids:
            raise ValueError("NTv2 file has no subgrids")
        self.subgrids = list(subgrids)

    def shift(self, lon_deg, lat_deg):
        """Interpolated (dlon_deg, dlat_deg, covered) at positive-east
        degree coordinates. Densest covering subgrid wins per point;
        uncovered points get zero shift and covered=False."""
        lon = np.atleast_1d(np.asarray(lon_deg, dtype=np.float64))
        lat = np.atleast_1d(np.asarray(lat_deg, dtype=np.float64))
        lon_w = -lon * 3600.0  # positive west arcseconds
        lat_s = lat * 3600.0
        dlat = np.zeros_like(lat_s)
        dlon_w = np.zeros_like(lon_w)
        covered = np.zeros(lat_s.shape, dtype=bool)
        best_inc = np.full(lat_s.shape, np.inf)
        for sg in self.subgrids:
            m = sg.contains(lon_w, lat_s) & (sg.lat_inc < best_inc)
            if not m.any():
                continue
            sl, so = sg.interpolate(lon_w[m], lat_s[m])
            dlat[m] = sl
            dlon_w[m] = so
            covered[m] = True
            best_inc[m] = sg.lat_inc
        # arcseconds -> degrees; positive-west lon shift flips sign
        return -dlon_w / 3600.0, dlat / 3600.0, covered

    def forward(self, lon_deg, lat_deg):
        """Source-datum -> target-datum coordinates (degrees)."""
        dlon, dlat, cov = self.shift(lon_deg, lat_deg)
        return (
            np.asarray(lon_deg, dtype=np.float64) + dlon,
            np.asarray(lat_deg, dtype=np.float64) + dlat,
            cov,
        )

    def inverse(self, lon_deg, lat_deg, max_iter=10, tol=1e-12):
        """Target-datum -> source-datum: fixed-point iteration on the
        forward shift (PROJ's inverse hgrid loop); converges in 3-4
        rounds for real-world shift magnitudes (arcseconds)."""
        lon_t = np.atleast_1d(np.asarray(lon_deg, dtype=np.float64))
        lat_t = np.atleast_1d(np.asarray(lat_deg, dtype=np.float64))
        lon = lon_t.copy()
        lat = lat_t.copy()
        cov = np.zeros(lon.shape, dtype=bool)
        for _ in range(max_iter):
            dlon, dlat, cov = self.shift(lon, lat)
            nlon = lon_t - dlon
            nlat = lat_t - dlat
            if (
                np.max(np.abs(nlon - lon), initial=0.0) < tol
                and np.max(np.abs(nlat - lat), initial=0.0) < tol
            ):
                lon, lat = nlon, nlat
                break
            lon, lat = nlon, nlat
        return lon, lat, cov


def write_gsb(path, subgrids, *, big_endian=False):
    """Write an NTv2 .gsb file (test/fixture writer; the field layout of
    ntv2dataset.cpp's documented hexdump). ``subgrids``: list of dicts
    with keys name, parent, s_lat..long_inc (arcseconds, positive-west
    longitudes) and (nrows, ncols) float arrays shift_lat / shift_lon in
    arcseconds. Accuracy fields are written as zeros."""
    en = ">" if big_endian else "<"

    def rec_i(name, v):
        return name.ljust(8).encode() + struct.pack(en + "i", v) + b"\0\0\0\0"

    def rec_d(name, v):
        return name.ljust(8).encode() + struct.pack(en + "d", float(v))

    def rec_s(name, v):
        return name.ljust(8).encode() + str(v).ljust(8)[:8].encode()

    blob = b"".join([
        rec_i("NUM_OREC", 11), rec_i("NUM_SREC", 11),
        rec_i("NUM_FILE", len(subgrids)),
        rec_s("GS_TYPE", "SECONDS"), rec_s("VERSION", "NTV2.0"),
        rec_s("SYSTEM_F", "SRC"), rec_s("SYSTEM_T", "DST"),
        rec_d("MAJOR_F", 6378137.0), rec_d("MINOR_F", 6356752.314),
        rec_d("MAJOR_T", 6378137.0), rec_d("MINOR_T", 6356752.314),
    ])
    for sg in subgrids:
        sl = np.asarray(sg["shift_lat"], dtype=np.float32)
        so = np.asarray(sg["shift_lon"], dtype=np.float32)
        nrows, ncols = sl.shape
        blob += b"".join([
            rec_s("SUB_NAME", sg["name"]), rec_s("PARENT", sg["parent"]),
            rec_s("CREATED", "19990101"), rec_s("UPDATED", "19990101"),
            rec_d("S_LAT", sg["s_lat"]), rec_d("N_LAT", sg["n_lat"]),
            rec_d("E_LONG", sg["e_long"]), rec_d("W_LONG", sg["w_long"]),
            rec_d("LAT_INC", sg["lat_inc"]), rec_d("LONG_INC", sg["long_inc"]),
            rec_i("GS_COUNT", nrows * ncols),
        ])
        # rows south->north, columns east->west (increasing positive-west)
        data = np.zeros((nrows * ncols, 4), dtype=en + "f4")
        data[:, 0] = sl.reshape(-1)
        data[:, 1] = so.reshape(-1)
        blob += data.tobytes()
    blob += b"END     " + b"\x00" * 8
    with open(path, "wb") as f:
        f.write(blob)


def read_gsb(path) -> Ntv2Grid:
    """Parse an NTv2 .gsb file (both byte orders; order detected from the
    NUM_OREC integer, like ntv2dataset.cpp's header probe)."""
    with open(path, "rb") as f:
        raw = f.read()
    if len(raw) < 11 * _REC or raw[:8] != b"NUM_OREC":
        raise ValueError("not an NTv2 .gsb file (missing NUM_OREC)")
    en = "<" if struct.unpack("<i", raw[8:12])[0] == 11 else ">"
    if struct.unpack(en + "i", raw[8:12])[0] != 11:
        raise ValueError("unsupported NUM_OREC (expected 11)")

    def geti(off):
        return struct.unpack(en + "i", raw[off + 8:off + 12])[0]

    def getd(off):
        return struct.unpack(en + "d", raw[off + 8:off + 16])[0]

    def gets(off):
        return raw[off + 8:off + 16].decode("ascii", "replace").strip()

    n_files = geti(2 * _REC)
    pos = 11 * _REC
    subgrids = []
    for _ in range(n_files):
        name = gets(pos)
        parent = gets(pos + _REC)
        s_lat, n_lat = getd(pos + 4 * _REC), getd(pos + 5 * _REC)
        e_long, w_long = getd(pos + 6 * _REC), getd(pos + 7 * _REC)
        lat_inc, long_inc = getd(pos + 8 * _REC), getd(pos + 9 * _REC)
        gs_count = geti(pos + 10 * _REC)
        pos += 11 * _REC
        nrows = int(round((n_lat - s_lat) / lat_inc)) + 1
        ncols = int(round((w_long - e_long) / long_inc)) + 1
        if nrows * ncols != gs_count:
            raise ValueError(
                f"subgrid {name!r}: GS_COUNT {gs_count} != "
                f"{nrows}x{ncols} from bounds/increments"
            )
        data = np.frombuffer(
            raw, dtype=en + "f4", count=gs_count * 4, offset=pos
        ).reshape(gs_count, 4)
        pos += gs_count * 16
        subgrids.append(SubGrid(
            name, parent, s_lat, n_lat, e_long, w_long, lat_inc, long_inc,
            data[:, 0].astype(np.float64).reshape(nrows, ncols),
            data[:, 1].astype(np.float64).reshape(nrows, ncols),
        ))
    return Ntv2Grid(subgrids)


def ntv2_shift_batch(batch, grid_ref, lon_col="lon", lat_col="lat",
                     inverse=False):
    """map_batches-ready pandas stage: append ``<lon>_shifted`` /
    ``<lat>_shifted`` / ``ntv2_covered`` columns. ``grid_ref`` is either
    an Ntv2Grid or a ray.ObjectRef to one (broadcast once with ray.put;
    plasma-local get per task)."""
    grid = grid_ref
    if not isinstance(grid, Ntv2Grid):
        import ray

        grid = ray.get(grid)
    lon = batch[lon_col].to_numpy(dtype=np.float64)
    lat = batch[lat_col].to_numpy(dtype=np.float64)
    if inverse:
        nlon, nlat, cov = grid.inverse(lon, lat)
    else:
        nlon, nlat, cov = grid.forward(lon, lat)
    out = batch.copy()
    out[lon_col + "_shifted"] = nlon
    out[lat_col + "_shifted"] = nlat
    out["ntv2_covered"] = cov
    return out
