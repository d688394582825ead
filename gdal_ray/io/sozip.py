"""SOZip (Seek-Optimized ZIP) writer/reader — ``gdal vsi sozip`` parity.

Reference: ``port/cpl_minizip_zip.cpp:2332-2600`` (CPLAddFileInZip SOZIP
path) + ``port/cpl_vsil_gzip.cpp:2270-2300,4190-4260`` (chunked deflate
and index reader), spec ``doc/source/programs/sozip.rst``. Built from
scratch on stdlib ``struct``/``zlib`` like the repo's TIFF/PNG codecs.

A seek-optimized entry deflates its payload in INDEPENDENT raw-deflate
chunks: each chunk gets a fresh deflate stream ended with
Z_SYNC_FLUSH + Z_FULL_FLUSH (the 9-byte ``00 00 ff ff 00 00 00 ff ff``
marker pigz emits; only the final chunk sets BFINAL), so a reader can
start inflating at any chunk boundary. The chunk offsets live in a
hidden STORED entry ``.<name>.sozip.idx`` written immediately after the
main entry's data and EXCLUDED from the central directory (invisible to
ordinary unzippers; the payload entry itself is a plain deflate member
any unzip reads):

    u32 version=1 | u32 toSkip=0 | u32 chunkSize | u32 offsetSize=8 |
    u64 uncompressedSize | u64 compressedSize |
    u64 offset[chunk 1..n-1]   (relative to the entry's data start)

Classic (non-ZIP64) records only — entries here stay < 4 GiB.
"""

from __future__ import annotations

import os
import struct
import zlib

__all__ = [
    "sozip_create",
    "sozip_list",
    "sozip_validate",
    "sozip_read_chunk",
    "DEFAULT_CHUNK",
]

DEFAULT_CHUNK = 32 * 1024
_DEFAULT_MIN_SOZIP = 1024 * 1024
_LOCAL_SIG = 0x04034B50
_CENTRAL_SIG = 0x02014B50
_EOCD_SIG = 0x06054B50


def _dos_datetime(mtime: float):
    import time

    t = time.localtime(mtime)
    dosdate = ((t.tm_year - 1980) << 9) | (t.tm_mon << 5) | t.tm_mday
    dostime = (t.tm_hour << 11) | (t.tm_min << 5) | (t.tm_sec // 2)
    return dostime, dosdate


def _chunked_deflate(data: bytes, chunk_size: int, level: int = 6):
    """Independent per-chunk raw deflate; returns (blob, offsets[1:])."""
    parts = []
    offsets = []
    pos = 0
    n = len(data)
    nchunks = max(1, -(-n // chunk_size))
    for i in range(nchunks):
        if i:
            offsets.append(pos)
        chunk = data[i * chunk_size : (i + 1) * chunk_size]
        co = zlib.compressobj(level, zlib.DEFLATED, -15)
        out = co.compress(chunk)
        if i + 1 == nchunks:
            out += co.flush(zlib.Z_FINISH)
        else:
            out += co.flush(zlib.Z_SYNC_FLUSH)
            out += co.flush(zlib.Z_FULL_FLUSH)
        parts.append(out)
        pos += len(out)
    return b"".join(parts), offsets


def _local_header(name: bytes, method: int, crc: int, csize: int, usize: int,
                  dostime: int, dosdate: int) -> bytes:
    return struct.pack(
        "<IHHHHHIIIHH", _LOCAL_SIG, 20, 0, method, dostime, dosdate,
        crc, csize, usize, len(name), 0,
    ) + name


def sozip_create(zip_path: str, files, chunk_size: int = DEFAULT_CHUNK,
                 min_file_size: int = _DEFAULT_MIN_SOZIP, level: int = 6,
                 force_sozip: bool | None = None):
    """Create a ZIP; entries above ``min_file_size`` become seek-optimized
    (``force_sozip=True``/``False`` overrides the AUTO rule, like the
    reference's ``--enable-sozip=auto/yes/no``).

    ``files``: iterable of ``(arcname, src_path)`` or ``(arcname, bytes)``.
    Returns a per-entry summary list.
    """
    out = open(zip_path, "wb")
    central = []
    summary = []
    try:
        for arcname, src in files:
            if isinstance(src, (bytes, bytearray)):
                data, mtime = bytes(src), 315532800.0  # 1980-01-01
            else:
                with open(src, "rb") as f:
                    data = f.read()
                mtime = os.stat(src).st_mtime
            dostime, dosdate = _dos_datetime(mtime)
            name = arcname.encode()
            crc = zlib.crc32(data) & 0xFFFFFFFF
            want_sozip = (
                len(data) > min_file_size if force_sozip is None
                else (force_sozip and len(data) > chunk_size)
            )
            offset = out.tell()
            if want_sozip:
                blob, offs = _chunked_deflate(data, chunk_size, level)
                out.write(_local_header(name, 8, crc, len(blob), len(data),
                                        dostime, dosdate))
                out.write(blob)
                # hidden STORED index entry, excluded from central dir
                d, _, b = arcname.rpartition("/")
                idx_name = ((d + "/") if d else "") + "." + b + ".sozip.idx"
                idx = struct.pack(
                    "<IIIIQQ", 1, 0, chunk_size, 8, len(data), len(blob)
                ) + b"".join(struct.pack("<Q", o) for o in offs)
                iname = idx_name.encode()
                icrc = zlib.crc32(idx) & 0xFFFFFFFF
                out.write(_local_header(iname, 0, icrc, len(idx), len(idx),
                                        dostime, dosdate))
                out.write(idx)
                summary.append(
                    {"name": arcname, "sozip": True, "chunks": len(offs) + 1,
                     "size": len(data), "csize": len(blob)}
                )
            else:
                blob = zlib.compress(data, level)[2:-4]  # raw deflate
                out.write(_local_header(name, 8, crc, len(blob), len(data),
                                        dostime, dosdate))
                out.write(blob)
                summary.append(
                    {"name": arcname, "sozip": False, "chunks": 1,
                     "size": len(data), "csize": len(blob)}
                )
            central.append((name, crc, summary[-1], offset, dostime, dosdate))
        cd_start = out.tell()
        for name, crc, s, offset, dostime, dosdate in central:
            csize = s["csize"]
            out.write(
                struct.pack(
                    "<IHHHHHHIIIHHHHHII", _CENTRAL_SIG, 20, 20, 0, 8,
                    dostime, dosdate, crc, csize, s["size"], len(name),
                    0, 0, 0, 0, 0, offset,
                )
            )
            out.write(name)
        cd_size = out.tell() - cd_start
        out.write(
            struct.pack("<IHHHHIIH", _EOCD_SIG, 0, 0, len(central),
                        len(central), cd_size, cd_start, 0)
        )
    finally:
        out.close()
    return summary


def _read_central(path: str):
    with open(path, "rb") as f:
        raw = f.read()
    eocd = raw.rfind(struct.pack("<I", _EOCD_SIG))
    if eocd < 0:
        raise ValueError(f"{path}: not a zip (no EOCD)")
    (n_entries,) = struct.unpack_from("<H", raw, eocd + 10)
    cd_size, cd_start = struct.unpack_from("<II", raw, eocd + 12)
    entries = []
    pos = cd_start
    for _ in range(n_entries):
        (sig, _, _, _, method, dostime, dosdate, crc, csize, usize,
         fnlen, eflen, clen, _, _, _, offset) = struct.unpack_from(
            "<IHHHHHHIIIHHHHHII", raw, pos)
        if sig != _CENTRAL_SIG:
            raise ValueError(f"{path}: bad central entry")
        name = raw[pos + 46 : pos + 46 + fnlen].decode()
        entries.append(
            {"name": name, "method": method, "crc": crc, "csize": csize,
             "size": usize, "offset": offset}
        )
        pos += 46 + fnlen + eflen + clen
    return raw, entries


def _data_start(raw: bytes, offset: int):
    sig, _, _, method, _, _, crc, csize, usize, fnlen, eflen = \
        struct.unpack_from("<IHHHHHIIIHH", raw, offset)
    if sig != _LOCAL_SIG:
        raise ValueError("bad local header")
    return offset + 30 + fnlen + eflen, method, csize, usize


def _find_index(raw: bytes, entry: dict):
    """The hidden idx entry sits immediately after the member's data."""
    start, _, csize, _ = _data_start(raw, entry["offset"])
    pos = start + csize
    if pos + 30 > len(raw) or struct.unpack_from("<I", raw, pos)[0] != _LOCAL_SIG:
        return None
    istart, imethod, icsize, _ = _data_start(raw, pos)
    fnlen = struct.unpack_from("<H", raw, pos + 26)[0]
    iname = raw[pos + 30 : pos + 30 + fnlen].decode()
    if ".sozip.idx" not in iname or imethod != 0:
        return None
    return raw[istart : istart + icsize]


def sozip_list(zip_path: str):
    """Entries + seek-optimization status (``gdal vsi sozip list``)."""
    raw, entries = _read_central(zip_path)
    out = []
    for e in entries:
        idx = _find_index(raw, e)
        info = dict(e)
        info["sozip"] = idx is not None
        if idx is not None:
            _, _, chunk, _, usz, csz = struct.unpack_from("<IIIIQQ", idx, 0)
            info["chunk_size"] = chunk
            info["chunks"] = max(1, -(-usz // chunk))
        out.append(info)
    return out


def _parse_index(idx: bytes, entry: dict):
    ver, skip, chunk, osz, usz, csz = struct.unpack_from("<IIIIQQ", idx, 0)
    if ver != 1 or osz != 8:
        raise ValueError("unsupported sozip index version/offset size")
    if usz != entry["size"] or csz != entry["csize"]:
        raise ValueError("sozip index sizes inconsistent with entry")
    n_off = (usz - 1) // chunk if usz else 0
    offs = list(struct.unpack_from(f"<{n_off}Q", idx, 32)) if n_off else []
    return chunk, [0] + offs


def sozip_read_chunk(zip_path: str, arcname: str, chunk_idx: int) -> bytes:
    """Random-access one chunk through the index — the point of SOZip:
    a reader fetches ~chunk_size compressed bytes, not the whole member."""
    raw, entries = _read_central(zip_path)
    e = next((x for x in entries if x["name"] == arcname), None)
    if e is None:
        raise FileNotFoundError(f"{arcname} not in {zip_path}")
    idx = _find_index(raw, e)
    if idx is None:
        raise ValueError(f"{arcname}: not seek-optimized")
    chunk, offs = _parse_index(idx, e)
    start, _, csize, _ = _data_start(raw, e["offset"])
    lo = start + offs[chunk_idx]
    hi = start + (offs[chunk_idx + 1] if chunk_idx + 1 < len(offs)
                  else csize)
    want = min(chunk, e["size"] - chunk_idx * chunk)
    return zlib.decompressobj(-15).decompress(raw[lo:hi], want)


def sozip_validate(zip_path: str, arcname: str) -> dict:
    """``gdal vsi sozip validate``: every chunk must inflate
    INDEPENDENTLY from its recorded offset to exactly the bytes the
    whole-member inflate yields; CRC must match the directory entry."""
    raw, entries = _read_central(zip_path)
    e = next((x for x in entries if x["name"] == arcname), None)
    if e is None:
        raise FileNotFoundError(f"{arcname} not in {zip_path}")
    start, method, csize, usize = _data_start(raw, e["offset"])
    full = zlib.decompressobj(-15).decompress(raw[start : start + csize])
    if len(full) != usize or (zlib.crc32(full) & 0xFFFFFFFF) != e["crc"]:
        raise ValueError(f"{arcname}: full-stream decode mismatch")
    idx = _find_index(raw, e)
    if idx is None:
        raise ValueError(f"{arcname}: no sozip index")
    chunk, offs = _parse_index(idx, e)
    for i in range(len(offs)):
        got = sozip_read_chunk(zip_path, arcname, i)
        want = full[i * chunk : (i + 1) * chunk]
        if got != want:
            raise ValueError(f"{arcname}: chunk {i} mismatch")
    return {"name": arcname, "chunks": len(offs), "chunk_size": chunk,
            "size": usize, "valid": True}
