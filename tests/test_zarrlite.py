import numpy as np
import pytest

from p2igan_tpu.data import zarrlite as zl


@pytest.mark.parametrize(
    "compressor",
    [None, {"id": "zlib", "level": 1}, {"id": "zstd", "level": 3},
     {"id": "blosc", "cname": "zstd", "clevel": 5, "shuffle": 1}],
)
def test_roundtrip_compressors(tmp_path, rng, compressor):
    g = zl.open_group(tmp_path / "s.zarr", mode="w")
    data = rng.integers(0, 255, size=(50, 32, 32), dtype=np.uint8)
    arr = g.create_dataset("frames", shape=data.shape, chunks=(20, 32, 32),
                           dtype="uint8", compressor=compressor, data=data)
    np.testing.assert_array_equal(arr[:], data)
    # partial, chunk-crossing window read
    np.testing.assert_array_equal(arr[15:45, 3:20, 5:30], data[15:45, 3:20, 5:30])


def test_group_tree_and_attrs(tmp_path):
    g = zl.open_group(tmp_path / "s.zarr", mode="w")
    g.attrs.update({"suggested_window": 20, "note": "hi"})
    ev = g.create_group("events")
    e0 = ev.create_group("200001010000")
    e0.create_dataset("frames", shape=(8, 16, 16), dtype="uint8",
                      data=np.arange(8 * 16 * 16, dtype=np.uint8).reshape(8, 16, 16))
    idx = g.create_group("index")
    idx.create_dataset("windows", shape=(3, 3), dtype="int64",
                       data=np.array([[0, 0, 8], [0, 1, 7], [0, 2, 6]]))

    r = zl.open(tmp_path / "s.zarr", mode="r")
    assert r.attrs["suggested_window"] == 20
    assert r.group_keys() == ["events", "index"]
    assert list(r["events"].keys()) == ["200001010000"]
    assert r["events"]["200001010000"]["frames"].shape == (8, 16, 16)
    assert r["index"]["windows"][1].tolist() == [0, 1, 7]
    # nested path access like zarr
    assert r["events/200001010000/frames"][2, 0, 0] == 2 * 256 % 256


def test_float_and_fill_value(tmp_path, rng):
    g = zl.open_group(tmp_path / "s.zarr", mode="w")
    arr = g.create_dataset("x", shape=(10, 10), chunks=(4, 4), dtype="float32")
    # untouched chunks read as fill value
    np.testing.assert_array_equal(arr[:], np.zeros((10, 10), np.float32))
    vals = rng.normal(size=(10, 10)).astype(np.float32)
    arr[:] = vals
    np.testing.assert_array_equal(arr[:], vals)
    arr[2:5, 3:9] = 7.0
    vals[2:5, 3:9] = 7.0
    np.testing.assert_array_equal(arr[...], vals)


def test_partial_write_overwrite_mean(tmp_path):
    """Running-mean update pattern used by multi-pass inference."""
    g = zl.open_group(tmp_path / "o.zarr", mode="w")
    a = np.full((4, 8, 8), 2.0, np.float32)
    ds = g.create_dataset("event_01", shape=a.shape, chunks=a.shape, dtype="float32", data=a)
    cur = ds[:]
    new = np.full_like(cur, 4.0)
    ds[:] = cur + (new - cur) / 2.0
    np.testing.assert_allclose(g["event_01"][:], 3.0)


def test_int_index_squeezes(tmp_path):
    g = zl.open_group(tmp_path / "s.zarr", mode="w")
    data = np.arange(24, dtype=np.int32).reshape(2, 3, 4)
    g.create_dataset("a", shape=data.shape, dtype="int32", data=data)
    a = zl.open(tmp_path / "s.zarr")["a"]
    np.testing.assert_array_equal(a[1], data[1])
    assert a[1, 2, 3] == data[1, 2, 3]
    assert a[0, :, 1].shape == (3,)


def test_open_w_truncates_existing_store(tmp_path):
    """zarr-python parity: open(path, 'w') clobbers an existing store."""
    p = tmp_path / "s.zarr"
    g = zl.open(p, mode="w")
    g.create_dataset("stale", shape=(4,), dtype="float32",
                     data=np.ones(4, np.float32))
    g2 = zl.open(p, mode="w")
    assert list(g2.array_keys()) == []
    g2.create_dataset("fresh", shape=(2,), dtype="float32",
                      data=np.zeros(2, np.float32))
    assert list(zl.open(p, mode="r").array_keys()) == ["fresh"]


def test_open_w_minus_refuses_existing(tmp_path):
    p = tmp_path / "s.zarr"
    zl.open(p, mode="w")
    with pytest.raises(FileExistsError):
        zl.open(p, mode="w-")
    # but creates when absent
    g = zl.open(tmp_path / "new.zarr", mode="w-")
    assert list(g.array_keys()) == []


def test_slash_dimension_separator_roundtrip(tmp_path, rng):
    """dimension_separator='/' writes nested chunk dirs (parents created)
    and reads back; real zarr stores using '/' keys stay writable."""
    g = zl.open(tmp_path / "s.zarr", mode="w")
    data = rng.integers(0, 255, size=(4, 6, 6), dtype=np.uint8)
    g.create_dataset("a", shape=data.shape, chunks=(2, 3, 3), dtype="uint8",
                     dimension_separator="/", data=data)
    arr = zl.open(tmp_path / "s.zarr", mode="r")["a"]
    np.testing.assert_array_equal(arr[...], data)
    assert (tmp_path / "s.zarr" / "a" / "0" / "0" / "0").exists()


def test_too_many_indices_raises(tmp_path):
    g = zl.open(tmp_path / "s.zarr", mode="w")
    arr = g.create_dataset("a", shape=(10,), dtype="float32",
                           data=np.arange(10, dtype=np.float32))
    with pytest.raises(IndexError, match="too many"):
        arr[2, 7]


def test_nonfinite_fill_value_spec_strings(tmp_path):
    """NaN/Infinity fill values round-trip as zarr-v2 spec JSON strings
    (strict-JSON readers can parse the .zarray) and decode on read."""
    import json as _json

    g = zl.open(tmp_path / "s.zarr", mode="w")
    for name, fv, want in (("n", float("nan"), "NaN"),
                           ("i", float("inf"), "Infinity"),
                           ("m", float("-inf"), "-Infinity")):
        g.create_dataset(name, shape=(4,), chunks=(2,), dtype="float32",
                         fill_value=fv)
        meta = _json.loads((tmp_path / "s.zarr" / name / ".zarray").read_text())
        assert meta["fill_value"] == want
        out = zl.open(tmp_path / "s.zarr", mode="r")[name][...]
        assert np.isnan(out).all() if want == "NaN" else (out == fv).all()


def test_numpy_scalar_fill_value(tmp_path):
    g = zl.open(tmp_path / "s.zarr", mode="w")
    g.create_dataset("a", shape=(3,), dtype="float32",
                     fill_value=np.float32(2.5))
    assert (zl.open(tmp_path / "s.zarr", mode="r")["a"][...] == 2.5).all()


def test_create_dataset_refuses_existing_group(tmp_path):
    g = zl.open(tmp_path / "s.zarr", mode="w")
    g.create_group("x")
    with pytest.raises(FileExistsError, match="group"):
        g.create_dataset("x", shape=(4,), dtype="float32")


def test_nested_dataset_creates_intermediate_groups(tmp_path):
    g = zl.open(tmp_path / "s.zarr", mode="w")
    g.create_dataset("a/b", shape=(4,), dtype="float32",
                     data=np.zeros(4, np.float32))
    root = zl.open(tmp_path / "s.zarr", mode="r")
    assert "a" in root.group_keys()
    assert root["a"].array_keys() == ["b"]


def test_readonly_attrs_not_mutated_on_rejected_write(tmp_path):
    g = zl.open(tmp_path / "s.zarr", mode="w")
    g.attrs["k"] = 1
    ro = zl.open(tmp_path / "s.zarr", mode="r")
    with pytest.raises(PermissionError):
        ro.attrs["other"] = 2
    assert "other" not in ro.attrs  # in-memory state untouched
    with pytest.raises(PermissionError):
        ro.attrs.update({"x": 3})
    assert "x" not in ro.attrs
