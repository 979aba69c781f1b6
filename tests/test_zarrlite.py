import numpy as np
import pytest

from orcai_tpu.io.zarrlite import open_zarr, save_as_zarr


def test_roundtrip_2d(tmp_path):
    arr = np.random.default_rng(0).normal(size=(4321, 171)).astype(np.float32)
    save_as_zarr(arr, tmp_path / "a.zarr")
    z = open_zarr(tmp_path / "a.zarr")
    assert z.shape == (4321, 171)
    assert z.dtype == np.float32
    np.testing.assert_array_equal(z[:], arr)


def test_roundtrip_blosc_lz4(tmp_path):
    """The fast production write codec (blosc-lz4 frames, byte-shuffle)
    round-trips bit-exactly through the store reader."""
    arr = np.random.default_rng(1).normal(size=(4321, 171)).astype(np.float32)
    save_as_zarr(arr, tmp_path / "b.zarr", compress="blosc-lz4")
    z = open_zarr(tmp_path / "b.zarr")
    assert {c["name"] for c in z.codecs} == {"bytes", "blosc"}
    np.testing.assert_array_equal(z[:], arr)
    # partial reads cross chunk boundaries correctly too
    np.testing.assert_array_equal(z[1990:2010], arr[1990:2010])


def test_resolve_zarr_codec_policy(monkeypatch):
    from orcai_tpu.io.zarrlite import resolve_zarr_codec

    assert resolve_zarr_codec(True) == "gzip"
    assert resolve_zarr_codec("gzip") == "gzip"
    assert resolve_zarr_codec(False) is None
    assert resolve_zarr_codec(None) is None
    assert resolve_zarr_codec("blosc-lz4") == "blosc-lz4"
    with pytest.raises(ValueError):
        resolve_zarr_codec("snappy")

    # auto: env override wins; else native availability decides (the
    # pure-Python lz4 encoder is slower than gzip, so hosts without the C
    # encoder must stay on gzip)
    monkeypatch.setenv("ORCAI_TPU_ZARR_CODEC", "gzip")
    assert resolve_zarr_codec("auto") == "gzip"
    monkeypatch.setenv("ORCAI_TPU_ZARR_CODEC", "none")
    assert resolve_zarr_codec("auto") is None
    monkeypatch.delenv("ORCAI_TPU_ZARR_CODEC")
    import orcai_tpu.native as native

    monkeypatch.setenv("ORCAI_TPU_DISABLE_NATIVE", "1")
    native._load_wirecodec.cache_clear()
    try:
        assert resolve_zarr_codec("auto") == "gzip"
    finally:
        monkeypatch.delenv("ORCAI_TPU_DISABLE_NATIVE")
        native._load_wirecodec.cache_clear()
    if native.native_available():
        assert resolve_zarr_codec("auto") == "blosc-lz4"


def test_row_slicing_across_chunks(tmp_path):
    arr = np.arange(5000 * 7, dtype=np.float32).reshape(5000, 7)
    save_as_zarr(arr, tmp_path / "a.zarr", chunks=(2000, 7))
    z = open_zarr(tmp_path / "a.zarr")
    np.testing.assert_array_equal(z[1990:2010, :], arr[1990:2010, :])
    np.testing.assert_array_equal(z[0:1, :], arr[0:1, :])
    np.testing.assert_array_equal(z[4999:5000, :], arr[4999:5000, :])
    np.testing.assert_array_equal(z[123], arr[123])


def test_uncompressed(tmp_path):
    arr = np.ones((10, 3), dtype=np.float32)
    save_as_zarr(arr, tmp_path / "a.zarr", compress=False)
    z = open_zarr(tmp_path / "a.zarr")
    np.testing.assert_array_equal(z[:], arr)


def test_1d(tmp_path):
    arr = np.linspace(0, 1, 777).astype(np.float32)
    save_as_zarr(arr, tmp_path / "v.zarr", chunks=(100,))
    z = open_zarr(tmp_path / "v.zarr")
    np.testing.assert_array_equal(z[:], arr)
    np.testing.assert_array_equal(z[50:150], arr[50:150])


def test_real_zarr_interop(tmp_path):
    zarr = pytest.importorskip("zarr")

    arr = np.random.default_rng(1).normal(size=(100, 8)).astype(np.float32)
    save_as_zarr(arr, tmp_path / "a.zarr", chunks=(30, 8))
    z = zarr.open(tmp_path / "a.zarr", mode="r")
    np.testing.assert_array_equal(z[:], arr)


def test_zstd_codec_gated(tmp_path):
    """zstd chunks decode when an implementation exists, else raise clearly."""
    import json

    import numpy as np

    from orcai_tpu.io import zarrlite

    arr = np.arange(12, dtype=np.float32).reshape(3, 4)
    path = tmp_path / "z.zarr"
    zarrlite.save_as_zarr(arr, path, compress=False)
    meta = json.loads((path / "zarr.json").read_text())
    meta["codecs"].append({"name": "zstd", "configuration": {"level": 3}})
    (path / "zarr.json").write_text(json.dumps(meta))

    try:
        import zstandard  # noqa: F401

        have_zstd = True
    except ImportError:
        try:
            from compression import zstd  # noqa: F401

            have_zstd = True
        except ImportError:
            have_zstd = False

    raw = (path / "c" / "0" / "0").read_bytes()
    if have_zstd:
        import zstandard

        (path / "c" / "0" / "0").write_bytes(
            zstandard.ZstdCompressor(3).compress(raw)
        )
        np.testing.assert_array_equal(zarrlite.open_zarr(path)[:], arr)
    else:
        with pytest.raises(NotImplementedError, match="zstd"):
            zarrlite.open_zarr(path)[0:3]


def test_integer_index_edges(tmp_path):
    arr = np.arange(20, dtype=np.float32).reshape(5, 4)
    save_as_zarr(arr, tmp_path / "e.zarr", compress=False)
    z = open_zarr(tmp_path / "e.zarr")
    np.testing.assert_array_equal(z[-1], arr[-1])
    np.testing.assert_array_equal(z[2, -2], arr[2, -2])
    with pytest.raises(IndexError):
        z[5]
    with pytest.raises(NotImplementedError):
        z[::2]


def test_empty_and_descending_slices(tmp_path):
    """numpy-style contract: empty slices (incl. start > stop) return
    empty arrays, not a negative-dimension crash."""
    arr = np.arange(20, dtype=np.float32).reshape(5, 4)
    save_as_zarr(arr, tmp_path / "e.zarr", compress=False)
    z = open_zarr(tmp_path / "e.zarr")
    for sl in (slice(5, 2), slice(3, 3), slice(4, 2), slice(7, 9)):
        np.testing.assert_array_equal(z[sl], arr[sl])
