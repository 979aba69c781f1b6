"""blosc1 codec: lz4 block format, frame round-trips, zarrlite interop.

The reference reads/writes zarr chunks through the zarr library, whose v2
default compressor is Blosc(cname="lz4", shuffle=1) (reference
io.py:296-331 accepts whatever codec the store was written with). No blosc
C library exists in this image, so conformance evidence is (a) strict
adherence to the c-blosc1 frame layout, (b) round-trips through an
independently-written encoder covering every decoder branch, and (c) a
committed binary fixture store read bit-exact.
"""

import json
import struct
import zlib
from pathlib import Path

import numpy as np
import pytest

from orcai_tpu.io.blosc import (
    blosc_compress,
    blosc_decompress,
    lz4_compress_block,
    lz4_decompress_block,
)
from orcai_tpu.io.zarrlite import open_zarr

FIXTURES = Path(__file__).parent / "fixtures"


# ------------------------------------------------------------------- lz4


def test_lz4_roundtrip_structured():
    rng = np.random.default_rng(0)
    # repetitive data: exercises matches, overlapping copies, long runs
    base = np.arange(256, dtype=np.uint8).tobytes()
    data = base * 40 + rng.integers(0, 256, 999).astype(np.uint8).tobytes()
    comp = lz4_compress_block(data)
    assert len(comp) < len(data)  # repetition must actually compress
    assert lz4_decompress_block(comp, len(data)) == data


def test_lz4_roundtrip_incompressible_and_tiny():
    rng = np.random.default_rng(1)
    for n in [0, 1, 4, 12, 13, 100]:
        data = rng.integers(0, 256, n).astype(np.uint8).tobytes()
        comp = lz4_compress_block(data)
        assert lz4_decompress_block(comp, n) == data


def test_lz4_literal_only_stream_decodes():
    # a hand-built literals-only sequence (valid per the block spec)
    data = b"hello world"
    stream = bytes([len(data) << 4]) + data
    assert lz4_decompress_block(stream, len(data)) == data


def test_lz4_overlapping_match_decodes():
    # token: 1 literal, then match len 8 at offset 1 -> 'a' * 9
    stream = bytes([(1 << 4) | (8 - 4)]) + b"a" + bytes([1, 0])
    assert lz4_decompress_block(stream, 9) == b"a" * 9


def test_lz4_corrupt_offset_raises():
    stream = bytes([(1 << 4) | 0]) + b"a" + bytes([5, 0])  # offset 5 > pos 1
    with pytest.raises(ValueError, match="offset"):
        lz4_decompress_block(stream, 16)


# ----------------------------------------------------------------- frames


@pytest.mark.parametrize("cname", ["lz4", "zlib"])
@pytest.mark.parametrize("shuffle", [True, False])
@pytest.mark.parametrize("typesize", [1, 2, 4, 8])
def test_frame_roundtrip(cname, shuffle, typesize):
    rng = np.random.default_rng(2)
    # compressible payload with a typed structure
    n = 5000 * typesize
    raw = (
        np.repeat(rng.integers(0, 50, n // typesize // 10), 10)
        .astype(f"<i{typesize}" if typesize <= 8 else "<i8")[: n // typesize]
        .tobytes()
    )
    frame = blosc_compress(raw, typesize, cname=cname, shuffle=shuffle)
    assert blosc_decompress(frame) == raw


def test_frame_multiblock_and_leftover():
    rng = np.random.default_rng(3)
    vals = np.repeat(rng.integers(0, 9, 6000), 7).astype("<f4")
    raw = vals.tobytes()  # 168 KB
    frame = blosc_compress(raw, 4, cname="lz4", blocksize=1 << 15)
    nblocks = -(-len(raw) // (1 << 15))
    assert nblocks > 1  # exercises bstarts + the short leftover block
    assert blosc_decompress(frame) == raw


def test_frame_memcpy_mode():
    rng = np.random.default_rng(4)
    raw = rng.integers(0, 256, 4096).astype(np.uint8).tobytes()  # random
    frame = blosc_compress(raw, 1, cname="lz4", shuffle=False)
    # incompressible input must fall back to the memcpy frame
    assert frame[2] & 0x2
    assert blosc_decompress(frame) == raw


def test_frame_split_substreams_layout():
    """The encoder really writes typesize sub-streams per split block, each
    with a u32 size prefix — the layout c-blosc1 produces and expects."""
    vals = np.repeat(np.arange(1000, dtype="<i4"), 4)
    raw = vals.tobytes()
    frame = blosc_compress(raw, 4, cname="zlib", shuffle=False)
    flags = frame[2]
    assert not flags & 0x2  # compressed, not memcpy
    nbytes, blocksize, cbytes = struct.unpack_from("<III", frame, 4)
    assert cbytes == len(frame)
    nblocks = -(-nbytes // blocksize)
    (start0,) = struct.unpack_from("<I", frame, 16)
    assert start0 == 16 + 4 * nblocks
    # walk the 4 sub-streams of block 0 and decode them independently
    pos = start0
    out = b""
    bsize = min(blocksize, nbytes)
    for _ in range(4):
        (sc,) = struct.unpack_from("<I", frame, pos)
        pos += 4
        payload = frame[pos : pos + sc]
        pos += sc
        out += payload if sc == bsize // 4 else zlib.decompress(payload)
    assert out == raw[:bsize]


def test_frame_rejects_bitshuffle_and_unknown_codec():
    frame = bytearray(blosc_compress(b"x" * 64, 1, cname="lz4", shuffle=False))
    good = bytes(frame)
    frame[2] |= 0x4  # bit-shuffle flag
    with pytest.raises(NotImplementedError, match="bit-shuffle"):
        blosc_decompress(bytes(frame))
    frame = bytearray(good)
    if not frame[2] & 0x2:  # only meaningful for compressed frames
        frame[2] = (frame[2] & 0x1F) | (2 << 5)  # snappy
        with pytest.raises(NotImplementedError, match="snappy"):
            blosc_decompress(bytes(frame))


def test_frame_truncated_raises():
    with pytest.raises(ValueError):
        blosc_decompress(b"\x02\x01\x00\x04")


# ------------------------------------------------------------- zarr interop


def _write_blosc_zarr(path: Path, arr: np.ndarray, chunks, **blosc_kw):
    """Hand-build a zarr v3 array directory with blosc-coded chunks."""
    path.mkdir(parents=True)
    meta = {
        "zarr_format": 3,
        "node_type": "array",
        "shape": list(arr.shape),
        "data_type": "float32",
        "chunk_grid": {"name": "regular",
                       "configuration": {"chunk_shape": list(chunks)}},
        "chunk_key_encoding": {"name": "default",
                               "configuration": {"separator": "/"}},
        "fill_value": 0.0,
        "codecs": [
            {"name": "bytes", "configuration": {"endian": "little"}},
            {"name": "blosc", "configuration": {
                "cname": blosc_kw.get("cname", "lz4"), "clevel": 5,
                "shuffle": "shuffle", "typesize": 4, "blocksize": 0}},
        ],
        "attributes": {},
    }
    (path / "zarr.json").write_text(json.dumps(meta))
    n0 = -(-arr.shape[0] // chunks[0])
    n1 = -(-arr.shape[1] // chunks[1])
    for i in range(n0):
        for j in range(n1):
            block = np.zeros(chunks, np.float32)
            src = arr[i * chunks[0] : (i + 1) * chunks[0],
                      j * chunks[1] : (j + 1) * chunks[1]]
            block[: src.shape[0], : src.shape[1]] = src
            frame = blosc_compress(
                block.astype("<f4").tobytes(), 4, **blosc_kw
            )
            f = path / "c" / str(i) / str(j)
            f.parent.mkdir(parents=True, exist_ok=True)
            f.write_bytes(frame)


def test_zarrlite_reads_blosc_store(tmp_path):
    rng = np.random.default_rng(5)
    arr = np.round(rng.normal(size=(130, 17)).astype(np.float32), 2)
    _write_blosc_zarr(tmp_path / "z", arr, (64, 17), cname="lz4")
    z = open_zarr(tmp_path / "z")
    np.testing.assert_array_equal(z[:], arr)
    np.testing.assert_array_equal(z[50:100, 3:9], arr[50:100, 3:9])


def test_zarrlite_reads_committed_blosc_fixture():
    """The committed store must decode bit-exact against its .npy sibling."""
    store = FIXTURES / "blosc_store"
    expected = np.load(FIXTURES / "blosc_store_expected.npy")
    z = open_zarr(store)
    np.testing.assert_array_equal(z[:], expected)
