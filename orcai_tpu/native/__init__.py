"""On-demand-built native (C) helpers for host-side hot loops.

The package ships plain C sources (no pybind11/setuptools machinery — the
environment's Python↔C surface is ctypes) that are compiled once per
source-hash into ``~/.cache/orcai_tpu/native`` with the system toolchain and
loaded via ctypes. Every native entry point has a vectorized-numpy fallback
with identical (bit-exact, tested) semantics, so a host without a C compiler
— or ``ORCAI_TPU_DISABLE_NATIVE=1`` — runs the same pipeline, just slower on
the 1-core encode stage.

Current contents: the wire-codec host encoders (``wirecodec.c``) — the
block-floating-point encode is the one host loop that sits on the predict
critical path (see ops/wire_codec.py for why) — the polyphase resamplers
(``resample.c``), and the LZ4 block codec (``lz4dec.c``/``lz4enc.c``)
behind blosc-framed zarr stores: decode for bulk reads of upstream
blosc-lz4 data, encode for the materialized spectrogram/label stores
(gzip writes dominated create-spectrograms wall time; see
io/zarrlite.resolve_zarr_codec).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from functools import lru_cache
from pathlib import Path

import numpy as np

def _sources() -> list[Path]:
    return sorted(Path(__file__).parent.glob("*.c"))


def _cache_dir() -> Path:
    return Path(
        os.environ.get(
            "ORCAI_TPU_NATIVE_CACHE_DIR",
            os.path.expanduser("~/.cache/orcai_tpu/native"),
        )
    )


def _compilers() -> list[str]:
    return [os.environ["CC"]] if os.environ.get("CC") else ["cc", "gcc", "g++"]


def _build(srcs: list[Path], out: Path) -> bool:
    """Compile srcs -> out (atomic rename); True on success.

    -march=native is tried first so the integer hot loops (bfp encode, the
    3/4 resampler) vectorize at the host's full SIMD width — every kernel
    here is pure integer arithmetic, so the flag changes speed, never
    results. Hosts whose compiler rejects the flag fall back to plain -O3.
    """
    out.parent.mkdir(parents=True, exist_ok=True)
    for cc in _compilers():
        for arch in (["-march=native"], []):
            fd, tmp = tempfile.mkstemp(dir=out.parent, suffix=".so")
            os.close(fd)
            try:
                proc = subprocess.run(
                    [cc, "-O3", *arch, "-shared", "-fPIC", "-o", tmp]
                    + [str(s) for s in srcs],
                    capture_output=True, timeout=120,
                )
                if proc.returncode == 0:
                    # atomic: concurrent builders race safely
                    os.replace(tmp, out)
                    return True
            except (OSError, subprocess.TimeoutExpired):
                pass
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)
    return False


def _isa_fingerprint() -> bytes:
    """Host-ISA marker folded into the .so cache name.

    The library is built with -march=native, so a cached binary is only
    valid on a host with the same instruction-set extensions: a cache
    directory that survives a machine change (shared volume, migrated
    image) must MISS rather than hand ctypes a .so whose first AVX-512
    instruction SIGILLs the process. The cpuinfo `flags` line enumerates
    exactly what -march=native could have emitted.
    """
    import platform

    marker = platform.machine().encode()
    try:
        with open("/proc/cpuinfo", "rb") as f:
            for line in f:
                if line.startswith((b"flags", b"Features")):
                    marker += b"|" + b" ".join(sorted(line.split()[2:]))
                    break
    except OSError:
        pass
    return marker


@lru_cache(maxsize=1)
def _load_wirecodec() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None on any failure.

    One .so covers every native helper; its name hashes all C sources plus
    the host-ISA fingerprint, so editing any source — or moving the cache
    to a CPU with different SIMD extensions — rebuilds on next use.
    """
    if os.environ.get("ORCAI_TPU_DISABLE_NATIVE") == "1":
        return None
    try:
        srcs = _sources()
        h = hashlib.sha256()
        for s in srcs:
            h.update(s.name.encode())
            h.update(s.read_bytes())
        h.update(_isa_fingerprint())
        so = _cache_dir() / f"orcai-native-{h.hexdigest()[:16]}.so"
        if not so.exists() and not _build(srcs, so):
            return None
        lib = ctypes.CDLL(str(so))
        lib.orcai_mulaw_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.orcai_mulaw_encode.restype = None
        lib.orcai_bfp_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.orcai_bfp_encode.restype = None
        # c_char_p for the buffers: ctypes passes bytes / string buffers
        # by address directly (c_void_p would require manual casts)
        lib.orcai_lz4_decompress.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
        ]
        lib.orcai_lz4_decompress.restype = ctypes.c_int64
        lib.orcai_lz4_compress.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
        ]
        lib.orcai_lz4_compress.restype = ctypes.c_int64
        lib.orcai_resample34.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.orcai_resample34.restype = ctypes.c_int64
        lib.orcai_resample_poly.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.orcai_resample_poly.restype = ctypes.c_int64
        lib.orcai_quant_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.orcai_quant_u8.restype = None
        lib.orcai_quant_u16.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.orcai_quant_u16.restype = None
        return lib
    except Exception:  # noqa: BLE001 — any failure means "use numpy"
        return None


def native_available() -> bool:
    return _load_wirecodec() is not None


def lz4_decompress_native(src: bytes, dest_size: int) -> bytes | None:
    """LZ4 block decode via C, or None if unavailable.

    Raises ValueError on malformed input (same contract as the Python
    decoder in io/blosc.py, which is the fallback and semantics reference).
    """
    lib = _load_wirecodec()
    if lib is None:
        return None
    dst = ctypes.create_string_buffer(dest_size)
    n = lib.orcai_lz4_decompress(src, len(src), dst, dest_size)
    if n != dest_size:
        raise ValueError(
            "corrupt lz4 block: bad match offset, truncation, or overrun "
            f"(produced {n} bytes, expected {dest_size})"
        )
    return dst.raw


def lz4_compress_native(src: bytes) -> bytes | None:
    """LZ4 block encode via C, or None if unavailable.

    Output is spec-conformant but NOT byte-identical to the Python encoder
    in io/blosc.py (any valid LZ4 encoding decodes to the same bytes; the
    tested contract is round-trip equality through both decoders).
    """
    lib = _load_wirecodec()
    if lib is None:
        return None
    n = len(src)
    if n > 0x7FFFFFF0:
        # the C side also guards this with the same -1 it uses for buffer
        # overflow; check here so a >2 GB input gets its own message
        # instead of being misreported as a buffer sizing bug
        raise ValueError(
            f"lz4 compress: input too large ({n} bytes > 0x7ffffff0); "
            "chunk the payload"
        )
    cap = n + n // 255 + 16
    dst = ctypes.create_string_buffer(cap)
    written = lib.orcai_lz4_compress(src, n, dst, cap)
    if written < 0:  # pragma: no cover — cap is the worst case by spec
        raise ValueError("lz4 compress: output buffer overflow")
    return dst.raw[:written]


def quantize_linear_native(x: np.ndarray, dtype) -> np.ndarray | None:
    """f32 -> uint8/uint16 linear quantize (rint(x*scale) clipped) via C,
    or None if unavailable. Bit-exact with the numpy chain in
    train/evaluate.quantize_eval_upload (tested)."""
    lib = _load_wirecodec()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float32)
    out = np.empty(x.shape, dtype)
    fn = lib.orcai_quant_u8 if dtype == np.uint8 else lib.orcai_quant_u16
    fn(x.ctypes.data, x.size, out.ctypes.data)
    return out


def mulaw_encode_native(x: np.ndarray, lut: np.ndarray) -> np.ndarray | None:
    """int16 PCM -> uint8 mu-law codes via C, or None if unavailable.

    `lut` is wire_codec.encode_table() — sharing it keeps the native path
    identical to the numpy path by construction.
    """
    lib = _load_wirecodec()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.int16)
    out = np.empty(x.size, np.uint8)
    lib.orcai_mulaw_encode(
        x.ctypes.data, x.size, lut.ctypes.data, out.ctypes.data
    )
    return out.reshape(x.shape)


# the C kernel's hardcoded layout (wirecodec.c): 128-sample blocks, packed
# bytes per block keyed by mantissa width
_BFP_C_BLOCK = 128
_BFP_C_BLOCK_BYTES = {6: 96, 5: 80}


def bfp_encode_into(
    x: np.ndarray,
    mant_bits: int,
    block: int,
    packed_out: np.ndarray,
    shifts_out: np.ndarray,
) -> bool:
    """Encode into caller-provided output views (e.g. one shared buffer).

    Returns False (without touching the outputs) when the native library is
    unavailable. The outputs must be C-contiguous uint8 views sized for
    ceil(len(x)/block) blocks; x is zero-padded to a whole block count.
    Raises ValueError for any geometry the C kernel does not implement —
    it hardcodes 128-sample blocks and 6/5-bit mantissas — or for
    mis-sized/mis-typed outputs (the C side cannot bounds-check for us).
    """
    lib = _load_wirecodec()
    if lib is None:
        return False
    if block != _BFP_C_BLOCK or mant_bits not in _BFP_C_BLOCK_BYTES:
        raise ValueError(
            f"native bfp encoder supports block={_BFP_C_BLOCK}, mant_bits in "
            f"{sorted(_BFP_C_BLOCK_BYTES)}; got block={block}, "
            f"mant_bits={mant_bits}"
        )
    x = np.ascontiguousarray(x, dtype=np.int16)
    pad = (-x.shape[0]) % block
    if pad:
        x = np.pad(x, (0, pad))
    n_blocks = x.shape[0] // block
    for name, out, want in (
        ("packed_out", packed_out, n_blocks * _BFP_C_BLOCK_BYTES[mant_bits]),
        ("shifts_out", shifts_out, n_blocks),
    ):
        if out.dtype != np.uint8 or not out.flags.c_contiguous:
            raise ValueError(f"{name} must be a C-contiguous uint8 array")
        if out.size != want:
            raise ValueError(f"{name} has {out.size} bytes, need {want}")
    lib.orcai_bfp_encode(
        x.ctypes.data, n_blocks, mant_bits, packed_out.ctypes.data,
        shifts_out.ctypes.data,
    )
    return True


def bfp_encode_native(
    x: np.ndarray, mant_bits: int, block: int, block_bytes: int
) -> tuple[np.ndarray, np.ndarray] | None:
    """int16 PCM (n,) -> (packed uint8, shifts uint8) via C, or None.

    Zero-pads to a whole number of `block`-sample blocks (as the numpy
    encoder does); bit-exact with wire_codec.bfp_encode. Thin allocation
    wrapper over bfp_encode_into.
    """
    n_blocks = -(-np.asarray(x).shape[0] // block)
    packed = np.empty(n_blocks * block_bytes, np.uint8)
    shifts = np.empty(n_blocks, np.uint8)
    if not bfp_encode_into(x, mant_bits, block, packed, shifts):
        return None
    return packed, shifts


def resample34_native(
    x: np.ndarray, taps: np.ndarray, n_out: int
) -> np.ndarray | None:
    """3/4 polyphase resample via C (resample.c), or None if unavailable.

    `x` int16 PCM, `taps` the int16 Q15 prototype from
    ops.spectral.design_taps34 (odd length, group delay divisible by 3).
    Bit-exact with the numpy fallback in ops/spectral.py. Raises ValueError
    when the C kernel rejects the geometry — the designer should never
    produce one it rejects, so a rejection is a bug, not a fallback case.
    """
    lib = _load_wirecodec()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.int16)
    taps = np.ascontiguousarray(taps, dtype=np.int16)
    out = np.empty(int(n_out), np.int16)
    rc = lib.orcai_resample34(
        x.ctypes.data, x.size, taps.ctypes.data, taps.size,
        out.ctypes.data, out.size,
    )
    if rc == -2:
        return None  # transient allocation failure: numpy path still works
    if rc != 0:
        raise ValueError(
            f"native resampler rejected geometry (rc={rc}): n_taps="
            f"{taps.size}, n_in={x.size}, n_out={n_out}"
        )
    return out


def resample_poly_native(
    x: np.ndarray, taps: np.ndarray, L: int, M: int, n_out: int
) -> np.ndarray | None:
    """Generic L/M polyphase resample via C (resample.c), or None if
    unavailable.

    `x` int16 PCM, `taps` the int16 Q15 prototype from
    ops.spectral.design_taps(sr, pass_hz, L, M) (odd length, group delay
    divisible by L). Bit-exact with ops/spectral._resample_poly_numpy.
    Raises ValueError on a geometry the C kernel rejects — the designer
    never produces one, so a rejection is a bug, not a fallback case.
    """
    if int(L) > 64:
        # beyond the C kernel's per-phase stack arrays; no grid-preserving
        # ratio needs it — the numpy path handles exotic callers
        return None
    lib = _load_wirecodec()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.int16)
    taps = np.ascontiguousarray(taps, dtype=np.int16)
    out = np.empty(int(n_out), np.int16)
    rc = lib.orcai_resample_poly(
        x.ctypes.data, x.size, taps.ctypes.data, taps.size,
        int(L), int(M), out.ctypes.data, out.size,
    )
    if rc == -2:
        return None
    if rc != 0:
        raise ValueError(
            f"native poly resampler rejected geometry (rc={rc}): L={L} "
            f"M={M} n_taps={taps.size}, n_in={x.size}, n_out={n_out}"
        )
    return out
