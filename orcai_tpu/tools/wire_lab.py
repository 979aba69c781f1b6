"""Offline evaluation of candidate lower-bitrate wire codecs.

The shipped wire codec (ops/wire_codec.py, 8-bit mu-law, 38 dB SNR) halves
the host->device bytes and holds annotation-level parity. The next byte
reductions all cost SNR; before building a device decode path for any of
them, this tool measures the thing that actually matters: does a predict
run on codec-round-tripped audio produce the same annotations as on the
original audio?

Usage:
    python -m orcai_tpu.tools.wire_lab <recording.wav> [--channel 1]

For each candidate codec it round-trips the PCM on the host (encode ->
decode, exactly what a device decode would reconstruct), writes a temp
wav, runs the full predict pipeline with the EXACT wire (so the only
perturbation is the candidate codec), and reports bytes/sample, SNR on
the recording, and an interval-aware annotation diff against the
exact-audio run. Candidates (all decode-cheap on TPU: pure vector integer
ops and/or an in-block cumsum):

- mulaw6: 6-bit mu-law (sign + 3-bit exponent + 2-bit mantissa), packed
  4 codes -> 3 bytes. 0.75 bytes/sample.
- bfp6: block-floating-point, 128-sample blocks, per-block uint8 shift +
  signed 6-bit mantissas packed 4->3. ~0.7578 bytes/sample.
- dpcm6: closed-loop first-order DPCM over 512-sample blocks (predictor
  reset per block, so device decode is a per-block cumsum), residuals
  quantized with a per-block power-of-two step to 6 bits, packed 4->3.
  ~0.7559 bytes/sample (incl. per-block step byte + int16 seed).

No reference counterpart (the reference uploads nothing); this is
TPU-link engineering evidence referenced from PERFORMANCE.md.
"""

from __future__ import annotations

import argparse
import tempfile
import time
from pathlib import Path

import numpy as np

BLOCK_BFP = 128
BLOCK_DPCM = 512


# --------------------------------------------------------------- candidates


def mulaw_roundtrip(x: np.ndarray, bits: int = 6) -> np.ndarray:
    """int16 -> int16 through a sign/exp/mant mu-law at `bits` total bits.

    Same segment structure as ops/wire_codec.py (bias 33, 14-bit domain,
    3-bit exponent) with the mantissa narrowed to bits-4 bits. Encode uses
    the same nearest-reconstruction rule, built by table.
    """
    mant_bits = bits - 4
    n_codes = 1 << (bits - 1)  # per sign
    codes = np.arange(n_codes, dtype=np.int64)
    e = codes >> mant_bits
    mant = codes & ((1 << mant_bits) - 1)
    # widen the mantissa back to 4 bits (centered) so segment spans match
    mant4 = (mant << (4 - mant_bits)) + ((1 << (4 - mant_bits)) >> 1)
    levels = (((2 * mant4 + 33) << e) - 33) << 2  # positive reconstructions
    mids = (levels[:-1] + levels[1:]) // 2
    mags = np.abs(x.astype(np.int64))
    idx = np.searchsorted(mids, np.minimum(mags, 32767), side="left")
    out = np.where(x < 0, -levels[idx], levels[idx])
    return np.clip(out, -32768, 32767).astype(np.int16)


def bfp_roundtrip(x: np.ndarray, mant_bits: int = 6,
                  block: int = BLOCK_BFP) -> np.ndarray:
    """Block-floating-point: per-block shift so the peak fits mant_bits."""
    n = len(x)
    pad = (-n) % block
    xb = np.pad(x.astype(np.int32), (0, pad)).reshape(-1, block)
    peak = np.abs(xb).max(axis=1, keepdims=True)
    half = 1 << (mant_bits - 1)
    # smallest shift with peak >> shift < half
    shift = np.zeros_like(peak)
    for s in range(16):
        shift = np.where((peak >> shift) >= half, shift + 1, shift)
    q = np.clip((xb + (1 << np.maximum(shift - 1, 0)) * (shift > 0))
                >> shift, -half, half - 1)
    out = (q << shift).reshape(-1)[:n]
    return np.clip(out, -32768, 32767).astype(np.int16)


def dpcm_roundtrip(x: np.ndarray, res_bits: int = 6,
                   block: int = BLOCK_DPCM) -> np.ndarray:
    """Closed-loop first-order DPCM, predictor reset per block.

    Per block: seed = exact first sample (int16), residual step = smallest
    power of two so the worst in-block first-difference fits res_bits;
    encode loop quantizes x[i] - xhat[i-1] (closed loop, so errors do not
    accumulate). Vectorized across blocks; the sequential dimension is the
    in-block index. Device decode would be dequantize + cumsum per block.
    """
    n = len(x)
    pad = (-n) % block
    xi = np.pad(x.astype(np.int32), (0, pad), mode="edge").reshape(-1, block)
    half = 1 << (res_bits - 1)
    d = np.abs(np.diff(xi, axis=1)).max(axis=1)
    step = np.ones_like(d)
    for s in range(16):
        step = np.where(d // step >= half, step * 2, step)
    xhat = np.empty_like(xi)
    xhat[:, 0] = xi[:, 0]
    for i in range(1, block):
        r = xi[:, i] - xhat[:, i - 1]
        q = np.clip(np.round(r / step).astype(np.int32), -half, half - 1)
        xhat[:, i] = np.clip(xhat[:, i - 1] + q * step, -32768, 32767)
    return xhat.reshape(-1)[:n].astype(np.int16)


CANDIDATES = {
    "mulaw6": (lambda x: mulaw_roundtrip(x, 6), 0.75),
    "bfp6": (lambda x: bfp_roundtrip(x, 6), 0.75 + 1.0 / BLOCK_BFP),
    "bfp5": (lambda x: bfp_roundtrip(x, 5), 0.625 + 1.0 / BLOCK_BFP),
    "dpcm6": (lambda x: dpcm_roundtrip(x, 6),
              0.75 + 3.0 / BLOCK_DPCM),  # step byte + int16 seed per block
    "dpcm5": (lambda x: dpcm_roundtrip(x, 5), 0.625 + 3.0 / BLOCK_DPCM),
    "dpcm4": (lambda x: dpcm_roundtrip(x, 4), 0.5 + 3.0 / BLOCK_DPCM),
    "mulaw8 (shipped)": (None, 1.0),  # round-trip via the real codec
}


# --------------------------------------------------------------- harness


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    ref = ref.astype(np.float64)
    err = test.astype(np.float64) - ref
    p = float(np.mean(ref**2))
    e = float(np.mean(err**2))
    return float("inf") if e == 0 else 10.0 * np.log10(p / max(e, 1e-30))


def _read_tsv(path: Path) -> list[tuple[float, float, str]]:
    rows = []
    for line in Path(path).read_text().strip().splitlines():
        if not line:
            continue
        a, b, lab = line.split("\t")
        try:
            rows.append((float(a), float(b), lab))
        except ValueError:  # header row
            continue
    return rows


def annotation_diff(exact: Path, coded: Path, tol_s: float = 0.5) -> dict:
    """Interval-aware diff for codec SCREENING: matched / lost / extra.

    NOT the same rule as bench.py's wire.parity: bench classifies into
    exact-identical rows + boundary-shifted (endpoints within 2 aggregation
    rows ~0.17 s) + residuals, for auditing the shipped codec at fine grain;
    this lab diff uses a single coarser endpoint tolerance (default 0.5 s)
    because candidate screening only needs "is the call still detected
    roughly where it was". Counts from the two tools are therefore not
    directly comparable.
    """
    ea, ca = _read_tsv(exact), _read_tsv(coded)

    def match(a, pool):
        for j, b in enumerate(pool):
            if (b[2] == a[2] and abs(b[0] - a[0]) <= tol_s
                    and abs(b[1] - a[1]) <= tol_s):
                return j
        return None

    rest = list(ca)
    matched = 0
    only_exact = []
    for a in ea:
        j = match(a, rest)
        if j is None:
            only_exact.append(a)
        else:
            matched += 1
            rest.pop(j)
    return {
        "matched": matched,
        "only_exact": only_exact,
        "only_coded": rest,
        "n_exact": len(ea),
        "n_coded": len(ca),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("recording")
    ap.add_argument("--channel", type=int, default=1)
    ap.add_argument("--model_dir", default=None)
    ap.add_argument("--tol_s", type=float, default=0.5)
    args = ap.parse_args()

    import scipy.io.wavfile as wavfile

    from orcai_tpu.ops.wire_codec import mulaw_decode_host, mulaw_encode
    from orcai_tpu.pipeline.predict import predict
    from orcai_tpu.utils import Messenger

    src = Path(args.recording)
    sr, audio = wavfile.read(str(src))
    if audio.ndim > 1:
        audio = audio[:, args.channel - 1]
    from orcai_tpu.ops.wire_codec import round_to_int16

    audio = np.ascontiguousarray(round_to_int16(audio))

    tmp = Path(tempfile.mkdtemp(prefix="wire_lab_"))
    msgr = Messenger(verbosity=0)

    def run(wav_path: Path, out: Path):
        t0 = time.time()
        predict(wav_path, model_dir=args.model_dir, output_path=out,
                msgr=msgr, verbosity=0, wire="exact")
        return time.time() - t0

    exact_out = tmp / "exact.txt"
    wall = run(src, exact_out)
    print(f"exact-audio predict: {wall:.1f}s, "
          f"{len(_read_tsv(exact_out))} annotations -> {exact_out}")

    for name, (fn, bps) in CANDIDATES.items():
        t0 = time.time()
        coded = mulaw_decode_host(mulaw_encode(audio)) if fn is None else fn(audio)
        enc_s = time.time() - t0
        wav_i = tmp / f"{name.split()[0]}.wav"
        wavfile.write(wav_i, sr, coded)
        out_i = tmp / f"{name.split()[0]}.txt"
        wall = run(wav_i, out_i)
        d = annotation_diff(exact_out, out_i, tol_s=args.tol_s)
        print(f"\n{name}: {bps:.3f} bytes/sample, SNR {snr_db(audio, coded):.1f} dB, "
              f"host encode-sim {enc_s:.2f}s, predict {wall:.1f}s")
        print(f"  matched {d['matched']}/{d['n_exact']} exact annotations; "
              f"{len(d['only_exact'])} lost, {len(d['only_coded'])} extra")
        for tag, rows in (("lost", d["only_exact"]), ("extra", d["only_coded"])):
            for a, b, lab in rows[:8]:
                print(f"    {tag}: {a:9.3f} {b:9.3f} {lab} ({b - a:.2f}s)")


if __name__ == "__main__":
    main()
