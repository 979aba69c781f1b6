"""orcAI-TPU: a TPU-native (JAX/XLA/Pallas) bioacoustics framework.

A from-scratch rebuild of the capabilities of ethz-tb/orcAI (reference:
/root/reference/src/orcAI) designed TPU-first:

- the audio frontend (wav -> STFT -> dB -> normalize) is a fused JAX/XLA
  graph built around a GEMM-native DFT that runs on the MXU
  (reference: spectrogram.py:15-87 runs librosa on host CPU),
- the CRNN detector is a pure-functional flax model trained with a jit'd,
  donate-buffered train step, data-parallel over a `jax.sharding.Mesh`
  (reference: train.py:201 pins a keras model to one GPU),
- inference slides overlapping windows over an HBM-resident spectrogram and
  fuses overlap-add averaging + thresholding into the device graph
  (reference: predict.py:235-317 does this in host numpy),
- storage is a zarr-v3-compatible chunked array store (reference: io.py:296)
  without the zarr dependency.

Keeps the reference's CLI surface, on-disk formats, parameter JSON schema,
and seed-registry semantics so projects can switch over in place.
"""

__version__ = "0.6.0"

MASK_VALUE = -1.0
