"""flappie-tpu: a TPU-native nanopore basecalling engine.

A from-scratch re-design of the capabilities of nanoporetech/flappie
(reference: /root/reference, C99 + SSE + OpenBLAS) as an idiomatic
JAX/XLA/Pallas framework:

- raw fast5 signal is read and normalised on host (float32 discipline
  matching the reference semantics, ``signal/``),
- the flip-flop / run-length neural networks run batched over reads on
  TPU as jitted graphs with fused Pallas recurrent kernels (``models/``,
  ``ops/``),
- CRF Viterbi / forward-backward decoding runs on device as log-semiring
  scans (``ops/crf.py``, ``decode/``),
- output is FASTQ/FASTA/SAM byte-compatible with the reference
  (``io/fastx.py``), plus the trace HDF5 dump and the runnie ``.run``
  format,
- scaling is data-parallel over a ``jax.sharding.Mesh`` (``parallel/``).
"""

__version__ = "0.1.0"
