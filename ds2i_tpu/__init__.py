"""ds2i_tpu — a TPU-native inverted-index engine.

A from-scratch rebuild of the capabilities of ot/ds2i ("Data Structures for
Inverted Indexes") designed TPU-first:

- Index *construction* is batched, vectorized encoding on the host (numpy,
  with optional C++ acceleration), producing an HBM-residable compressed
  index made of flat word arrays.
- Query *processing* replaces the reference's pointer-chasing cursors with
  superblock-granular batched decode + branchless vectorized search under
  `jax.jit` (Pallas kernels for the hot bit-manipulation loops), processing
  thousands of queries per dispatch.
- Multi-chip scaling uses `jax.sharding.Mesh` + collectives over ICI
  (term-sharded index, all-gather'd top-k merge) instead of threads.

Layer map (mirrors SURVEY.md §1):
  L0/L1  ds2i_tpu.bitvec      — bit substrate, gamma/delta/interpolative codes
  L2     ds2i_tpu.sequences   — Elias-Fano family with enumerators
  L3     ds2i_tpu.codecs      — 128-int block codecs (vbyte, interpolative,
                                 optpfor, varint-G8IU, QMX, mixed)
  L4     ds2i_tpu.index       — freq_index / block_freq_index containers
  L5     ds2i_tpu.io          — binary collection formats
  L6     ds2i_tpu.queries     — boolean/ranked query operators, BM25, WAND
  L7     ds2i_tpu.tools       — CLI tools
  ops    ds2i_tpu.ops         — jnp/Pallas device kernels (decode, search)
  engine ds2i_tpu.engine      — batched device query executor
  par    ds2i_tpu.parallel    — mesh/sharding utilities, build pool
"""

__version__ = "0.1.0"

from .global_params import GlobalParameters
from .config import Configuration
