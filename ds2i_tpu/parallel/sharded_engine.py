"""Mesh-collective demonstration plane (dp x tp shard_map with psum).

SCOPE: this module is the multi-chip COLLECTIVE fixture — it exists so
the sharding/collective path (shard_map over a Mesh, psum over ICI) is
exercised end-to-end by tests and dryrun_multichip. It scatters into
dense (B_local, num_docs) score/count planes, which is O(B*D) memory and
only sensible at small num_docs.

It is NOT the scale-out serving path. Sharding an inverted index by TERM
forces a per-query cross-chip combination of partial scores keyed by
docid (communication grows with postings touched); sharding by DOC RANGE
keeps every query's join local to a chip and merges only k scores per
query — strictly less ICI traffic and exact. That is why production
engines shard by document, and why this framework's real beyond-one-chip
path is parallel/doc_sharded.DocShardedEngine (per-shard resident
sub-indexes, per-shard block-max pruning, exact merge), with
ResidentEngine(devices=[...]) providing query-batch data parallelism
over replicated state.

  - 'dp' axis: query batch rows (data parallel)
  - 'tp' axis: query terms — each shard scores its term slice, partial
    planes are reduced with psum over ICI, top-k on the reduced plane.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..queries.bm25 import BM25


def make_sharded_plane_step(mesh, num_docs, k):
    """Returns a jitted step: (docs (B,T,L), freqs, qw (B,T), norm_lens (D,))
    -> (and_counts, or_counts, topk_or, topk_and), sharded B over 'dp' and
    T over 'tp'."""

    def local_step(docs, freqs, qw, norm_lens):
        B, T, L = docs.shape
        valid = docs < num_docs
        didx = jnp.where(valid, docs, num_docs)
        bi = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None, None], docs.shape)

        counts = jnp.zeros((B, num_docs + 1), dtype=jnp.int32).at[bi, didx].add(
            valid.astype(jnp.int32)
        )[:, :num_docs]
        counts = jax.lax.psum(counts, "tp")
        target = jax.lax.psum(jnp.where(qw > 0, 1, 0).sum(axis=1), "tp")

        nl = norm_lens[jnp.clip(docs, 0, num_docs - 1)]
        f = freqs.astype(jnp.float32)
        k1, b = jnp.float32(BM25.k1), jnp.float32(BM25.b)
        contrib = qw[:, :, None] * (f / (f + k1 * (jnp.float32(1.0) - b + b * nl)))
        contrib = jnp.where(valid, contrib, 0.0)
        scores = jnp.zeros((B, num_docs + 1), dtype=jnp.float32).at[bi, didx].add(contrib)[
            :, :num_docs
        ]
        scores = jax.lax.psum(scores, "tp")

        and_counts = (counts == target[:, None]).sum(axis=1, dtype=jnp.int32)
        or_counts = (counts > 0).sum(axis=1, dtype=jnp.int32)
        topk_or, _ = jax.lax.top_k(jnp.where(counts > 0, scores, -jnp.inf), k)
        topk_and, _ = jax.lax.top_k(jnp.where(counts == target[:, None], scores, -jnp.inf), k)
        return and_counts, or_counts, topk_or, topk_and

    step = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P("dp", "tp", None), P("dp", "tp", None), P("dp", "tp"), P()),
        out_specs=(P("dp"), P("dp"), P("dp", None), P("dp", None)),
        check_vma=False,
    )
    return jax.jit(step)


def make_mesh(devices=None, dp=None, tp=None):
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if tp is None:
        tp = 2 if n % 2 == 0 and n > 1 else 1
    if dp is None:
        dp = n // tp
    import numpy as np

    return Mesh(np.array(devices[: dp * tp]).reshape(dp, tp), ("dp", "tp"))
