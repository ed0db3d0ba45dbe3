"""CLI: measure per-(type,param) block decode times (profile_decoding.cpp).

Usage: python -m ds2i_tpu.tools.profile_decoding <type> <index> <fraction>
           [--out FILE] [--engine host|resident]

Samples `fraction` of the full blocks (rng seeded 1729, like the
reference), re-encodes each with every viable (type, param), measures
decode time over repeated randomly-ordered replays, and emits one JSON
line per measurement with the block's features — the training data for
the decode-time regression.

--engine host (default) times the Python oracle decode on this machine's
CPU. --engine resident times the DEVICE serving path instead — the same
kernels the ResidentEngine dispatches (`_decode_block_stream`: OptPFor /
varint / interpolative), on whatever backend jax is running (the real
TPU under the tunnel, CPU in tests). The reference measures its actual
serving decode (profile_decoding.cpp:13-41); this mode is that
measurement for the batched device engine. Protocol per docs/PERF.md:
blocks sharing a decode-group shape batch into one (R, T) call, repeated
with an in-program lax.fori_loop whose carry feeds back into the field
table (a loop-carried data dependence, so XLA cannot hoist the decode),
and the per-rep time is the difference between a 2N-rep and an N-rep
dispatch (cancelling dispatch+fetch overhead). On device the per-block
cost within a group is shape-determined, not value-determined (all VPU
lanes pay the same); each sampled block's record carries its group's
per-block time, so the downstream regression learns the true per-
(type,param,shape) device cost structure.
"""

import argparse
import json
import sys
import time

import numpy as np

from ..codecs.interpolative import UNKNOWN_SUM
from ..codecs.mixed import BLOCK_TYPES, MixedBlock, compr_params
from ..codecs.time_prediction import FEATURES, FeatureVector, values_statistics
from ..utils import logger
from .common import load_index


def measure_decode(block_type, param, values, sum_of_values, replays=64):
    out = []
    fv = FeatureVector()
    values_statistics(values, fv)
    buf = MixedBlock.compression_stats(block_type, param, values, sum_of_values, len(values), fv)
    if buf is None:
        return None
    t0 = time.perf_counter_ns()
    for _ in range(replays):
        MixedBlock.decode(buf, 0, sum_of_values, len(values))
    elapsed = (time.perf_counter_ns() - t0) / replays
    rec = {"type": block_type, "time": elapsed}
    rec.update(fv.dump())
    return rec


class DeviceProfiler:
    """Times the resident engine's device decode kernels per decode-group
    static class, with the reference's 256-copy replay protocol mapped to
    the batched engine: each group's sampled blocks replicate (at distinct
    stream copies, like profile_decoding.cpp:13-41's random-aligned
    copies) up to `copies` rows, decode as ONE (R, 128) group call
    repeated `reps` times inside a lax.fori_loop whose carry perturbs the
    field table (loop-carried data dependence, so XLA cannot hoist the
    decode), and per-rep time = (t(2*reps) - t(reps)) / reps (cancelling
    dispatch + fetch: see docs/PERF.md measurement protocol)."""

    def __init__(self, copies=256, reps=64, trials=3):
        self.copies = copies
        self.reps = reps
        self.trials = trials
        # static group key -> [bytes chunks, field rows, record refs]
        self._groups = {}

    def add(self, block_type, param, values, sum_of_values, rec):
        """Queue one encoded block for device timing; `rec` gains "time"
        once the group is measured (flush())."""
        from ..engine.block_tiles import _full_stream
        from ..engine.tiles import N_FIELDS

        out = []
        MixedBlock.encode_type(block_type, param, values, sum_of_values, len(values), out)
        buf = np.concatenate([np.asarray(o, np.uint8) for o in out])
        # classify only (field rows are re-walked at the block's real
        # offset inside the group's concatenated stream, see flush())
        row = np.zeros(N_FIELDS, dtype=np.int64)
        end, st = _full_stream(buf, 0, len(values), sum_of_values, MixedBlock, row)
        assert end == len(buf)
        st = st + (len(values),)
        g = self._groups.setdefault(st, ([], [], [], []))
        g[0].append(buf)
        g[1].append(int(sum_of_values))
        g[2].append(len(values))
        g[3].append(rec)

    def _time_reps(self, run, words, fld, st, reps):
        import jax.numpy as jnp

        best = float("inf")
        for _ in range(self.trials):
            t0 = time.perf_counter_ns()
            np.asarray(run(words, fld, st, reps))  # np.asarray = real sync
            best = min(best, time.perf_counter_ns() - t0)
        return best

    def flush(self):
        """Measure every queued group and write per-block times into the
        queued records. Returns the number of groups measured."""
        import jax
        import jax.numpy as jnp
        from functools import partial

        from ..engine.resident import _decode_block_stream
        from ..engine.tiles import N_FIELDS

        @partial(jax.jit, static_argnames=("st",))
        def run(words, fld, st, reps):
            # reps is TRACED (one compile per group static class; the
            # t(2N)-t(N) pair reuses it), the fori_loop carry feeds back
            # into the field table so XLA cannot hoist the decode
            R = fld.shape[0]

            def body(i, carry):
                s, acc = carry
                f = fld + (s & 0)  # data dependence on the previous rep
                out = _decode_block_stream(words, f, st, R, True, 1 << 30)
                s2 = out[:, -1].sum().astype(jnp.int32)
                return (s ^ s2, acc + s2)

            s, acc = jax.lax.fori_loop(0, reps, body, (jnp.int32(0), jnp.int32(0)))
            return s + acc

        from ..engine.block_tiles import BF_EX_W0, BF_W0, _full_stream
        from ..engine.tiles import F_BASE, N_FIELDS

        for st, (bufs, sovs, lens, recs) in sorted(self._groups.items(), key=str):
            # one contiguous stream of this group's blocks, replicated so
            # every row points at its own copy (word offsets shift by the
            # copy's padded length — profile_decoding.cpp's 256 copies)
            stream = np.concatenate(bufs)
            offs = np.concatenate([[0], np.cumsum([len(b) for b in bufs[:-1]])]).astype(np.int64) if len(bufs) > 1 else np.zeros(1, np.int64)
            pad = (-len(stream)) % 4
            stream = np.concatenate([stream, np.zeros(pad + 64, np.uint8)])
            swords = len(stream) // 4
            rows = []
            for pos, sov, n in zip(offs, sovs, lens):
                row = np.zeros(N_FIELDS, dtype=np.int64)
                _full_stream(stream, int(pos), n, sov, MixedBlock, row)
                row[F_BASE] = 1
                rows.append(row)
            fld = np.stack(rows)
            ncopy = max(1, -(-self.copies // len(bufs)))
            words = jnp.asarray(np.tile(stream, ncopy).view("<u4").astype(np.uint32))
            base = np.repeat(np.arange(ncopy, dtype=np.int64) * swords, len(bufs))
            fldr = np.tile(fld, (ncopy, 1))
            fldr[:, BF_W0] += base
            if st[0] == "opt":
                fldr[:, BF_EX_W0] += base
            # fixed row count = copies for every group: one static (R, st)
            # shape class per group regardless of how many blocks landed in it
            fldr = np.resize(fldr, (self.copies, fldr.shape[1]))
            fldj = jnp.asarray(fldr.astype(np.int32))
            R = fldr.shape[0]
            run(words, fldj, st, self.reps)  # compile + warm
            reps, per_block = self.reps, 0.0
            for _ in range(4):  # double reps until the diff clears noise
                t1 = self._time_reps(run, words, fldj, st, reps)
                t2 = self._time_reps(run, words, fldj, st, 2 * reps)
                per_block = (t2 - t1) / reps / R
                if t2 - t1 > 0.1 * t1:
                    break
                reps *= 2
            per_block = max(per_block, 0.0)
            for rec in recs:
                rec["time"] = per_block
        return len(self._groups)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("type")
    ap.add_argument("index_file")
    ap.add_argument("fraction", type=float)
    ap.add_argument("--out")
    ap.add_argument("--replays", type=int, default=64)
    ap.add_argument("--engine", choices=("host", "resident"), default="host")
    ap.add_argument("--copies", type=int, default=256,
                    help="resident mode: replicated stream copies per group")
    args = ap.parse_args()

    index = load_index(args.index_file, args.type)
    rng = np.random.RandomState(1729)
    out = open(args.out, "w") if args.out else sys.stdout

    dev = DeviceProfiler(copies=args.copies, reps=args.replays) if args.engine == "resident" else None
    measured = 0
    records = []
    for l in range(index.size()):
        if index.list_length(l) < MixedBlock.block_size:
            continue
        if rng.rand() > args.fraction:
            continue
        for ib in index.get_blocks(l):
            if ib.size != MixedBlock.block_size:
                continue
            gaps, _ = index.codec.decode(ib.docs_bytes, 0, ib.doc_gaps_universe, ib.size)
            freqs, _ = index.codec.decode(ib.freqs_bytes, 0, UNKNOWN_SUM, ib.size)
            for values, sov in ((gaps, ib.doc_gaps_universe), (freqs, UNKNOWN_SUM)):
                for t in range(BLOCK_TYPES):
                    for param in range(compr_params(t)):
                        if dev is None:
                            rec = measure_decode(t, param, values, sov, args.replays)
                            if rec is not None:
                                out.write(json.dumps(rec) + "\n")
                                measured += 1
                            continue
                        fv = FeatureVector()
                        values_statistics(values, fv)
                        buf = MixedBlock.compression_stats(
                            t, param, values, sov, len(values), fv)
                        if buf is None:
                            continue
                        rec = {"type": t, "time": 0.0}
                        rec.update(fv.dump())
                        dev.add(t, param, values, sov, rec)
                        records.append(rec)
                        measured += 1
    if dev is not None:
        ngroups = dev.flush()
        logger(f"{ngroups} device decode groups timed")
        for rec in records:
            out.write(json.dumps(rec) + "\n")
    logger(f"{measured} measurements")
    if args.out:
        out.close()


if __name__ == "__main__":
    main()
