from .device_index import DeviceIndex
from .executor import QueryEngine
from .flat_executor import FlatQueryEngine
from .resident import ResidentEngine
from .tile_executor import TileQueryEngine


RESIDENT_STREAM_LIMIT = (2**31) // 8 - (1 << 20)  # bytes (i32 bit cursors)


def make_engine(index, wdata=None, devices=None, limit=None, **kw):
    """Engine factory: a single ResidentEngine when the index fits one
    chip's resident-stream budget, else a DocShardedEngine with just
    enough doc-range shards (each shard's stream under the 256 MB i32
    bit-cursor limit), spread over `devices` when given."""
    limit = RESIDENT_STREAM_LIMIT if limit is None else limit
    nbytes = (
        len(index.lists) if hasattr(index, "lists")
        else (len(index.docs_sequences.bits_bv.words) + len(index.freqs_sequences.bits_bv.words)) * 8
    )
    if nbytes <= limit:
        return ResidentEngine(index, wdata, devices=devices, **kw)
    from ..parallel import DocShardedEngine

    # doc ranges split bytes unevenly on skewed collections; the 0.6
    # headroom factor absorbs skew (ResidentEngine raises loudly on any
    # per-shard stream that still exceeds the hard limit, both families)
    shards = max(-(-nbytes // max(int(limit * 0.6), 1)), len(devices) if devices else 1)
    return DocShardedEngine(index, wdata, num_shards=int(shards), devices=devices, **kw)
