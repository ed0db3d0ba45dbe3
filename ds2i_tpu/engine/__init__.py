from .device_index import DeviceIndex
from .executor import QueryEngine
from .flat_executor import FlatQueryEngine
from .resident import ResidentEngine
from .tile_executor import TileQueryEngine


# ResidentEngine holds streams up to 2^36 bits = 8 GB each (tile cursors
# are (i32 word, bit-in-word) pairs); the factory's default split point
# keeps the combined resident bytes at half a v5e's 16 GB HBM so tile
# tables, norm cache, and decode workspace still fit alongside.
RESIDENT_STREAM_LIMIT = (1 << 33) - (1 << 20)  # bytes


def make_engine(index, wdata=None, devices=None, limit=None, **kw):
    """Engine factory: a single ResidentEngine when the index fits one
    chip's resident-stream budget, else a DocShardedEngine with just
    enough doc-range shards (each shard's streams under the 8 GB
    word-cursor limit), spread over `devices` when given."""
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
