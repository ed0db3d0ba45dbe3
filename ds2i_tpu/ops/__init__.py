from .segments import SEG_EF, SEG_EF_STRICT, SEG_RB, SEG_AO, SegmentTable, sequence_segments
from .decode import decode_segments_device, decode_segments_numpy
