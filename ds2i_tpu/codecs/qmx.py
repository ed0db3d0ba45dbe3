"""QMX-style 128-integer block codec.

The reference vendors Trotman's QMX (qmx_codec.hpp, ~6k lines of SSE):
values packed into 128-bit payload words at a per-run bit width, with
selector bytes (width + run length) stored separately, payload first.
This is a from-scratch re-derivation of that design for the TPU build
(SURVEY.md §7 explicitly calls for re-deriving from the selector table,
not transliterating): 16 width classes, each 128-bit payload word packs
floor(128/width) values; a selector byte encodes (width_class << 4) | run
of consecutive payload words sharing the class. Layout: payload words,
then selectors; the byte length prefix is written by the caller
(block_codecs.hpp:330-332 writes vbyte(len) + payload, as do we).

Partial blocks fall back to interpolative, like the reference.
"""

import numpy as np

from .interpolative import InterpolativeBlock
from .vbyte import TightVariableByte

# width classes: bits per value in a 128-bit payload word
QMX_WIDTHS = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 16, 21, 32]
_PER_WORD = [128 // w if w else 128 for w in QMX_WIDTHS]
_CLASS_OF_BITS = {}
for ci, w in enumerate(QMX_WIDTHS):
    _CLASS_OF_BITS[w] = ci


def _width_class(maxval):
    bits = int(maxval).bit_length()
    for ci, w in enumerate(QMX_WIDTHS):
        if w >= bits:
            return ci
    return len(QMX_WIDTHS) - 1


class QMXBlock:
    block_size = 128
    overflow = 512  # decoders may overshoot within the padded buffer

    @staticmethod
    def _encode_payload(v):
        """Greedy: pack a full payload word at the width of its widest value."""
        n = len(v)
        payload = []  # (class, values list)
        i = 0
        while i < n:
            # width needed for the next candidates at each class
            best = None
            for ci in range(len(QMX_WIDTHS)):
                cnt = min(_PER_WORD[ci], n - i)
                w = QMX_WIDTHS[ci]
                if all(int(x).bit_length() <= w for x in v[i : i + cnt]):
                    best = ci
                    break
            assert best is not None
            cnt = min(_PER_WORD[best], n - i)
            payload.append((best, v[i : i + cnt]))
            i += cnt
        return payload

    @staticmethod
    def encode(values, sum_of_values, n, out_list):
        if n < QMXBlock.block_size:
            InterpolativeBlock.encode(values, sum_of_values, n, out_list)
            return
        v = [int(x) for x in values[:n]]
        payload = QMXBlock._encode_payload(v)

        words = bytearray()
        for ci, vals in payload:
            w = QMX_WIDTHS[ci]
            acc = 0
            if w:
                for j, x in enumerate(vals):
                    acc |= x << (j * w)
            words += acc.to_bytes(16, "little")

        selectors = bytearray()
        i = 0
        while i < len(payload):
            ci = payload[i][0]
            run = 1
            while i + run < len(payload) and payload[i + run][0] == ci and run < 15:
                run += 1
            selectors.append((ci << 4) | run)
            i += run

        body = bytes(words) + bytes(selectors)
        # vbyte(selector offset) so the decoder can split payload/selectors
        out_list.append(TightVariableByte.encode([len(words)]))
        out_list.append(np.frombuffer(body, dtype=np.uint8))

    @staticmethod
    def decode(buf, pos, sum_of_values, n):
        if n < QMXBlock.block_size:
            return InterpolativeBlock.decode(buf, pos, sum_of_values, n)
        vals, pos = TightVariableByte.decode(buf, pos, 1)
        payload_len = int(vals[0])
        out = np.empty(n + QMXBlock.overflow, dtype=np.uint32)
        got = 0
        ppos = pos
        spos = pos + payload_len
        while got < n:
            sel = int(buf[spos])
            spos += 1
            ci = sel >> 4
            run = sel & 0xF
            w = QMX_WIDTHS[ci]
            per = _PER_WORD[ci]
            for _ in range(run):
                word = int.from_bytes(bytes(buf[ppos : ppos + 16]), "little")
                ppos += 16
                if w == 0:
                    cnt = min(per, n - got)
                    out[got : got + cnt] = 0
                    got += cnt
                else:
                    mask = (1 << w) - 1
                    cnt = min(per, n - got)
                    for j in range(cnt):
                        out[got + j] = (word >> (j * w)) & mask
                    got += cnt
                if got >= n:
                    break
        return out[:n].copy(), spos

    # size of the encoded body (payload + selectors), used by the caller's
    # vbyte length prefix — computed during encode
