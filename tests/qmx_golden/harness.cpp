// Golden-test harness for the QMX byte format.
//
// Compiles the REFERENCE codec (qmx_codec.hpp from the read-only
// reference mount, passed via -I; never copied into this repo) and
// exposes it as a stdin/stdout filter so tests/test_qmx_golden.py can
// check byte-for-byte encode identity and decode round-trips against
// ds2i_tpu/codecs/qmx.py.
//
// Protocol (little-endian):
//   mode "encode": stdin = u32 nblocks, then nblocks * 128 u32 values.
//                  stdout = per block: u32 enc_len + enc_len bytes.
//   mode "decode": stdin = u32 nblocks, then per block u32 enc_len +
//                  enc_len bytes. stdout = nblocks * 128 u32 values.
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include <qmx_codec.hpp>

static const uint32_t BS = 128;

int main(int argc, char** argv) {
    if (argc != 2) { fprintf(stderr, "usage: harness encode|decode\n"); return 2; }
    bool enc = strcmp(argv[1], "encode") == 0;
    uint32_t nblocks = 0;
    if (fread(&nblocks, 4, 1, stdin) != 1) return 3;
    QMX::codec<BS> codec;
    if (enc) {
        std::vector<uint32_t> vals(BS);
        std::vector<uint8_t> buf(QMX::constants::WASTAGE * 4 + 2 * 4 * BS);
        for (uint32_t b = 0; b < nblocks; b++) {
            if (fread(vals.data(), 4, BS, stdin) != BS) return 3;
            size_t len = codec.encode(buf.data(), vals.data());
            uint32_t len32 = (uint32_t)len;
            fwrite(&len32, 4, 1, stdout);
            fwrite(buf.data(), 1, len, stdout);
        }
    } else {
        std::vector<uint32_t> out(BS + QMX::constants::WASTAGE);
        for (uint32_t b = 0; b < nblocks; b++) {
            uint32_t len = 0;
            if (fread(&len, 4, 1, stdin) != 1) return 3;
            std::vector<uint8_t> in(len + QMX::constants::WASTAGE, 0);
            if (len && fread(in.data(), 1, len, stdin) != len) return 3;
            codec.decode(out.data(), in.data(), len);
            fwrite(out.data(), 4, BS, stdout);
        }
    }
    return 0;
}
