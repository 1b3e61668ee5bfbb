// ThreadSanitizer exercise for the native ingest library (SURVEY §5.2:
// host-side C++ should run under TSAN in CI; the reference has no sanitizer
// builds at all).  Compiled together with gbingest.cpp under
// -fsanitize=thread by tools/tsan_check.sh and drives every multithreaded
// path plus concurrent independent calls from parallel loader threads.
#include <cassert>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

#include <zlib.h>

extern "C" {
void gb_encode_ascii(const uint8_t* src, int64_t n, uint8_t* dst,
                     int32_t n_threads);
int64_t gb_bgzf_inflate(const uint8_t* data, int64_t n, uint8_t* out,
                        int64_t out_cap, int32_t n_threads);
int64_t gb_bgzf_raw_size(const uint8_t* data, int64_t n);
int64_t gb_sais(const uint8_t* s, int64_t n, int32_t K, int32_t* out);
}

// one BGZF block: gzip header + BC extra field + raw deflate + crc/isize
static void bgzf_block(const uint8_t* raw, size_t n, std::vector<uint8_t>& out) {
    std::vector<uint8_t> comp(n + 256);
    z_stream zs{};
    deflateInit2(&zs, 6, Z_DEFLATED, -15, 8, Z_DEFAULT_STRATEGY);
    zs.next_in = const_cast<uint8_t*>(raw);
    zs.avail_in = (uInt)n;
    zs.next_out = comp.data();
    zs.avail_out = (uInt)comp.size();
    int rc = deflate(&zs, Z_FINISH);
    assert(rc == Z_STREAM_END);
    size_t clen = zs.total_out;
    deflateEnd(&zs);
    uint16_t bsize = (uint16_t)(clen + 25 + 1 - 1);
    uint8_t hdr[18] = {31, 139, 8, 4, 0, 0, 0, 0, 0, 255,
                       6,  0,  66, 67, 2, 0, 0, 0};
    memcpy(hdr + 16, &bsize, 2);
    out.insert(out.end(), hdr, hdr + 18);
    out.insert(out.end(), comp.data(), comp.data() + clen);
    uint32_t crc = crc32(0, raw, (uInt)n), isz = (uint32_t)n;
    uint8_t tail[8];
    memcpy(tail, &crc, 4);
    memcpy(tail + 4, &isz, 4);
    out.insert(out.end(), tail, tail + 8);
}

int main() {
    std::mt19937 rng(7);
    const char* bases = "ACGTNacgtn";

    // 1. gb_encode_ascii internal thread pool on a >1MB buffer
    std::vector<uint8_t> ascii(3 << 20);
    for (auto& c : ascii) c = (uint8_t)bases[rng() % 10];
    std::vector<uint8_t> codes(ascii.size());
    gb_encode_ascii(ascii.data(), (int64_t)ascii.size(), codes.data(), 4);
    for (size_t i = 0; i < 64; i++) assert(codes[i] <= 4);

    // 2. gb_bgzf_inflate internal thread pool over >=8 blocks
    std::vector<uint8_t> raw(16 * 60000);
    for (auto& c : raw) c = (uint8_t)(rng() & 0xFF);
    std::vector<uint8_t> bgzf;
    for (size_t off = 0; off < raw.size(); off += 60000)
        bgzf_block(raw.data() + off, 60000, bgzf);
    std::vector<uint8_t> empty;
    bgzf_block(nullptr, 0, empty);  // EOF block
    bgzf.insert(bgzf.end(), empty.begin(), empty.end());
    int64_t rsz = gb_bgzf_raw_size(bgzf.data(), (int64_t)bgzf.size());
    assert(rsz == (int64_t)raw.size());
    std::vector<uint8_t> infl(rsz);
    int64_t got = gb_bgzf_inflate(bgzf.data(), (int64_t)bgzf.size(),
                                  infl.data(), rsz, 4);
    assert(got == rsz && memcmp(infl.data(), raw.data(), rsz) == 0);

    // 3. concurrent independent callers (parallel loader threads): encode +
    //    SA-IS on disjoint buffers, all four at once
    auto worker = [&](int seed) {
        std::mt19937 r(seed);
        std::vector<uint8_t> a(1 << 21);
        for (auto& c : a) c = (uint8_t)bases[r() % 10];
        std::vector<uint8_t> out(a.size());
        gb_encode_ascii(a.data(), (int64_t)a.size(), out.data(), 2);
        std::vector<uint8_t> txt(5000);
        for (auto& c : txt) c = (uint8_t)(r() % 4);
        std::vector<int32_t> sa(txt.size());
        int64_t rc2 = gb_sais(txt.data(), (int64_t)txt.size(), 4, sa.data());
        assert(rc2 == (int64_t)txt.size());
        for (size_t i = 1; i < 200; i++) assert(sa[i] != sa[i - 1]);
    };
    std::vector<std::thread> ts;
    for (int t = 0; t < 4; t++) ts.emplace_back(worker, 100 + t);
    for (auto& t : ts) t.join();

    printf("tsan_check: all exercises passed\n");
    return 0;
}
