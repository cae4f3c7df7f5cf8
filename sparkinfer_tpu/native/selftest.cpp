// Sanitizer self-test harness for the native host kernels — the analogue
// of the reference's ASAN/TSAN/UBSAN CI matrices (SURVEY.md §5.2) scoped
// to the code that actually runs native here: exercises
// spif_sparse_complement{,_f16}, the dequant/repack codecs and the
// reload planner with hostile-ish shapes under -fsanitize.
//
// Build + run:  make -C sparkinfer_tpu/native sanitize
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
void spif_sparse_complement(const float*, const float*, const float*,
                            const float*, const float*, const float*,
                            const uint8_t*, float*, int32_t, int32_t,
                            int32_t, int32_t, int32_t, float, float);
void spif_sparse_complement_f16(const float*, const uint16_t*, const uint16_t*,
                                const uint16_t*, const float*, const float*,
                                const uint8_t*, float*, int32_t, int32_t,
                                int32_t, int32_t, int32_t, float, float);
int32_t spif_has_f16(void);
void spif_dequant_q8_0(const uint8_t*, float*, int64_t);
int32_t spif_reload_plan(const int32_t*, int32_t, const int32_t*, int32_t,
                         int32_t, int32_t*, int32_t*);
}

static float frand() { return (float)rand() / RAND_MAX - 0.5f; }

int main() {
    srand(7);
    const int32_t N = 3, ng = 5, G = 8, E = 16;
    std::vector<float> x(N * E), up(ng * G * E), gate(ng * G * E),
        down(ng * G * E), probs(N * ng * G), out(N * E, 0.f);
    std::vector<uint8_t> cold(N * ng);
    for (auto& v : x) v = frand();
    for (auto& v : up) v = frand();
    for (auto& v : gate) v = frand();
    for (auto& v : down) v = frand();
    for (auto& v : probs) v = frand() + 0.5f;
    for (size_t i = 0; i < cold.size(); i++) cold[i] = i % 2;

    for (int act = 0; act < 3; act++) {
        std::fill(out.begin(), out.end(), 0.f);
        spif_sparse_complement(x.data(), up.data(), gate.data(), down.data(),
                               nullptr, probs.data(), cold.data(), out.data(),
                               N, ng, G, E, act, 0.05f, 0.5f);
    }
    if (spif_has_f16()) {
        std::vector<uint16_t> upH(up.size()), gateH(up.size()), downH(up.size());
        // bit-pattern f16 conversion via _Float16 when available
        for (size_t i = 0; i < up.size(); i++) {
            _Float16 h = (_Float16)up[i];
            memcpy(&upH[i], &h, 2);
            h = (_Float16)gate[i]; memcpy(&gateH[i], &h, 2);
            h = (_Float16)down[i]; memcpy(&downH[i], &h, 2);
        }
        std::fill(out.begin(), out.end(), 0.f);
        spif_sparse_complement_f16(x.data(), upH.data(), gateH.data(),
                                   downH.data(), nullptr, probs.data(),
                                   cold.data(), out.data(), N, ng, G, E, 1,
                                   0.05f, 0.5f);
    }

    // dequant q8_0: 2 blocks of 32 (the C ABI takes NBLOCKS)
    std::vector<uint8_t> raw(2 * 34);
    for (auto& b : raw) b = (uint8_t)rand();
    std::vector<float> deq(64);
    spif_dequant_q8_0(raw.data(), deq.data(), 2);

    // reload planner: overlapping current/desired sets, tight window
    int32_t cur[4] = {0, 1, 2, 3}, want[4] = {2, 3, 9, 7};
    int32_t slots[4], groups[4];
    int32_t n = spif_reload_plan(cur, 4, want, 4, 2, slots, groups);
    if (n < 0 || n > 2) { fprintf(stderr, "plan size %d\n", n); return 1; }

    printf("native selftest ok\n");
    return 0;
}
