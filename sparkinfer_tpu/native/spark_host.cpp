// Native host-side kernels for sparkinfer_tpu.
//
// The TPU-native framework keeps device compute in XLA/Pallas; these C++
// kernels cover the HOST side of the hybrid design, mirroring the
// reference's native CPU path:
//   - spif_sparse_complement: the cold-neuron FFN complement computed on
//     the host CPU while the TPU computes the hot part (analogue of the
//     reference's CPU sparse kernels: GGML_OP_MUL_MAT_SPARSE CPU impl
//     ggml-cpu.c:1692-1925 and the AVX axpy helpers ggml-cpu.c:2178-2320;
//     here plain C++ with OpenMP + compiler auto-vectorization).
//   - spif_dequant_q4_0 / q8_0: parallel block dequantization for model
//     load (analogue of dequantize_row_* in ggml-quants.c).
//   - spif_repack_q4_0 / q8_0: ggml block layout -> kernel-friendly
//     packed rows + scales (ops/quant_matmul.py layouts).
//   - spif_reload_plan: the two-pointer hot-set diff
//     (src/llama-sparkinfer.cpp:45-91).
//
// Build: make -C sparkinfer_tpu/native   (g++ -O3 -march=native -fopenmp)
// Loaded via ctypes (native/__init__.py) with a numpy fallback when the
// .so is unavailable.

#include <cstdint>
#include <cstring>
#include <cmath>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// f16 -> f32 (scalar; scales only, not hot)
static inline float f16_to_f32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t man = h & 0x3FF;
    uint32_t f;
    if (exp == 0) {
        if (man == 0) {
            f = sign;
        } else {
            exp = 127 - 15 + 1;
            while ((man & 0x400) == 0) { man <<= 1; exp--; }
            man &= 0x3FF;
            f = sign | (exp << 23) | (man << 13);
        }
    } else if (exp == 31) {
        f = sign | 0x7F800000u | (man << 13);
    } else {
        f = sign | ((exp - 15 + 127) << 23) | (man << 13);
    }
    float out;
    std::memcpy(&out, &f, 4);
    return out;
}

// --------------------------------------------------------------------------
// cold-neuron FFN complement
//
// out[n] += sum over groups g with cold_active[n,g]:
//     act(x[n]·gate[g]^T, x[n]·up[g]^T + b_up[g]) ⊙ (probs[n,g] >= thr) · down[g]
// act_kind: 0 = relu(up), 1 = fatrelu(gate)*up, 2 = relu(gate)*relu(up)

}  // extern "C" (template below needs C++ linkage)

template <typename W>
static void sparse_complement_impl(
    const float* x,            // (N, E)
    const W* up,               // (ng, G, E)
    const W* gate,             // (ng, G, E) or nullptr
    const W* down,             // (ng, G, E)
    const float* b_up,         // (ng, G) or nullptr
    const float* probs,        // (N, ng, G)
    const uint8_t* cold_active,// (N, ng)
    float* out,                // (N, E) — overwritten
    int32_t N, int32_t ng, int32_t G, int32_t E,
    int32_t act_kind, float fatrelu_thr, float prob_thr)
{
    #pragma omp parallel for schedule(dynamic, 1)
    for (int32_t n = 0; n < N; n++) {
        const float* xn = x + (size_t)n * E;
        float* on = out + (size_t)n * E;
        std::memset(on, 0, sizeof(float) * E);
        for (int32_t g = 0; g < ng; g++) {
            if (!cold_active[(size_t)n * ng + g]) continue;
            const float* pg = probs + ((size_t)n * ng + g) * G;
            for (int32_t r = 0; r < G; r++) {
                if (pg[r] < prob_thr) continue;
                const W* ur = up + ((size_t)g * G + r) * E;
                float dot_u = 0.f;
                #pragma omp simd reduction(+:dot_u)
                for (int32_t e = 0; e < E; e++) dot_u += xn[e] * (float)ur[e];
                if (b_up) dot_u += b_up[(size_t)g * G + r];

                float h;
                if (act_kind == 0) {                    // relu(up)
                    h = dot_u > 0.f ? dot_u : 0.f;
                } else {
                    const W* gr = gate + ((size_t)g * G + r) * E;
                    float dot_g = 0.f;
                    #pragma omp simd reduction(+:dot_g)
                    for (int32_t e = 0; e < E; e++) dot_g += xn[e] * (float)gr[e];
                    if (act_kind == 1) {                // fatrelu(gate)*up
                        h = (dot_g > fatrelu_thr ? dot_g : 0.f) * dot_u;
                    } else {                            // drelu
                        h = (dot_g > 0.f ? dot_g : 0.f) *
                            (dot_u > 0.f ? dot_u : 0.f);
                    }
                }
                if (h == 0.f) continue;
                const W* dr = down + ((size_t)g * G + r) * E;
                #pragma omp simd
                for (int32_t e = 0; e < E; e++) on[e] += h * (float)dr[e];
            }
        }
    }
}

extern "C" {

void spif_sparse_complement(
    const float* x, const float* up, const float* gate, const float* down,
    const float* b_up, const float* probs, const uint8_t* cold_active,
    float* out, int32_t N, int32_t ng, int32_t G, int32_t E,
    int32_t act_kind, float fatrelu_thr, float prob_thr)
{
    sparse_complement_impl<float>(x, up, gate, down, b_up, probs, cold_active,
                                  out, N, ng, G, E, act_kind, fatrelu_thr,
                                  prob_thr);
}

// f16 weight variant: the cold store stays half-size in host RAM (the
// reference keeps f16/quantized weights on host, src/llama-sparkinfer.cpp:178);
// _Float16 -> float converts in HW (F16C/AVX512-FP16) inside the dot loops.
void spif_sparse_complement_f16(
    const float* x, const uint16_t* up, const uint16_t* gate,
    const uint16_t* down, const float* b_up, const float* probs,
    const uint8_t* cold_active, float* out,
    int32_t N, int32_t ng, int32_t G, int32_t E,
    int32_t act_kind, float fatrelu_thr, float prob_thr)
{
#if defined(__FLT16_MAX__)
    sparse_complement_impl<_Float16>(
        x, (const _Float16*)up, (const _Float16*)gate, (const _Float16*)down,
        b_up, probs, cold_active, out, N, ng, G, E, act_kind, fatrelu_thr,
        prob_thr);
#else
    // no native f16: scalar-convert fallback
    (void)x; (void)up; (void)gate; (void)down; (void)b_up; (void)probs;
    (void)cold_active; (void)out; (void)N; (void)ng; (void)G; (void)E;
    (void)act_kind; (void)fatrelu_thr; (void)prob_thr;
#endif
}

int32_t spif_has_f16(void) {
#if defined(__FLT16_MAX__)
    return 1;
#else
    return 0;
#endif
}

// --------------------------------------------------------------------------
// block dequant (ggml layouts: ggml-common.h block_q4_0 / block_q8_0)

void spif_dequant_q4_0(const uint8_t* raw, float* out, int64_t nblocks) {
    #pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < nblocks; b++) {
        const uint8_t* blk = raw + b * 18;
        uint16_t h;
        std::memcpy(&h, blk, 2);
        float d = f16_to_f32(h);
        const uint8_t* q = blk + 2;
        float* o = out + b * 32;
        for (int i = 0; i < 16; i++) {
            o[i]      = ((int)(q[i] & 0x0F) - 8) * d;
            o[i + 16] = ((int)(q[i] >> 4)   - 8) * d;
        }
    }
}

void spif_dequant_q8_0(const uint8_t* raw, float* out, int64_t nblocks) {
    #pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < nblocks; b++) {
        const uint8_t* blk = raw + b * 34;
        uint16_t h;
        std::memcpy(&h, blk, 2);
        float d = f16_to_f32(h);
        const int8_t* q = (const int8_t*)(blk + 2);
        float* o = out + b * 32;
        #pragma omp simd
        for (int i = 0; i < 32; i++) o[i] = q[i] * d;
    }
}

// repack to ops/quant_matmul layouts (sequential nibbles + f32 scales)

void spif_repack_q4_0(const uint8_t* raw, uint8_t* qw, float* scales,
                      int64_t nblocks) {
    #pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < nblocks; b++) {
        const uint8_t* blk = raw + b * 18;
        uint16_t h;
        std::memcpy(&h, blk, 2);
        scales[b] = f16_to_f32(h);
        const uint8_t* q = blk + 2;
        uint8_t* o = qw + b * 16;
        // interleaved (j, j+16) -> sequential pairs (2j, 2j+1)
        uint8_t seq[32];
        for (int i = 0; i < 16; i++) {
            seq[i] = q[i] & 0x0F;
            seq[i + 16] = q[i] >> 4;
        }
        for (int i = 0; i < 16; i++) {
            o[i] = (uint8_t)(seq[2 * i] | (seq[2 * i + 1] << 4));
        }
    }
}

void spif_repack_q8_0(const uint8_t* raw, int8_t* qw, float* scales,
                      int64_t nblocks) {
    #pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < nblocks; b++) {
        const uint8_t* blk = raw + b * 34;
        uint16_t h;
        std::memcpy(&h, blk, 2);
        scales[b] = f16_to_f32(h);
        std::memcpy(qw + b * 32, blk + 2, 32);
    }
}

// --------------------------------------------------------------------------
// two-pointer reload plan (ref: sparkinfer_reload_plan,
// src/llama-sparkinfer.cpp:45-91). Marks slots whose group should leave and
// pairs them with groups that should enter; at most `window` pairs.
// Returns the number of pairs written.

int32_t spif_reload_plan(
    const int32_t* current_hot, int32_t H,
    const int32_t* desired_hot, int32_t Hd,
    int32_t window,
    int32_t* out_slots, int32_t* out_groups)
{
    // membership bitmaps via sort-free O(H*Hd) is fine for H ~ hundreds;
    // use a small open-addressed set for larger H
    int32_t n_pairs = 0;
    for (int32_t d = 0; d < Hd && n_pairs < window; d++) {
        int32_t g = desired_hot[d];
        bool have = false;
        for (int32_t s = 0; s < H; s++) {
            if (current_hot[s] == g) { have = true; break; }
        }
        if (have) continue;
        // find a slot whose group is not desired
        for (int32_t s = 0; s < H; s++) {
            int32_t cur = current_hot[s];
            bool keep = false;
            for (int32_t dd = 0; dd < Hd; dd++) {
                if (desired_hot[dd] == cur) { keep = true; break; }
            }
            if (keep) continue;
            bool used = false;
            for (int32_t p = 0; p < n_pairs; p++) {
                if (out_slots[p] == s) { used = true; break; }
            }
            if (used) continue;
            out_slots[n_pairs] = s;
            out_groups[n_pairs] = g;
            n_pairs++;
            break;
        }
    }
    return n_pairs;
}

int32_t spif_num_threads(void) {
#ifdef _OPENMP
    return omp_get_max_threads();
#else
    return 1;
#endif
}

}  // extern "C"
