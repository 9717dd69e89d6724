// Native host-side I/O kernels (C ABI, loaded via ctypes).
//
// The reference implements its ingest hot paths in C++ (src/read-plink.cpp,
// src/read-bgen.cpp); these are the TPU-framework equivalents:
//   - bed_recode: byte-level 2-bit recode/subset of PLINK .bed bodies
//   - bgen_decode_variants: parallel seek + zlib inflate + 8-bit
//     probability decode into dosage codes, with INFO/freq accumulation
//     (reference src/read-bgen.cpp:18-127)
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC io_native.cpp -lz
//
// The Python wrapper (native/__init__.py) compiles lazily and falls back
// to the pure-numpy implementations when no toolchain is available.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <zlib.h>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Recode a variant-major 2-bit packed matrix to a row/col subset.
// in:  (m, nb_in) packed;  rows = variant indices (n_rows_out of them)
// cols = sample indices (n_out of them); out: (n_rows_out, nb_out)
int bed_subset_pack(const uint8_t* in, int64_t m, int64_t nb_in,
                    const int64_t* rows, int64_t m_out,
                    const int64_t* cols, int64_t n_out,
                    uint8_t* out) {
  int64_t nb_out = (n_out + 3) / 4;
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t j = 0; j < m_out; j++) {
    const uint8_t* src = in + rows[j] * nb_in;
    uint8_t* dst = out + j * nb_out;
    std::memset(dst, 0, nb_out);
    for (int64_t i = 0; i < n_out; i++) {
      int64_t s = cols[i];
      uint8_t code = (src[s >> 2] >> (2 * (s & 3))) & 3;
      dst[i >> 2] |= code << (2 * (i & 3));
    }
  }
  return 0;
}

// Decode BGEN layout-2 zlib 8-bit variants.
// file_bytes: whole .bgen file; offsets[k] point at the START of the
// compressed genotype block (i.e. after the variant-id fields), with
// comp_sizes[k] = C - 4 and N samples. ind_row: selected rows.
// Outputs: codes (K, n_sub) uint8 (dosage codes, 207-decode, 3=missing),
// info[K], freq[K].
int bgen_decode_variants(const uint8_t* file_bytes,
                         const int64_t* offsets,
                         const int64_t* comp_sizes,
                         int64_t K, int64_t N,
                         const int64_t* ind_row, int64_t n_sub,
                         uint8_t* codes, double* info, double* freq,
                         int dosage, uint64_t seed,
                         int n_threads) {
  const int64_t D = 10 + 3 * N;
  int err = 0;

  // decode LUT: e in 0..510 -> byte code 207 - round(e*100/255)
  uint8_t decode_lut[511];
  for (int e = 0; e <= 510; e++)
    decode_lut[e] = (uint8_t)(207 - (int)std::lround(e * 100.0 / 255.0));

#ifdef _OPENMP
#pragma omp parallel num_threads(n_threads)
#endif
  {
    uint8_t* buf = new uint8_t[D];
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 16)
#endif
    for (int64_t k = 0; k < K; k++) {
      uLongf D2 = (uLongf)D;
      int rc = uncompress(buf, &D2, file_bytes + offsets[k],
                          (uLong)comp_sizes[k]);
      if (rc != Z_OK) { err = rc; continue; }

      const uint8_t* ploidy = buf + 8;
      const uint8_t* probs = buf + 10 + N;
      uint8_t* out_row = codes + k * n_sub;

      // per-variant RNG for hard-call sampling (splitmix64)
      uint64_t st = seed + (uint64_t)k * 0x9E3779B97F4A7C15ull;
      auto next_u01 = [&st]() {
        uint64_t z = (st += 0x9E3779B97F4A7C15ull);
        z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
        z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
        z = z ^ (z >> 31);
        return (double)(z >> 11) * (1.0 / 9007199254740992.0);
      };

      int64_t nona = 0;
      double af = 0, num = 0;
      for (int64_t i = 0; i < n_sub; i++) {
        int64_t g = ind_row[i];
        if (ploidy[g] >= 0x80) {
          out_row[i] = 3;
        } else {
          int p0 = probs[2 * g], p1 = probs[2 * g + 1];
          int e = 2 * p0 + p1;
          double f = 4.0 * p0 + p1;
          nona++;
          af += e;
          num += 255.0 * f - (double)e * e;
          if (dosage) {
            out_row[i] = decode_lut[e];
          } else {
            double first = next_u01() * 255 - p0;
            out_row[i] = (first < 0) ? 4 : ((first < p1) ? 5 : 6);
          }
        }
      }
      double coef = 255.0 * (2 * nona);
      info[k] = (af > 0) ? 1 - num * 2 * nona / (af * (coef - af)) : NAN;
      freq[k] = (nona > 0) ? 1 - af / coef : NAN;
    }
    delete[] buf;
  }
  return err;
}

}  // extern "C"
