// Multi-scale deformable attention forward — XLA FFI custom call (CPU).
//
// Native counterpart of the reference's CUDA im2col kernel
// (ops/src/cuda/ms_deform_im2col_cuda.cuh:243) and CPU stub
// (ops/src/cpu/ms_deform_attn_cpu.cpp — which only raised "Not implement on
// cpu"; here the CPU path is real). The TPU production path is the XLA
// gather composition / Pallas kernel in partdistillation_tpu/ops/; this
// custom call is the independent native implementation used for
// cross-checking numerics (the ops/test.py pattern) and for fast host-side
// inference.
//
// Semantics (must match ops/sampling.py bilinear_sample):
//   value   (B, S, M, D) f32, S = sum_l H_l*W_l, level-major flattening
//   shapes  (L, 2) s32 — (H_l, W_l)
//   loc     (B, Q, M, L, P, 2) f32 normalized [0,1], (x, y)
//   weight  (B, Q, M, L, P) f32
//   out     (B, Q, M*D) f32
// Pixel mapping: x_pix = x*W - 0.5 (align_corners=False); out-of-range
// bilinear taps contribute zero.
//
// Build: g++ -O3 -fopenmp -shared -fPIC -I<jax ffi include> \
//        ms_deform_attn_cpu.cc -o libms_deform_attn_cpu.so

#include <cmath>
#include <cstdint>
#include <vector>

#include "xla/ffi/api/ffi.h"

namespace ffi = xla::ffi;

static ffi::Error MsDeformAttnFwdImpl(ffi::Buffer<ffi::F32> value,
                                      ffi::Buffer<ffi::S32> shapes,
                                      ffi::Buffer<ffi::F32> loc,
                                      ffi::Buffer<ffi::F32> weight,
                                      ffi::ResultBuffer<ffi::F32> out) {
  auto vd = value.dimensions();
  auto ld = loc.dimensions();
  if (vd.size() != 4 || ld.size() != 6) {
    return ffi::Error::InvalidArgument("expected value rank 4, loc rank 6");
  }
  const int64_t B = vd[0], S = vd[1], M = vd[2], D = vd[3];
  const int64_t Q = ld[1], L = ld[3], P = ld[4];

  const float* v = value.typed_data();
  const int32_t* sh = shapes.typed_data();
  const float* lp = loc.typed_data();
  const float* wp = weight.typed_data();
  float* op = out->typed_data();

  std::vector<int64_t> level_start(L + 1, 0);
  for (int64_t l = 0; l < L; ++l) {
    level_start[l + 1] = level_start[l] + (int64_t)sh[2 * l] * sh[2 * l + 1];
  }
  if (level_start[L] != S) {
    return ffi::Error::InvalidArgument("spatial shapes do not sum to S");
  }

#pragma omp parallel for collapse(2)
  for (int64_t b = 0; b < B; ++b) {
    for (int64_t q = 0; q < Q; ++q) {
      for (int64_t m = 0; m < M; ++m) {
        float* acc = op + ((b * Q + q) * M + m) * D;
        for (int64_t d = 0; d < D; ++d) acc[d] = 0.f;
        for (int64_t l = 0; l < L; ++l) {
          const int64_t H = sh[2 * l], W = sh[2 * l + 1];
          const float* vbase = v + ((b * S + level_start[l]) * M + m) * D;
          const int64_t row_stride = W * M * D;  // value is (B,S,M,D); S is level-major
          for (int64_t p = 0; p < P; ++p) {
            const int64_t li = ((((b * Q + q) * M + m) * L + l) * P + p);
            const float x = lp[li * 2 + 0] * (float)W - 0.5f;
            const float y = lp[li * 2 + 1] * (float)H - 0.5f;
            const float wgt = wp[li];
            if (wgt == 0.f) continue;
            const int64_t x0 = (int64_t)std::floor(x), y0 = (int64_t)std::floor(y);
            const float fx = x - (float)x0, fy = y - (float)y0;
            const float cw[4] = {(1 - fy) * (1 - fx), (1 - fy) * fx,
                                 fy * (1 - fx), fy * fx};
            const int64_t ys[4] = {y0, y0, y0 + 1, y0 + 1};
            const int64_t xs[4] = {x0, x0 + 1, x0, x0 + 1};
            for (int t = 0; t < 4; ++t) {
              if (ys[t] < 0 || ys[t] >= H || xs[t] < 0 || xs[t] >= W) continue;
              const float* src = vbase + ys[t] * row_stride + xs[t] * M * D;
              const float c = wgt * cw[t];
              for (int64_t d = 0; d < D; ++d) acc[d] += c * src[d];
            }
          }
        }
      }
    }
  }
  return ffi::Error::Success();
}

XLA_FFI_DEFINE_HANDLER_SYMBOL(
    PdMsDeformAttnFwd, MsDeformAttnFwdImpl,
    ffi::Ffi::Bind()
        .Arg<ffi::Buffer<ffi::F32>>()   // value
        .Arg<ffi::Buffer<ffi::S32>>()   // shapes
        .Arg<ffi::Buffer<ffi::F32>>()   // loc
        .Arg<ffi::Buffer<ffi::F32>>()   // weight
        .Ret<ffi::Buffer<ffi::F32>>()); // out
