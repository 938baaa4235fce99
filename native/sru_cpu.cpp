// SRU CPU inference forward — native host kernel.
//
// The framework's equivalent of the reference's torch C++ extension
// (reference: code/lib/archs/modules/sru/sru_cpu_impl.cpp:55-215): a fused
// elementwise recurrence over pre-GEMMed U, exposed through a plain C ABI
// for ctypes (no torch/pybind dependency).
//
// Per-step math (sru_cpu_impl.cpp:117-127):
//   f = sigmoid(u1 + fb + c*fw)
//   r = sigmoid(u2 + rb + c*rw)
//   c' = u0 + (c - u0) * f
//   h  = x' + (g(c') - x') * r          with skip term (x' = u3 or x*scale_x)
//      = g(c') * r                       without
//
// Build: native/build.py -> libtpuseg_native.so
#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

inline float sigmoidf_(float x) { return 1.0f / (1.0f + std::exp(-x)); }

inline float activate(float x, int type) {
  switch (type) {
    case 1: return std::tanh(x);
    case 2: return x > 0.0f ? x : 0.0f;
    case 3: {  // selu
      const float alpha = 1.6732632423543772f;
      const float scale = 1.0507009873554805f;
      return x > 0.0f ? scale * x : scale * alpha * (std::exp(x) - 1.0f);
    }
    default: return x;
  }
}

// One direction of the recurrence over a [length, batch, d, k] U layout
// (contiguous, k minor).
void sru_dir(const float* u, const float* x, const float* weight_c,
             const float* bias, const float* init, const float* mask_pad,
             int64_t length, int64_t batch, int64_t d, int64_t k,
             int64_t n_in, int activation, bool has_skip, float scale_x,
             bool reverse, int64_t dir, int64_t n_dir,
             float* h, float* c_final) {
  const float* fw = weight_c + dir * d;
  const float* rw = weight_c + (n_dir + dir) * d;
  const float* fb = bias + dir * d;
  const float* rb = bias + (n_dir + dir) * d;

  for (int64_t b = 0; b < batch; ++b) {
    for (int64_t j = 0; j < d; ++j) {
      float c = init ? init[(b * n_dir + dir) * d + j] : 0.0f;
      for (int64_t s = 0; s < length; ++s) {
        int64_t t = reverse ? (length - 1 - s) : s;
        const float* u_t = u + ((t * batch + b) * n_dir + dir) * d * k + j * k;
        float pad = mask_pad ? mask_pad[t * batch + b] : 0.0f;
        float f = sigmoidf_(u_t[1] + fb[j] + c * fw[j]);
        float r = sigmoidf_(u_t[2] + rb[j] + c * rw[j]);
        float c_t = u_t[0] + (c - u_t[0]) * f;
        if (mask_pad) c_t = c_t * (1.0f - pad) + c * pad;
        c = c_t;
        float g = activate(c_t, activation);
        float h_t;
        if (has_skip) {
          float xp = (k == 4)
                         ? u_t[3]
                         : x[(t * batch + b) * n_in + dir * d + j] * scale_x;
          h_t = xp + (g - xp) * r;
        } else {
          h_t = g * r;
        }
        if (mask_pad) h_t = h_t * (1.0f - pad);
        h[((t * batch + b) * n_dir + dir) * d + j] = h_t;
      }
      c_final[(b * n_dir + dir) * d + j] = c;
    }
  }
}

}  // namespace

extern "C" {

// Unidirectional forward. u: [length, batch, d*k]; x: [length, batch, n_in];
// weight_c/bias: [2*d]; init: [batch, d] or nullptr; mask_pad:
// [length, batch] or nullptr. Outputs h: [length, batch, d], c_final:
// [batch, d].
void tpuseg_sru_forward(const float* u, const float* x,
                        const float* weight_c, const float* bias,
                        const float* init, const float* mask_pad,
                        int64_t length, int64_t batch, int64_t d, int64_t k,
                        int64_t n_in, int activation, int has_skip,
                        float scale_x, float* h, float* c_final) {
  sru_dir(u, x, weight_c, bias, init, mask_pad, length, batch, d, k, n_in,
          activation, has_skip != 0, scale_x, /*reverse=*/false, /*dir=*/0,
          /*n_dir=*/1, h, c_final);
}

// Bidirectional forward (reference cpu_bi_forward, sru_cpu_impl.cpp:135).
// u: [length, batch, 2*d*k]; weight_c/bias: [4*d]; init: [batch, 2*d];
// outputs h: [length, batch, 2*d], c_final: [batch, 2*d].
void tpuseg_sru_bi_forward(const float* u, const float* x,
                           const float* weight_c, const float* bias,
                           const float* init, const float* mask_pad,
                           int64_t length, int64_t batch, int64_t d,
                           int64_t k, int64_t n_in, int activation,
                           int has_skip, float scale_x, float* h,
                           float* c_final) {
  for (int64_t dir = 0; dir < 2; ++dir) {
    sru_dir(u, x, weight_c, bias, init, mask_pad, length, batch, d, k, n_in,
            activation, has_skip != 0, scale_x, /*reverse=*/dir == 1, dir,
            /*n_dir=*/2, h, c_final);
  }
}

}  // extern "C"
