// Native C++ CPU oracle for deformable convolution (forward + backward).
//
// An independent, deterministic, single-threaded implementation of the op
// semantics contract (SURVEY.md §2.4) used as a test oracle for the JAX/TPU
// implementation — the role the reference's CUDA kernels played for its
// Python layer (reference src/deformable_conv.cu etc.), re-designed rather
// than translated: direct per-output accumulation with a small stack column
// buffer instead of a materialized im2col matrix, unified N-d (2D/3D) code
// path, exact analytic VJPs with ordered (non-atomic) accumulation.
//
// Exposed through a C ABI consumed by ctypes (native/__init__.py).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int MAX_ND = 3;

struct Geom {
  int nd;              // spatial dims (2 or 3)
  int B, C, O;         // batch, in channels, out channels
  int S[MAX_ND];       // input spatial sizes
  int K;               // prod(kernel)
  int kernel[MAX_ND];
  int stride[MAX_ND];
  int pad[MAX_ND];
  int dil[MAX_ND];
  int OS[MAX_ND];      // output spatial sizes
  int g, dg;           // groups, deformable groups
  long P;              // prod(OS)
  long SF;             // prod(S)
  int sstr[MAX_ND];    // input spatial strides (row-major)
  int ostr[MAX_ND];    // output spatial strides
};

Geom make_geom(const int64_t* dims) {
  // dims layout: nd, B, C, O, S[nd], kernel[nd], stride[nd], pad[nd],
  //              dil[nd], g, dg
  Geom ge{};
  int i = 0;
  ge.nd = static_cast<int>(dims[i++]);
  ge.B = static_cast<int>(dims[i++]);
  ge.C = static_cast<int>(dims[i++]);
  ge.O = static_cast<int>(dims[i++]);
  for (int d = 0; d < ge.nd; ++d) ge.S[d] = static_cast<int>(dims[i++]);
  for (int d = 0; d < ge.nd; ++d) ge.kernel[d] = static_cast<int>(dims[i++]);
  for (int d = 0; d < ge.nd; ++d) ge.stride[d] = static_cast<int>(dims[i++]);
  for (int d = 0; d < ge.nd; ++d) ge.pad[d] = static_cast<int>(dims[i++]);
  for (int d = 0; d < ge.nd; ++d) ge.dil[d] = static_cast<int>(dims[i++]);
  ge.g = static_cast<int>(dims[i++]);
  ge.dg = static_cast<int>(dims[i++]);
  ge.K = 1;
  ge.P = 1;
  ge.SF = 1;
  for (int d = 0; d < ge.nd; ++d) {
    ge.K *= ge.kernel[d];
    ge.OS[d] = (ge.S[d] + 2 * ge.pad[d] -
                (ge.dil[d] * (ge.kernel[d] - 1) + 1)) / ge.stride[d] + 1;
    ge.P *= ge.OS[d];
    ge.SF *= ge.S[d];
  }
  ge.sstr[ge.nd - 1] = 1;
  ge.ostr[ge.nd - 1] = 1;
  for (int d = ge.nd - 2; d >= 0; --d) {
    ge.sstr[d] = ge.sstr[d + 1] * ge.S[d + 1];
    ge.ostr[d] = ge.ostr[d + 1] * ge.OS[d + 1];
  }
  return ge;
}

// Decompose flat index p into per-dim output coords.
inline void out_coords(const Geom& ge, long p, int* oc) {
  for (int d = 0; d < ge.nd; ++d) {
    oc[d] = static_cast<int>(p / ge.ostr[d]);
    p -= static_cast<long>(oc[d]) * ge.ostr[d];
  }
}

// Decompose flat tap index f into per-dim kernel coords.
inline void tap_coords(const Geom& ge, int f, int* tc) {
  for (int d = ge.nd - 1; d >= 0; --d) {
    tc[d] = f % ge.kernel[d];
    f /= ge.kernel[d];
  }
}

struct Sample {
  double value;        // interpolated (unmasked) value
  double dpos[MAX_ND]; // d value / d pos_d
  bool gated;          // tap outside the open interval (-1, S_d)
};

// Multilinear sample of one channel plane with out-of-range corners = 0,
// plus analytic derivatives w.r.t. the fractional position.
Sample sample_plane(const Geom& ge, const double* plane, const double* pos) {
  Sample s{};
  for (int d = 0; d < ge.nd; ++d) {
    if (!(pos[d] > -1.0 && pos[d] < static_cast<double>(ge.S[d]))) {
      s.gated = true;
      return s;
    }
  }
  int lo[MAX_ND];
  double fr[MAX_ND];
  for (int d = 0; d < ge.nd; ++d) {
    lo[d] = static_cast<int>(std::floor(pos[d]));
    fr[d] = pos[d] - lo[d];
  }
  const int corners = 1 << ge.nd;
  for (int c = 0; c < corners; ++c) {
    int idx[MAX_ND];
    bool ok = true;
    long flat = 0;
    for (int d = 0; d < ge.nd; ++d) {
      idx[d] = lo[d] + ((c >> d) & 1);
      if (idx[d] < 0 || idx[d] > ge.S[d] - 1) ok = false;
      flat += static_cast<long>(idx[d] < 0 ? 0 : (idx[d] >= ge.S[d] ?
              ge.S[d] - 1 : idx[d])) * ge.sstr[d];
    }
    if (!ok) continue;
    const double v = plane[flat];
    double w = 1.0;
    for (int d = 0; d < ge.nd; ++d)
      w *= ((c >> d) & 1) ? fr[d] : 1.0 - fr[d];
    s.value += w * v;
    for (int d = 0; d < ge.nd; ++d) {
      double dw = ((c >> d) & 1) ? 1.0 : -1.0;
      for (int e = 0; e < ge.nd; ++e)
        if (e != d) dw *= ((c >> e) & 1) ? fr[e] : 1.0 - fr[e];
      s.dpos[d] += dw * v;
    }
  }
  return s;
}

// Scatter `grad` through the interpolation into grad_plane corners.
void scatter_plane(const Geom& ge, double* grad_plane, const double* pos,
                   double grad) {
  for (int d = 0; d < ge.nd; ++d)
    if (!(pos[d] > -1.0 && pos[d] < static_cast<double>(ge.S[d]))) return;
  int lo[MAX_ND];
  double fr[MAX_ND];
  for (int d = 0; d < ge.nd; ++d) {
    lo[d] = static_cast<int>(std::floor(pos[d]));
    fr[d] = pos[d] - lo[d];
  }
  const int corners = 1 << ge.nd;
  for (int c = 0; c < corners; ++c) {
    bool ok = true;
    long flat = 0;
    for (int d = 0; d < ge.nd; ++d) {
      const int idx = lo[d] + ((c >> d) & 1);
      if (idx < 0 || idx > ge.S[d] - 1) { ok = false; break; }
      flat += static_cast<long>(idx) * ge.sstr[d];
    }
    if (!ok) continue;
    double w = 1.0;
    for (int d = 0; d < ge.nd; ++d)
      w *= ((c >> d) & 1) ? fr[d] : 1.0 - fr[d];
    grad_plane[flat] += w * grad;
  }
}

}  // namespace

extern "C" {

// Forward.  All buffers are double (the oracle runs in fp64).
//   x      (B, C, *S)
//   offset (B, dg*nd*K, *OS)
//   mask   (B, dg*K, *OS) or nullptr
//   weight (O, C/g, *kernel)
//   bias   (O,) or nullptr
//   out    (B, O, *OS)  — zero-initialized by the caller
void mdc_forward(const int64_t* dims, const double* x, const double* offset,
                 const double* mask, const double* weight, const double* bias,
                 double* out) {
  const Geom ge = make_geom(dims);
  const int Cg = ge.C / ge.g, Og = ge.O / ge.g, Cdg = ge.C / ge.dg;
  std::vector<double> col(static_cast<size_t>(ge.C) * ge.K);
  int oc[MAX_ND], tc[MAX_ND];
  for (int b = 0; b < ge.B; ++b) {
    const double* xb = x + static_cast<long>(b) * ge.C * ge.SF;
    const double* ob = offset + static_cast<long>(b) * ge.dg * ge.nd * ge.K * ge.P;
    const double* mb = mask ? mask + static_cast<long>(b) * ge.dg * ge.K * ge.P
                            : nullptr;
    for (long p = 0; p < ge.P; ++p) {
      out_coords(ge, p, oc);
      // build the column for this output position
      for (int c = 0; c < ge.C; ++c) {
        const int dgi = c / Cdg;
        const double* plane = xb + static_cast<long>(c) * ge.SF;
        for (int f = 0; f < ge.K; ++f) {
          tap_coords(ge, f, tc);
          double pos[MAX_ND];
          for (int d = 0; d < ge.nd; ++d)
            pos[d] = oc[d] * ge.stride[d] - ge.pad[d] + tc[d] * ge.dil[d] +
                     ob[((static_cast<long>(dgi) * ge.K + f) * ge.nd + d) *
                        ge.P + p];
          Sample s = sample_plane(ge, plane, pos);
          double v = s.gated ? 0.0 : s.value;
          if (mb) v *= mb[(static_cast<long>(dgi) * ge.K + f) * ge.P + p];
          col[static_cast<size_t>(c) * ge.K + f] = v;
        }
      }
      // grouped contraction
      for (int gi = 0; gi < ge.g; ++gi)
        for (int oi = 0; oi < Og; ++oi) {
          double accum = bias ? bias[gi * Og + oi] : 0.0;
          const double* wrow = weight +
              (static_cast<long>(gi) * Og + oi) * Cg * ge.K;
          const double* crow = col.data() + static_cast<size_t>(gi) * Cg * ge.K;
          for (int ck = 0; ck < Cg * ge.K; ++ck) accum += wrow[ck] * crow[ck];
          out[(static_cast<long>(b) * ge.O + gi * Og + oi) * ge.P + p] = accum;
        }
    }
  }
}

// Backward.  grad buffers are caller-zeroed; mask/grad_mask/bias/grad_bias
// may be nullptr.
void mdc_backward(const int64_t* dims, const double* x, const double* offset,
                  const double* mask, const double* weight,
                  const double* grad_out, double* grad_x, double* grad_offset,
                  double* grad_mask, double* grad_weight, double* grad_bias) {
  const Geom ge = make_geom(dims);
  const int Cg = ge.C / ge.g, Og = ge.O / ge.g, Cdg = ge.C / ge.dg;
  std::vector<double> gcol(static_cast<size_t>(ge.C) * ge.K);
  int oc[MAX_ND], tc[MAX_ND];
  for (int b = 0; b < ge.B; ++b) {
    const double* xb = x + static_cast<long>(b) * ge.C * ge.SF;
    double* gxb = grad_x + static_cast<long>(b) * ge.C * ge.SF;
    const double* ob = offset + static_cast<long>(b) * ge.dg * ge.nd * ge.K * ge.P;
    double* gob = grad_offset + static_cast<long>(b) * ge.dg * ge.nd * ge.K * ge.P;
    const double* mb = mask ? mask + static_cast<long>(b) * ge.dg * ge.K * ge.P
                            : nullptr;
    double* gmb = grad_mask ? grad_mask + static_cast<long>(b) * ge.dg * ge.K * ge.P
                            : nullptr;
    for (long p = 0; p < ge.P; ++p) {
      out_coords(ge, p, oc);
      // grad_col = W^T grad_out ; also grad_bias
      std::fill(gcol.begin(), gcol.end(), 0.0);
      for (int gi = 0; gi < ge.g; ++gi)
        for (int oi = 0; oi < Og; ++oi) {
          const double go = grad_out[
              (static_cast<long>(b) * ge.O + gi * Og + oi) * ge.P + p];
          if (grad_bias) grad_bias[gi * Og + oi] += go;
          const double* wrow = weight +
              (static_cast<long>(gi) * Og + oi) * Cg * ge.K;
          double* grow = gcol.data() + static_cast<size_t>(gi) * Cg * ge.K;
          for (int ck = 0; ck < Cg * ge.K; ++ck) grow[ck] += wrow[ck] * go;
        }
      for (int c = 0; c < ge.C; ++c) {
        const int dgi = c / Cdg;
        const double* plane = xb + static_cast<long>(c) * ge.SF;
        double* gplane = gxb + static_cast<long>(c) * ge.SF;
        const int gi = c / Cg, ci = c % Cg;
        for (int f = 0; f < ge.K; ++f) {
          tap_coords(ge, f, tc);
          double pos[MAX_ND];
          for (int d = 0; d < ge.nd; ++d)
            pos[d] = oc[d] * ge.stride[d] - ge.pad[d] + tc[d] * ge.dil[d] +
                     ob[((static_cast<long>(dgi) * ge.K + f) * ge.nd + d) *
                        ge.P + p];
          Sample s = sample_plane(ge, plane, pos);
          const double val = s.gated ? 0.0 : s.value;
          const double m = mb ?
              mb[(static_cast<long>(dgi) * ge.K + f) * ge.P + p] : 1.0;
          const double gc = gcol[static_cast<size_t>(c) * ge.K + f];
          // grad_weight needs the modulated column value
          double* gw = grad_weight +
              (static_cast<long>(gi) * Og) * Cg * ge.K;  // base of group gi
          for (int oi = 0; oi < Og; ++oi) {
            const double go = grad_out[
                (static_cast<long>(b) * ge.O + gi * Og + oi) * ge.P + p];
            gw[(static_cast<long>(oi) * Cg + ci) * ge.K + f] += go * val * m;
          }
          if (s.gated) continue;
          const double dval = gc * m;  // upstream into the sampler
          scatter_plane(ge, gplane, pos, dval);
          for (int d = 0; d < ge.nd; ++d)
            gob[((static_cast<long>(dgi) * ge.K + f) * ge.nd + d) * ge.P + p]
                += dval * s.dpos[d];
          if (gmb)
            gmb[(static_cast<long>(dgi) * ge.K + f) * ge.P + p] += gc * val;
        }
      }
    }
  }
}

}  // extern "C"
