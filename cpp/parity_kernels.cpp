// CPU reference kernels for numerical parity testing.
//
// The reference repo's two native components are a Cython pairwise-IoU kernel
// (PyraPose/utils/compute_overlap.pyx:13-53) and a Ceres-based weighted-
// reprojection PnP refiner (PyraPose/uncertainty_pnp/src/uncertainty_pnp.cpp).
// The TPU framework implements both as JAX programs; these standalone C++
// implementations (no external deps — the 6x6 normal equations are solved
// with a hand-rolled Cholesky) are the ground truth the test suite checks the
// JAX kernels against.
//
// Build: g++ -O2 -shared -fPIC -o libparity.so parity_kernels.cpp

#include <cmath>
#include <cstring>

extern "C" {

// Pairwise IoU: boxes (n,4) x query (k,4) -> out (n,k), boxes as x1,y1,x2,y2.
void iou_pairwise(const float* boxes, int n, const float* query, int k,
                  float* out) {
  for (int i = 0; i < n; ++i) {
    const float bx1 = boxes[i * 4 + 0], by1 = boxes[i * 4 + 1];
    const float bx2 = boxes[i * 4 + 2], by2 = boxes[i * 4 + 3];
    const float barea = (bx2 - bx1) * (by2 - by1);
    for (int j = 0; j < k; ++j) {
      const float qx1 = query[j * 4 + 0], qy1 = query[j * 4 + 1];
      const float qx2 = query[j * 4 + 2], qy2 = query[j * 4 + 3];
      const float iw = std::fmin(bx2, qx2) - std::fmax(bx1, qx1);
      const float ih = std::fmin(by2, qy2) - std::fmax(by1, qy1);
      float iou = 0.f;
      if (iw > 0.f && ih > 0.f) {
        const float qarea = (qx2 - qx1) * (qy2 - qy1);
        const float ua = barea + qarea - iw * ih;
        if (ua > 0.f) iou = iw * ih / ua;
      }
      out[i * k + j] = iou;
    }
  }
}

namespace {

// Solve A x = b for symmetric positive-definite 6x6 A via Cholesky.
bool solve6(double a[6][6], const double b[6], double x[6]) {
  double l[6][6] = {};
  for (int i = 0; i < 6; ++i) {
    for (int j = 0; j <= i; ++j) {
      double s = a[i][j];
      for (int k = 0; k < j; ++k) s -= l[i][k] * l[j][k];
      if (i == j) {
        if (s <= 0.0) return false;
        l[i][i] = std::sqrt(s);
      } else {
        l[i][j] = s / l[j][j];
      }
    }
  }
  double y[6];
  for (int i = 0; i < 6; ++i) {
    double s = b[i];
    for (int k = 0; k < i; ++k) s -= l[i][k] * y[k];
    y[i] = s / l[i][i];
  }
  for (int i = 5; i >= 0; --i) {
    double s = y[i];
    for (int k = i + 1; k < 6; ++k) s -= l[k][i] * x[k];
    x[i] = s / l[i][i];
  }
  return true;
}

void axis_angle_to_r(const double v[3], double r[3][3]) {
  const double t2 = v[0] * v[0] + v[1] * v[1] + v[2] * v[2];
  const double t = std::sqrt(t2);
  double a, b;
  if (t2 < 1e-12) {
    a = 1.0 - t2 / 6.0;
    b = 0.5 - t2 / 24.0;
  } else {
    a = std::sin(t) / t;
    b = (1.0 - std::cos(t)) / t2;
  }
  const double d = 1.0 - b * t2;
  r[0][0] = d + b * v[0] * v[0];
  r[0][1] = b * v[0] * v[1] - a * v[2];
  r[0][2] = b * v[0] * v[2] + a * v[1];
  r[1][0] = b * v[0] * v[1] + a * v[2];
  r[1][1] = d + b * v[1] * v[1];
  r[1][2] = b * v[1] * v[2] - a * v[0];
  r[2][0] = b * v[0] * v[2] - a * v[1];
  r[2][1] = b * v[1] * v[2] + a * v[0];
  r[2][2] = d + b * v[2] * v[2];
}

void matmul33(const double a[3][3], const double b[3][3], double out[3][3]) {
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += a[i][k] * b[k][j];
      out[i][j] = s;
    }
}

}  // namespace

// Weighted Gauss-Newton refinement of (R, t) on reprojection error — the
// fixed-iteration equivalent of uncertainty_pnp.cpp:61-92's Ceres LM solve.
// rot: 9 doubles row-major in/out; trans: 3 doubles in/out.
// pts2d (n,2), pts3d (n,3), w (n), cam = fx fy cx cy.
void gn_refine_pose(double* rot, double* trans, const double* pts2d,
                    const double* pts3d, const double* w, int n,
                    const double* cam, int iterations, double damping) {
  double r[3][3];
  std::memcpy(r, rot, sizeof(r));
  double t[3] = {trans[0], trans[1], trans[2]};
  const double fx = cam[0], fy = cam[1], cx = cam[2], cy = cam[3];

  for (int it = 0; it < iterations; ++it) {
    double jtj[6][6] = {};
    double jtr[6] = {};
    for (int i = 0; i < n; ++i) {
      const double* p = pts3d + i * 3;
      double pc[3];
      for (int d = 0; d < 3; ++d)
        pc[d] = r[d][0] * p[0] + r[d][1] * p[1] + r[d][2] * p[2] + t[d];
      double z = pc[2];
      if (std::fabs(z) < 1e-6) z = 1e-6;
      const double iz = 1.0 / z;
      const double u = fx * pc[0] * iz + cx;
      const double v = fy * pc[1] * iz + cy;
      const double res[2] = {u - pts2d[i * 2 + 0], v - pts2d[i * 2 + 1]};
      // d(pix)/d(p_cam)
      const double jp[2][3] = {{fx * iz, 0.0, -fx * pc[0] * iz * iz},
                               {0.0, fy * iz, -fy * pc[1] * iz * iz}};
      // d(p_cam)/d(theta) = -[pc]x, d(p_cam)/dt = I
      const double sk[3][3] = {{0, -pc[2], pc[1]},
                               {pc[2], 0, -pc[0]},
                               {-pc[1], pc[0], 0}};
      double jac[2][6];
      for (int rdx = 0; rdx < 2; ++rdx) {
        for (int cdx = 0; cdx < 3; ++cdx) {
          double s = 0;
          for (int k = 0; k < 3; ++k) s += jp[rdx][k] * sk[k][cdx];
          jac[rdx][cdx] = -s;            // rotation block
          jac[rdx][3 + cdx] = jp[rdx][cdx];  // translation block
        }
      }
      const double wi = w[i] > 0 ? w[i] : 0.0;
      for (int a = 0; a < 6; ++a) {
        for (int b = 0; b < 6; ++b)
          jtj[a][b] += wi * (jac[0][a] * jac[0][b] + jac[1][a] * jac[1][b]);
        jtr[a] += wi * (jac[0][a] * res[0] + jac[1][a] * res[1]);
      }
    }
    for (int a = 0; a < 6; ++a) jtj[a][a] += damping * (1.0 + jtj[a][a]);
    double delta[6];
    double neg[6];
    for (int a = 0; a < 6; ++a) neg[a] = -jtr[a];
    if (!solve6(jtj, neg, delta)) break;
    double dr[3][3], rnew[3][3];
    axis_angle_to_r(delta, dr);
    matmul33(dr, r, rnew);
    std::memcpy(r, rnew, sizeof(r));
    // the linearization is about camera-frame points p = R p0 + t, so the
    // increment acts on the whole pose: t' = dR t + dt (matches
    // pose/refine.py)
    double tn[3];
    for (int a = 0; a < 3; ++a)
      tn[a] = dr[a][0] * t[0] + dr[a][1] * t[1] + dr[a][2] * t[2] + delta[3 + a];
    t[0] = tn[0];
    t[1] = tn[1];
    t[2] = tn[2];
  }
  std::memcpy(rot, r, sizeof(r));
  trans[0] = t[0];
  trans[1] = t[1];
  trans[2] = t[2];
}

// Covariance-weighted Gauss-Newton: the exact residual of the reference's
// Ceres cost (uncertainty_pnp.cpp:29-31), r = W * (proj - obs) with a
// symmetric 2x2 weight matrix W = [[wxx, wxy], [wxy, wyy]] per point.
// wgt (n,3) = wxx, wxy, wyy. Other args as gn_refine_pose.
void gn_refine_pose_cov(double* rot, double* trans, const double* pts2d,
                        const double* pts3d, const double* wgt, int n,
                        const double* cam, int iterations, double damping) {
  double r[3][3];
  std::memcpy(r, rot, sizeof(r));
  double t[3] = {trans[0], trans[1], trans[2]};
  const double fx = cam[0], fy = cam[1], cx = cam[2], cy = cam[3];

  for (int it = 0; it < iterations; ++it) {
    double jtj[6][6] = {};
    double jtr[6] = {};
    for (int i = 0; i < n; ++i) {
      const double* p = pts3d + i * 3;
      double pc[3];
      for (int d = 0; d < 3; ++d)
        pc[d] = r[d][0] * p[0] + r[d][1] * p[1] + r[d][2] * p[2] + t[d];
      double z = pc[2];
      if (std::fabs(z) < 1e-6) z = 1e-6;
      const double iz = 1.0 / z;
      const double u = fx * pc[0] * iz + cx;
      const double v = fy * pc[1] * iz + cy;
      const double res[2] = {u - pts2d[i * 2 + 0], v - pts2d[i * 2 + 1]};
      const double jp[2][3] = {{fx * iz, 0.0, -fx * pc[0] * iz * iz},
                               {0.0, fy * iz, -fy * pc[1] * iz * iz}};
      const double sk[3][3] = {{0, -pc[2], pc[1]},
                               {pc[2], 0, -pc[0]},
                               {-pc[1], pc[0], 0}};
      double jac[2][6];
      for (int rdx = 0; rdx < 2; ++rdx) {
        for (int cdx = 0; cdx < 3; ++cdx) {
          double s = 0;
          for (int k = 0; k < 3; ++k) s += jp[rdx][k] * sk[k][cdx];
          jac[rdx][cdx] = -s;
          jac[rdx][3 + cdx] = jp[rdx][cdx];
        }
      }
      // whiten: jw = W jac, rw = W res
      const double wxx = wgt[i * 3 + 0], wxy = wgt[i * 3 + 1],
                   wyy = wgt[i * 3 + 2];
      double jw[2][6];
      for (int cdx = 0; cdx < 6; ++cdx) {
        jw[0][cdx] = wxx * jac[0][cdx] + wxy * jac[1][cdx];
        jw[1][cdx] = wxy * jac[0][cdx] + wyy * jac[1][cdx];
      }
      const double rw[2] = {wxx * res[0] + wxy * res[1],
                            wxy * res[0] + wyy * res[1]};
      for (int a = 0; a < 6; ++a) {
        for (int b = 0; b < 6; ++b)
          jtj[a][b] += jw[0][a] * jw[0][b] + jw[1][a] * jw[1][b];
        jtr[a] += jw[0][a] * rw[0] + jw[1][a] * rw[1];
      }
    }
    for (int a = 0; a < 6; ++a) jtj[a][a] += damping * (1.0 + jtj[a][a]);
    double delta[6];
    double neg[6];
    for (int a = 0; a < 6; ++a) neg[a] = -jtr[a];
    if (!solve6(jtj, neg, delta)) break;
    double dr[3][3], rnew[3][3];
    axis_angle_to_r(delta, dr);
    matmul33(dr, r, rnew);
    std::memcpy(r, rnew, sizeof(r));
    double tn[3];
    for (int a = 0; a < 3; ++a)
      tn[a] = dr[a][0] * t[0] + dr[a][1] * t[1] + dr[a][2] * t[2] + delta[3 + a];
    t[0] = tn[0];
    t[1] = tn[1];
    t[2] = tn[2];
  }
  std::memcpy(rot, r, sizeof(r));
  trans[0] = t[0];
  trans[1] = t[1];
  trans[2] = t[2];
}

}  // extern "C"
