// _native: C++ host-side preprocessing kernels.
//
// The model-build step (B-matrices, Jacobians, affine element-stiffness
// parts for every element x quadrature point) is pure host work that runs
// once per mesh. For production-scale meshes (hundreds of thousands of
// elements) the NumPy einsum path becomes the build bottleneck; this
// extension provides the same computation as vbicm_tpu.model._element_geometry
// + the ke_lam/ke_mu einsums in tight C++ loops. Exposed via the CPython
// C API (no pybind11 dependency); vbicm_tpu.model falls back to NumPy when
// the extension is not built.
//
// Layout contract (must match vbicm_tpu/model.py):
//   B[e, q] is (3, 8):  row0 = dN/dx interleaved x-slots,
//                       row1 = dN/dy interleaved y-slots,
//                       row2 = (dN/dy, dN/dx) pairs;
//   dvol[e, q] = thk * detJ * w_q;
//   ke_lam = sum_q dvol * B^T C_LAM3 B,  C_LAM3 = [[1,1,0],[1,1,0],[0,0,0]]
//   ke_mu  = sum_q dvol * B^T C_MU3  B,  C_MU3  = diag(2,2,1)

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <cmath>
#include <cstdint>

namespace {

// bilinear quad corner signs, order (-,-), (+,-), (+,+), (-,+)
const double S[4] = {-1.0, 1.0, 1.0, -1.0};
const double T[4] = {-1.0, -1.0, 1.0, 1.0};

static PyObject* precompute_quad4(PyObject*, PyObject* args) {
  PyArrayObject *coords_o, *conn_o, *qpts_o, *qwts_o;
  double thk;
  if (!PyArg_ParseTuple(args, "O!O!O!O!d", &PyArray_Type, &coords_o,
                        &PyArray_Type, &conn_o, &PyArray_Type, &qpts_o,
                        &PyArray_Type, &qwts_o, &thk)) {
    return nullptr;
  }

  PyArrayObject* coords = (PyArrayObject*)PyArray_FROM_OTF(
      (PyObject*)coords_o, NPY_DOUBLE, NPY_ARRAY_IN_ARRAY);
  PyArrayObject* conn = (PyArrayObject*)PyArray_FROM_OTF(
      (PyObject*)conn_o, NPY_INT32, NPY_ARRAY_IN_ARRAY);
  PyArrayObject* qpts = (PyArrayObject*)PyArray_FROM_OTF(
      (PyObject*)qpts_o, NPY_DOUBLE, NPY_ARRAY_IN_ARRAY);
  PyArrayObject* qwts = (PyArrayObject*)PyArray_FROM_OTF(
      (PyObject*)qwts_o, NPY_DOUBLE, NPY_ARRAY_IN_ARRAY);
  if (!coords || !conn || !qpts || !qwts) {
    Py_XDECREF(coords); Py_XDECREF(conn); Py_XDECREF(qpts); Py_XDECREF(qwts);
    return nullptr;
  }

  const npy_intp nele = PyArray_DIM(conn, 0);
  const npy_intp nqpt = PyArray_DIM(qpts, 0);
  const double* cx = (const double*)PyArray_DATA(coords);
  const int32_t* cn = (const int32_t*)PyArray_DATA(conn);
  const double* qp = (const double*)PyArray_DATA(qpts);
  const double* qw = (const double*)PyArray_DATA(qwts);

  npy_intp dimsB[4] = {nele, nqpt, 3, 8};
  npy_intp dimsD[2] = {nele, nqpt};
  npy_intp dimsK[3] = {nele, 8, 8};
  PyArrayObject* B_o = (PyArrayObject*)PyArray_ZEROS(4, dimsB, NPY_DOUBLE, 0);
  PyArrayObject* dvol_o = (PyArrayObject*)PyArray_ZEROS(2, dimsD, NPY_DOUBLE, 0);
  PyArrayObject* kl_o = (PyArrayObject*)PyArray_ZEROS(3, dimsK, NPY_DOUBLE, 0);
  PyArrayObject* km_o = (PyArrayObject*)PyArray_ZEROS(3, dimsK, NPY_DOUBLE, 0);
  if (!B_o || !dvol_o || !kl_o || !km_o) {
    Py_XDECREF(B_o); Py_XDECREF(dvol_o); Py_XDECREF(kl_o); Py_XDECREF(km_o);
    Py_DECREF(coords); Py_DECREF(conn); Py_DECREF(qpts); Py_DECREF(qwts);
    return nullptr;
  }
  double* Bd = (double*)PyArray_DATA(B_o);
  double* Dd = (double*)PyArray_DATA(dvol_o);
  double* Kl = (double*)PyArray_DATA(kl_o);
  double* Km = (double*)PyArray_DATA(km_o);

  Py_BEGIN_ALLOW_THREADS
  for (npy_intp e = 0; e < nele; ++e) {
    double xl[4][2];
    for (int i = 0; i < 4; ++i) {
      const int32_t node = cn[e * 4 + i];
      xl[i][0] = cx[2 * node];
      xl[i][1] = cx[2 * node + 1];
    }
    double* ke_l = Kl + e * 64;
    double* ke_m = Km + e * 64;
    for (npy_intp q = 0; q < nqpt; ++q) {
      const double xi = qp[2 * q], eta = qp[2 * q + 1];
      // natural derivatives
      double dxi[4], deta[4];
      for (int i = 0; i < 4; ++i) {
        dxi[i] = 0.25 * S[i] * (1.0 + T[i] * eta);
        deta[i] = 0.25 * T[i] * (1.0 + S[i] * xi);
      }
      // Jacobian J = dn_nat^T @ xl  (rows: d/dxi, d/deta; cols: x, y)
      double j00 = 0, j01 = 0, j10 = 0, j11 = 0;
      for (int i = 0; i < 4; ++i) {
        j00 += dxi[i] * xl[i][0];
        j01 += dxi[i] * xl[i][1];
        j10 += deta[i] * xl[i][0];
        j11 += deta[i] * xl[i][1];
      }
      const double det = j00 * j11 - j01 * j10;
      const double inv = 1.0 / det;
      // global gradients: dn_glob = dn_nat @ J^{-T}
      double dx[4], dy[4];
      for (int i = 0; i < 4; ++i) {
        dx[i] = (dxi[i] * j11 - deta[i] * j01) * inv;
        dy[i] = (-dxi[i] * j10 + deta[i] * j00) * inv;
      }
      const double dv = thk * det * qw[q];
      Dd[e * nqpt + q] = dv;
      double* Bq = Bd + ((e * nqpt + q) * 24);
      for (int i = 0; i < 4; ++i) {
        Bq[0 * 8 + 2 * i] = dx[i];
        Bq[1 * 8 + 2 * i + 1] = dy[i];
        Bq[2 * 8 + 2 * i] = dy[i];
        Bq[2 * 8 + 2 * i + 1] = dx[i];
      }
      // ke contributions; exploit B sparsity. With b = [bx_i, by_i]
      // lam-part: (BtCB)_ab = s_a s_b where s = [dx0, dy0, dx1, dy1, ...]
      //   (volumetric row sum), since C_LAM3 couples (e11+e22) with itself.
      // mu-part: 2*dx_a dx_b (xx), 2*dy dy (yy), + shear row outer.
      double svec[8], shear[8];
      for (int i = 0; i < 4; ++i) {
        svec[2 * i] = dx[i];
        svec[2 * i + 1] = dy[i];
        shear[2 * i] = dy[i];
        shear[2 * i + 1] = dx[i];
      }
      for (int a = 0; a < 8; ++a) {
        const double sa = svec[a], ha = shear[a];
        const bool a_is_x = (a % 2) == 0;
        const double ga = a_is_x ? dx[a / 2] : dy[a / 2];
        for (int b = 0; b < 8; ++b) {
          const double sb = svec[b], hb = shear[b];
          const bool b_is_x = (b % 2) == 0;
          const double gb = b_is_x ? dx[b / 2] : dy[b / 2];
          ke_l[a * 8 + b] += dv * sa * sb;
          // mu: 2*(exx_a exx_b + eyy_a eyy_b) + gam_a gam_b
          double m = ha * hb;
          if (a_is_x == b_is_x) m += 2.0 * ga * gb;
          ke_m[a * 8 + b] += dv * m;
        }
      }
    }
  }
  Py_END_ALLOW_THREADS

  Py_DECREF(coords); Py_DECREF(conn); Py_DECREF(qpts); Py_DECREF(qwts);
  PyObject* out = PyTuple_Pack(4, (PyObject*)B_o, (PyObject*)dvol_o,
                               (PyObject*)kl_o, (PyObject*)km_o);
  Py_DECREF(B_o); Py_DECREF(dvol_o); Py_DECREF(kl_o); Py_DECREF(km_o);
  return out;
}

// Generic-element variant: works for ANY node count (3/4/8/9/12/16). The
// natural-coordinate shape derivatives are evaluated once per quadrature
// point in Python (ops.shape.shape_natural — tiny) and passed in as
// dshp (nqpt, nel, 2); the per-element hot loop (Jacobians, global
// gradients, B, dvol, ke_p = sum_q dv * B^T C_p B for two material bases)
// runs here. Same layout contract as precompute_quad4 with edof = 2*nel.
static PyObject* precompute_generic(PyObject*, PyObject* args) {
  PyArrayObject *coords_o, *conn_o, *dshp_o, *qwts_o, *c0_o, *c1_o;
  double thk;
  if (!PyArg_ParseTuple(args, "O!O!O!O!dO!O!", &PyArray_Type, &coords_o,
                        &PyArray_Type, &conn_o, &PyArray_Type, &dshp_o,
                        &PyArray_Type, &qwts_o, &thk,
                        &PyArray_Type, &c0_o, &PyArray_Type, &c1_o)) {
    return nullptr;
  }
  PyArrayObject* coords = (PyArrayObject*)PyArray_FROM_OTF(
      (PyObject*)coords_o, NPY_DOUBLE, NPY_ARRAY_IN_ARRAY);
  PyArrayObject* conn = (PyArrayObject*)PyArray_FROM_OTF(
      (PyObject*)conn_o, NPY_INT32, NPY_ARRAY_IN_ARRAY);
  PyArrayObject* dshp = (PyArrayObject*)PyArray_FROM_OTF(
      (PyObject*)dshp_o, NPY_DOUBLE, NPY_ARRAY_IN_ARRAY);
  PyArrayObject* qwts = (PyArrayObject*)PyArray_FROM_OTF(
      (PyObject*)qwts_o, NPY_DOUBLE, NPY_ARRAY_IN_ARRAY);
  PyArrayObject* c0a = (PyArrayObject*)PyArray_FROM_OTF(
      (PyObject*)c0_o, NPY_DOUBLE, NPY_ARRAY_IN_ARRAY);
  PyArrayObject* c1a = (PyArrayObject*)PyArray_FROM_OTF(
      (PyObject*)c1_o, NPY_DOUBLE, NPY_ARRAY_IN_ARRAY);
  if (!coords || !conn || !dshp || !qwts || !c0a || !c1a) {
    Py_XDECREF(coords); Py_XDECREF(conn); Py_XDECREF(dshp);
    Py_XDECREF(qwts); Py_XDECREF(c0a); Py_XDECREF(c1a);
    return nullptr;
  }

  const npy_intp nele = PyArray_DIM(conn, 0);
  const npy_intp nel = PyArray_DIM(conn, 1);
  const npy_intp nqpt = PyArray_DIM(dshp, 0);
  const npy_intp edof = 2 * nel;
  const double* cx = (const double*)PyArray_DATA(coords);
  const int32_t* cn = (const int32_t*)PyArray_DATA(conn);
  const double* dn = (const double*)PyArray_DATA(dshp);  // (nqpt, nel, 2)
  const double* qw = (const double*)PyArray_DATA(qwts);
  const double* C0 = (const double*)PyArray_DATA(c0a);   // (3, 3)
  const double* C1 = (const double*)PyArray_DATA(c1a);

  npy_intp dimsB[4] = {nele, nqpt, 3, edof};
  npy_intp dimsD[2] = {nele, nqpt};
  npy_intp dimsK[3] = {nele, edof, edof};
  PyArrayObject* B_o = (PyArrayObject*)PyArray_ZEROS(4, dimsB, NPY_DOUBLE, 0);
  PyArrayObject* dvol_o = (PyArrayObject*)PyArray_ZEROS(2, dimsD, NPY_DOUBLE, 0);
  PyArrayObject* kl_o = (PyArrayObject*)PyArray_ZEROS(3, dimsK, NPY_DOUBLE, 0);
  PyArrayObject* km_o = (PyArrayObject*)PyArray_ZEROS(3, dimsK, NPY_DOUBLE, 0);
  if (!B_o || !dvol_o || !kl_o || !km_o) {
    Py_XDECREF(B_o); Py_XDECREF(dvol_o); Py_XDECREF(kl_o); Py_XDECREF(km_o);
    Py_DECREF(coords); Py_DECREF(conn); Py_DECREF(dshp);
    Py_DECREF(qwts); Py_DECREF(c0a); Py_DECREF(c1a);
    return nullptr;
  }
  double* Bd = (double*)PyArray_DATA(B_o);
  double* Dd = (double*)PyArray_DATA(dvol_o);
  double* Kl = (double*)PyArray_DATA(kl_o);
  double* Km = (double*)PyArray_DATA(km_o);

  Py_BEGIN_ALLOW_THREADS
  const int NEL = (int)nel;
  const int EDOF = (int)edof;
  double xl[16][2], dx[16], dy[16];
  double CB0[3 * 32], CB1[3 * 32];
  for (npy_intp e = 0; e < nele; ++e) {
    for (int i = 0; i < NEL; ++i) {
      const int32_t node = cn[e * NEL + i];
      xl[i][0] = cx[2 * node];
      xl[i][1] = cx[2 * node + 1];
    }
    double* ke_l = Kl + e * EDOF * EDOF;
    double* ke_m = Km + e * EDOF * EDOF;
    for (npy_intp q = 0; q < nqpt; ++q) {
      const double* dq = dn + q * NEL * 2;  // (nel, 2)
      double j00 = 0, j01 = 0, j10 = 0, j11 = 0;
      for (int i = 0; i < NEL; ++i) {
        j00 += dq[2 * i] * xl[i][0];
        j01 += dq[2 * i] * xl[i][1];
        j10 += dq[2 * i + 1] * xl[i][0];
        j11 += dq[2 * i + 1] * xl[i][1];
      }
      const double det = j00 * j11 - j01 * j10;
      const double inv = 1.0 / det;
      for (int i = 0; i < NEL; ++i) {
        dx[i] = (dq[2 * i] * j11 - dq[2 * i + 1] * j01) * inv;
        dy[i] = (-dq[2 * i] * j10 + dq[2 * i + 1] * j00) * inv;
      }
      const double dv = thk * det * qw[q];
      Dd[e * nqpt + q] = dv;
      double* Bq = Bd + ((e * nqpt + q) * 3 * EDOF);
      for (int i = 0; i < NEL; ++i) {
        Bq[0 * EDOF + 2 * i] = dx[i];
        Bq[1 * EDOF + 2 * i + 1] = dy[i];
        Bq[2 * EDOF + 2 * i] = dy[i];
        Bq[2 * EDOF + 2 * i + 1] = dx[i];
      }
      // CB_p = C_p @ B  (3 x edof), then ke_p += dv * B^T CB_p
      for (int r = 0; r < 3; ++r) {
        for (int b = 0; b < EDOF; ++b) {
          double a0 = 0.0, a1 = 0.0;
          for (int s = 0; s < 3; ++s) {
            const double Bsb = Bq[s * EDOF + b];
            a0 += C0[r * 3 + s] * Bsb;
            a1 += C1[r * 3 + s] * Bsb;
          }
          CB0[r * EDOF + b] = a0;
          CB1[r * EDOF + b] = a1;
        }
      }
      for (int a = 0; a < EDOF; ++a) {
        for (int b = 0; b < EDOF; ++b) {
          double k0 = 0.0, k1 = 0.0;
          for (int r = 0; r < 3; ++r) {
            const double Bra = Bq[r * EDOF + a];
            k0 += Bra * CB0[r * EDOF + b];
            k1 += Bra * CB1[r * EDOF + b];
          }
          ke_l[a * EDOF + b] += dv * k0;
          ke_m[a * EDOF + b] += dv * k1;
        }
      }
    }
  }
  Py_END_ALLOW_THREADS

  Py_DECREF(coords); Py_DECREF(conn); Py_DECREF(dshp);
  Py_DECREF(qwts); Py_DECREF(c0a); Py_DECREF(c1a);
  PyObject* out = PyTuple_Pack(4, (PyObject*)B_o, (PyObject*)dvol_o,
                               (PyObject*)kl_o, (PyObject*)km_o);
  Py_DECREF(B_o); Py_DECREF(dvol_o); Py_DECREF(kl_o); Py_DECREF(km_o);
  return out;
}

static PyMethodDef Methods[] = {
    {"precompute_quad4", precompute_quad4, METH_VARARGS,
     "precompute_quad4(coords, conn, qpts, qwts, thk) -> (B, dvol, ke_lam, ke_mu)"},
    {"precompute_generic", precompute_generic, METH_VARARGS,
     "precompute_generic(coords, conn, dshp, qwts, thk, C0, C1) -> "
     "(B, dvol, ke0, ke1) for any 3-16 node element"},
    {nullptr, nullptr, 0, nullptr},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_native", "vbicm_tpu native host kernels",
    -1, Methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__native(void) {
  import_array();
  return PyModule_Create(&moduledef);
}
