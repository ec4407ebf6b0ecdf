"""Nistér 5-point minimal solver for the essential matrix — batched, fixed
shape, jit/vmap-safe on TPU.

TPU-native replacement for the 5-point solver inside cv2.findEssentialMat
(/root/reference/utils/metrics.py:79-109 calls it with RANSAC; SURVEY.md §7
lists it as a hard part). Design notes:

  * The classical pipeline (Nistér, PAMI 2004): 5 correspondences give a 5x9
    linear system whose 4-dim null space parameterizes E = xX + yY + zZ + W;
    the rank/trace constraints det(E)=0 and 2 E EᵀE - tr(E Eᵀ) E = 0 give 10
    cubic equations in (x, y, z); Gauss-Jordan reduction + Nistér's row
    recipe yields a 3x3 matrix B(z) of polynomials whose determinant is a
    degree-10 polynomial n(z); each real root gives one candidate E.
  * All polynomial arithmetic is coefficient algebra over fixed monomial
    bases (index-table einsums built once with numpy at import) — no symbolic
    work at trace time, everything batches over hypotheses.
  * Root-finding: TPU has no nonsymmetric eigendecomposition (the usual
    companion-matrix trick needs LAPACK), so roots come from a fixed-iteration
    Durand-Kerner (Weierstrass) solver in complex arithmetic — embarrassingly
    parallel over [batch, 10] roots and XLA-friendly.
  * Degenerate samples (rank-deficient reduction, complex roots, leading
    coefficient collapse) yield masked-out candidates, never NaNs in the
    caller: invalid slots return E = I (a harmless model) with valid=False.

Returns up to 10 candidate essential matrices per 5-point sample, like
OpenCV's solver returns a stacked [10*3, 3] matrix.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# monomial bases
# ---------------------------------------------------------------------------
# degree-1 basis for E(x, y, z) = xX + yY + zZ + W
_EXP1 = ((1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0))
# any fixed degree<=2 basis (intermediate products)
_EXP2 = (
    (2, 0, 0), (1, 1, 0), (0, 2, 0), (1, 0, 1), (0, 1, 1), (0, 0, 2),
    (1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0),
)
# Nistér's degree<=3 column order: the first 10 are the leading monomials the
# Gauss-Jordan step eliminates; the last 10 split into x-, y- and 1-groups of
# polynomials in z (paper Table 1 ordering)
_EXP3 = (
    (3, 0, 0), (0, 3, 0), (2, 1, 0), (1, 2, 0), (2, 0, 1), (2, 0, 0),
    (0, 2, 1), (0, 2, 0), (1, 1, 1), (1, 1, 0),
    (1, 0, 2), (1, 0, 1), (1, 0, 0),          # x z^2, x z, x
    (0, 1, 2), (0, 1, 1), (0, 1, 0),          # y z^2, y z, y
    (0, 0, 3), (0, 0, 2), (0, 0, 1), (0, 0, 0),  # z^3, z^2, z, 1
)


def _mul_table(ea, eb, eo) -> np.ndarray:
    """[len(ea), len(eb), len(eo)] 0/1 tensor: product index map."""
    lookup = {e: k for k, e in enumerate(eo)}
    T = np.zeros((len(ea), len(eb), len(eo)), np.float32)
    for i, a in enumerate(ea):
        for j, b in enumerate(eb):
            s = tuple(x + y for x, y in zip(a, b))
            if s in lookup:
                T[i, j, lookup[s]] = 1.0
            else:  # product escapes the basis — must never happen
                raise AssertionError(f"monomial {s} not in output basis")
    return T


_T11 = jnp.asarray(_mul_table(_EXP1, _EXP1, _EXP2))  # deg1*deg1 -> deg2
_T21 = jnp.asarray(_mul_table(_EXP2, _EXP1, _EXP3))  # deg2*deg1 -> deg3


def _conv_table(da: int, db: int) -> jnp.ndarray:
    """Univariate coefficient-convolution index map [da, db, da+db-1]."""
    T = np.zeros((da, db, da + db - 1), np.float32)
    for i in range(da):
        for j in range(db):
            T[i, j, i + j] = 1.0
    return jnp.asarray(T)


def _pmul11(a, b):
    return jnp.einsum("...i,...j,ijk->...k", a, b, _T11)


def _pmul21(a, b):
    return jnp.einsum("...i,...j,ijk->...k", a, b, _T21)


def _zmul(a, b, Ta):
    return jnp.einsum("...i,...j,ijk->...k", a, b, Ta)


# ---------------------------------------------------------------------------
# constraint system
# ---------------------------------------------------------------------------

def _epipolar_rows(pts0: jnp.ndarray, pts1: jnp.ndarray) -> jnp.ndarray:
    """[..., N, 9] rows of the linear epipolar system (x1ᵀ E x0 = 0)."""
    x0, y0 = pts0[..., 0], pts0[..., 1]
    x1, y1 = pts1[..., 0], pts1[..., 1]
    ones = jnp.ones_like(x0)
    return jnp.stack(
        [x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1, x0, y0, ones], axis=-1
    )


def _constraint_matrix(Ep: jnp.ndarray) -> jnp.ndarray:
    """Ep: [..., 3, 3, 4] degree-1 coefficient tensor of E(x, y, z).
    Returns the [..., 10, 20] cubic-constraint coefficient matrix."""
    e = Ep  # e[..., i, j, :] is the deg-1 poly of E_ij

    def m11(i, j, k, l):
        return _pmul11(e[..., i, j, :], e[..., k, l, :])

    # det(E) = e00(e11 e22 - e12 e21) - e01(e10 e22 - e12 e20)
    #        + e02(e10 e21 - e11 e20)
    d0 = m11(1, 1, 2, 2) - m11(1, 2, 2, 1)
    d1 = m11(1, 0, 2, 2) - m11(1, 2, 2, 0)
    d2 = m11(1, 0, 2, 1) - m11(1, 1, 2, 0)
    det = (
        _pmul21(d0, e[..., 0, 0, :])
        - _pmul21(d1, e[..., 0, 1, :])
        + _pmul21(d2, e[..., 0, 2, :])
    )  # [..., 20]

    # EEᵀ (deg-2 entries) and the trace constraint
    EEt = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            EEt[i][j] = sum(m11(i, k, j, k) for k in range(3))
    tr = EEt[0][0] + EEt[1][1] + EEt[2][2]

    rows = [det]
    for i in range(3):
        for j in range(3):
            cij = sum(_pmul21(EEt[i][k], e[..., k, j, :]) for k in range(3))
            cij = cij - 0.5 * _pmul21(tr, e[..., i, j, :])
            rows.append(cij)
    return jnp.stack(rows, axis=-2)  # [..., 10, 20]


_T34 = _conv_table(4, 5)  # deg3 * deg4 -> deg7
_T33 = _conv_table(4, 4)  # deg3 * deg3 -> deg6
_T37 = _conv_table(4, 8)  # deg3 * deg7 -> deg10
_T56 = _conv_table(5, 7)  # deg4 * deg6 -> deg10


def _det_B(kx, ky, k1, lx, ly, l1, mx, my, m1) -> jnp.ndarray:
    """det of the 3x3 polynomial matrix [[kx,ky,k1],[lx,ly,l1],[mx,my,m1]]
    where *x, *y have degree 3 (4 coeffs, ascending) and *1 degree 4 (5
    coeffs). Returns the degree-10 coefficient vector [..., 11] ascending."""
    t0 = _zmul(ly, m1, _T34) - _zmul(my, l1, _T34)  # [..., 8] deg7
    t1 = _zmul(lx, m1, _T34) - _zmul(mx, l1, _T34)
    t2 = _zmul(lx, my, _T33) - _zmul(mx, ly, _T33)  # [..., 7] deg6
    n = (
        _zmul(kx, t0, _T37)
        - _zmul(ky, t1, _T37)
        + jnp.einsum("...i,...j,ijk->...k", k1, t2, _T56)
    )
    return n  # [..., 11]


# ---------------------------------------------------------------------------
# Durand-Kerner polynomial roots
# ---------------------------------------------------------------------------

def _durand_kerner(coeffs: jnp.ndarray, iters: int = 60):
    """Roots of a degree-10 polynomial, batched (Aberth-Ehrlich iteration).

    coeffs: [..., 11] ASCENDING (c0 + c1 z + ... + c10 z^10).
    Returns (roots [..., 10] complex, ok [...] bool) — ok is False when the
    leading coefficient collapses (degenerate sample; lower effective degree).

    Conditioning: the variable is rescaled by the Cauchy root bound
    (z = Rb·u puts every root inside the unit disk), so the unit-circle
    initialization always brackets the roots — without this, samples with
    large-|z| solutions never converge in fixed iterations.
    """
    c = coeffs
    scale = jnp.max(jnp.abs(c), axis=-1, keepdims=True) + 1e-30
    c = c / scale
    lead = c[..., -1:]
    # gate ONLY true degree collapse: a small lead coefficient relative to
    # max|c| is normal when the product of roots is large (|c0/c10| can reach
    # ~1e12 for wide root spreads) — the Cauchy rescale below restores
    # conditioning, so the gate must stay loose
    ok = jnp.abs(lead[..., 0]) > 1e-25
    safe_lead = jnp.where(jnp.abs(lead) > 1e-25, lead, 1.0)
    monic = c / safe_lead  # [..., 11], last coeff 1

    deg = coeffs.shape[-1] - 1
    cdtype = jnp.complex64 if coeffs.dtype != jnp.float64 else jnp.complex128

    # Fujiwara bound: every root has |z| <= 2 max_k |c_{deg-k}|^{1/k} (monic).
    # (The additive Cauchy bound 1 + max|c_k| is orders of magnitude too loose
    # for polynomials with large coefficients, which crushes the rescaled
    # roots into a cluster the unit-circle initialization can't resolve.)
    degs = jnp.arange(coeffs.shape[-1] - 1)
    Rb = 2.0 * jnp.max(
        jnp.abs(monic[..., :-1]) ** (1.0 / (coeffs.shape[-1] - 1 - degs)),
        axis=-1,
        keepdims=True,
    )
    Rb = jnp.maximum(Rb, 1e-6)
    # substitute z = Rb*u; keep monic: c'_k = c_k * Rb^(k - deg) (all <= 1)
    powers = Rb ** jnp.arange(-deg, 1, dtype=monic.dtype)
    mc = (monic * powers).astype(cdtype)
    ok = ok & jnp.all(jnp.isfinite(jnp.abs(mc)), axis=-1)

    angles = 2.0 * jnp.pi * jnp.arange(deg) / deg + 0.7
    base = jnp.exp(1j * angles).astype(cdtype)  # unit circle
    r = jnp.broadcast_to(base, coeffs.shape[:-1] + (deg,))

    def eval_p_dp(z):
        # Horner for p and p' simultaneously (monic, descending)
        p = jnp.ones_like(z)
        dp = jnp.zeros_like(z)
        for k in range(deg - 1, -1, -1):
            dp = dp * z + p
            p = p * z + mc[..., k, None]  # broadcast coeff over the 10 roots
        return p, dp

    eye = jnp.eye(deg, dtype=cdtype)

    def step(r, _):
        pz, dpz = eval_p_dp(r)
        w = pz / (dpz + 1e-20)  # Newton correction
        diff = r[..., :, None] - r[..., None, :]
        s = jnp.sum(1.0 / (diff + eye), axis=-1) - 1.0  # sum_{j!=k} 1/(rk-rj)
        r_new = r - w / (1.0 - w * s + 1e-20)
        return r_new, None

    r, _ = jax.lax.scan(step, r, None, length=iters)
    return r * Rb.astype(cdtype), ok


def _monomials_and_grad(x, y, z):
    """Evaluate the 20 degree<=3 monomials (order _EXP3) and their gradient.

    x, y, z: [...]; returns (m [..., 20], dm [..., 20, 3])."""
    ones = jnp.ones_like(x)
    vals = []
    grads = []
    for (a, b, c) in _EXP3:
        xa = x**a if a else ones
        yb = y**b if b else ones
        zc = z**c if c else ones
        vals.append(xa * yb * zc)
        gx = (a * x ** (a - 1) * yb * zc) if a else jnp.zeros_like(x)
        gy = (b * xa * y ** (b - 1) * zc) if b else jnp.zeros_like(x)
        gz = (c * xa * yb * z ** (c - 1)) if c else jnp.zeros_like(x)
        grads.append(jnp.stack([gx, gy, gz], axis=-1))
    return jnp.stack(vals, axis=-1), jnp.stack(grads, axis=-2)


def _polish_xyz(M, x, y, z, iters: int = 3):
    """Gauss-Newton refinement of candidate (x, y, z) on the RAW constraint
    system M (10 cubic residuals, [..., 10, 20]).

    The Gauss-Jordan reduction amplifies float32 rounding by the system's
    condition number; M itself only carries elementwise rounding, so a few GN
    steps on it recover most of the accuracy a float64 solver would have.
    x, y, z: [..., 10] candidates (per root)."""
    eye3 = jnp.eye(3, dtype=x.dtype)

    def step(carry, _):
        x, y, z = carry
        m, dm = _monomials_and_grad(x, y, z)  # [..., 10, 20], [..., 10, 20, 3]
        # r = M @ m per candidate; J = M @ dm
        r = jnp.einsum("...ik,...rk->...ri", M, m)  # [..., 10cand, 10res]
        J = jnp.einsum("...ik,...rkc->...ric", M, dm)  # [..., 10, 10, 3]
        JtJ = jnp.einsum("...ric,...rid->...rcd", J, J) + 1e-10 * eye3
        Jtr = jnp.einsum("...ric,...ri->...rc", J, r)
        delta = jnp.linalg.solve(JtJ, Jtr[..., None])[..., 0]
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)
        return (x - delta[..., 0], y - delta[..., 1], z - delta[..., 2]), None

    (x, y, z), _ = jax.lax.scan(step, (x, y, z), None, length=iters)
    return x, y, z


# ---------------------------------------------------------------------------
# the solver
# ---------------------------------------------------------------------------

def five_point_candidates(
    pts0: jnp.ndarray, pts1: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nistér 5-point solver on one minimal sample (batched over leading dims).

    Args:
      pts0, pts1: [..., 5, 2] normalized camera coordinates.
    Returns:
      E: [..., 10, 3, 3] candidate essential matrices (Frobenius-normalized;
         invalid slots are identity), and valid: [..., 10] bool.
    """
    A = _epipolar_rows(pts0, pts1)  # [..., 5, 9]
    # 4-dim null space: last 4 right-singular vectors
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    basis = Vt[..., 5:9, :]  # [..., 4, 9] = X, Y, Z, W
    # E(x,y,z) coefficients: [..., 3, 3, 4]
    Ep = jnp.moveaxis(basis.reshape(basis.shape[:-2] + (4, 3, 3)), -3, -1)

    M = _constraint_matrix(Ep)  # [..., 10, 20]
    # row equilibration: the det row and trace rows have different scales
    M = M / (jnp.linalg.norm(M, axis=-1, keepdims=True) + 1e-30)
    M1 = M[..., :, :10]
    M2 = M[..., :, 10:]
    # Gauss-Jordan: express the 10 leading monomials via the 10 tail columns.
    # Guard singular M1 (degenerate point configs) by Tikhonov-style jitter;
    # those samples are caught by the residual validity check below. One step
    # of iterative refinement claws back precision in float32 (the system's
    # conditioning is the accuracy bottleneck on TPU).
    eye10 = jnp.eye(10, dtype=M.dtype)
    M1j = M1 + 1e-12 * eye10
    R = jnp.linalg.solve(M1j, M2)  # [..., 10, 10]
    R = R + jnp.linalg.solve(M1j, M2 - M1 @ R)
    finite = jnp.all(jnp.isfinite(R), axis=(-2, -1))
    R = jnp.where(finite[..., None, None], R, 0.0)

    # rows: 4 = <e> (x^2 z), 5 = <f> (x^2), 6 = <g> (y^2 z), 7 = <h> (y^2),
    #       8 = <i> (xyz),   9 = <j> (xy).  Tail columns (ascending groups):
    #       [x z^2, x z, x | y z^2, y z, y | z^3, z^2, z, 1]
    def split(row):
        # ascending-degree coeff vectors: x-group deg<=2, y-group deg<=2,
        # 1-group deg<=3
        gx = jnp.stack([row[..., 2], row[..., 1], row[..., 0]], axis=-1)
        gy = jnp.stack([row[..., 5], row[..., 4], row[..., 3]], axis=-1)
        g1 = jnp.stack(
            [row[..., 9], row[..., 8], row[..., 7], row[..., 6]], axis=-1
        )
        return gx, gy, g1

    def nister_row(r_hi, r_lo):
        """<hi> - z * <lo>: leading monomials cancel; returns the x/y/1-group
        z-polynomials (deg 3, 3, 4 — ascending coeffs of size 4, 4, 5)."""
        hx, hy, h1 = split(r_hi)
        lx_, ly_, l1_ = split(r_lo)
        zero = jnp.zeros_like(hx[..., :1])
        # deg<=2 -> deg<=3 with a z-shift of the subtrahend
        px = jnp.concatenate([hx, zero], -1) - jnp.concatenate([zero, lx_], -1)
        py = jnp.concatenate([hy, zero], -1) - jnp.concatenate([zero, ly_], -1)
        zero1 = jnp.zeros_like(h1[..., :1])
        p1 = jnp.concatenate([h1, zero1], -1) - jnp.concatenate(
            [zero1, l1_], -1
        )
        return px, py, p1

    kx, ky, k1 = nister_row(R[..., 4, :], R[..., 5, :])
    lx, ly, l1 = nister_row(R[..., 6, :], R[..., 7, :])
    mx, my, m1 = nister_row(R[..., 8, :], R[..., 9, :])

    n = _det_B(kx, ky, k1, lx, ly, l1, mx, my, m1)  # [..., 11] ascending
    roots, lead_ok = _durand_kerner(n)

    # real roots only; float32 roots carry more imaginary noise — gate
    # loosely there and let RANSAC scoring reject bad models
    im_tol = 1e-3 if pts0.dtype == jnp.float64 else 2e-2
    re = jnp.real(roots)
    im = jnp.imag(roots)
    real_ok = jnp.abs(im) < im_tol * (1.0 + jnp.abs(re))
    z = re  # [..., 10]

    # back-substitute x(z), y(z): B(z) [x, y, 1]^T = 0; use the largest of the
    # three row-pair cross products for conditioning
    def peval(c, zz):
        # c: [..., D] ascending; zz: [..., 10]
        out = jnp.zeros(zz.shape, zz.dtype)
        for k in range(c.shape[-1] - 1, -1, -1):
            out = out * zz + c[..., k : k + 1]
        return out

    rows = [
        (peval(kx, z), peval(ky, z), peval(k1, z)),
        (peval(lx, z), peval(ly, z), peval(l1, z)),
        (peval(mx, z), peval(my, z), peval(m1, z)),
    ]

    def cross2(a, b):
        # a, b: tuples of [..., 10]; returns v = a x b, components [..., 10]
        v0 = a[1] * b[2] - a[2] * b[1]
        v1 = a[2] * b[0] - a[0] * b[2]
        v2 = a[0] * b[1] - a[1] * b[0]
        return v0, v1, v2

    cands = [cross2(rows[0], rows[1]), cross2(rows[0], rows[2]),
             cross2(rows[1], rows[2])]
    norms = jnp.stack(
        [c[0] ** 2 + c[1] ** 2 + c[2] ** 2 for c in cands], axis=-1
    )  # [..., 10, 3]
    pick = jnp.argmax(norms, axis=-1)  # [..., 10]
    v = [
        jnp.take_along_axis(
            jnp.stack([c[i] for c in cands], -1), pick[..., None], -1
        )[..., 0]
        for i in range(3)
    ]
    denom_ok = jnp.abs(v[2]) > 1e-12
    safe = jnp.where(denom_ok, v[2], 1.0)
    x = v[0] / safe
    y = v[1] / safe

    # Gauss-Newton polish on the raw constraints (recovers float32 precision
    # the reduction lost; a no-op at float64 accuracy)
    x, y, z = _polish_xyz(M, x, y, z)

    # E = x X + y Y + z Z + W  -> [..., 10, 3, 3]
    coeff = jnp.stack([x, y, z, jnp.ones_like(z)], axis=-1)  # [..., 10, 4]
    E = jnp.einsum("...rc,...ijc->...rij", coeff, Ep)
    fro = jnp.linalg.norm(E, axis=(-2, -1), keepdims=True)
    E = E / (fro + 1e-12)

    # validity: real root, well-conditioned back-substitution, finite E, and
    # the sample's epipolar residual actually near zero (catches bad GJ)
    resid = jnp.einsum("...nk,...rk->...rn", A, E.reshape(E.shape[:-2] + (9,)))
    resid_tol = 1e-3 if pts0.dtype == jnp.float64 else 2e-2
    resid_ok = jnp.max(jnp.abs(resid), axis=-1) < resid_tol
    valid = (
        real_ok
        & denom_ok
        & lead_ok[..., None]
        & finite[..., None]
        & jnp.all(jnp.isfinite(E), axis=(-2, -1))
        & resid_ok
    )
    E = jnp.where(
        valid[..., None, None], E, jnp.eye(3, dtype=E.dtype)
    )
    return E, valid
