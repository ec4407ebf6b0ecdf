"""SE(3) / SO(3) utilities in pure JAX.

Replaces the reference's torch/numpy/scipy rotation plumbing:
  * rot_from_axisangle / transformation_from_parameters
    (/root/reference/network/utils/pose_pred.py:59-108)
  * rotationMatrixToEulerAngles (/root/reference/network/utils/pose_pred.py:111-127)
  * scipy quaternion conversion (/root/reference/network/utils/pose_pred_new.py:199-214)
  * relative pose error (/root/reference/utils/metrics.py:12-29, losses/loss.py:100-114)

Everything is batched-last-free: functions take unbatched [..., 3] / [..., 3, 3]
arrays and broadcast over leading dims, so `jax.vmap` is rarely needed.
"""

from __future__ import annotations

import jax.numpy as jnp


def _eps_like(x, eps=1e-8):
    return jnp.asarray(eps, dtype=x.dtype)


def axis_angle_to_matrix(vec: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: axis-angle vector [..., 3] -> rotation matrix [..., 3, 3].

    Matches the reference's `rot_from_axisangle` (pose_pred.py:59-98), which
    interprets `vec` as [rz, ry, rx]-ordered components: element 0 fills the
    z-role, element 2 the x-role. We keep standard [rx, ry, rz] semantics here;
    use `vec[..., ::-1]` at call sites that feed reference-ordered outputs.
    """
    angle = jnp.linalg.norm(vec, axis=-1, keepdims=True)  # [..., 1]
    axis = vec / (angle + _eps_like(vec, 1e-7))
    ca = jnp.cos(angle)[..., 0]
    sa = jnp.sin(angle)[..., 0]
    C = 1.0 - ca
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    xs, ys, zs = x * sa, y * sa, z * sa
    xC, yC, zC = x * C, y * C, z * C
    xyC, yzC, zxC = x * yC, y * zC, z * xC
    row0 = jnp.stack([x * xC + ca, xyC - zs, zxC + ys], axis=-1)
    row1 = jnp.stack([xyC + zs, y * yC + ca, yzC - xs], axis=-1)
    row2 = jnp.stack([zxC - ys, yzC + xs, z * zC + ca], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def matrix_to_euler_zyx(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> euler angles [x, y, z] (XYZ extraction).

    Port of `rotationMatrixToEulerAngles` (pose_pred.py:111-127) with the same
    singularity handling, but branchless via `where` so it vectorizes.
    """
    sy = jnp.sqrt(R[..., 0, 0] ** 2 + R[..., 1, 0] ** 2)
    singular = sy < 1e-6
    x_ns = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    y_ns = jnp.arctan2(-R[..., 2, 0], sy)
    z_ns = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    x_s = jnp.arctan2(-R[..., 1, 2], R[..., 1, 1])
    z_s = jnp.zeros_like(x_s)
    x = jnp.where(singular, x_s, x_ns)
    y = y_ns
    z = jnp.where(singular, z_s, z_ns)
    return jnp.stack([x, y, z], axis=-1)


def euler_zyx_to_matrix(euler: jnp.ndarray) -> jnp.ndarray:
    """Euler [x, y, z] -> R = Rz @ Ry @ Rx (inverse of matrix_to_euler_zyx)."""
    x, y, z = euler[..., 0], euler[..., 1], euler[..., 2]
    cx, sx = jnp.cos(x), jnp.sin(x)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cz, sz = jnp.cos(z), jnp.sin(z)
    row0 = jnp.stack([cz * cy, cz * sy * sx - sz * cx, cz * sy * cx + sz * sx], -1)
    row1 = jnp.stack([sz * cy, sz * sy * sx + cz * cx, sz * sy * cx - cz * sx], -1)
    row2 = jnp.stack([-sy, cy * sx, cy * cx], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [..., 4] (x, y, z, w — scipy order) -> R [..., 3, 3].

    Replaces scipy.spatial.transform.Rotation in pose_pred_new.py:199-214.
    """
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _eps_like(q))
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    row0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], -1)
    row1 = jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], -1)
    row2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def matrix_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """R [..., 3, 3] -> unit quaternion [..., 4] (x, y, z, w), w >= 0.

    Branchless Shepperd's method: compute all four candidate constructions and
    select the best-conditioned one with `where` (vectorizes on the VPU).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidates (w-major, x-major, y-major, z-major)
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, 0.0)) / 2
    s0 = 4 * qw0 + _eps_like(R)
    cand0 = jnp.stack([(m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0, qw0], -1)

    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 0.0)) / 2
    s1 = 4 * qx1 + _eps_like(R)
    cand1 = jnp.stack([qx1, (m01 + m10) / s1, (m02 + m20) / s1, (m21 - m12) / s1], -1)

    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 0.0)) / 2
    s2 = 4 * qy2 + _eps_like(R)
    cand2 = jnp.stack([(m01 + m10) / s2, qy2, (m12 + m21) / s2, (m02 - m20) / s2], -1)

    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 0.0)) / 2
    s3 = 4 * qz3 + _eps_like(R)
    cand3 = jnp.stack([(m02 + m20) / s3, (m12 + m21) / s3, qz3, (m10 - m01) / s3], -1)

    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    best = jnp.argmax(scores, axis=-1)[..., None]
    cands = jnp.stack([cand0, cand1, cand2, cand3], axis=-2)  # [..., 4cand, 4]
    q = jnp.take_along_axis(cands, best[..., None], axis=-2)[..., 0, :]
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _eps_like(q))
    return q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)


def transform_from_params(axisangle: jnp.ndarray, translation: jnp.ndarray) -> jnp.ndarray:
    """(axis-angle [..., 3], t [..., 3]) -> homogeneous T [..., 4, 4].

    Port of `transformation_from_parameters` (pose_pred.py:101-108).
    """
    R = axis_angle_to_matrix(axisangle)
    T = jnp.zeros(R.shape[:-2] + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(translation)
    T = T.at[..., 3, 3].set(1.0)
    return T


def invert_se3(T: jnp.ndarray) -> jnp.ndarray:
    """Invert a rigid transform [..., 4, 4] without a general solve."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    t_inv = -jnp.einsum("...ij,...j->...i", Rt, t)
    out = jnp.zeros_like(T)
    out = out.at[..., :3, :3].set(Rt)
    out = out.at[..., :3, 3].set(t_inv)
    out = out.at[..., 3, 3].set(1.0)
    return out


def relative_pose_error(T_0to1: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray):
    """(R_err_deg, t_err) against GT transform.

    Mirrors /root/reference/utils/metrics.py:12-29: t_err is the L2 norm of the
    translation difference; R_err is the geodesic angle in degrees.
    """
    t_err = jnp.linalg.norm(T_0to1[..., :3, 3] - t, axis=-1)
    R_gt = T_0to1[..., :3, :3]
    RtRgt = jnp.einsum("...ji,...jk->...ik", R, R_gt)  # R^T @ R_gt
    cos = (jnp.trace(RtRgt, axis1=-2, axis2=-1) - 1.0) / 2.0
    cos = jnp.clip(cos, -1.0, 1.0)
    R_err = jnp.rad2deg(jnp.abs(jnp.arccos(cos)))
    return R_err, t_err


def angular_translation_error(T_0to1: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Angle (deg) between estimated and GT translation directions, with the
    essential-matrix sign ambiguity handled (min(err, 180-err)).

    This is the standard AUC metric definition (SuperGlue-style; the reference
    keeps it commented at utils/metrics.py:13-19 but the AUC literature uses it).
    """
    t_gt = T_0to1[..., :3, 3]
    n = jnp.linalg.norm(t, axis=-1) * jnp.linalg.norm(t_gt, axis=-1)
    cos = jnp.sum(t * t_gt, axis=-1) / (n + 1e-10)
    t_err = jnp.rad2deg(jnp.arccos(jnp.clip(cos, -1.0, 1.0)))
    return jnp.minimum(t_err, 180.0 - t_err)


# ---------------------------------------------------------------------------
# Lie-group exp/log maps (needed by the SfM back-end's manifold optimizers)
# ---------------------------------------------------------------------------

def _hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator [..., 3] -> [..., 3, 3]."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -w[..., 2], w[..., 1]], -1),
            jnp.stack([w[..., 2], zeros, -w[..., 0]], -1),
            jnp.stack([-w[..., 1], w[..., 0], zeros], -1),
        ],
        axis=-2,
    )


def _safe_theta(w: jnp.ndarray):
    """(theta2, theta_safe, small) with NaN-free gradients at w == 0.

    d(sqrt(x))/dx blows up at 0, so the sqrt input is masked where small; the
    small branch always uses theta2 polynomials (smooth), keeping jacfwd/jacrev
    of exp/log maps finite at the identity — required by the BA/pose-graph
    solvers that linearize at xi = 0.
    """
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]  # [..., 1, 1]
    # threshold sized for fp32: below theta ~ 1e-2 the (1-cos)/theta^2 family
    # cancels catastrophically in float32, while the theta2 Taylor series is
    # accurate to ~1e-10 — so switch early.
    small = theta2 < 1e-4
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    return theta2, theta, small


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Exponential map so(3) -> SO(3), Taylor- and gradient-safe near zero."""
    theta2, theta, small = _safe_theta(w)
    W = _hat(w)
    W2 = W @ W
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A * W + B * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Log map SO(3) -> so(3), Taylor- and gradient-safe near identity.

    theta comes from atan2(|skew|/2, (tr-1)/2) instead of arccos — arccos'
    gradient diverges at identity, which would poison the pose-graph GN
    linearization whenever a residual approaches zero.
    """
    w_skew = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    s2 = jnp.sum(w_skew * w_skew, axis=-1, keepdims=True) / 4.0
    small = s2 < 1e-8
    s = jnp.sqrt(jnp.where(small, 1.0, s2))
    c = (jnp.trace(R, axis1=-2, axis2=-1)[..., None] - 1.0) / 2.0
    theta = jnp.where(small, 0.0, jnp.arctan2(s, c))
    # factor = theta / (2 sin theta) ~= 1/2 + theta^2/12; sin(theta) = s
    factor = jnp.where(small, 0.5 + s2 / 12.0, theta / (2.0 * s))
    return factor * w_skew


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Exponential map se(3) [..., 6] (v, w) -> T [..., 4, 4]."""
    v, w = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    theta2, theta, small = _safe_theta(w)
    W = _hat(w)
    W2 = W @ W
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    C = jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / (theta2 * theta),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), R.shape)
    V = eye + B * W + C * W2
    t = jnp.einsum("...ij,...j->...i", V, v)
    T = jnp.zeros(xi.shape[:-1] + (4, 4), dtype=xi.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """Log map SE(3) -> se(3) [..., 6] (v, w)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = so3_log(R)
    theta2, theta, small = _safe_theta(w)
    W = _hat(w)
    W2 = W @ W
    # V^{-1} = I - W/2 + (1/theta^2)(1 - A/(2B)) W^2
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - A / (2.0 * B)) / theta2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), R.shape)
    Vinv = eye - 0.5 * W + coef * W2
    v = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([v, w], axis=-1)
