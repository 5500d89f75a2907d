"""se(3)/SO(3) Lie-group operations in closed form (Rodrigues), pure JAX.

The reference does all pose algebra by building a 4x4 twist matrix and
calling Eigen's dense matrix ``exp()``/``log()`` on the host per pixel-loop
iteration (``src/Frame.cpp:503-615``, ``src/PixelWisePyramid.cpp:153-159``,
``matlab_scripts/se32SE3/se3_2_SE3.m``).  On TPU we instead use the exact
closed-form Rodrigues formulas, which are branch-free (small-angle Taylor
guarded by ``jnp.where``), differentiable, and batch trivially via ``vmap``.

Twist layout follows the reference exactly: ``xi = [wx, wy, wz, vx, vy, vz]``
with the 4x4 twist matrix

    [[ 0, -w3,  w2, v1],
     [ w3,  0, -w1, v2],
     [-w2,  w1,  0, v3],
     [ 0,   0,   0,  0]]

(``src/Frame.cpp:384``), i.e. SE3 = expm(hat(xi)) and the rotation block is
``exp([w]_x)`` while the translation is ``V(w) @ v``.

All functions operate on the trailing dimensions and accept arbitrary
leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8
# Small-angle threshold on theta^2 for the sinc-family Taylor branches.
# In float32, 1 - cos(theta) cancels catastrophically for theta up to
# ~3e-3 (cos(1.3e-4) == 1.0 exactly), which turned B = (1-cos t)/t^2
# into 0 and poisoned log_se3's V^-1 with inf.  At theta^2 = 1e-4
# (theta = 0.01 rad) the 2-term Taylor series are accurate to ~1e-10
# relative — far better than the direct formulas there.
_THETA2_SMALL = 1e-4


def hat_so3(w: jnp.ndarray) -> jnp.ndarray:
    """[w]_x for w of shape (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee_so3(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`hat_so3`: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc_coeffs(theta2: jnp.ndarray):
    """Return (A, B, C) = (sin t / t, (1-cos t)/t^2, (t - sin t)/t^3).

    Computed from theta^2 with 4th-order Taylor fallbacks near zero so the
    expressions stay exact to float32 precision and differentiable at 0.
    """
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    small = theta2 < _THETA2_SMALL
    # guard the divisions
    t2s = jnp.where(small, 1.0, theta2)
    ts = jnp.sqrt(t2s)
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(ts) / ts)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(ts)) / t2s)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (ts - jnp.sin(ts)) / (t2s * ts))
    del theta
    return A, B, C


def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """SO(3) exponential: (..., 3) -> (..., 3, 3).  R = I + A [w]x + B [w]x^2."""
    theta2 = jnp.sum(w * w, axis=-1)
    A, B, _ = _sinc_coeffs(theta2)
    W = hat_so3(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A[..., None, None] * W + B[..., None, None] * W2


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """SO(3) logarithm: (..., 3, 3) -> (..., 3).

    Uses the numerically-stable quaternion route, valid for all angles in
    [0, pi), matching Eigen's ``log`` on the rotations this pipeline sees.
    """
    q = quat_from_matrix(R)
    return log_quat(q)


def exp_se3(xi: jnp.ndarray) -> jnp.ndarray:
    """SE(3) exponential of a twist (..., 6) -> (..., 4, 4).

    Equals matrix expm of the 4x4 twist (se3_2_SE3.m:3-11) in closed form:
    R = exp([w]x), t = V v with V = I + B [w]x + C [w]x^2.
    """
    w, v = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    A, B, C = _sinc_coeffs(theta2)
    W = hat_so3(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = eye + A[..., None, None] * W + B[..., None, None] * W2
    V = eye + B[..., None, None] * W + C[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", V, v)
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def log_se3(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) logarithm: (..., 4, 4) -> twist (..., 6).

    v = V^{-1} t with V^{-1} = I - 1/2 [w]x + (1/t^2)(1 - A/(2B)) [w]x^2.
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = log_so3(R)
    theta2 = jnp.sum(w * w, axis=-1)
    A, B, _ = _sinc_coeffs(theta2)
    small = theta2 < _THETA2_SMALL
    t2s = jnp.where(small, 1.0, theta2)
    # (1/theta^2) * (1 - A / (2B)); Taylor: 1/12 + theta^2/720 + ...
    D = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0, (1.0 - A / (2.0 * B)) / t2s)
    W = hat_so3(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    Vinv = eye - 0.5 * W + D[..., None, None] * W2
    v = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([w, v], axis=-1)


def inv_se3_matrix(T: jnp.ndarray) -> jnp.ndarray:
    """Inverse of an SE(3) matrix without a linear solve."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    tt = -jnp.einsum("...ij,...j->...i", Rt, t)
    top = jnp.concatenate([Rt, tt[..., :, None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def compose(xi_1wrt2: jnp.ndarray, xi_2wrt3: jnp.ndarray) -> jnp.ndarray:
    """log(exp(xi_1wrt2) @ exp(xi_2wrt3)); mirrors frame::concatenateRelativePose
    (src/Frame.cpp:503-530)."""
    return log_se3(exp_se3(xi_1wrt2) @ exp_se3(xi_2wrt3))


def relative(xi_1wrt0: jnp.ndarray, xi_2wrt0: jnp.ndarray) -> jnp.ndarray:
    """log(exp(xi_1wrt0) @ exp(xi_2wrt0)^-1): pose of 1 w.r.t. 2 from two
    world poses; mirrors frame::concatenateOriginPose (src/Frame.cpp:534-562)."""
    return log_se3(exp_se3(xi_1wrt0) @ inv_se3_matrix(exp_se3(xi_2wrt0)))


def inverse(xi: jnp.ndarray) -> jnp.ndarray:
    """log(exp(xi)^-1) == -xi exactly; mirrors frame::calculateInvLiePose
    (src/Frame.cpp:565-614)."""
    return -xi


# --- quaternions (scalar-first [w, x, y, z]) ----------------------------


def quat_from_matrix(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion (..., 4), scalar-first.

    Full Shepperd pivot construction: the vector part comes from
    off-diagonal *differences* divided by the largest quaternion
    component, never from square roots of cancelling diagonal sums.
    (A naive all-sqrt construction quantizes small rotations to
    ~sqrt(eps_f32)/2 = 1.7e-4 rad — fatal for frame-to-frame tracking
    where rotations are ~1e-3 rad.)
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(a):
        return jnp.sqrt(jnp.maximum(a, 1e-12))

    # candidate 0: pivot on w
    S0 = safe_sqrt(1.0 + tr) * 2.0
    q0 = jnp.stack([S0 / 4.0, (m21 - m12) / S0, (m02 - m20) / S0,
                    (m10 - m01) / S0], axis=-1)
    # candidate 1: pivot on x
    S1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([(m21 - m12) / S1, S1 / 4.0, (m01 + m10) / S1,
                    (m02 + m20) / S1], axis=-1)
    # candidate 2: pivot on y
    S2 = safe_sqrt(1.0 - m00 + m11 - m22) * 2.0
    q2 = jnp.stack([(m02 - m20) / S2, (m01 + m10) / S2, S2 / 4.0,
                    (m12 + m21) / S2], axis=-1)
    # candidate 3: pivot on z
    S3 = safe_sqrt(1.0 - m00 - m11 + m22) * 2.0
    q3 = jnp.stack([(m10 - m01) / S3, (m02 + m20) / S3, (m12 + m21) / S3,
                    S3 / 4.0], axis=-1)

    # choose the largest pivot (tr preferred when competitive)
    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    case = jnp.argmax(scores, axis=-1)
    q = jnp.where((case == 0)[..., None], q0,
                  jnp.where((case == 1)[..., None], q1,
                            jnp.where((case == 2)[..., None], q2, q3)))
    # canonical sign (w >= 0) and normalization
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, _EPS)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b, scalar-first."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def log_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> rotation vector (..., 3), angle in (-pi, pi].

    Uses the atan2 form of RobustMeanSO3Graph.m:152-157 for stability.
    """
    s = jnp.linalg.norm(q[..., 1:], axis=-1)
    theta = 2.0 * jnp.arctan2(s, q[..., 0])
    theta = jnp.where(theta >= jnp.pi, theta - 2.0 * jnp.pi, theta)
    theta = jnp.where(theta < -jnp.pi, theta + 2.0 * jnp.pi, theta)
    scale = jnp.where(s < _EPS, 2.0, theta / jnp.maximum(s, _EPS))
    return q[..., 1:] * scale[..., None]


def exp_quat(w: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector -> unit quaternion (..., 4), scalar-first."""
    theta = jnp.linalg.norm(w, axis=-1)
    half = theta / 2.0
    small = theta < _EPS
    k = jnp.where(small, 0.5 - theta * theta / 48.0,
                  jnp.sin(half) / jnp.where(small, 1.0, theta))
    return jnp.concatenate([jnp.cos(half)[..., None], w * k[..., None]], axis=-1)


def matrix_from_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> rotation matrix (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )


def rotation_angle_deg(Ra: jnp.ndarray, Rb: jnp.ndarray) -> jnp.ndarray:
    """Angular distance between two rotations in degrees
    (CompareRotations.m:1-20 metric)."""
    w = log_so3(jnp.swapaxes(Ra, -1, -2) @ Rb)
    return jnp.linalg.norm(w, axis=-1) * (180.0 / jnp.pi)


def view_vector(xi: jnp.ndarray) -> jnp.ndarray:
    """Third row of the rotation block of exp(xi): the viewing direction used
    by the loop-closure angle gate (GlobalOptimize.cpp:436-452)."""
    R = exp_so3(xi[..., :3])
    return R[..., 2, :]
