"""SoA lane-math (ops/soa_math.py) vs the AoS geometry modules.

Every SoA function must match its vmapped array-of-structures twin to
f32 precision on random batches — including near-identity inputs where
the Taylor switches engage and near-pi rotations where the quaternion
route's other branch engages.  The SoA forms are the in-kernel math of
the fused GN kernel (ops/fused_gn.py), so equality here is what makes
the fused solver's numerics trustworthy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pop_up_slam_tpu.geometry import plane as plane_mod
from pop_up_slam_tpu.geometry import se3
from pop_up_slam_tpu.ops import soa_math as sm

N = 257  # deliberately not a lane multiple — SoA is shape-agnostic


def _rand_rot(rng, n, scale=2.0):
    phi = jnp.asarray(rng.normal(0, scale, (n, 3)), jnp.float32)
    return se3.so3_exp(phi)


def _rows(x):
    """(N, k) -> list of k (N,) component arrays."""
    return [x[:, i] for i in range(x.shape[1])]


def _mat_rows(x):
    """(N, r, c) -> nested r x c lists of (N,) arrays."""
    return [[x[:, i, j] for j in range(x.shape[2])] for i in range(x.shape[1])]


def _from_rows(rows):
    return jnp.stack(rows, axis=-1)


def _from_mat(nest):
    return jnp.stack([jnp.stack(r, axis=-1) for r in nest], axis=-2)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def _angles_batch(rng):
    """Rotation vectors spanning tiny / moderate / near-pi angles."""
    phi = rng.normal(0, 1.0, (N, 3)).astype(np.float32)
    phi[:40] *= 1e-5        # deep in the Taylor branch
    phi[40:80] *= 0.05      # just under _SMALL
    # near-pi block
    ax = rng.normal(0, 1, (40, 3))
    ax /= np.linalg.norm(ax, axis=-1, keepdims=True)
    phi[80:120] = (np.pi - 1e-3) * ax
    return jnp.asarray(phi)


def test_atan2_pos(rng):
    y = jnp.asarray(np.abs(rng.normal(0, 2.0, (4096,))), jnp.float32)
    x = jnp.asarray(np.abs(rng.normal(0, 2.0, (4096,))), jnp.float32)
    # include axis cases
    y = y.at[:4].set(jnp.array([0.0, 1.0, 0.0, 1e-9]))
    x = x.at[:4].set(jnp.array([1.0, 0.0, 0.0, 1.0]))
    got = sm.atan2_pos(y, x)
    want = jnp.arctan2(y, x)
    np.testing.assert_allclose(got, want, atol=5e-7)


def test_so3_exp_log_roundtrip(rng):
    phi = _angles_batch(rng)
    R = se3.so3_exp(phi)
    R_soa = _from_mat(sm.so3_exp_soa(_rows(phi)))
    np.testing.assert_allclose(R_soa, R, atol=2e-6)

    log_soa = _from_rows(sm.so3_log_soa(_mat_rows(R)))
    np.testing.assert_allclose(log_soa, se3.so3_log(R), atol=5e-6, rtol=1e-5)


def test_quat(rng):
    R = _rand_rot(rng, N)
    q = se3.rotmat_to_quat(R)
    q_soa = _from_rows(sm.rotmat_to_quat_soa(_mat_rows(R)))
    np.testing.assert_allclose(q_soa, q, atol=2e-6)


def test_V_and_inverse(rng):
    phi = _angles_batch(rng)
    np.testing.assert_allclose(
        _from_mat(sm.se3_V_soa(_rows(phi))), se3.se3_V(phi), atol=2e-6
    )
    np.testing.assert_allclose(
        _from_mat(sm.se3_V_inv_soa(_rows(phi))), se3.se3_V_inv(phi), atol=2e-6
    )


def test_Q_and_right_jacobian_inv(rng):
    phi = _angles_batch(rng)
    rho = jnp.asarray(rng.normal(0, 1.0, (N, 3)), jnp.float32)
    np.testing.assert_allclose(
        _from_mat(sm.se3_Q_soa(_rows(rho), _rows(phi))),
        se3.se3_Q(rho, phi),
        atol=5e-6,
    )
    xi = jnp.concatenate([rho, phi], axis=-1)
    np.testing.assert_allclose(
        _from_mat(sm.se3_right_jacobian_inv_soa(_rows(rho), _rows(phi))),
        se3.se3_right_jacobian_inv(xi),
        atol=1e-5,
        rtol=1e-5,
    )


def test_adjoint_compose_between_log_exp(rng):
    Ra = _rand_rot(rng, N)
    Rb = _rand_rot(rng, N)
    ta = jnp.asarray(rng.normal(0, 2.0, (N, 3)), jnp.float32)
    tb = jnp.asarray(rng.normal(0, 2.0, (N, 3)), jnp.float32)

    np.testing.assert_allclose(
        _from_mat(sm.se3_adjoint_soa(_mat_rows(Ra), _rows(ta))),
        se3.se3_adjoint(Ra, ta),
        atol=2e-6,
    )

    Rc, tc = sm.se3_compose_soa(_mat_rows(Ra), _rows(ta), _mat_rows(Rb), _rows(tb))
    Rr, tr = se3.se3_compose(Ra, ta, Rb, tb)
    np.testing.assert_allclose(_from_mat(Rc), Rr, atol=2e-6)
    np.testing.assert_allclose(_from_rows(tc), tr, atol=5e-6)

    Rw, tw = sm.se3_between_soa(_mat_rows(Ra), _rows(ta), _mat_rows(Rb), _rows(tb))
    Rr2, tr2 = se3.se3_between(Ra, ta, Rb, tb)
    np.testing.assert_allclose(_from_mat(Rw), Rr2, atol=2e-6)
    np.testing.assert_allclose(_from_rows(tw), tr2, atol=1e-5)

    rho_l, phi_l = sm.se3_log_soa(_mat_rows(Rr2), _rows(tr2))
    xi = se3.se3_log(Rr2, tr2)
    np.testing.assert_allclose(_from_rows(rho_l + phi_l), xi,
                               atol=2e-5, rtol=1e-5)

    Re, te = sm.se3_exp_soa(rho_l, phi_l)
    Rx, tx = se3.se3_exp(xi)
    np.testing.assert_allclose(_from_mat(Re), Rx, atol=2e-6)
    np.testing.assert_allclose(_from_rows(te), tx, atol=2e-5)


def test_plane_normalize_and_bases(rng):
    pi_raw = jnp.asarray(rng.normal(0, 1.5, (N, 4)), jnp.float32)
    want = plane_mod.normalize(pi_raw)
    got = _from_rows(sm.plane_normalize_soa(_rows(pi_raw)))
    np.testing.assert_allclose(got, want, atol=2e-6)

    pi = want
    B_want = plane_mod.tangent_basis(pi)
    B_got = _from_mat(sm.tangent_basis4_soa(_rows(pi)))
    np.testing.assert_allclose(B_got, B_want, atol=2e-6)

    n = pi[:, :3] / jnp.linalg.norm(pi[:, :3], axis=-1, keepdims=True)
    Bn_want = plane_mod.normal_tangent_basis(n)
    c0, c1 = sm.normal_tangent_basis_cols_soa(_rows(n))
    np.testing.assert_allclose(_from_rows(c0), Bn_want[:, :, 0], atol=2e-6)
    np.testing.assert_allclose(_from_rows(c1), Bn_want[:, :, 1], atol=2e-6)
