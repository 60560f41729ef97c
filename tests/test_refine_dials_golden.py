"""DIALS goldens for the refinement parameterisations.

The reference's GTest suite pins exact DIALS-derived parameterisation
states and analytic derivatives inline (reference:
baseline/refiner/tests/test_beam_parameterisation.cc:24-58,
test_orientation_parameterisation.cc:14-73, test_cell_parameterisation.cc:
14-99, test_detector_parameterisation.cc:13-96).  These tests assert our
compose functions and their JAX forward-mode Jacobians reproduce every
number at the reference's own tolerances (1e-12).

Inputs that the reference reads from a DLS filesystem file were
reconstructed exactly from the pinned values themselves:

  * beam: s0 along -z with |s0| = 0.8065491793362101 (10 keV), spindle
    +x -> dir1 = +x, dir2 = -y (verified: the pinned state/derivatives
    match at ~1e-19).
  * detector: Pilatus 6M panel (2463 x 2527 px, 0.172 mm) with fast +x,
    slow -y, dist 170 / shift (-6.84904, 8.1012) — the centre-offset
    (-211.818, -217.322) back-solves from the pinned state with a 1e-14
    normal residual.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ffs_tpu.indexing.refine import (
    b_matrix_from_metric,
    compose_beam,
    compose_detector,
    compose_orientation,
    metric_from_b,
)
from ffs_tpu.models.crystal import Crystal

TOL = 1e-12


def _golden_crystal() -> Crystal:
    # reference: test_orientation_parameterisation.cc:15-19
    return Crystal(
        np.array([-0.19, 2.78, 6.05]),
        np.array([0.09, -15.44, 8.78]),
        np.array([26.77, 0.45, 2.39]),
        "P 1",
    )


def test_beam_parameterisation_golden():
    # reference: test_beam_parameterisation.cc:24-58
    nu0 = 0.8065491793362101
    s0_dir = jnp.asarray([0.0, 0.0, -1.0])
    dir1 = jnp.asarray([1.0, 0.0, 0.0])
    dir2 = jnp.asarray([0.0, -1.0, 0.0])
    # initial state: mu1 = mu2 = 0, nu = |s0|
    s0_init = np.asarray(compose_beam(jnp.asarray([0.0, 0.0, nu0]), s0_dir, dir1, dir2))
    np.testing.assert_allclose(s0_init, [0.0, 0.0, -nu0], atol=TOL)

    p = jnp.asarray([1.0, 2.0, 0.90])
    state = np.asarray(compose_beam(p, s0_dir, dir1, dir2))
    np.testing.assert_allclose(
        state,
        [0.0017999979000009152, 0.0008999998500000073, -0.8999977500015376],
        atol=TOL,
    )
    jac = np.asarray(jax.jacfwd(lambda q: compose_beam(q, s0_dir, dir1, dir2))(p))
    np.testing.assert_allclose(
        jac[:, 0],
        [-1.7999985000004549e-9, 0.0008999995500000376, 8.999980500009076e-7],
        atol=TOL,
    )
    np.testing.assert_allclose(
        jac[:, 1],
        [0.0008999977500015377, 0.0, 1.7999979000009154e-6],
        atol=TOL,
    )
    np.testing.assert_allclose(
        jac[:, 2],
        [0.001999997666667683, 0.0009999998333333415, -0.9999975000017084],
        atol=TOL,
    )


def test_orientation_parameterisation_golden():
    # reference: test_orientation_parameterisation.cc:14-73
    u0 = jnp.asarray(_golden_crystal().u_matrix)
    p = jnp.asarray([1.0, 2.0, 20.0])
    state = np.asarray(compose_orientation(p, u0))
    expected_state = np.array(
        [
            [-0.03503059924492174, 0.02655905018597599, 0.999033269701145],
            [0.4158378860448571, -0.908613417947585, 0.03873640736248012],
            [0.9087638360136735, 0.41679284252350873, 0.020785013227984962],
        ]
    )
    np.testing.assert_allclose(state, expected_state, atol=TOL)

    jac = np.asarray(jax.jacfwd(lambda q: compose_orientation(q, u0))(p))
    expected_derivs = [
        np.array(
            [
                [1.9005703928913567e-5, 6.51805884278694e-6, 4.931444834945913e-7],
                [-0.0009085102109894602, -0.00041676177137985016, -2.2778880009563593e-5],
                [0.0004164544536079352, -0.0009089610289886106, 1.8749289464301534e-5],
            ]
        ),
        np.array(
            [
                [0.0009085820893048154, 0.00041670948673358586, 2.078085636390427e-5],
                [1.8174065059392263e-5, 8.335301137794516e-6, 4.156725517629904e-7],
                [2.6707390077135652e-5, -8.38268165437287e-6, -0.0009996081462070772],
            ]
        ),
        np.array(
            [
                [-0.0004158378860448571, 0.000908613417947585, -3.873640736248012e-5],
                [-3.503059924492174e-5, 2.6559050185975988e-5, 0.000999033269701145],
                [0.0, 0.0, 0.0],
            ]
        ),
    ]
    for k, want in enumerate(expected_derivs):
        np.testing.assert_allclose(jac[..., k], want, atol=TOL)


def test_cell_parameterisation_golden():
    # reference: test_cell_parameterisation.cc:14-99
    crystal = _golden_crystal()
    p0 = metric_from_b(crystal.b_matrix) * 1e5
    np.testing.assert_allclose(
        p0,
        [
            2278.037528258581,
            319.6089400562122,
            139.00920939203462,
            -71.8358313088007,
            -31.860812118145848,
            -6.218180236875039,
        ],
        atol=TOL,
    )

    new_p = jnp.asarray([2279.0, 320.0, 138.0, -71.0, -31.0, -6.0])
    state = np.asarray(b_matrix_from_metric(new_p / 1e5))
    expected_state = np.array(
        [
            [0.15018874747345667, 0.0, 0.0],
            [-0.012794625871624953, 0.05654547996390009, 0.0],
            [-0.008344919481901558, -0.0016151457061744903, 0.03714835124201342],
        ]
    )
    np.testing.assert_allclose(state, expected_state, atol=TOL)

    jac = np.asarray(jax.jacfwd(lambda q: b_matrix_from_metric(q / 1e5))(new_p))
    expected_derivs = [
        np.array([[3.329144216269376e-5, 0, 0], [0, 0, 0], [0, 0, 0]]),
        np.array(
            [
                [1.7044803613601804e-6, 0, 0],
                [2.000791372364517e-5, 8.84243975502925e-5, 0],
                [0, 0, 0],
            ]
        ),
        np.array(
            [
                [1.8303232869663895e-6, 0, 0],
                [1.7650788060680502e-6, 1.6715387060546735e-7, 0],
                [3.023521551413609e-5, 5.851977196284386e-6, 0.0001345954755145414],
            ]
        ),
        np.array(
            [
                [1.506580357865718e-5, 0, 0],
                [0.000176848795100585, 0, 0],
                [0, 0, 0],
            ]
        ),
        np.array(
            [
                [1.561205967796347e-5, 0, 0],
                [7.689078047851524e-6, 0, 0],
                [0.0002691909510290828, 0, 0],
            ]
        ),
        np.array(
            [
                [3.5325628643093795e-6, 0, 0],
                [4.146672183189763e-5, 7.689078047851526e-6, 0],
                [0, 0.0002691909510290828, 0],
            ]
        ),
    ]
    for k, want in enumerate(expected_derivs):
        np.testing.assert_allclose(jac[..., k], want, atol=TOL)


def test_detector_parameterisation_golden():
    # reference: test_detector_parameterisation.cc:13-96 (Pilatus 6M panel,
    # see module docstring for the input reconstruction)
    d1 = jnp.asarray([1.0, 0.0, 0.0])
    d2 = jnp.asarray([0.0, -1.0, 0.0])
    dn = jnp.asarray([0.0, 0.0, -1.0])
    offset = jnp.asarray([-0.5 * 2463 * 0.172, -0.5 * 2527 * 0.172])
    init = (d1, d2, dn, offset)

    # initial params round-trip through the make_setup decomposition
    from ffs_tpu.indexing.refine import make_setup
    from ffs_tpu.models.geometry import Panel

    dorg0 = 170.0 * np.asarray(dn) - 6.84904 * np.asarray(d1) + 8.1012 * np.asarray(d2)
    origin0 = dorg0 + float(offset[0]) * np.asarray(d1) + float(offset[1]) * np.asarray(d2)
    panel = Panel(
        fast_axis=np.asarray(d1),
        slow_axis=np.asarray(d2),
        origin=origin0,
        pixel_size=(0.172, 0.172),
        image_size=(2463, 2527),
    )
    setup = make_setup(_golden_crystal(), _FakeBeam(), panel, _FakeGonio())
    _, _, _, got_offset, dist0, sh1_0, sh2_0 = setup.det_init
    np.testing.assert_allclose(np.asarray(got_offset), np.asarray(offset), atol=TOL)
    np.testing.assert_allclose(
        [dist0, sh1_0, sh2_0], [170.0, -6.84904, 8.1012], atol=TOL
    )

    p = jnp.asarray([169.0, -6.8, 7.0, 60.0, 50.0, 30.0])

    def state_mat(q):
        nd1, nd2, org = compose_detector(q, init)
        return jnp.stack([nd1, nd2, org], axis=1)

    state = np.asarray(state_mat(p))
    expected_state = np.array(
        [
            [0.9978412784317169, -0.05844057217915775, -205.85472658632028],
            [-0.059889067085670725, -0.9969530491866812, 222.77398727917634],
            [0.026945921794682904, -0.05166543564852365, -164.02448577444122],
        ]
    )
    np.testing.assert_allclose(state, expected_state, atol=1e-10)

    jac = np.asarray(jax.jacfwd(state_mat)(p))
    expected_derivs = [
        np.array([[0.0, 0, 0], [0, 0, 0], [0, 0, -1.0]]).T,
        np.array(
            [
                [0, 0, 0.9978412784317173],
                [0, 0, -0.05988906708567075],
                [0, 0, 0.026945921794682914],
            ]
        ),
        np.array(
            [
                [0, 0, -0.058440572179157796],
                [0, 0, -0.9969530491866815],
                [0, 0, -0.05166543564852367],
            ]
        ),
        np.array(
            [
                [-5.844057217915779e-5, -0.0009978412784317173, 0.22264413437097877],
                [-0.0009969530491866813, 5.988906708567075e-5, 0.20535589333950147],
                [-5.1665435648523665e-5, -2.6945921794682916e-5, 0.016962314374310245],
            ]
        ),
        np.array(
            [
                [1.7964025238955129e-6, 2.9904105388757763e-5, -0.006682217180543301],
                [2.996951229984214e-6, 4.988923375150408e-5, -0.011147990905080535],
                [-5.986211902667757e-5, -0.0009965044539607033, 0.22267374650329727],
            ]
        ),
        np.array(
            [
                [-2.6945921794682923e-5, 5.1665435648523665e-5, -0.004975514225558792],
                [0.0, 0.0, 0.0],
                [0.0009978412784317173, -5.8440572179157796e-5, -0.20585472658632034],
            ]
        ),
    ]
    for k, want in enumerate(expected_derivs):
        np.testing.assert_allclose(jac[..., k], want, atol=1e-10)


class _FakeBeam:
    s0 = np.array([0.0, 0.0, -0.8065491793362101])


class _FakeGonio:
    rotation_axis = np.array([1.0, 0.0, 0.0])
    fixed_rotation = np.eye(3)
    setting_rotation = np.eye(3)
