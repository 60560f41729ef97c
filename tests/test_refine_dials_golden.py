"""DIALS goldens for the refinement parameterisations.

The reference's GTest suite pins exact DIALS-derived parameterisation
states and analytic derivatives inline (reference:
baseline/refiner/tests/test_beam_parameterisation.cc:24-58,
test_orientation_parameterisation.cc:14-73, test_cell_parameterisation.cc:
14-99, test_detector_parameterisation.cc:13-96,
test_gradients_calculator.cc:64-203).  These tests assert our compose
functions and their JAX forward-mode Jacobians reproduce every number at
the reference's own tolerances (1e-12).

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


# Goniometer fixed (sample) rotation of the gradients-calculator GTest's
# experiment, reference: test_gradients_calculator.cc:22-32.  The file it
# loads is on a DLS filesystem, but the geometry is fully recoverable from
# the pinned numbers themselves: the beam-parameterisation golden fixes the
# spindle to +x (dir2 = normalize(s0 x spindle) = -y with s0 along -z), the
# detector golden fixes the panel frame, S = I, and F's 3 dof were
# back-solved (Gauss-Newton over the rotation vector) from the 20 pinned
# dphi gradients alone — leaving the 60 pinned dx/dy values as a held-out
# cross-check, which the recovered F reproduces at < 6e-16 (far inside the
# GTest's own 1e-12).  Canonical form: 137.814 deg about
# (0.98991, -0.01995, -0.14032) — a multi-axis goniometer datum.
F_GRADIENTS_GOLDEN = np.array(
    [
        [0.9650279818250813, 0.059856249103780124, -0.25522191077146333],
        [-0.12860377792955574, -0.7402804861964261, -0.6598832245625195],
        [-0.2284339348626996, 0.6696282783754053, -0.7066936438111884],
    ]
)


def _gradients_test_states():
    """States + per-parameter derivatives at the gradients-GTest's params."""
    crystal = _golden_crystal()
    u0 = jnp.asarray(crystal.u_matrix)
    p_u = jnp.asarray([1.0, 2.0, 20.0])
    U = np.asarray(compose_orientation(p_u, u0))
    dU_dp = np.asarray(jax.jacfwd(lambda q: compose_orientation(q, u0))(p_u))

    p_cell = jnp.asarray([2279.0, 320.0, 138.0, -71.0, -31.0, -6.0])
    B = np.asarray(b_matrix_from_metric(p_cell / 1e5))
    dB_dp = np.asarray(jax.jacfwd(lambda q: b_matrix_from_metric(q / 1e5))(p_cell))

    s0_dir = jnp.asarray([0.0, 0.0, -1.0])
    dir1 = jnp.asarray([1.0, 0.0, 0.0])
    dir2 = jnp.asarray([0.0, -1.0, 0.0])
    p_beam = jnp.asarray([1.0, 2.0, 0.90])
    s0 = np.asarray(compose_beam(p_beam, s0_dir, dir1, dir2))
    ds0_dp = np.asarray(
        jax.jacfwd(lambda q: compose_beam(q, s0_dir, dir1, dir2))(p_beam)
    )

    d1 = jnp.asarray([1.0, 0.0, 0.0])
    d2 = jnp.asarray([0.0, -1.0, 0.0])
    dn = jnp.asarray([0.0, 0.0, -1.0])
    offset = jnp.asarray([-0.5 * 2463 * 0.172, -0.5 * 2527 * 0.172])
    init = (d1, d2, dn, offset)
    p_det = jnp.asarray([169.0, -6.8, 7.0, 6.0, 5.0, 3.0])

    def det_state(q):
        a1, a2, o = compose_detector(q, init)
        return jnp.stack([a1, a2, o], axis=1)

    d_matrix = np.asarray(det_state(p_det))
    dD_dp = np.asarray(jax.jacfwd(det_state)(p_det))
    return U, dU_dp, B, dB_dp, s0, ds0_dp, d_matrix, dD_dp


def test_gradients_calculator_golden():
    """Analytic prediction gradients vs every pinned DIALS number.

    reference: test_gradients_calculator.cc:64-203 — two real reflections,
    16 parameter rows x (2 dx, 2 dy, 2 dphi), validated there against
    DIALS's own GradientsCalculator at 1e-12.  Beam mu2 is the only free
    beam parameter (mu1/nu fixed rows are zeros in the GTest and omitted
    here).
    """
    from ffs_tpu.indexing.gradients_oracle import scan_static_gradients

    U, dU_dp, B, dB_dp, s0, ds0_dp, d_matrix, dD_dp = _gradients_test_states()

    hkl = np.array([[-12, -11, 17], [-2, 6, 14]], dtype=float)
    s1 = np.array(
        [
            [0.4179348780141723, -0.20045075910012414, -0.6600541717187897],
            [-0.09066552735670198, -0.2355641335951222, -0.7660358214865836],
        ]
    )
    xyz = np.array(
        [
            [327.2532679418043, 260.486750141457, 2.8784005884739994],
            [198.93046946782965, 261.3879205849422, 2.8810375748248247],
        ]
    )

    grads = scan_static_gradients(
        s1=s1,
        xyzcal_mm=xyz,
        hkl=hkl,
        U=U,
        B=B,
        s0=s0,
        d_matrix=d_matrix,
        axis=np.array([1.0, 0.0, 0.0]),
        fixed_rotation=F_GRADIENTS_GOLDEN,
        dbeam_dp=ds0_dp[:, 1:2],  # mu2 only
        du_dp=dU_dp,
        db_dp=dB_dp,
        dd_dp=dD_dp,
    )
    # rows: [beam mu2, u1-u3, c1-c6, det dist/shift1/shift2/tau1-tau3];
    # columns: [dx_0, dx_1, dy_0, dy_1, dphi_0, dphi_1]
    expected = np.array(
        [
            [0.4287826631965805, 0.18408783635453912, 0.20191156388350756,
             -0.17853420664143882, -0.0008082088205582376, -0.002344544175499804],
            [-0.04959579644558594, 0.025070920084672176, -0.12220349700104796,
             -0.06820402967379478, -0.0007634711810092794, -0.0015109861808262255],
            [-0.5062005276059334, 0.00469820527228704, 0.20986412961046694,
             -0.041038216518272025, -1.76482882093943e-5, -0.0016294842009530364],
            [0.06494068374443888, 0.10459812784210254, -0.08929501703416928,
             -0.16857128301109173, -0.0003305266605921589, -0.0007779020610478103],
            [0.044929397934425894, 0.0032113606061801863, 0.12239571338813976,
             0.006501737891694474, -0.00010782518902494864, -9.496308786352764e-5],
            [-0.0009982417164380055, -0.016059493329712186, 0.021925146205354643,
             0.17738128609561624, -0.0006094409461294244, 0.0016907180188751464],
            [0.5920492522192147, 0.40227621146774833, 0.007649280448604453,
             0.11045187349562537, -0.0003585427716161955, 0.0024151582447524337],
            [0.01456038676210086, 0.013151546827410026, 0.08278997918317386,
             -0.12471862951189557, -0.0011055814255902538, -0.0012655746686363915],
            [-1.0027102548270417, -0.11441398647948181, 0.057507694508682414,
             -0.03465028767685144, 0.0004956756740565934, -0.0008011897845487581],
            [-0.9350508965438956, 0.3508435894916053, 0.01951313914075557,
             0.08385438357345058, 0.0002414885505191235, 0.0019732238690136836],
            [0.6347498332644728, -0.11673565064776006, 0.29977337029334195,
             0.30880352915599546, 0.0, 0.0],
            [-1.0, -1.0, 0.0, 0.0, 0.0, 0.0],
            [0.0, 0.0, -1.0, -1.0, 0.0, 0.0],
            [0.05066169957957481, 0.05218779642736319, -0.10727272182169596,
             0.01972832495947142, 0.0, 0.0],
            [0.032413652010338245, -0.006232995148877551, 0.015637403503896467,
             0.016340483302854734, 0.0, 0.0],
            [-0.06783309907395624, -0.0026599798137931815, -0.03206633548057176,
             0.0061907114140071235, 0.0, 0.0],
        ]
    )
    np.testing.assert_allclose(grads, expected, atol=TOL)


def test_autodiff_jacobian_matches_dials_gradients():
    """The production autodiff Jacobian == the DIALS analytic gradients.

    refine.py's LM gets its Jacobian from jacfwd through the vectorised
    scan-static predictor; DIALS (and the reference,
    gradients_calculator.cc:43-177) uses the hand-derived chain-rule
    expressions.  At a self-consistent state (reflection s1/xyzcal predicted
    at that same state) the two must agree exactly — asserted here for all
    18 parameters on ~160 reflections with the non-trivial recovered
    goniometer F, which exercises every F-dependent term.
    """
    from ffs_tpu.indexing.gradients_oracle import scan_static_gradients
    from ffs_tpu.indexing.predict import predict_scan_static
    from ffs_tpu.indexing.refine import _residual_fn, make_setup
    from ffs_tpu.models.geometry import Goniometer, MonochromaticBeam, simple_panel

    crystal = Crystal(
        np.array([20.0, 1.0, 0.0]),
        np.array([-1.0, 28.0, 0.5]),
        np.array([0.2, -0.3, 35.0]),
    )
    beam = MonochromaticBeam(wavelength=1.0)
    gonio = Goniometer(fixed_rotation=F_GRADIENTS_GOLDEN)
    panel = simple_panel(
        distance_mm=80.0,
        beam_center_px=(200.0, 220.0),
        pixel_size_mm=(0.25, 0.25),
        image_size=(400, 440),
    )

    rng = np.random.default_rng(3)
    hkl = rng.integers(-12, 13, size=(200, 3))
    hkl = hkl[~(hkl == 0).all(axis=1)]
    d_matrix = np.stack([panel.fast_axis, panel.slow_axis, panel.origin], axis=1)
    phi0 = rng.uniform(0.05, 1.0, size=len(hkl))
    kw = dict(
        s0=beam.s0,
        fixed_rotation=gonio.fixed_rotation,
        setting_rotation=gonio.setting_rotation,
        rotation_axis=gonio.rotation_axis,
        ub=crystal.a_matrix,
        d_matrix=d_matrix,
    )
    pred = predict_scan_static(hkl, np.zeros(len(hkl), dtype=bool), phi0, **kw)
    s0_m2 = np.cross(beam.s0, gonio.setting_rotation @ gonio.rotation_axis)
    s0_m2 /= np.linalg.norm(s0_m2)
    entering = np.asarray(pred["s1"]) @ s0_m2 < 0
    pred = predict_scan_static(hkl, entering, phi0, **kw)
    ok = np.asarray(pred["valid"])
    xy = np.asarray(pred["xyzcal_mm"])[:, :2]
    ok &= (xy[:, 0] > 0) & (xy[:, 0] < 100) & (xy[:, 1] > 0) & (xy[:, 1] < 110)
    hkl, entering = hkl[ok], entering[ok]
    xyz = np.asarray(pred["xyzcal_mm"])[ok]
    s1 = np.asarray(pred["s1"])[ok]
    assert len(hkl) > 100

    setup = make_setup(crystal, beam, panel, gonio)
    d1_0, d2_0, dn_0, offset, dist0, sh1_0, sh2_0 = setup.det_init
    x0 = np.concatenate(
        [
            [0.0, 0.0, setup.s0_norm],
            [0.0, 0.0, 0.0],
            setup.g6_0 * 1e5,
            [dist0, sh1_0, sh2_0],
            [0.0, 0.0, 0.0],
        ]
    )
    resid = _residual_fn(setup, hkl, entering, xyz)
    assert np.abs(np.asarray(resid(jnp.asarray(x0)))).max() < 1e-12
    J = np.asarray(jax.jacfwd(resid)(jnp.asarray(x0)))  # (3N, 18)

    # analytic gradients at the same state
    sdir = jnp.asarray(setup.s0_dir)
    bd1 = jnp.asarray(setup.beam_dir1)
    bd2 = jnp.asarray(setup.beam_dir2)
    p_beam = jnp.asarray(x0[0:3])
    s0_state = np.asarray(compose_beam(p_beam, sdir, bd1, bd2))
    ds0_dp = np.asarray(jax.jacfwd(lambda q: compose_beam(q, sdir, bd1, bd2))(p_beam))
    u0 = jnp.asarray(setup.u0)
    U = np.asarray(compose_orientation(jnp.asarray(x0[3:6]), u0))
    dU_dp = np.asarray(
        jax.jacfwd(lambda q: compose_orientation(q, u0))(jnp.asarray(x0[3:6]))
    )
    B = np.asarray(b_matrix_from_metric(jnp.asarray(x0[6:12]) / 1e5))
    dB_dp = np.asarray(
        jax.jacfwd(lambda q: b_matrix_from_metric(q / 1e5))(jnp.asarray(x0[6:12]))
    )
    init = (jnp.asarray(d1_0), jnp.asarray(d2_0), jnp.asarray(dn_0), jnp.asarray(offset))

    def det_state(q):
        a1, a2, o = compose_detector(q, init)
        return jnp.stack([a1, a2, o], axis=1)

    dmat = np.asarray(det_state(jnp.asarray(x0[12:18])))
    dD_dp = np.asarray(jax.jacfwd(det_state)(jnp.asarray(x0[12:18])))

    grads = scan_static_gradients(
        s1=s1,
        xyzcal_mm=xyz,
        hkl=hkl,
        U=U,
        B=B,
        s0=s0_state,
        d_matrix=dmat,
        axis=setup.rotation_axis,
        fixed_rotation=setup.fixed_rotation,
        setting_rotation=setup.setting_rotation,
        dbeam_dp=ds0_dp,
        du_dp=dU_dp,
        db_dp=dB_dp,
        dd_dp=dD_dp,
    )
    np.testing.assert_allclose(grads, J.T, atol=1e-10)
