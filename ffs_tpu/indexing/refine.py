"""Candidate refinement: 18-parameter Levenberg-Marquardt on (x, y, phi).

Equivalent of the reference's Eigen LM refinement over beam (mu1, mu2, nu),
orientation (phi1..3 mrad), cell (6 metrical parameters x 1e5) and detector
(dist, shift1, shift2, tau1..3 mrad) parameterisations (reference:
baseline/refiner/*.cc, baseline/indexer/refine_candidate.cc:56-96,
target.cc:107-152).  The parameterisation state composition follows the
same DIALS math; the Jacobian comes from JAX forward-mode autodiff through
the vectorised scan-static predictor instead of the hand-derived
GradientsCalculator — identical derivatives, one implementation.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..models.crystal import Crystal
from .lm import lmder
from .predict import predict_scan_static


def _axis_angle_rot(axis, angle):
    """Rotation matrix about unit axis (jnp)."""
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    x, y, z = axis
    K = jnp.array([[0.0, -z, y], [z, 0.0, -x], [-y, x, 0.0]])
    return c * jnp.eye(3) + s * K + (1 - c) * jnp.outer(axis, axis)


def compose_beam(params, istate_s0_dir, dir1, dir2):
    """s0 from (mu1, mu2 [mrad], nu=|s0|) (beam_parameterisation.cc:43-66)."""
    mu1, mu2, nu = params
    R = _axis_angle_rot(dir2, mu2 / 1000.0) @ _axis_angle_rot(dir1, mu1 / 1000.0)
    d = R @ istate_s0_dir
    return nu * d / jnp.linalg.norm(d)


def compose_orientation(params, u0):
    """U from three axial rotations (mrad) about x, y, z
    (orientation_parameterisation.cc)."""
    p1, p2, p3 = params
    R1 = _axis_angle_rot(jnp.array([1.0, 0, 0]), p1 / 1000.0)
    R2 = _axis_angle_rot(jnp.array([0.0, 1, 0]), p2 / 1000.0)
    R3 = _axis_angle_rot(jnp.array([0.0, 0, 1]), p3 / 1000.0)
    return R3 @ R2 @ R1 @ u0


def b_matrix_from_metric(g6):
    """DIALS-convention B from the 6 reciprocal metric elements
    (g11, g22, g33, g12, g13, g23) — the P1 metrical-matrix
    parameterisation (cell_parameterisation.cc via rstbx
    SymmetrizeReduceEnlarge).

    Follows the reference's ``BG::back`` path exactly (reference:
    baseline/refiner/cell_parameterisation.cc:64-74): reciprocal metric ->
    direct cell -> B = inv(orth)^T with the standard PDB orthogonalisation
    (lower-triangular B, same frame as models.crystal.Crystal.b_matrix).
    State and autodiff derivatives reproduce the DIALS goldens at 1e-12
    (tests/test_refine_dials_golden.py; reference:
    baseline/refiner/tests/test_cell_parameterisation.cc:24-99).
    """
    g11, g22, g33, g12, g13, g23 = g6
    a_s = jnp.sqrt(g11)
    b_s = jnp.sqrt(g22)
    c_s = jnp.sqrt(g33)
    cga_s = g12 / (a_s * b_s)  # cos gamma*
    cbe_s = g13 / (a_s * c_s)  # cos beta*
    cal_s = g23 / (b_s * c_s)  # cos alpha*
    sga_s = jnp.sqrt(jnp.maximum(1 - cga_s**2, 1e-12))
    sbe_s = jnp.sqrt(jnp.maximum(1 - cbe_s**2, 1e-12))
    sal_s = jnp.sqrt(jnp.maximum(1 - cal_s**2, 1e-12))
    vs = (
        a_s
        * b_s
        * c_s
        * jnp.sqrt(
            jnp.maximum(
                1 - cal_s**2 - cbe_s**2 - cga_s**2 + 2 * cal_s * cbe_s * cga_s,
                1e-16,
            )
        )
    )
    # direct cell from the reciprocal one
    a = b_s * c_s * sal_s / vs
    b = a_s * c_s * sbe_s / vs
    c = a_s * b_s * sga_s / vs
    ca = (cbe_s * cga_s - cal_s) / (sbe_s * sga_s)
    cb = (cal_s * cga_s - cbe_s) / (sal_s * sga_s)
    cg = (cal_s * cbe_s - cga_s) / (sal_s * sbe_s)
    sg = jnp.sqrt(jnp.maximum(1 - cg**2, 1e-12))
    w = jnp.sqrt(
        jnp.maximum(1 - ca**2 - cb**2 - cg**2 + 2 * ca * cb * cg, 1e-16)
    )
    orth = jnp.array(
        [
            [a, b * cg, c * cb],
            [0.0, b * sg, c * (ca - cb * cg) / sg],
            [0.0, 0.0, c * w / sg],
        ]
    )
    return jnp.linalg.inv(orth).T


def metric_from_b(b_matrix) -> np.ndarray:
    """Inverse of b_matrix_from_metric: the 6 reciprocal metric elements."""
    g = np.asarray(b_matrix).T @ np.asarray(b_matrix)
    return np.array([g[0, 0], g[1, 1], g[2, 2], g[0, 1], g[0, 2], g[1, 2]])


def compose_detector(params, init):
    """Panel (fast, slow, origin) from (dist, shift1, shift2, tau1..3 [mrad])
    (detector_parameterisation.cc compose)."""
    dist, sh1, sh2, t1, t2, t3 = params
    d1, d2, dn, offset = init
    T1 = _axis_angle_rot(dn, t1 / 1000.0)
    T2 = _axis_angle_rot(d1, t2 / 1000.0)
    T3 = _axis_angle_rot(d2, t3 / 1000.0)
    T32 = T3 @ T2
    T321 = T32 @ T1
    P0 = dist * dn
    dsv = P0 + sh1 * d1 + sh2 * d2
    dorg = T321 @ dsv - T32 @ P0 + P0
    new_d1 = T321 @ d1
    new_d1 = new_d1 / jnp.linalg.norm(new_d1)
    new_d2 = T321 @ d2
    new_d2 = new_d2 / jnp.linalg.norm(new_d2)
    origin = dorg + offset[0] * new_d1 + offset[1] * new_d2
    return new_d1, new_d2, origin


@dataclass
class RefineSetup:
    """Fixed quantities captured before refinement (host side)."""

    u0: np.ndarray
    g6_0: np.ndarray
    s0_dir: np.ndarray
    s0_norm: float
    beam_dir1: np.ndarray
    beam_dir2: np.ndarray
    det_init: tuple  # (d1, d2, dn, offset)
    fixed_rotation: np.ndarray
    setting_rotation: np.ndarray
    rotation_axis: np.ndarray


def make_setup(crystal: Crystal, beam, panel, gonio) -> RefineSetup:
    s0 = beam.s0
    spindle = gonio.rotation_axis
    dir2 = np.cross(s0, spindle)
    dir2 /= np.linalg.norm(dir2)
    dir1 = np.cross(dir2, s0)
    dir1 /= np.linalg.norm(dir1)

    d1 = panel.fast_axis / np.linalg.norm(panel.fast_axis)
    d2 = panel.slow_axis / np.linalg.norm(panel.slow_axis)
    dn = np.cross(d1, d2)
    dn /= np.linalg.norm(dn)
    # DIALS parameterises about the panel CENTRE: the frame origin dorg is
    # the centre, the panel origin sits at a fixed in-plane offset of
    # (-width/2, -height/2) mm from it, and tau rotations pivot there
    # (reference: detector_parameterisation.cc:167-180; golden state/derivs
    # in tests/test_refine_dials_golden.py)
    origin = panel.origin
    offset = np.array(
        [
            -0.5 * panel.image_size[0] * panel.pixel_size[0],
            -0.5 * panel.image_size[1] * panel.pixel_size[1],
        ]
    )
    dorg = origin - offset[0] * d1 - offset[1] * d2
    dist = origin @ dn  # directed distance (offsets are in-plane)
    shift = dorg - dist * dn
    sh1 = shift @ d1
    sh2 = shift @ d2
    return RefineSetup(
        u0=crystal.u_matrix,
        g6_0=metric_from_b(crystal.b_matrix),
        s0_dir=s0 / np.linalg.norm(s0),
        s0_norm=float(np.linalg.norm(s0)),
        beam_dir1=dir1,
        beam_dir2=dir2,
        det_init=(d1, d2, dn, offset, dist, sh1, sh2),
        fixed_rotation=gonio.fixed_rotation,
        setting_rotation=gonio.setting_rotation,
        rotation_axis=gonio.rotation_axis,
    )


def _residual_fn(setup: RefineSetup, hkl, entering, xyzobs_mm):
    d1_0, d2_0, dn_0, offset, dist0, sh1_0, sh2_0 = setup.det_init
    u0 = jnp.asarray(setup.u0)
    fixed = jnp.asarray(setup.fixed_rotation)
    setting = jnp.asarray(setup.setting_rotation)
    axis = jnp.asarray(setup.rotation_axis)
    hkl_j = jnp.asarray(hkl, dtype=jnp.float64)
    entering_j = jnp.asarray(entering)
    obs = jnp.asarray(xyzobs_mm)

    def residuals(x):
        s0 = compose_beam(
            x[0:3], jnp.asarray(setup.s0_dir), jnp.asarray(setup.beam_dir1),
            jnp.asarray(setup.beam_dir2),
        )
        u = compose_orientation(x[3:6], u0)
        b = b_matrix_from_metric(x[6:12] / 1e5)
        ub = u @ b
        fast, slow, origin = compose_detector(
            x[12:18], (jnp.asarray(d1_0), jnp.asarray(d2_0), jnp.asarray(dn_0),
                       jnp.asarray(offset)),
        )
        d_matrix = jnp.stack([fast, slow, origin], axis=1)
        pred = predict_scan_static(
            hkl_j,
            entering_j,
            obs[:, 2],
            s0=s0,
            fixed_rotation=fixed,
            setting_rotation=setting,
            rotation_axis=axis,
            ub=ub,
            d_matrix=d_matrix,
            xp=jnp,
        )
        diff = jnp.where(
            pred["valid"][:, None], pred["xyzcal_mm"] - obs, 0.0
        )
        return diff.T.reshape(-1)  # [dx..., dy..., dphi...]

    return residuals


def refine_candidate(
    crystal: Crystal,
    beam,
    panel,
    gonio,
    hkl: np.ndarray,
    entering: np.ndarray,
    xyzobs_mm: np.ndarray,
    maxfev: int = 10,
    ftol: float = 1e-6,
    xtol: float = 1e-6,
    fix_in_spindle_plane: bool = True,
    fix_wavelength: bool = True,
):
    """LM refinement; returns (crystal', s0', d_matrix', rmsds (3,)).

    Parameter layout matches refine_candidate.cc:62-96; the optimizer is
    the MINPACK-semantics trust-region LM (indexing/lm.py), with the
    reference's own settings ftol=xtol=1e-6 and a maxfev=10
    function-evaluation budget (refine_candidate.cc:78-86 — Eigen's
    ``parameters.maxfev`` counts residual evaluations, not outer
    iterations).

    The beam's in-spindle-plane rotation (mu1) and wavelength (nu) are
    FROZEN by default, exactly as the reference defaults them
    (beam_parameterisation.cc:37-39 ``_fix_in_spindle_plane=true``,
    ``_fix_wavelength=true``; the gradients calculator zeroes their
    Jacobian columns, gradients_calculator.cc:99-112).  Freezing nu is
    load-bearing, not just parity: a free |s0| is exactly degenerate
    with the reciprocal-cell scale (s0 -> s*s0, UB -> s*UB keeps every
    (x, y, phi) prediction identical), so refining it lets the minimiser
    wander along a flat manifold trading wavelength against cell size.
    """
    setup = make_setup(crystal, beam, panel, gonio)
    d1_0, d2_0, dn_0, offset, dist0, sh1_0, sh2_0 = setup.det_init
    x0 = np.zeros(18)
    x0[2] = setup.s0_norm
    x0[6:12] = 1e5 * setup.g6_0
    x0[12:15] = [dist0, sh1_0, sh2_0]

    fn = _residual_fn(setup, hkl, entering, xyzobs_mm)
    free = np.ones(18, dtype=bool)
    if fix_in_spindle_plane:
        free[0] = False
    if fix_wavelength:
        free[2] = False

    # Refinement is a tiny f64 host workload (hundreds of residuals, 18
    # parameters) exactly as in the reference, where it is Eigen on the
    # CPU: TPU backends cannot lower f64 LU at all (the residual inverts
    # 3x3 matrices), and a remote device would pay its dispatch latency
    # ~20x per candidate — pin everything here to the host CPU backend,
    # which JAX keeps registered alongside any accelerator.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        x0_j = jnp.asarray(x0)
        free_j = jnp.asarray(free)

        def fn_masked(x):
            # frozen parameters: residuals are independent of them, so
            # their Jacobian columns are exactly zero (= the reference's
            # masking)
            return fn(jnp.where(free_j, x, x0_j))

        fn_jit = jax.jit(fn_masked)
        jac_jit = jax.jit(jax.jacfwd(fn_masked))

        res = lmder(
            lambda v: np.asarray(fn_jit(jnp.asarray(v))),
            lambda v: np.asarray(jac_jit(jnp.asarray(v))),
            x0,
            ftol=ftol,
            xtol=xtol,
            maxfev=maxfev,
        )
    # zero-column directions never move (min-norm lmpar steps), but pin
    # the frozen slots to the initial state explicitly regardless
    x, r = np.where(free, res.x, x0), res.fvec
    n = len(hkl)
    rr = np.asarray(r).reshape(3, n)
    rmsds = np.sqrt((rr**2).mean(axis=1))

    # rebuild the refined models (CPU: b_matrix_from_metric inverts a
    # 3x3 in f64, which TPU backends cannot lower)
    with jax.default_device(cpu):
        s0 = np.asarray(
            compose_beam(
                jnp.asarray(x[0:3]), jnp.asarray(setup.s0_dir),
                jnp.asarray(setup.beam_dir1), jnp.asarray(setup.beam_dir2),
            )
        )
        u = np.asarray(compose_orientation(jnp.asarray(x[3:6]), jnp.asarray(setup.u0)))
        b = np.asarray(b_matrix_from_metric(jnp.asarray(x[6:12] / 1e5)))
        fast, slow, origin = (
            np.asarray(v)
            for v in compose_detector(
                jnp.asarray(x[12:18]),
                (jnp.asarray(d1_0), jnp.asarray(d2_0), jnp.asarray(dn_0), jnp.asarray(offset)),
            )
        )
    a_matrix = u @ b
    return Crystal.from_a_matrix(a_matrix), s0, (fast, slow, origin), rmsds
