"""Service layer: PIA request handling, ordering, pipe results, exit-32."""

import json
import os
import shutil
import threading
import time
from types import SimpleNamespace

import numpy as np
import pytest

from ffs_tpu.service.detectors import DetectorGeometry
from ffs_tpu.service.pia import MessageOrderResolver, PiaRequest, PiaService

from .util import synthetic_rotation_stack, write_nexus


class FakeTransport:
    def __init__(self):
        self.acked = []
        self.nacked = []

    def ack(self, header):
        self.acked.append(header)

    def nack(self, header, requeue=False):
        self.nacked.append(header)


class FakeRecipeWrapper:
    def __init__(self, parameters):
        self.recipe_step = {"parameters": parameters}
        self.transport = FakeTransport()
        self.sent = []
        self.checkpoints = []

    def send_to(self, channel, data):
        self.sent.append((channel, data))

    def checkpoint(self, message, header=None, delay=None):
        self.checkpoints.append((message, header, delay))


def test_pia_request_validation():
    req = PiaRequest(
        dcid=1, dcgid=2, filename="a.nxs", message_index=0,
        number_of_frames=5, start_frame_index=0, xBeam=150.0, yBeam=160.0,
        detector_distance=250.0, unit_cell="79.1, 79.1, 38.4, 90 90 90",
    )
    assert req.unit_cell == (79.1, 79.1, 38.4, 90.0, 90.0, 90.0)
    with pytest.raises(Exception):
        PiaRequest(
            dcid=1, dcgid=2, filename="a.nxs", message_index=0,
            number_of_frames=5, start_frame_index=0, xBeam=1.0, yBeam=1.0,
            detector_distance=1.0, unit_cell="1 2 3",
        )


def test_detector_geometry_json():
    g = DetectorGeometry(
        distance=250.0, beam_center_x=155.0, beam_center_y=162.0,
        detector={"detector_type": "Eiger16M"},
    )
    d = json.loads(g.to_json())
    assert d["pixel_size_x"] == 0.075
    assert d["image_size_x"] == 4148
    assert d["thickness"] == 0.45
    g9 = DetectorGeometry(
        distance=100.0, beam_center_x=1.0, beam_center_y=1.0,
        detector={"detector_type": "Eiger9MCdTe"},
    )
    assert g9.detector.material == "CdTe"
    assert g9.detector.calculate_mu(1.0) > 0


def test_message_order_resolver():
    r = MessageOrderResolver()
    h = {}
    m0 = SimpleNamespace(dcgid=1, message_index=0)
    m1 = SimpleNamespace(dcgid=1, message_index=1)
    m2 = SimpleNamespace(dcgid=1, message_index=2)
    assert r.should_handle_now(m0, {})
    # out of order: 2 before 1 -> requeue once
    h2 = {}
    assert not r.should_handle_now(m2, h2)
    assert h2["already_requeued"]
    assert r.should_handle_now(m1, {})
    # requeued message comes back: handled despite mismatch
    assert r.should_handle_now(m2, h2)
    # new group resets
    m_new = SimpleNamespace(dcgid=2, message_index=0)
    assert r.should_handle_now(m_new, {})


@pytest.fixture()
def spotfinder_env(monkeypatch):
    sf = shutil.which("spotfinder")
    sf32 = shutil.which("spotfinder32")
    if not sf or not sf32:
        pytest.skip("spotfinder console scripts not installed")
    monkeypatch.setenv("SPOTFINDER", sf)
    monkeypatch.setenv("SPOTFINDER_32BIT", sf32)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    return sf, sf32


@pytest.mark.slow
def test_pia_service_end_to_end(tmp_path, monkeypatch, spotfinder_env):
    stack, mask = synthetic_rotation_stack(nimg=3, h=96, w=128)
    path = tmp_path / "data.nxs"
    write_nexus(path, stack, oscillation=None, mask=mask, distance=0.25,
                pixel_size=75e-6, beam_center=(64.0, 48.0))
    monkeypatch.chdir(tmp_path)

    service = PiaService(threads=2, with_indexer=False)
    rw = FakeRecipeWrapper(
        {
            "dcid": 100, "dcgid": 7, "filename": str(path),
            "message_index": 0, "number_of_frames": 3, "start_frame_index": 0,
            "xBeam": 64 * 0.075, "yBeam": 48 * 0.075,
            "detector_distance": 250.0, "wavelength": 0.9762,
        }
    )
    service.handle(rw, {}, {})
    assert rw.transport.acked
    assert len(rw.sent) == 3
    frames = sorted(d["file-number"] for _, d in rw.sent)
    assert frames == [1, 2, 3]  # 1-based for XRC
    assert all("num_strong_pixels" in d for _, d in rw.sent)


@pytest.mark.slow
def test_pia_service_batch_env_knob(tmp_path, monkeypatch, spotfinder_env):
    """FFS_SPOTFIND_BATCH flows into the spotfinder command line; without
    the packed path (CPU here) the CLI falls back per-frame and the
    per-image results are unchanged."""
    stack, mask = synthetic_rotation_stack(nimg=3, h=96, w=128)
    path = tmp_path / "data.nxs"
    write_nexus(path, stack, oscillation=None, mask=mask, distance=0.25,
                pixel_size=75e-6, beam_center=(64.0, 48.0))
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("FFS_SPOTFIND_BATCH", "2")

    service = PiaService(threads=2, with_indexer=False)
    rw = FakeRecipeWrapper(
        {
            "dcid": 100, "dcgid": 7, "filename": str(path),
            "message_index": 0, "number_of_frames": 3, "start_frame_index": 0,
            "xBeam": 64 * 0.075, "yBeam": 48 * 0.075,
            "detector_distance": 250.0, "wavelength": 0.9762,
        }
    )
    service.handle(rw, {}, {})
    assert rw.transport.acked
    assert len(rw.sent) == 3
    assert all("num_strong_pixels" in d for _, d in rw.sent)


def test_pia_service_rejects_bad_request(spotfinder_env):
    service = PiaService(threads=1, with_indexer=False)
    rw = FakeRecipeWrapper({"dcid": 5})  # missing fields
    service.handle(rw, {}, {})
    assert rw.transport.nacked


def test_pia_stale_message_with_timezone_aware_start_time(tmp_path):
    """ISO-8601 startTime with a timezone ('...Z') must flow through the
    stale-message age check.  Divergence from the reference (service.py:
    403-404), which subtracts naive now() from the aware datetime and
    crashes with TypeError before the ack — wedging the queue on every
    redelivery."""
    service = PiaService(threads=1, with_indexer=False)
    params = {
        "dcid": 9, "dcgid": 3, "filename": "missing.nxs",
        "message_index": 0, "number_of_frames": 1, "start_frame_index": 0,
        "xBeam": 1.0, "yBeam": 1.0, "detector_distance": 100.0,
        "startTime": "2020-01-01T00:00:00Z",  # aware, ancient
    }
    rw = FakeRecipeWrapper(params)
    # base_path is a real dir and the data file is absent -> the stale
    # rejection path runs: acked, nothing sent, NO TypeError
    service.handle(rw, {}, {"m": 1}, base_path=str(tmp_path))
    assert rw.transport.acked and not rw.sent


def test_zocalo_entry_point_attributes_are_lazy():
    """The `workflows.services` entry points resolve module attributes
    (pia:TPUPerImageAnalysis, compare:XRCResultCompare) that build the
    CommonService subclass on access — without workflows installed the
    access raises ImportError (NOT AttributeError: the hook exists)."""
    from ffs_tpu.service import compare as compare_mod
    from ffs_tpu.service import pia as pia_mod

    try:
        import workflows  # noqa: F401

        have_workflows = True
    except ImportError:
        have_workflows = False

    for mod, attr in (
        (pia_mod, "TPUPerImageAnalysis"),
        (compare_mod, "XRCResultCompare"),
    ):
        if have_workflows:
            assert getattr(mod, attr).__name__ == attr
        else:
            with pytest.raises(ImportError):
                getattr(mod, attr)
        with pytest.raises(AttributeError):
            mod.NoSuchService


def test_pia_service_requeues_out_of_order(spotfinder_env):
    service = PiaService(threads=1, with_indexer=False)
    params = {
        "dcid": 1, "dcgid": 3, "filename": "nope.nxs", "message_index": 5,
        "number_of_frames": 1, "start_frame_index": 0, "xBeam": 1.0,
        "yBeam": 1.0, "detector_distance": 100.0,
    }
    rw = FakeRecipeWrapper(params)
    header = {}
    service.handle(rw, header, {"m": 1}, base_path="/nonexistent")
    # out-of-order (expected 0, got 5): acked + checkpointed, nothing sent
    assert rw.transport.acked and rw.checkpoints and not rw.sent


def test_mu_tabulated_si_matches_dx2_anchor():
    """Si attenuation must reproduce the dx2/DIALS value (NIST SRD-126 grid
    + log-log interpolation, the cctbx attenuation_coefficient scheme)."""
    from ffs_tpu.service.detectors import (
        calculate_mu_for_material_at_wavelength as mu,
    )

    assert mu("Si", 0.9762458439949315) == pytest.approx(
        3.9219876752936167, rel=1e-12
    )
    # NIST grid points are exact by construction: 10 keV -> 33.89 cm^2/g
    assert mu("Si", 12.398419843320026 / 10.0) == pytest.approx(
        33.89 * 2.33 / 10.0, rel=1e-12
    )
    assert mu("Si", 12.398419843320026 / 15.0) == pytest.approx(
        10.34 * 2.33 / 10.0, rel=1e-12
    )


def test_mu_tabulated_cdte_physical():
    """CdTe: monotone between edges, Cd K-edge jump at 26.71 keV, and in the
    physically-known range at 20.7 keV (mu/rho ~ 15 cm^2/g)."""
    from ffs_tpu.service.detectors import (
        calculate_mu_for_material_at_wavelength as mu,
    )

    hc = 12.398419843320026
    v20 = mu("CdTe", hc / 20.66)
    assert 6.0 < v20 < 12.0  # mm^-1
    # K-edge discontinuity: just above the Cd edge absorbs more
    below = mu("CdTe", hc / 26.5)
    above = mu("CdTe", hc / 27.0)
    assert above > 2.0 * below
    # harder X-rays attenuate less within an edge-free band
    assert mu("CdTe", 0.5) < mu("CdTe", 0.55) < mu("CdTe", 0.6)
