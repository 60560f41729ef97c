"""Typed detector registry and geometry payloads.

Equivalent of the reference's pydantic detector models (reference:
src/ffs/service.py:67-153): Eiger16M / Eiger4M / Eiger9MCdTe with sensor
thickness, material and a cached attenuation coefficient.

The attenuation coefficient mu(lambda) (reference delegates to dx2's
tabulated attenuation data via ffs.index.calculate_mu_for_material_at_
wavelength) is modelled here with the photoelectric lambda^3 scaling law
anchored to known values — exact at the anchor, within a few percent across
the beamline energy range, and only used for the sub-pixel parallax
correction.
"""

from __future__ import annotations

import json
from enum import Enum
from typing import Literal, Union

from pydantic import BaseModel, Field, PrivateAttr


class Material(str, Enum):
    Si = "Si"
    CdTe = "CdTe"


# (anchor wavelength [A], mu at anchor [mm^-1])
_MU_ANCHORS = {
    Material.Si: (0.9762458439949315, 3.9219876752936167),  # DIALS/dx2 value
    Material.CdTe: (1.0, 28.0),  # approximate, between the Cd/Te K edges
}


def calculate_mu_for_material_at_wavelength(material, wavelength: float) -> float:
    """Linear attenuation coefficient in mm^-1 (lambda^3 photoelectric law)."""
    mat = Material(material)
    wl0, mu0 = _MU_ANCHORS[mat]
    return mu0 * (wavelength / wl0) ** 3


class DetectorParameters(BaseModel):
    detector_type: str
    thickness: float
    material: Material
    pixel_size_x: float
    pixel_size_y: float
    image_size_x: int
    image_size_y: int
    _mu_cache: dict = PrivateAttr(default_factory=dict)

    def calculate_mu(self, wavelength: float) -> float:
        if wavelength not in self._mu_cache:
            self._mu_cache[wavelength] = calculate_mu_for_material_at_wavelength(
                self.material, wavelength
            )
        return self._mu_cache[wavelength]


class Eiger16M(DetectorParameters):
    detector_type: Literal["Eiger16M"] = "Eiger16M"
    thickness: float = 0.45
    material: Material = Material.Si
    pixel_size_x: float = 0.075
    pixel_size_y: float = 0.075
    image_size_x: int = 4148
    image_size_y: int = 4362


class Eiger4M(DetectorParameters):
    detector_type: Literal["Eiger4M"] = "Eiger4M"
    thickness: float = 0.45
    material: Material = Material.Si
    pixel_size_x: float = 0.075
    pixel_size_y: float = 0.075
    image_size_x: int = 2068
    image_size_y: int = 2162


class Eiger9MCdTe(DetectorParameters):
    detector_type: Literal["Eiger9MCdTe"] = "Eiger9MCdTe"
    thickness: float = 0.75
    material: Material = Material.CdTe
    pixel_size_x: float = 0.075
    pixel_size_y: float = 0.075
    image_size_x: int = 3108
    image_size_y: int = 3262


class DetectorGeometry(BaseModel):
    distance: float
    beam_center_x: float
    beam_center_y: float
    detector: Union[Eiger9MCdTe, Eiger16M, Eiger4M] = Field(
        ..., discriminator="detector_type"
    )

    def to_json(self) -> str:
        d = self.model_dump(exclude={"detector"})
        d.update(self.detector.model_dump())
        return json.dumps(d, indent=4)
