"""Contact-zone vertex tables.

The reference loads six precomputed MANO-vertex groups (palm + finger zones,
sizes {19,28,19,7,25,17}) from ``assets/contact_zones.pkl`` and, per zone,
keeps only the hand vertex closest to the object when building the
attraction mask (reference: mano_train/networks/branches/contactloss.py:
262-274, handobjectdatasets/contactutils.py:8-13).

For the TPU build the variable-length zone index lists are converted once to
a fixed-shape boolean membership matrix ``(num_zones, 778)`` so the
"closest vertex per zone" selection becomes a static-shape masked argmin.
"""

from __future__ import annotations

import functools
import os

import numpy as np

# Fingertip vertex ids used by the "tips" contact-zone filter
# (reference: contactloss.py:258).
TIP_VERT_IDS = (745, 317, 444, 556, 673)

_DATA = os.path.join(os.path.dirname(__file__), "data", "contact_zones.npz")

NUM_HAND_VERTS = 778


@functools.lru_cache(maxsize=2)
def load_contact_zones(path: str = _DATA):
    """Returns ``(verts (778,3) float32, zones: dict[int, np.ndarray])``."""
    data = np.load(path)
    zones = {}
    i = 0
    while f"zone_{i}" in data:
        zones[i] = data[f"zone_{i}"].astype(np.int32)
        i += 1
    return data["verts"].astype(np.float32), zones


@functools.lru_cache(maxsize=2)
def zone_masks(path: str = _DATA) -> np.ndarray:
    """Fixed-shape zone membership: bool ``(num_zones, 778)``."""
    _, zones = load_contact_zones(path)
    masks = np.zeros((len(zones), NUM_HAND_VERTS), dtype=bool)
    for idx, vert_ids in zones.items():
        masks[idx, vert_ids] = True
    masks.setflags(write=False)
    return masks


def tips_mask() -> np.ndarray:
    """Bool (778,) mask of fingertip vertices."""
    mask = np.zeros((NUM_HAND_VERTS,), dtype=bool)
    mask[list(TIP_VERT_IDS)] = True
    return mask
