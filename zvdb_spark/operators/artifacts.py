"""Shared npz+manifest persistence discipline.

One implementation of the pattern GraphIndex.save established and
kmeans.save_centroids / pq.save_ivf_quantizer reuse: numpy arrays in
an .npz beside a small json manifest, each written to a temp name and
atomically renamed so a reader never sees a half-written file, with a
format-version check on load. Callers own their shape validation and
error wording; this module owns the file mechanics, so a future
format bump or corruption-handling fix lands in exactly one place.
"""

from __future__ import annotations

import json
import os

import numpy as np


def save_npz_manifest(
    npz_path: str, json_path: str, arrays: dict, manifest: dict
) -> None:
    """Atomically write ``arrays`` to ``npz_path`` and ``manifest``
    to ``json_path`` (arrays first, so a manifest never points at
    missing data)."""
    with open(npz_path + ".tmp", "wb") as f:
        np.savez(f, **arrays)
    os.replace(npz_path + ".tmp", npz_path)
    with open(json_path + ".tmp", "w") as f:
        json.dump(manifest, f)
    os.replace(json_path + ".tmp", json_path)


def load_npz_manifest(
    npz_path: str, json_path: str, expect_format: int, what: str
) -> tuple[dict, dict]:
    """Read (arrays, manifest), failing with a named diagnostic when
    the manifest's ``format`` is not ``expect_format``."""
    with open(json_path) as f:
        manifest = json.load(f)
    if manifest.get("format") != expect_format:
        raise ValueError(
            f"{what} manifest {json_path} has format "
            f"{manifest.get('format')!r}; this build reads "
            f"{expect_format}"
        )
    with np.load(npz_path) as z:
        arrays = {k: z[k] for k in z.files}
    return arrays, manifest
