"""Stage storage: the checkpoint/resume layer.

The reference persists counted solid k-mers, the abundance histogram, the
minimizer repartition table and config into a `.h5` HDF5 store (or
`_gatb/` directory) which doubles as the checkpoint for the stage-skipping
flags `-skip-bcalm -skip-bglue -redo-links`
(/root/reference/README.md:103, scripts/pufferize.py:143), and deletes it
after a successful run (/root/reference/src/bcalm_1.cpp:64-77).

Here the store is a `<prefix>_btpu/` directory holding npz arrays + a JSON
manifest — same lifecycle, same resume semantics, no 300k-LoC HDF5 vendor
dependency.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Dict, Optional, Tuple

import numpy as np

SUFFIX = "_btpu"
MANIFEST = "manifest.json"


class Store:
    def __init__(self, prefix: str):
        self.path = prefix + SUFFIX

    def exists(self) -> bool:
        return os.path.isfile(os.path.join(self.path, MANIFEST))

    def _manifest(self) -> Dict:
        with open(os.path.join(self.path, MANIFEST)) as f:
            return json.load(f)

    def write_counts(self, solid: np.ndarray, counts: np.ndarray, k: int,
                     histogram: Optional[np.ndarray] = None,
                     config: Optional[Dict] = None) -> None:
        os.makedirs(self.path, exist_ok=True)
        np.savez_compressed(
            os.path.join(self.path, "solid.npz"), lanes=solid, counts=counts
        )
        if histogram is not None:
            np.save(os.path.join(self.path, "histogram.npy"), histogram)
        manifest = {
            "k": k,
            "n_solid": int(solid.shape[1]),
            "lanes": int(solid.shape[0]),
            "config": config or {},
        }
        with open(os.path.join(self.path, MANIFEST), "w") as f:
            json.dump(manifest, f, indent=2)

    def read_counts(self, k: int) -> Tuple[np.ndarray, np.ndarray]:
        m = self._manifest()
        if m["k"] != k:
            raise ValueError(
                f"stored counts are for k={m['k']}, requested k={k}"
            )
        data = np.load(os.path.join(self.path, "solid.npz"))
        return data["lanes"], data["counts"]

    def read_histogram(self) -> Optional[np.ndarray]:
        p = os.path.join(self.path, "histogram.npy")
        return np.load(p) if os.path.exists(p) else None

    def remove(self) -> None:
        """End-of-run cleanup (the reference removes its .h5,
        src/bcalm_1.cpp:64-77)."""
        if os.path.isdir(self.path):
            shutil.rmtree(self.path)
