"""Analysis configuration.

Replaces the reference's ad-hoc flag handling — module-level `switch`
booleans (orderParam_lib.py:1945), `sys.argv` slicing (:1949-1950), and
physics constants hard-coded at call sites (cutoff=4.2 :1696, hbDist=3.0
:421, highCut=3.413 wp:210) — with one declarative dataclass that the
drivers accept and that serializes to JSON for reproducibility.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass

from waterorderlib_tpu import constants


@dataclass
class AnalysisConfig:
    """Every tunable the trajectory drivers consume, with the reference's
    defaults."""

    # selections
    wat_res: str = "WAT"
    stride: int = 1

    # neighbor shells / order parameters
    tet_cutoff: float = constants.DEFAULT_TET_CUTOFF  # 3-body shell (wp:210)
    q_high_cut: float = 10.0  # 4-NN search shell (wp:344)
    lsi_cutoff: float = constants.DEFAULT_LSI_CUTOFF  # (wp:252)
    psi_high_cut: float = 7.0  # chain-end shell (orderParam_lib.py:1505)
    max_neighbors: int = 16  # fixed-K neighbor padding

    # hydrogen bonds
    hb_dist: float = constants.DEFAULT_HB_DIST  # hbCalc (3.5, :805)
    hb_angle: float = constants.DEFAULT_HB_ANGLE  # hbCalc (120, :805)
    bound_hb_dist: float = 3.0  # getBoundWrap (:421)
    bound_hb_angle: float = 150.0  # getBoundWrap (:421)
    shell_cutoff: float = constants.DEFAULT_SHELL_CUTOFF  # getBoundWrap (4.0)

    # RDF
    rdf_binwidth: float = 0.1
    rdf_totbins: int = 150
    rdf_chunks: int = 5

    # chemical potential
    probe_radius: float = 3.3
    chempot_shell_cutoff: float = 4.2  # (:1696)
    insertions_bulk: int = 10000
    insertions_shell: int = 100000

    # execution
    row_block: int = 512
    output_dir: str = "."
    seed: int = 0

    def to_json(self, path: str):
        with open(path, "w") as fh:
            json.dump(dataclasses.asdict(self), fh, indent=2)

    @classmethod
    def from_json(cls, path: str) -> "AnalysisConfig":
        with open(path) as fh:
            data = json.load(fh)
        known = {f.name for f in dataclasses.fields(cls)}
        unknown = set(data) - known
        if unknown:
            raise ValueError(f"unknown config keys: {sorted(unknown)}")
        return cls(**data)
