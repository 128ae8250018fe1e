"""Data pipeline: native trajectory IO (SURVEY.md §2.2 — the reference
reads MD data through optional external tooling; this is first-party)."""

from vaemolsim_tpu.data.dcd import DCDReader, write_dcd  # noqa: F401
from vaemolsim_tpu.data.pipeline import (  # noqa: F401
    BackgroundReader,
    epoch_stream,
    prefetch_to_device,
)
from vaemolsim_tpu.data.pdb import (  # noqa: F401
    PDBTopology,
    read_pdb,
    write_pdb,
)
from vaemolsim_tpu.data.xyz import read_xyz, write_xyz  # noqa: F401
