"""Numerical substrate: functional distributions, bijectors, and TPU
kernels (XLA + Pallas) — the first-party replacement for the reference's
borrowed TF/TFP kernels (SURVEY.md §2.3)."""

from vaemolsim_tpu.ops import bijectors  # noqa: F401
from vaemolsim_tpu.ops import distributions  # noqa: F401
from vaemolsim_tpu.ops import rqs  # noqa: F401
