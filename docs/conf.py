"""Sphinx configuration (the reference ships docs/conf.py + RTD config;
this build adds autodoc over the package modules and MyST markdown
sources).  Built in CI via `make docs`; locally `make docs` falls back
to the dependency-free builder in docs/build_html.py when Sphinx is not
installed."""

import os
import sys

sys.path.insert(0, os.path.abspath(".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

project = "vaemolsim-tpu"
author = "vaemolsim-tpu developers"
copyright = "2026, vaemolsim-tpu developers"

try:
    from vaemolsim_tpu._version import __version__ as release
except Exception:
    release = "0.0.0"
version = release

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.autosummary",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.intersphinx",
    "myst_parser",
]

source_suffix = {".rst": "restructuredtext", ".md": "markdown"}
master_doc = "index"
exclude_patterns = ["_build", "Thumbs.db", ".DS_Store"]

autosummary_generate = True
autodoc_member_order = "bysource"
autodoc_default_options = {"members": True, "undoc-members": True,
                           "show-inheritance": True}
# Heavy/optional imports that should not break the doc build.
autodoc_mock_imports = []

napoleon_google_docstring = True
napoleon_numpy_docstring = True

intersphinx_mapping = {
    "python": ("https://docs.python.org/3", None),
    "jax": ("https://docs.jax.dev/en/latest/", None),
}

html_theme = "alabaster"
html_static_path = []
