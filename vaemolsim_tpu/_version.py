"""Version resolution — the versioningit analog.

The reference derives its version from git tags at build time via
versioningit (reference pyproject.toml:87-88 writing vaemolsim/_version.py).
Here the same capability is provided at import time with a cheap fallback
chain: installed distribution metadata -> ``git describe`` on the source
tree -> the static base version.
"""

from __future__ import annotations

import os
import subprocess

_BASE_VERSION = "0.2.0"


def _from_metadata() -> str | None:
    try:
        from importlib.metadata import version

        return version("vaemolsim_tpu")
    except Exception:
        return None


def _from_git() -> str | None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # exists(), not isdir(): in worktrees/submodules .git is a gitfile.
    if not os.path.exists(os.path.join(root, ".git")):
        return None
    try:
        out = subprocess.run(
            ["git", "describe", "--tags", "--always", "--dirty"],
            cwd=root, capture_output=True, text=True, timeout=5)
        if out.returncode != 0:
            return None
        desc = out.stdout.strip()
        if not desc:
            return None
        # "v1.2.3-4-gabcdef" -> "1.2.3.post4+gabcdef"; bare hash (no tag
        # in history) -> base version + local identifier.
        if desc.startswith("v"):
            desc = desc[1:]
        dirty = desc.endswith("-dirty")
        if dirty:
            desc = desc[: -len("-dirty")]
        parts = desc.split("-")
        if len(parts) >= 3 and parts[-2].isdigit():
            out = f"{'-'.join(parts[:-2])}.post{parts[-2]}+{parts[-1]}"
        elif "." in desc:  # exactly on a tag
            out = desc
        else:  # bare commit hash
            out = f"{_BASE_VERSION}+g{desc}"
        if dirty:
            out += ".dirty" if "+" in out else "+dirty"
        return out
    except Exception:
        return None


# Git first: when running from a source tree (the repo's sys.path
# pattern), an older installed wheel's metadata must not shadow the
# checkout's actual version.
__version__ = _from_git() or _from_metadata() or _BASE_VERSION
