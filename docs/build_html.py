"""Dependency-light HTML docs builder (fallback for `make docs`).

Sphinx (docs/conf.py) is the primary builder in CI / ReadTheDocs; this
script renders the same markdown sources into navigable HTML using only
the `markdown` + `pygments` packages already in the runtime image, so
`make docs` produces HTML anywhere — including hermetic environments
where nothing can be pip-installed.

Run:  python docs/build_html.py   ->  docs/_build/html/*.html
"""

import os
import re
import shutil

import markdown

DOCS = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(DOCS, "_build", "html")

PAGES = [
    ("index.md", "Overview"),
    ("getting_started.md", "Getting started"),
    ("distributed.md", "Distributed execution"),
    ("molecular.md", "Molecular simulation"),
    ("performance.md", "Performance"),
    ("attention_equivalence.md", "Attention equivalence study"),
    ("api.md", "API reference"),
    ("migrating_from_vaemolsim.md", "Migrating from vaemolsim"),
]

TEMPLATE = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{title} — vaemolsim-tpu</title>
<style>
  body {{ margin: 0; font: 16px/1.6 -apple-system, "Segoe UI", sans-serif;
         color: #1a202c; }}
  nav {{ position: fixed; top: 0; left: 0; bottom: 0; width: 230px;
        padding: 24px 16px; background: #f7fafc;
        border-right: 1px solid #e2e8f0; box-sizing: border-box; }}
  nav h1 {{ font-size: 18px; margin: 0 0 16px; }}
  nav a {{ display: block; padding: 6px 8px; border-radius: 6px;
          color: #2b6cb0; text-decoration: none; }}
  nav a.current {{ background: #bee3f8; color: #1a365d; }}
  main {{ margin-left: 230px; padding: 32px 48px; max-width: 860px; }}
  pre {{ background: #f6f8fa; padding: 12px 16px; border-radius: 8px;
        overflow-x: auto; font-size: 14px; }}
  code {{ background: #f6f8fa; padding: 1px 4px; border-radius: 4px;
         font-size: 0.92em; }}
  pre code {{ background: none; padding: 0; }}
  table {{ border-collapse: collapse; }}
  th, td {{ border: 1px solid #e2e8f0; padding: 6px 10px; }}
  h1, h2, h3 {{ line-height: 1.25; }}
  a {{ color: #2b6cb0; }}
</style>
</head>
<body>
<nav>
<h1>vaemolsim-tpu</h1>
{nav}
</nav>
<main>
{body}
</main>
</body>
</html>
"""


def build():
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)
    md = markdown.Markdown(
        extensions=["fenced_code", "tables", "codehilite", "toc"],
        extension_configs={"codehilite": {"guess_lang": False,
                                          "noclasses": True}})
    for src, title in PAGES:
        with open(os.path.join(DOCS, src)) as f:
            text = f.read()
        # Strip MyST toctree directives (Sphinx-only).
        text = re.sub(r"```\{toctree\}.*?```", "", text, flags=re.S)
        # Point .md cross-links at the rendered pages.
        text = re.sub(r"\(([\w./-]+)\.md\)", r"(\1.html)", text)
        md.reset()
        body = md.convert(text)
        nav = "\n".join(
            f'<a href="{os.path.splitext(s)[0]}.html"'
            f'{" class=current" if s == src else ""}>{t}</a>'
            for s, t in PAGES)
        out = os.path.join(OUT, os.path.splitext(src)[0] + ".html")
        with open(out, "w") as f:
            f.write(TEMPLATE.format(title=title, nav=nav, body=body))
        print(f"wrote {out}")
    print(f"HTML docs in {OUT}")


if __name__ == "__main__":
    build()
