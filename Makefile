# Developer entry points.

PY ?= python

.PHONY: test docs apidocs docs-check bench clean-docs

test:
	$(PY) -m pytest tests/ -q

# Regenerate the per-module API reference (docs/api.md).
apidocs:
	$(PY) docs/generate_api.py

# Fail if docs/api.md has drifted from the package's public symbols.
docs-check:
	$(PY) docs/generate_api.py --check

# Build HTML docs: Sphinx when available (CI / ReadTheDocs), otherwise
# the dependency-light fallback builder (hermetic environments).
docs: docs-check
	@if $(PY) -c "import sphinx" 2>/dev/null; then \
		$(PY) -m sphinx -b html docs docs/_build/html; \
	else \
		echo "sphinx not installed; using fallback builder"; \
		$(PY) docs/build_html.py; \
	fi

bench:
	$(PY) bench.py

clean-docs:
	rm -rf docs/_build
