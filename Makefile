# Developer entry points.

PY ?= python

.PHONY: test test-examples test-all docs apidocs docs-check bench clean-docs

# Default lane: everything but the example-workflow smokes, sharded by
# file over available cores with a hard per-file timeout
# (tools/partest.py — first-party xdist/timeout stand-in).
test:
	$(PY) tools/partest.py -m "not slow" --timeout 1200

# Examples lane (the 41 subprocess smokes; CI runs it as its own job).
# --per-test: they all live in one file, so sharding/timeouts apply to
# individual examples.
test-examples:
	$(PY) tools/partest.py tests/test_examples.py -m slow --per-test --timeout 1200

test-all: test test-examples

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
