# aha-tpu developer targets (the reference ships the same surface for its
# cargo workflow, /root/reference/Makefile: build/test/fmt/lint/clean).
SHELL := bash
.SHELLFLAGS := -eu -o pipefail -c
.DEFAULT_GOAL := help
MAKEFLAGS += --no-print-directory

PY ?= python

help:
	@echo "targets:"
	@echo "  test        fast gate: pytest -m 'not slow' (CI tier, ~5 min)"
	@echo "  test-full   full suite incl. slow/HF-parity tests (nightly tier)"
	@echo "  lint        pyflakes over the package and tests"
	@echo "  bench       run bench.py (one JSON line; real TPU when present)"
	@echo "  serve       aha serv \$$(MODEL) (e.g. make serve MODEL=Qwen/Qwen3-0.6B)"
	@echo "  assets      regenerate the sample assets under assets/"
	@echo "  clean       remove caches and build artifacts"

test:
	@$(PY) -m pytest tests/ -q -m "not slow"

test-full:
	@$(PY) -m pytest tests/ -q

lint:
	@$(PY) -m compileall -q aha_tpu tests bench.py __graft_entry__.py
	@if $(PY) -c "import pyflakes" 2>/dev/null; then \
	  $(PY) -m pyflakes aha_tpu tests bench.py __graft_entry__.py; \
	else echo "pyflakes not installed; syntax check only"; fi

bench:
	@$(PY) bench.py

MODEL ?= Qwen/Qwen3-0.6B
serve:
	@$(PY) -m aha_tpu serv "$(MODEL)"

assets:
	@$(PY) scripts/make_assets.py

clean:
	@find . -name __pycache__ -type d -prune -exec rm -rf {} +
	@rm -rf .pytest_cache build dist *.egg-info

.PHONY: help test test-full lint bench serve assets clean
