# Developer targets (reference has a docker-centric 318-line Makefile;
# TPU VMs don't need docker, so these are direct invocations).

PY ?= python

.PHONY: test test-fast lint bench bench-quick train preprocess clean

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -m "not slow"

bench:
	$(PY) bench.py

bench-quick:
	$(PY) -m pointcloud_style_transfer_tpu.cli.benchmark --quick --reps 2

train:
	$(PY) -m pointcloud_style_transfer_tpu.cli.train $(ARGS)

preprocess:
	$(PY) -m pointcloud_style_transfer_tpu.cli.preprocess $(ARGS)

# dependency-free stand-in for the reference's black/isort/flake8/mypy/
# bandit/pydocstyle pre-commit stack (no package installs on TPU VMs);
# see tools/lint.py for the check inventory and .pre-commit-config.yaml
lint:
	$(PY) -m py_compile $$(git ls-files '*.py')
	$(PY) tools/lint.py

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null; \
	rm -rf .pytest_cache
