# Developer entry points (reference repo has an equivalent Makefile).

.PHONY: test test-fast bench native clean-native stress eval install ci ci-quick

test:
	python -m pytest tests/ -q

# Full local CI: what .github/workflows/ci.yml runs (tests on the 8-device
# CPU mesh + native build + multi-chip dryrun).
ci: native test
	python -c "import os; os.environ.setdefault('JAX_PLATFORMS','cpu'); \
os.environ.setdefault('XLA_FLAGS','--xla_force_host_platform_device_count=8'); \
import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun ok')"

# Fast pre-commit gate (reference make ci-quick): changed-area tests only.
ci-quick:
	python -m pytest tests/ -x -q -m "not slow" --ignore=tests/test_stress_cycles.py

test-fast:
	python -m pytest tests/ -x -q

bench:
	python bench.py

eval:
	python scripts/eval_recall.py

stress:
	STRESS_CYCLES=75 python -m pytest tests/test_stress_cycles.py -q

native:
	$(MAKE) -C native

clean-native:
	$(MAKE) -C native clean

install:
	pip install -e . --no-deps --no-build-isolation
