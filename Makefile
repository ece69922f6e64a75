# Developer entry points (reference repo has an equivalent Makefile).

.PHONY: test test-fast bench native clean-native stress eval install

test:
	python -m pytest tests/ -q

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
