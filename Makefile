# Test lanes (VERDICT r2 #7): the fast lane must stay under ~5 min on CPU;
# the full suite (torch full-graph parity oracles, training recipes) is the
# trust anchor and runs in CI / before release.
.PHONY: test test-all bench

test:
	python -m pytest tests/ -x -q -m "not slow"

test-all:
	python -m pytest tests/ -x -q

bench:
	python bench.py
