# maxstyle_tpu developer entry points

.PHONY: test test-fast test-slow bench dryrun

# fast regression gate (~6 min warm, single-core CPU): everything except
# @pytest.mark.slow (heavy full-size compiles / end-to-end cycles)
test-fast:
	python -m pytest tests -x -q -m "not slow"

# prioritized pre-close gate: fast tests PLUS the load-bearing slow tests
# (e2e, sharding, executable parity, golden losses, production drill,
# train CLI) — skips the slow library-surface parity pins
test-preclose:
	python -m pytest tests -x -q -m "not slow or core"

# the full suite (~20 min warm, single-core CPU)
test:
	python -m pytest tests -x -q

test-slow:
	python -m pytest tests -x -q -m "slow"

bench:
	python bench.py

dryrun:
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('OK')"
