# Test tiers (the full suite takes ~3h on this 1-core box).
# `test-fast` runs in ~14 min here; `test-slow` ~2.5h (the two
# released-depth composed-parity cases are ~50 min of that).
.PHONY: test-fast test-slow test-all

test-fast:
	python -m pytest tests -q -m "not slow"

test-slow:
	python -m pytest tests -q -m "slow"

test-all:
	python -m pytest tests -q

# Driver-style checks, runnable by hand.
.PHONY: dryrun dryrun-soak bench
dryrun:
	python -c "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"

# 5 consecutive dryrun runs; tallies clean vs needed-retry vs failed
# (record the JSON line in ROADMAP each round)
dryrun-soak:
	python scripts/dryrun_soak.py 5

bench:
	python bench.py
