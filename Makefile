# Test tiers (the full suite cannot finish in bounded time on a 1-core box:
# the multihost test alone budgets ~28 min). `test-fast` targets < 5 min.
.PHONY: test-fast test-slow test-all

test-fast:
	python -m pytest tests -q -m "not slow"

test-slow:
	python -m pytest tests -q -m "slow"

test-all:
	python -m pytest tests -q
