# Test tiers (the full suite cannot finish in bounded time on a 1-core box:
# the multihost test alone budgets ~28 min). `test-fast` targets < 5 min.
.PHONY: test-fast test-slow test-all

test-fast:
	python -m pytest tests -q -m "not slow"

test-slow:
	python -m pytest tests -q -m "slow"

test-all:
	python -m pytest tests -q

# Driver-style checks, runnable by hand.
.PHONY: dryrun bench
dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 python -c "\
	import jax; jax.config.update('jax_platforms','cpu'); \
	from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"

bench:
	python bench.py
