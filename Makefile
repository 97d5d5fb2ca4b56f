# Test tiers (the full suite takes ~55 min on this 1-core box).
# `test-fast` runs in ~8 min here.
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
