# Common tasks. The session env pins JAX at a tunneled TPU; CPU targets
# override it (see tests/conftest.py and .claude/skills/verify/SKILL.md).
CPU_ENV = env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu

.PHONY: test bench native dryrun clean warm

test:
	python -m pytest tests/ -q

# Full suite, reproducibly green: quick tier in one process, slow tier one
# module per fresh process (a monolithic run segfaults XLA:CPU around the
# ~220th test on this 1-core box — see scripts/run_tests.py).
test-all:
	python scripts/run_tests.py

bench:
	python bench.py

# Populate the on-disk compile cache (.jax_cache/, gitignored) so a
# subsequent `make bench` run times warm executables instead of compiles.
warm:
	python bench.py > /dev/null || true
	FREEPOSE_BENCH=proposals python bench.py > /dev/null || true

# Released-weights drop-in (docs/WEIGHTS.md): convert every checkpoint found
# under data/checkpoints/ to .npz params, then run the gated smoke tier.
weights:
	python -m scripts.prepare_weights
	python -m pytest tests/test_weights_smoke.py -q

native:
	$(MAKE) -C csrc

dryrun:
	$(CPU_ENV) XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

clean:
	$(MAKE) -C csrc clean
	rm -rf .jax_cache
