# The session env points every python at the one real TPU chip via the
# axon relay (PALLAS_AXON_POOL_IPS triggers plugin registration inside
# sitecustomize at interpreter startup — before conftest can run). CPU
# work must strip that var or risk hanging at startup when the relay is
# wedged; these targets encode the bypass so `make test` always works.
PY := env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python

.PHONY: test quick native bench ci

test:
	$(PY) -m pytest tests/ -x -q

# inner-loop tier: skips the slow end-to-end / sweep tests (<2 min)
quick:
	$(PY) -m pytest tests/ -x -q -m "not slow"

native:
	$(MAKE) -C sparkinfer_tpu/native

bench:
	timeout 3000 python bench.py

# one-command CI gate: native build + sanitized selftest, quick test
# tier, single-chip compile check + 8-device virtual-mesh dryrun
# (ref: the ASAN/UBSAN ctest jobs, .github/workflows/build.yml:257-304)
ci: native
	$(MAKE) -C sparkinfer_tpu/native sanitize
	$(PY) -m pytest tests/ -x -q -m "not slow"
	env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
	  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	  python __graft_entry__.py
