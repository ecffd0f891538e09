# Convenience targets. CPU work always clears the axon TPU registration.
CPU_ENV := env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS=
TPU_ENV := env PYTHONPATH=$(PWD):/root/.axon_site

.PHONY: test native bench bench-tpu kernel-bench diagnose clean

test:
	$(CPU_ENV) python -m pytest tests/ -q

native:
	rm -f native/libgraphcore.so && sh native/build.sh

bench:
	$(CPU_ENV) python bench.py --cpu

bench-tpu:
	timeout 590 $(TPU_ENV) python bench.py --scale medium

kernel-bench:
	timeout 590 $(TPU_ENV) python kernel_bench.py --validate

diagnose:
	$(CPU_ENV) python scripts/diagnose.py --cpu

clean:
	rm -rf .bench_cache native/libgraphcore.so
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
