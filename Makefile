# diffmining_tpu build/test entry points
.PHONY: native test bench clean

native: diffmining_tpu/native/libboxops.so

diffmining_tpu/native/libboxops.so: diffmining_tpu/native/boxops.cpp
	g++ -O3 -shared -fPIC $< -o $@

test:
	python -m pytest tests/ -x -q

# fast lane: skips the minutes-long e2e probes (full-config parity, the
# 2-process jax.distributed pods, full graft entry) — ~half the wall time
test-fast:
	python -m pytest tests/ -x -q -m "not slow"

bench:
	python bench.py

clean:
	rm -f diffmining_tpu/native/libboxops.so
