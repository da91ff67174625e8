# diffmining_tpu build/test entry points
.PHONY: native test bench clean

native: diffmining_tpu/native/libboxops.so

diffmining_tpu/native/libboxops.so: diffmining_tpu/native/boxops.cpp
	g++ -O3 -shared -fPIC $< -o $@

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

clean:
	rm -f diffmining_tpu/native/libboxops.so
