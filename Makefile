.PHONY: all native test bench clean

all: native

native: build/libjpezy_host.so

build/libjpezy_host.so: csrc/jpezy_host.cpp
	mkdir -p build
	g++ -O3 -march=native -ffp-contract=off -std=c++17 -shared -fPIC $< -o $@

test: native
	python -m pytest tests/ -x -q

bench: native
	python bench.py

clean:
	rm -rf build
