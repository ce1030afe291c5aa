# Mirrors the reference's build driver (reference makefile:1-20)

test:
	rm -rf examples/*/generated
	python -m pytest tests/ -x -q

test-all:
	python -m pytest tests/ -q -m ""

# per-round validation tier (VERDICT r4 item 4): the BLS/mesh surface that
# the default tier skips — BLS EthKZG e2e, BLS emitted execution, BSB22
# budget variants, gnark-mode e2e, sharded MSM + ONE mesh prove.  Run and
# record in CHANGELOG every round.
test-mid:
	python -m pytest tests/ -q -m mid

examples:
	MERKLE_DEPTH=4 python examples/basic/logicsig_verifier.py
	MERKLE_DEPTH=4 python examples/merkle/logicsig_verifier.py

bench:
	python bench.py

bench-kernels:
	python bench_kernels.py

bench-prove:
	python bench_prove.py

bench-scaling:
	python bench_scaling.py

all: test examples

.PHONY: test test-all test-mid examples bench bench-kernels bench-prove bench-scaling all

native:
	g++ -O3 -shared -fPIC -o algoplonk_tpu/native/libapmath.so algoplonk_tpu/native/csrc/apmath.cc

.PHONY: native
