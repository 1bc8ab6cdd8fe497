# Evidence + gates (VERDICT r5 item 6). `make check` reproduces the
# three per-round audit artifacts and fails non-zero on any
# regression; `make test` / `make bench` are the other two gates.

SF_DIR ?= /root/testdata/sf0.01

.PHONY: check test bench

check:
	python tools/check.py $(SF_DIR)

test:
	python -m pytest tests/ -q

bench:
	python bench.py
