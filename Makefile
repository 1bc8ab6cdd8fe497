# Evidence + gates (VERDICT r5 item 6). `make check` reproduces the
# three per-round audit artifacts and fails non-zero on any
# regression; `make test` / `make bench` are the other two gates.

SF_DIR ?= /root/testdata/sf0.01

.PHONY: check test bench sync-check

check:
	python tools/check.py $(SF_DIR)

# Artifact-staleness gate (VERDICT r8 item 2): committed counts must
# agree with the live registry. Also the final stage of `make check`.
sync-check:
	python tools/sync_check.py

test:
	python -m pytest tests/ -q

bench:
	python bench.py
