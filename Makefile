# depth_estimation_tpu — developer targets
#
# `make test` is the fast CI suite (CPU, 8 virtual devices via conftest).
# `make gate-cpu` is the opt-in FULL-SCALE accuracy gate: full-dimension
# MiDaS-small / MiDaS (v2.1 Large) / DPT-Large / DPT-Hybrid forwards vs the
# torch oracles on the CPU backend (slow — tens of minutes; run before
# perf/precision changes).
# `make gate-tpu` runs the same gate on the real chip (the numbers that
# actually matter for the 1e-3 threshold; needs the axon TPU).

PY ?= python

.PHONY: test gate-cpu gate-tpu native bench smoke

test:
	$(PY) -m pytest tests/ -q

gate-cpu:
	DEPTH_TPU_PLATFORM=cpu $(PY) tools/accuracy_gate.py

gate-tpu:
	$(PY) tools/accuracy_gate.py

native:
	$(MAKE) -C depth_estimation_tpu/native

bench:
	$(PY) bench.py

smoke:
	$(PY) tools/tpu_smoke.py
