# Top-level targets mirroring the reference's Makefile ergonomics
# (reference Makefile:51-110: libs / all / run / clean / lines).

PY ?= python

all: native

native:
	$(MAKE) -C native

run:
	$(PY) -m raymarching_tpu --scene scenes/demo.txt --out out.png

test:
	$(PY) -m pytest tests/ -q

# fast iteration loop: slow-tagged tests excluded, 4 xdist workers
# (~9 min; cluster tests allocate ephemeral ports so workers never collide)
test-fast:
	$(PY) -m pytest tests/ -q -m 'not slow' -n 4

bench:
	$(PY) bench.py

clean:
	$(MAKE) -C native clean
	rm -f out.png

lines:
	find raymarching_tpu native tests -name '*.py' -o -name '*.cpp' | xargs wc -l | tail -1

.PHONY: all native run test bench clean lines
