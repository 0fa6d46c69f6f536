.PHONY: test test-all native bench lint

# default selection: excludes @pytest.mark.slow (multi-process launches,
# e2e pipeline, beam search) — <8 min on 4 CPUs.  test-all is the full
# suite the driver runs.
test:
	python -m pytest tests/ -q -n 4 -m "not slow"

test-all:
	python -m pytest tests/ -q -n 4

native:
	cd onebit_tpu/tools/decontam && python setup.py build_ext --inplace

bench:
	python bench.py

lint:
	python -m compileall -q onebit_tpu tests bench.py __graft_entry__.py
