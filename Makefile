.PHONY: test native bench lint

test:
	python -m pytest tests/ -q

native:
	cd onebit_tpu/tools/decontam && python setup.py build_ext --inplace

bench:
	python bench.py

lint:
	python -m compileall -q onebit_tpu tests bench.py __graft_entry__.py
