.PHONY: test test-fast bench dryrun golden native clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -k "not full_stack and not integration and not compat"

bench:
	python bench.py

dryrun:
	python __graft_entry__.py

golden:
	python tests/golden/gen_waveunet_tf.py
	python tests/golden/gen_spectro_tf.py

native:
	g++ -O3 -march=native -shared -fPIC -std=c++17 \
	    waveunet_tpu/runtime/host_ops.cc \
	    -o waveunet_tpu/runtime/libwaveunet_host.so

clean:
	rm -rf .pytest_cache waveunet_tpu/runtime/libwaveunet_host.so
	find . -name __pycache__ -type d -exec rm -rf {} +
