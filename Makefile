.PHONY: test test-fast smoke bench dryrun golden native clean quality quality-multi quality-u7 quality-m1 parity

# Trained-quality artifact: train through the real driver to early stop,
# score with in-repo BSS-Eval v4, write docs/quality_synth.json.
quality:
	python tools/quality.py

# Same, for the 4-source multi_instrument task (M6): writes
# docs/quality_synth_multi.json.
quality-multi:
	python tools/quality.py --preset full_multi_instrument

# Same, for the U7 spectrogram family: writes
# docs/quality_synth_unet_spectrogram.json.
quality-u7:
	python tools/quality.py --preset unet_spectrogram

# Same, for the non-context M1 baseline family (same-padding, mono,
# direct/tanh output — `/root/reference/Config.py:52-54`): writes
# docs/quality_synth_baseline.json. Reduced scale: the family's value is
# covering the same-padding/direct-output code paths with a driver-level
# trained artifact, not another production soak.
quality-m1:
	python tools/quality.py --preset baseline --train-songs 8 --seconds 45 \
	  --epoch-it 300

# Zoo-parity run (needs real MUSDB18 + the reference's pretrained zoo):
#   make parity MUSDB=/path/to/musdb18 [ZOO=/path/to/checkpoints]
ZOO ?= checkpoints
parity:
	python tools/parity.py --musdb "$(MUSDB)" --zoo "$(ZOO)"

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -k "not full_stack and not integration and not compat"

# Fast end-to-end confidence: the multi-chip dry run, the two product
# runbook smokes (make-quality and make-parity pipelines at toy scale), and
# the bench machinery on CPU (schema + all phases, tiny models).
smoke:
	python __graft_entry__.py
	python -m pytest tests/test_quality_tool.py tests/test_parity_tool.py \
	  tests/test_bench_smoke.py -q

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
