# Developer entry points (the reference's justfile analog)

.PHONY: test test-tpu bench suite examples native clean

test:            ## full test suite (virtual 8-device CPU mesh)
	python -m pytest tests/ -q

bench:           ## headline benchmark on the current device (JSON line)
	python bench.py

suite:           ## criterion-parity workload suite
	python benchmarks/suite.py sines_const wrappers galactic fm_bank fm_cascade_model

examples:        ## render every example offline
	cd examples && for e in simple_sine many_sines buffer_player visualize_graph live_edit wavetable_orchestra mesh_voice_cluster; do \
		python $$e.py || exit 1; done

native:          ## build the C++ realtime support library
	$(MAKE) -C native

clean:
	$(MAKE) -C native clean
	rm -f *.wav examples/*.wav graph.svg
