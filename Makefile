# Common entry points (see README.md for details)

.PHONY: test bench smoke dryrun sweep-dry

test:
	python -m pytest tests/ -q

bench:
	python bench.py

# tiny CLI training on synthetic data (CPU) — the verify-skill recipe
smoke:
	python -c "from wav2vec2forbrain_tpu.data.synthetic import make_synthetic_splits_dir; make_synthetic_splits_dir('/tmp/w2b_smoke/t12', n_trials=4, n_blocks=2, seed=1)"
	@test -f config.yaml || (echo "run once to bootstrap config.yaml, then edit it" && JAX_PLATFORMS=cpu python run.py --experiment_type=b2p2t_gru+w2v || true)
	JAX_PLATFORMS=cpu python run.py --experiment_type=b2p2t_gru+w2v \
	  --epochs=2 --batch_size=2 --limit_samples=4 --w2v_skip_loading_weights=true \
	  --encoder_gru_hidden_size=64 --encoder_num_gru_layers=1

# multi-chip sharding dry run on 8 virtual CPU devices
dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	  python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

sweep-dry:
	python sweep.py sweeps/b2p2t_gru+w2v_full_fine_tuning.yaml --dry_run --max_runs 3

# ARPA text LM -> kenlm probing binary (mmap'd O(1) load in the decoder)
# usage: make lm-binary ARPA=path/to/lm.arpa BIN=path/to/lm.bin
lm-binary:
	python tools/arpa_to_kenlm_binary.py $(ARPA) $(BIN)
