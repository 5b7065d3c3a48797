"""CLI entry point (ref: run.py:1-5).

Usage: python run.py --experiment_type=b2p2t_gru+w2v [flags...]
"""

from wav2vec2forbrain_tpu.args.argparsing import get_experiment_from_args

if __name__ == "__main__":
    experiment = get_experiment_from_args()
    experiment.run()
