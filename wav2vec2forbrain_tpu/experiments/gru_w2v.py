"""b2p2t_gru+w2v experiment (ref: src/experiments/b2t_gru_w2v_experiment.py)."""

from wav2vec2forbrain_tpu.experiments.args_models import B2TGruAndW2VArgsModel

__all__ = ["B2TGruAndW2VArgsModel", "B2TGruAndW2VExperiment"]


def __getattr__(name):
    # Experiment class is defined with the training stack; import lazily so
    # the args models stay importable without jax.
    if name == "B2TGruAndW2VExperiment":
        from wav2vec2forbrain_tpu.experiments.impl import B2TGruAndW2VExperiment

        return B2TGruAndW2VExperiment
    raise AttributeError(name)
