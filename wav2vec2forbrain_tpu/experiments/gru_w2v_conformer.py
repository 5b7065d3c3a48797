"""b2p2t_gru+w2v_conformer experiment
(ref: src/experiments/b2t_gru_w2v_conformer_experiment.py)."""

from wav2vec2forbrain_tpu.experiments.args_models import (
    B2TGruAndW2VConformerArgsModel,
)

__all__ = ["B2TGruAndW2VConformerArgsModel", "B2TGruAndW2VConformerExperiment"]


def __getattr__(name):
    if name == "B2TGruAndW2VConformerExperiment":
        from wav2vec2forbrain_tpu.experiments.impl import (
            B2TGruAndW2VConformerExperiment,
        )

        return B2TGruAndW2VConformerExperiment
    raise AttributeError(name)
