"""Experiment registry (ref: src/args/argparsing.py:14-17).

Only the two live experiment types of the reference are registered; every
other `experiment_type` Literal value fails with KeyError at dispatch,
matching the reference behaviour.
"""


class _LazyRegistry(dict):
    def __missing__(self, key):
        raise KeyError(key)


def _gru_w2v():
    from wav2vec2forbrain_tpu.experiments.impl import B2TGruAndW2VExperiment

    return B2TGruAndW2VExperiment


def _gru_w2v_conformer():
    from wav2vec2forbrain_tpu.experiments.impl import B2TGruAndW2VConformerExperiment

    return B2TGruAndW2VConformerExperiment


class _Lazy:
    """Defers the heavy (jax) import until the experiment is actually used."""

    def __init__(self, loader):
        self._loader = loader
        self._cls = None

    def _resolve(self):
        if self._cls is None:
            self._cls = self._loader()
        return self._cls

    def get_args_model(self):
        return self._resolve().get_args_model()

    def __call__(self, *args, **kwargs):
        return self._resolve()(*args, **kwargs)


experiments = _LazyRegistry(
    {
        "b2p2t_gru+w2v": _Lazy(_gru_w2v),
        "b2p2t_gru+w2v_conformer": _Lazy(_gru_w2v_conformer),
    }
)
