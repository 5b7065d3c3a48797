import argparse

from wav2vec2forbrain_tpu.args.argparsing import (
    _parser_from_model,
    str_to_bool,
    str_to_list,
)
from wav2vec2forbrain_tpu.args.base_args import BaseExperimentArgsModel


def test_str_to_bool():
    assert str_to_bool("true") is True
    assert str_to_bool("F") is False
    assert str_to_bool("none") is None


def test_str_to_list():
    assert str_to_list("[256]") == [256]
    assert str_to_list('[1, 2, "a"]') == [1, 2, "a"]


def test_base_parser_defaults():
    parser = _parser_from_model(argparse.ArgumentParser(), BaseExperimentArgsModel)
    args = parser.parse_args([])
    assert args.batch_size == 16
    assert args.learning_rate == 0.001
    assert args.optimizer == "adam"
    assert args.seed == 42
    assert args.whiteNoiseSD == 0.0
    assert args.early_stopping_patience is None
    assert args.early_stopping_delta == 0.0001


def test_base_parser_overrides():
    parser = _parser_from_model(argparse.ArgumentParser(), BaseExperimentArgsModel)
    args = parser.parse_args(
        [
            "--batch_size=32",
            "--use_wandb=true",
            "--gradient_clipping=1.0",
            "--experiment_type=b2p2t_gru+w2v_conformer",
        ]
    )
    assert args.batch_size == 32
    assert args.use_wandb is True
    assert args.gradient_clipping == 1.0
    assert args.experiment_type == "b2p2t_gru+w2v_conformer"
    model = BaseExperimentArgsModel(**vars(args))
    assert model.batch_size == 32


def test_experiment_args_models():
    from wav2vec2forbrain_tpu.experiments.gru_w2v import B2TGruAndW2VArgsModel

    parser = _parser_from_model(argparse.ArgumentParser(), B2TGruAndW2VArgsModel)
    args = parser.parse_args(
        [
            "--encoder_fc_hidden_sizes=[256]",
            "--encoder_gru_hidden_size=512",
            "--unfreeze_strategy=brain_encoder+w2v",
            "--w2v_learning_rate=9.5e-06",
            "--w2v_warmup_steps=7",
        ]
    )
    m = B2TGruAndW2VArgsModel(**vars(args))
    assert m.encoder_fc_hidden_sizes == [256]
    assert m.encoder_gru_hidden_size == 512
    assert m.unfreeze_strategy == "brain_encoder+w2v"
    assert m.w2v_learning_rate == 9.5e-06
    assert m.w2v_warmup_steps == 7
    assert m.wav2vec_checkpoint == "facebook/wav2vec2-base-960h"
    assert m.lm_decode_beam_width == 100


def test_help_strings_are_original_prose():
    """Flag names/defaults are the parity surface; help text must be our own.
    No Field description may appear verbatim in any reference source file."""
    import pathlib
    import re

    ref_root = pathlib.Path("/root/reference")
    if not ref_root.exists():
        import pytest

        pytest.skip("reference tree not mounted")
    ref = "".join(
        p.read_text(errors="ignore") for p in ref_root.rglob("*.py")
    )
    for rel in [
        "wav2vec2forbrain_tpu/args/base_args.py",
        "wav2vec2forbrain_tpu/experiments/args_models.py",
    ]:
        src = (pathlib.Path(__file__).parents[1] / rel).read_text()
        for m in re.finditer(r'description=\(?\s*((?:"[^"]*"\s*)+)', src):
            text = "".join(re.findall(r'"([^"]*)"', m.group(1)))
            assert not (len(text) > 12 and text in ref), (rel, text)
