"""Two-stage pydantic-driven argparse CLI.

Stage 1 parses the base args to learn `experiment_type`, stage 2 builds the
full parser from that experiment's args model (ref: src/args/argparsing.py:
40-88). Rewritten for pydantic v2 introspection.
"""

import argparse
import json
import typing
from typing import Any, Literal, Optional, Type, Union

from pydantic import BaseModel
from pydantic_core import PydanticUndefined

from wav2vec2forbrain_tpu.args.base_args import BaseExperimentArgsModel
from wav2vec2forbrain_tpu.args.yaml_config import YamlConfig


def str_to_bool(value: str):
    if value.lower() in ["true", "t"]:
        return True
    elif value.lower() in ["false", "f"]:
        return False
    elif value.lower() in ["none", "n"]:
        return None
    else:
        raise argparse.ArgumentTypeError("Invalid boolean value: {}".format(value))


def str_to_list(value: str):
    parsed = json.loads(value)
    if not isinstance(parsed, list):
        raise argparse.ArgumentTypeError("Invalid list value: {}".format(value))
    return parsed


def _unwrap_optional(annotation: Any) -> Any:
    """Optional[X] -> X (leaves other annotations untouched)."""
    origin = typing.get_origin(annotation)
    if origin is Union or (origin is not None and str(origin) == "types.UnionType"):
        args = [a for a in typing.get_args(annotation) if a is not type(None)]
        if len(args) == 1:
            return args[0]
    return annotation


def _type_args_for(annotation: Any) -> dict:
    annotation = _unwrap_optional(annotation)
    origin = typing.get_origin(annotation)
    if origin is Literal:
        return {"type": str, "choices": typing.get_args(annotation)}
    if annotation is bool:
        return {"type": str_to_bool}
    if origin is list or annotation is list:
        return {"type": str_to_list}
    if annotation in (int, float, str):
        return {"type": annotation}
    # Fall back to string; pydantic will coerce on model validation.
    return {"type": str}


def _parser_from_model(
    parser: argparse.ArgumentParser, model: Type[BaseModel]
) -> argparse.ArgumentParser:
    """Add a pydantic model's fields as CLI flags."""
    for name, field in model.model_fields.items():
        default = field.default
        if default is PydanticUndefined:
            default = None
        parser.add_argument(
            f"--{name}",
            dest=name,
            default=default,
            help=field.description,
            **_type_args_for(field.annotation),
        )
    return parser


def _get_experiments():
    # Imported lazily: experiment modules pull in jax.
    from wav2vec2forbrain_tpu.experiments.registry import experiments

    return experiments


def _create_arg_parser() -> argparse.ArgumentParser:
    base_parser = argparse.ArgumentParser(add_help=False)
    base_parser = _parser_from_model(base_parser, BaseExperimentArgsModel)
    base_args, _ = base_parser.parse_known_args()

    experiments = _get_experiments()
    if base_args.experiment_type not in experiments:
        raise KeyError(
            f"Unknown experiment_type {base_args.experiment_type!r}. "
            f"Registered: {sorted(experiments.keys())}"
        )
    experiment_model = experiments[base_args.experiment_type].get_args_model()
    parser = argparse.ArgumentParser(
        description="Machine Learning Experiment Configuration"
    )
    parser = _parser_from_model(parser, experiment_model)
    return parser


def get_experiment_from_args(argv: Optional[list] = None):
    arg_parser = _create_arg_parser()
    args = arg_parser.parse_args(argv)
    yaml_config = YamlConfig()

    experiments = _get_experiments()
    experiment = experiments[args.experiment_type](vars(args), yaml_config.config)
    return experiment
