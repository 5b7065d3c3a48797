"""Activation registry (JAX analogue of transformers.activations.ACT2FN,
used by the FC builder; ref: src/util/nn_helper.py:9-49)."""

import jax
import jax.numpy as jnp


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def _gelu_10(x):
    return jnp.clip(_gelu_tanh(x), -10.0, 10.0)


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _laplace(x, mu=0.707107, sigma=0.282095):
    return 0.5 * (1.0 + jax.lax.erf((x - mu) / (sigma * jnp.sqrt(2.0))))


def _relu2(x):
    return jnp.square(jax.nn.relu(x))


ACT2FN = {
    "gelu": _gelu,
    "gelu_10": _gelu_10,
    "gelu_fast": _gelu_tanh,
    "gelu_new": _gelu_tanh,
    "gelu_python": _gelu,
    "gelu_pytorch_tanh": _gelu_tanh,
    "gelu_accurate": _gelu_tanh,
    "laplace": _laplace,
    "linear": lambda x: x,
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    "quick_gelu": _quick_gelu,
    "relu": jax.nn.relu,
    "relu2": _relu2,
    "relu6": lambda x: jnp.clip(x, 0.0, 6.0),
    "sigmoid": jax.nn.sigmoid,
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "tanh": jnp.tanh,
}
