"""Fully-connected stack builder (functional).

Equivalent of the reference MLP builder (ref: src/util/nn_helper.py:31-49):
Linear(+activation) chain with configurable hidden sizes. Kernels stored
(in, out) — JAX convention; torch weights transpose on conversion.
"""

from typing import List, Sequence

import jax
import jax.numpy as jnp

from wav2vec2forbrain_tpu.models.activations import ACT2FN


def init_linear(rng, in_size: int, out_size: int, dtype=jnp.float32) -> dict:
    """torch nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in)) for both
    kernel and bias."""
    k1, k2 = jax.random.split(rng)
    bound = 1.0 / jnp.sqrt(in_size)
    return {
        "kernel": jax.random.uniform(
            k1, (in_size, out_size), dtype, minval=-bound, maxval=bound
        ),
        "bias": jax.random.uniform(
            k2, (out_size,), dtype, minval=-bound, maxval=bound
        ),
    }


def apply_linear(
    params: dict, x: jnp.ndarray, compute_dtype=None, out_dtype=None
) -> jnp.ndarray:
    """Matmul in compute_dtype, f32 accumulate + bias add, then emit in
    out_dtype (default f32). A bf16 out_dtype halves the HBM traffic of the
    activation stream; XLA fuses the downcast into the matmul epilogue."""
    kernel = params["kernel"]
    bias = params["bias"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
    y = jnp.dot(x, kernel, preferred_element_type=jnp.float32)
    y = y.astype(jnp.float32) + bias
    return y if out_dtype is None else y.astype(out_dtype)


def init_fc(
    rng,
    input_size: int,
    output_size: int,
    hidden_sizes: Sequence[int] = (),
    dtype=jnp.float32,
) -> dict:
    sizes = [input_size] + list(hidden_sizes) + [output_size]
    layers: List[dict] = []
    for i in range(len(sizes) - 1):
        rng, sub = jax.random.split(rng)
        layers.append(init_linear(sub, sizes[i], sizes[i + 1], dtype))
    return {"layers": layers}


def apply_fc(
    params: dict,
    x: jnp.ndarray,
    activation: str = "gelu",
    compute_dtype=None,
) -> jnp.ndarray:
    act = ACT2FN[activation]
    n = len(params["layers"])
    for i, layer in enumerate(params["layers"]):
        x = apply_linear(layer, x, compute_dtype)
        if i < n - 1:
            x = act(x)
    return x
