"""Multi-layer bidirectional GRU as a `lax.scan` recurrence (TPU-native).

Replaces the reference's cuDNN `torch.nn.GRU`
(ref: src/model/brain_feature_extractor.py:39-47) with a formulation that
keeps the MXU busy: the input projection for ALL timesteps is one large
batched matmul (B*T, in) @ (in, 3H) done outside the scan; only the small
recurrent matmul (B, H) @ (H, 3H) lives inside the scan body. Bidirectional
= a second scan over the time-reversed sequence (the reference feeds padded
batches without packing, so the backward direction consumes padding as real
input — reproduced exactly).

Gate math and weight layout match torch (gates ordered r, z, n):
    r = sigmoid(gi_r + gh_r)
    z = sigmoid(gi_z + gh_z)
    n = tanh(gi_n + r * gh_n)
    h' = (1 - z) * n + z * h
Kernels are stored transposed relative to torch: w_ih (in, 3H), w_hh (H, 3H).
"""

from typing import Optional

import jax
import jax.numpy as jnp


def init_gru_params(
    rng,
    in_size: int,
    hidden_size: int,
    num_layers: int,
    bidirectional: bool = True,
    bias: bool = True,
    learnable_initial_state: bool = False,
    dtype=jnp.float32,
) -> dict:
    """torch nn.GRU default init: U(-1/sqrt(H), 1/sqrt(H)) for all weights."""
    num_directions = 2 if bidirectional else 1
    bound = 1.0 / jnp.sqrt(hidden_size)
    layers = []
    for layer in range(num_layers):
        layer_in = in_size if layer == 0 else hidden_size * num_directions
        directions = []
        for _ in range(num_directions):
            rng, k1, k2, k3, k4 = jax.random.split(rng, 5)
            d = {
                "w_ih": jax.random.uniform(
                    k1, (layer_in, 3 * hidden_size), dtype, -bound, bound
                ),
                "w_hh": jax.random.uniform(
                    k2, (hidden_size, 3 * hidden_size), dtype, -bound, bound
                ),
            }
            if bias:
                d["b_ih"] = jax.random.uniform(
                    k3, (3 * hidden_size,), dtype, -bound, bound
                )
                d["b_hh"] = jax.random.uniform(
                    k4, (3 * hidden_size,), dtype, -bound, bound
                )
            directions.append(d)
        layers.append({"directions": directions})
    params = {"layers": layers}
    if learnable_initial_state:
        rng, k = jax.random.split(rng)
        # (num_layers * num_directions, H), torch h0 layout:
        # [l0_fwd, l0_bwd, l1_fwd, l1_bwd, ...] (ref: brain_feature_extractor.py:31-37)
        params["hidden_start"] = jax.random.normal(
            k, (num_layers * num_directions, hidden_size), dtype
        )
    return params


def _gru_direction(
    d_params: dict,
    x: jnp.ndarray,
    h0: jnp.ndarray,
    hidden_size: int,
    reverse: bool,
    compute_dtype=None,
) -> jnp.ndarray:
    """One direction of one layer. x: (B, T, in) -> (B, T, H)."""
    if reverse:
        x = jnp.flip(x, axis=1)

    w_ih = d_params["w_ih"]
    w_hh = d_params["w_hh"]
    cd = compute_dtype or x.dtype
    # Input projection for all timesteps at once (MXU-friendly).
    gi = jnp.dot(
        x.astype(cd), w_ih.astype(cd), preferred_element_type=jnp.float32
    )
    if "b_ih" in d_params:
        gi = gi + d_params["b_ih"]
    gi = jnp.swapaxes(gi, 0, 1)  # (T, B, 3H)

    b_hh = d_params.get("b_hh")
    w_hh_c = w_hh.astype(cd)

    def step(h, gi_t):
        gh = jnp.dot(
            h.astype(cd), w_hh_c, preferred_element_type=jnp.float32
        )
        if b_hh is not None:
            gh = gh + b_hh
        gi_r, gi_z, gi_n = jnp.split(gi_t, 3, axis=-1)
        gh_r, gh_z, gh_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(gi_r + gh_r)
        z = jax.nn.sigmoid(gi_z + gh_z)
        n = jnp.tanh(gi_n + r * gh_n)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    _, ys = jax.lax.scan(step, h0, gi)
    ys = jnp.swapaxes(ys, 0, 1)  # (B, T, H)
    if reverse:
        ys = jnp.flip(ys, axis=1)
    return ys


def _bigru_layer_fused(
    dirs: list, x: jnp.ndarray, h0: jnp.ndarray, compute_dtype=None
) -> jnp.ndarray:
    """Both directions of one layer in ONE scan.

    The forward stream and the time-reversed backward stream are stacked on
    a leading direction axis, so each scan step does a single
    (2, B, H) x (2, H, 3H) batched matmul instead of two half-size launches
    in two separate scans. x: (B, T, in); h0: (2, B, H) f32."""
    xs = jnp.stack([x, jnp.flip(x, axis=1)], axis=0)  # (2, B, T, in)
    cd = compute_dtype or x.dtype
    w_ih = jnp.stack([d["w_ih"] for d in dirs]).astype(cd)  # (2, in, 3H)
    w_hh = jnp.stack([d["w_hh"] for d in dirs]).astype(cd)  # (2, H, 3H)
    gi = jnp.einsum(
        "dbti,dik->dbtk", xs.astype(cd), w_ih, preferred_element_type=jnp.float32
    )
    if "b_ih" in dirs[0]:
        b_ih = jnp.stack([d["b_ih"] for d in dirs])  # (2, 3H)
        gi = gi + b_ih[:, None, None, :]
    gi = jnp.moveaxis(gi, 2, 0)  # (T, 2, B, 3H)
    b_hh = None
    if "b_hh" in dirs[0]:
        b_hh = jnp.stack([d["b_hh"] for d in dirs])[:, None, :]  # (2, 1, 3H)

    def step(h, gi_t):
        gh = jnp.einsum(
            "dbh,dhk->dbk", h.astype(cd), w_hh, preferred_element_type=jnp.float32
        )
        if b_hh is not None:
            gh = gh + b_hh
        gi_r, gi_z, gi_n = jnp.split(gi_t, 3, axis=-1)
        gh_r, gh_z, gh_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(gi_r + gh_r)
        z = jax.nn.sigmoid(gi_z + gh_z)
        n = jnp.tanh(gi_n + r * gh_n)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    _, ys = jax.lax.scan(step, h0, gi)  # ys: (T, 2, B, H)
    fwd = jnp.transpose(ys[:, 0], (1, 0, 2))  # (B, T, H)
    bwd = jnp.flip(jnp.transpose(ys[:, 1], (1, 0, 2)), axis=1)
    return jnp.concatenate([fwd, bwd], axis=-1)


def _pallas_gru_vmem_bytes(b: int, h: int) -> int:
    """Peak VMEM of the fused (both-directions-per-step) Pallas GRU backward
    kernel (w + dw blocks resident, double-buffered gi/dgi/hprev/g streams)."""
    h3 = 3 * h
    weights = 2 * h * h3 * 4 * 2          # w_ref + dw_ref, both directions
    streams = (2 * 2 * b * h3 * 4) * 2    # gi_buf + dgi_buf (2 slots each)
    hstreams = (2 * 2 * b * h * 4) * 2    # hprev_buf + g_buf
    carry = 2 * b * h * 4 * 2             # dh_ref + dh0
    return weights + streams + hstreams + carry + (1 << 20)


def _pallas_gru_dir_vmem_bytes(b: int, h: int, cd_bytes: int) -> int:
    """Peak VMEM of the per-direction (grid=(2,)) backward kernel: one
    direction's weight in the compute dtype, double-buffered gi/dgi/r/g/hprev
    streams, NO on-chip dW accumulator (dW/db are one XLA einsum outside)."""
    h3 = 3 * h
    weights = h * h3 * cd_bytes                  # w_ref, one direction
    streams = (2 * b * h3 * 4) * 2               # gi_buf + dgi_buf
    hstreams = (2 * b * h * 4) * 3               # hprev + g + r bufs
    carry = b * h * 4 * 2                        # dh_ref + dh0
    return weights + streams + hstreams + carry + (1 << 20)


def apply_gru(
    params: dict,
    x: jnp.ndarray,
    hidden_size: int,
    num_layers: int,
    bidirectional: bool = True,
    dropout: float = 0.0,
    train: bool = False,
    dropout_rng: Optional[jax.Array] = None,
    use_learnable_initial_state: bool = False,
    compute_dtype=None,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Full stacked (bi)GRU. x: (B, T, in) -> (B, T, H * num_directions).

    Inter-layer dropout (not after the last layer) matches torch nn.GRU.
    use_pallas runs each bidirectional layer's recurrence as one fused
    Pallas kernel (ops/pallas_gru.py) instead of a lax.scan.
    """
    b = x.shape[0]
    num_directions = 2 if bidirectional else 1
    h0_all = None
    if use_learnable_initial_state:
        h0_all = params["hidden_start"]  # (L*D, H)

    out = x
    for layer in range(num_layers):
        dirs = params["layers"][layer]["directions"]
        if num_directions == 2:
            # carry stays float32: gate math accumulates in f32 regardless
            # of the matmul compute dtype
            if h0_all is not None:
                h0 = jnp.broadcast_to(
                    h0_all[
                        layer * num_directions : layer * num_directions + 2,
                        None,
                        :,
                    ],
                    (2, b, hidden_size),
                ).astype(jnp.float32)
            else:
                h0 = jnp.zeros((2, b, hidden_size), jnp.float32)
            # the Pallas recurrence needs lane-aligned gate slices
            # (hidden_size % 128 == 0) and must fit its weight + stream
            # buffers in VMEM. Small hidden sizes use the fused
            # both-directions-per-step kernel; larger ones (the 512/1024
            # sweep configs) the per-direction grid kernel, which keeps only
            # one direction's weight resident and computes dW outside;
            # otherwise fall back to the scan.
            from wav2vec2forbrain_tpu.ops.select import kernel_enabled

            gru_kernel_ok = kernel_enabled("gru", use_pallas)
            cd_bytes = jnp.dtype(compute_dtype or out.dtype).itemsize
            budget = 14 * 2**20
            use_fused = (
                gru_kernel_ok
                and hidden_size % 128 == 0
                and _pallas_gru_vmem_bytes(b, hidden_size) <= budget
            )
            use_dir = (
                gru_kernel_ok
                and not use_fused
                and hidden_size % 128 == 0
                and _pallas_gru_dir_vmem_bytes(b, hidden_size, cd_bytes)
                <= budget
            )
            if use_fused or use_dir:
                from wav2vec2forbrain_tpu.ops.pallas_gru import (
                    bigru_layer_pallas,
                )

                out = bigru_layer_pallas(
                    dirs, out, h0, compute_dtype, per_direction=use_dir
                )
            else:
                out = _bigru_layer_fused(dirs, out, h0, compute_dtype)
        else:
            if h0_all is not None:
                h0 = jnp.broadcast_to(
                    h0_all[layer], (b, hidden_size)
                ).astype(jnp.float32)
            else:
                h0 = jnp.zeros((b, hidden_size), jnp.float32)
            out = _gru_direction(
                dirs[0], out, h0, hidden_size, reverse=False,
                compute_dtype=compute_dtype,
            )
        if train and dropout > 0.0 and layer < num_layers - 1:
            assert dropout_rng is not None, "dropout_rng required in train mode"
            from wav2vec2forbrain_tpu.ops.select import kernel_enabled

            if kernel_enabled("dropout", True, out.dtype):
                from wav2vec2forbrain_tpu.ops.hash_dropout import (
                    dropout_with_rng,
                )

                dropout_rng, out = dropout_with_rng(
                    dropout_rng, out, dropout, train
                )
            else:
                dropout_rng, sub = jax.random.split(dropout_rng)
                keep = jax.random.bernoulli(sub, 1.0 - dropout, out.shape)
                out = jnp.where(keep, out / (1.0 - dropout), 0.0)
    return out
