"""Pallas TPU kernel for the bidirectional GRU recurrence.

The lax.scan GRU spends ~40us/timestep in per-iteration overhead (tiny
(2,B,H)x(2,H,3H) matmuls, 89-167 steps); this kernel runs the WHOLE
recurrence of one layer (both directions stacked) inside a single Pallas
program, with the recurrent weights VMEM-resident and the per-timestep
input projections (gi, precomputed as one big MXU matmul outside) streamed
from HBM with double-buffered DMA.

Custom VJP: the backward kernel runs classic BPTT in reverse inside one
program, emitting per-timestep dgi (streamed back to HBM) plus the
accumulated dW_hh / db_hh / dh0; the dx / dW_ih / db_ih grads then fall out
of XLA's autodiff of the outside gi matmul.

Gate math matches torch (r, z, n ordering; see models/gru.py):
    r = sig(gi_r + gh_r); z = sig(gi_z + gh_z); n = tanh(gi_n + r*gh_n)
    h' = (1-z)*n + z*h
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _gates(gi_t, gh, h):
    gi_r, gi_z, gi_n = jnp.split(gi_t, 3, axis=-1)
    gh_r, gh_z, gh_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(gi_r + gh_r)
    z = jax.nn.sigmoid(gi_z + gh_z)
    n = jnp.tanh(gi_n + r * gh_n)
    h_new = (1.0 - z) * n + z * h
    return r, z, n, gh_n, h_new


def _mm(a, b, compute_dtype):
    """2-D matmul (Mosaic-friendly; batched dot_general crashes the TPU
    compiler here)."""
    return jax.lax.dot_general(
        a.astype(compute_dtype),
        b,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _fwd_kernel(gi_hbm, w_ref, b_ref, h0_ref, ys_hbm, *, t_len, compute_dtype):
    """gi_hbm: (T, 2, B, 3H) f32 in HBM; ys_hbm: (T, 2, B, H) f32 out."""

    def body(gi_buf, ys_buf, h_ref, in_sems, out_sems):
        w = w_ref[...].astype(compute_dtype)
        bias = b_ref[...]

        def in_dma(slot, t):
            return pltpu.make_async_copy(
                gi_hbm.at[t], gi_buf.at[slot], in_sems.at[slot]
            )

        def out_dma(slot, t):
            return pltpu.make_async_copy(
                ys_buf.at[slot], ys_hbm.at[t], out_sems.at[slot]
            )

        in_dma(0, 0).start()
        h_ref[...] = h0_ref[...]

        def step(t, _):
            slot = t % 2
            nxt = (t + 1) % 2

            @pl.when(t + 1 < t_len)
            def _():
                in_dma(nxt, t + 1).start()

            in_dma(slot, t).wait()
            for di in range(2):  # static unroll over directions, 2-D matmuls
                gi_t = gi_buf[slot, di]
                h = h_ref[di]
                gh = _mm(h, w[di], compute_dtype) + bias[di]
                _r, _z, _n, _ghn, h_new = _gates(gi_t, gh, h)
                h_ref[di] = h_new

            # wait for the previous write of this slot before reuse
            @pl.when(t >= 2)
            def _():
                out_dma(slot, t - 2).wait()

            ys_buf[slot] = h_ref[...]
            out_dma(slot, t).start()
            return 0

        jax.lax.fori_loop(0, t_len, step, 0)
        # drain trailing output DMAs
        @pl.when(t_len >= 2)
        def _():
            out_dma(t_len % 2, t_len - 2).wait()
        out_dma((t_len - 1) % 2, t_len - 1).wait()

    d, b_sz, h3 = gi_hbm.shape[1], gi_hbm.shape[2], gi_hbm.shape[3]
    h_sz = h3 // 3
    pl.run_scoped(
        body,
        gi_buf=pltpu.VMEM((2, d, b_sz, h3), jnp.float32),
        ys_buf=pltpu.VMEM((2, d, b_sz, h_sz), jnp.float32),
        h_ref=pltpu.VMEM((d, b_sz, h_sz), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2,)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


def _bwd_kernel(
    gi_hbm, w_ref, b_ref, h0_ref, ys_hbm, g_hbm,
    dgi_hbm, dw_ref, db_ref, dh0_ref,
    *, t_len, compute_dtype,
):
    """Reverse-time BPTT. g_hbm: (T, 2, B, H) upstream grads on ys."""

    def body(gi_buf, hprev_buf, g_buf, dgi_buf, dh_ref, in_sems, hp_sems, g_sems, out_sems):
        w = w_ref[...].astype(compute_dtype)
        bias = b_ref[...]
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dh_ref[...] = jnp.zeros_like(dh_ref)

        def gi_dma(slot, t):
            return pltpu.make_async_copy(gi_hbm.at[t], gi_buf.at[slot], in_sems.at[slot])

        def hp_dma(slot, t):
            # h_{t-1}: ys[t-1] for t>0 (t==0 handled from h0_ref)
            return pltpu.make_async_copy(ys_hbm.at[t - 1], hprev_buf.at[slot], hp_sems.at[slot])

        def g_dma(slot, t):
            return pltpu.make_async_copy(g_hbm.at[t], g_buf.at[slot], g_sems.at[slot])

        def dgi_dma(slot, t):
            return pltpu.make_async_copy(dgi_buf.at[slot], dgi_hbm.at[t], out_sems.at[slot])

        t0 = t_len - 1
        gi_dma(t0 % 2, t0).start()
        g_dma(t0 % 2, t0).start()

        @pl.when(t0 > 0)
        def _():
            hp_dma(t0 % 2, t0).start()

        def step(i, _):
            t = t_len - 1 - i
            slot = t % 2
            nxt = (t - 1) % 2

            @pl.when(t - 1 >= 0)
            def _():
                gi_dma(nxt, t - 1).start()
                g_dma(nxt, t - 1).start()

            @pl.when(t - 1 >= 1)
            def _():
                hp_dma(nxt, t - 1).start()

            gi_dma(slot, t).wait()
            g_dma(slot, t).wait()

            def read_hprev():
                hp_dma(slot, t).wait()
                return hprev_buf[slot]

            hprev_all = jax.lax.cond(t == 0, lambda: h0_ref[...], read_hprev)

            @pl.when(i >= 2)
            def _():
                dgi_dma(slot, t + 2).wait()

            for di in range(2):  # static unroll, 2-D matmuls only
                hprev = hprev_all[di]
                gi_t = gi_buf[slot, di]
                gh = _mm(hprev, w[di], compute_dtype) + bias[di]
                r, z, n, gh_n, _h_new = _gates(gi_t, gh, hprev)

                dh = dh_ref[di] + g_buf[slot, di]
                dn = dh * (1.0 - z)
                dz = dh * (hprev - n)
                dgn = dn * (1.0 - n * n)
                dr = dgn * gh_n
                dghn = dgn * r
                dgz = dz * z * (1.0 - z)
                dgr = dr * r * (1.0 - r)
                dgi = jnp.concatenate([dgr, dgz, dgn], axis=-1)
                dgh = jnp.concatenate([dgr, dgz, dghn], axis=-1)

                # dh_{t-1} = dh*z + dgh @ w^T
                dh_ref[di] = dh * z + _mm(
                    dgh, jnp.swapaxes(w[di], 0, 1), compute_dtype
                )
                # dw_hh += hprev^T @ dgh
                dw_ref[di] = dw_ref[di] + _mm(
                    jnp.swapaxes(hprev, 0, 1),
                    dgh.astype(compute_dtype),
                    compute_dtype,
                )
                db_ref[di] = db_ref[di] + jnp.sum(dgh, axis=0, keepdims=True)
                dgi_buf[slot, di] = dgi

            dgi_dma(slot, t).start()
            return 0

        jax.lax.fori_loop(0, t_len, step, 0)
        dh0_ref[...] = dh_ref[...]
        # drain: the last two reverse iterations wrote t=1 (slot 1) and
        # t=0 (slot 0)
        @pl.when(t_len >= 2)
        def _():
            dgi_dma(1, 1).wait()
        dgi_dma(0, 0).wait()

    d, b_sz, h3 = gi_hbm.shape[1], gi_hbm.shape[2], gi_hbm.shape[3]
    h_sz = h3 // 3
    pl.run_scoped(
        body,
        gi_buf=pltpu.VMEM((2, d, b_sz, h3), jnp.float32),
        hprev_buf=pltpu.VMEM((2, d, b_sz, h_sz), jnp.float32),
        g_buf=pltpu.VMEM((2, d, b_sz, h_sz), jnp.float32),
        dgi_buf=pltpu.VMEM((2, d, b_sz, h3), jnp.float32),
        dh_ref=pltpu.VMEM((d, b_sz, h_sz), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2,)),
        hp_sems=pltpu.SemaphoreType.DMA((2,)),
        g_sems=pltpu.SemaphoreType.DMA((2,)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def gru_recurrence(gi, w_hh, b_hh, h0, compute_dtype=jnp.float32):
    """gi: (T, 2, B, 3H) f32; w_hh: (2, H, 3H); b_hh: (2, 1, 3H);
    h0: (2, B, H) f32 -> ys (T, 2, B, H) f32."""
    return _fwd_impl(gi, w_hh, b_hh, h0, compute_dtype)


def _fwd_impl(gi, w_hh, b_hh, h0, compute_dtype):
    t_len = gi.shape[0]
    kern = functools.partial(
        _fwd_kernel, t_len=t_len, compute_dtype=compute_dtype
    )
    return pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # gi stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_hh
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b_hh
            pl.BlockSpec(memory_space=pltpu.VMEM),  # h0
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(
            (t_len, gi.shape[1], gi.shape[2], gi.shape[3] // 3), jnp.float32
        ),
        interpret=_interpret(),
    )(gi.astype(jnp.float32), w_hh, b_hh.reshape(b_hh.shape[0], 1, -1), h0)


def _vjp_fwd(gi, w_hh, b_hh, h0, compute_dtype):
    ys = _fwd_impl(gi, w_hh, b_hh, h0, compute_dtype)
    return ys, (gi, w_hh, b_hh, h0, ys)


def _vjp_bwd(compute_dtype, residuals, g):
    gi, w_hh, b_hh, h0, ys = residuals
    t_len = gi.shape[0]
    d, b_sz, h3 = gi.shape[1], gi.shape[2], gi.shape[3]
    h_sz = h3 // 3
    kern = functools.partial(
        _bwd_kernel, t_len=t_len, compute_dtype=compute_dtype
    )
    dgi, dw, db, dh0 = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # gi
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_hh
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b_hh
            pl.BlockSpec(memory_space=pltpu.VMEM),  # h0
            pl.BlockSpec(memory_space=pl.ANY),   # ys
            pl.BlockSpec(memory_space=pl.ANY),   # g
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # dgi
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dw
            pl.BlockSpec(memory_space=pltpu.VMEM),  # db
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dh0
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_len, d, b_sz, h3), jnp.float32),
            jax.ShapeDtypeStruct((d, h_sz, h3), jnp.float32),
            jax.ShapeDtypeStruct((d, 1, h3), jnp.float32),
            jax.ShapeDtypeStruct((d, b_sz, h_sz), jnp.float32),
        ],
        interpret=_interpret(),
    )(
        gi.astype(jnp.float32),
        w_hh,
        b_hh.reshape(b_hh.shape[0], 1, -1),
        h0,
        ys,
        g.astype(jnp.float32),
    )
    return dgi, dw, db.reshape(b_hh.shape), dh0


gru_recurrence.defvjp(_vjp_fwd, _vjp_bwd)


def bigru_layer_pallas(
    dirs: list, x: jnp.ndarray, h0: jnp.ndarray, compute_dtype=None
) -> jnp.ndarray:
    """Drop-in for models.gru._bigru_layer_fused using the Pallas recurrence.

    x: (B, T, in); h0: (2, B, H) f32 -> (B, T, 2H)."""
    cd = compute_dtype or x.dtype
    xs = jnp.stack([x, jnp.flip(x, axis=1)], axis=0)  # (2, B, T, in)
    w_ih = jnp.stack([d["w_ih"] for d in dirs]).astype(cd)
    gi = jnp.einsum(
        "dbti,dik->dbtk", xs.astype(cd), w_ih, preferred_element_type=jnp.float32
    )
    if "b_ih" in dirs[0]:
        gi = gi + jnp.stack([d["b_ih"] for d in dirs])[:, None, None, :]
    gi = jnp.moveaxis(gi, 2, 0)  # (T, 2, B, 3H)
    w_hh = jnp.stack([d["w_hh"] for d in dirs])
    if "b_hh" in dirs[0]:
        b_hh = jnp.stack([d["b_hh"] for d in dirs])[:, None, :]
    else:
        b_hh = jnp.zeros((2, 1, w_hh.shape[-1]), jnp.float32)
    ys = gru_recurrence(gi, w_hh, b_hh, h0, cd)  # (T, 2, B, H)
    fwd = jnp.transpose(ys[:, 0], (1, 0, 2))
    bwd = jnp.flip(jnp.transpose(ys[:, 1], (1, 0, 2)), axis=1)
    return jnp.concatenate([fwd, bwd], axis=-1)
