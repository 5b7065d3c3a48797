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
    return _fwd_partitioned(compute_dtype)(gi, w_hh, b_hh, h0)


# The recurrence is batch-parallel (weights replicated, batch on gi dim 2 /
# h0 dim 1); declare that to GSPMD/Shardy so dp-sharded batches run the
# kernel shard-local instead of being all-gathered around the opaque custom
# call. Weight grads are batch-summed inside the kernel, so the partitioned
# backward psums them over the batch mesh axes.
@functools.lru_cache(maxsize=None)
def _fwd_partitioned(compute_dtype):
    from wav2vec2forbrain_tpu.parallel.kernel_partition import (
        partition_kernel,
    )

    def impl(gi, w_hh, b_hh, h0):
        return _fwd_impl(gi, w_hh, b_hh, h0, compute_dtype)

    return partition_kernel(
        impl,
        arg_factors=[{0: 2}, None, None, {0: 1}],
        arg_ndims=(4, 3, 3, 3),
        out_factors=[{0: 2}],
        out_ndims=(4,),
    )


@functools.lru_cache(maxsize=None)
def _bwd_partitioned(compute_dtype):
    from wav2vec2forbrain_tpu.parallel.kernel_partition import (
        partition_kernel,
    )

    def impl(gi, w_hh, b_hh, h0, ys, g):
        return _bwd_impl(gi, w_hh, b_hh, h0, ys, g, compute_dtype)

    return partition_kernel(
        impl,
        arg_factors=[{0: 2}, None, None, {0: 1}, {0: 2}, {0: 2}],
        arg_ndims=(4, 3, 3, 3, 4, 4),
        out_factors=[{0: 2}, None, None, {0: 1}],
        out_ndims=(4, 3, 3, 3),
        reduce_outputs=(1, 2),
    )


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
    # route through the PARTITIONED wrapper: on real hardware the raw impl
    # is an opaque custom call that GSPMD would all-gather (interpret-mode
    # CPU tests can't catch this — there the kernel lowers to plain XLA ops)
    ys = _fwd_partitioned(compute_dtype)(gi, w_hh, b_hh, h0)
    return ys, (gi, w_hh, b_hh, h0, ys)


def _vjp_bwd(compute_dtype, residuals, g):
    gi, w_hh, b_hh, h0, ys = residuals
    dgi, dw, db, dh0 = _bwd_partitioned(compute_dtype)(
        gi, w_hh, b_hh, h0, ys, g
    )
    return dgi, dw, db.reshape(b_hh.shape), dh0


def _bwd_impl(gi, w_hh, b_hh, h0, ys, g, compute_dtype):
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
    return dgi, dw, db, dh0


gru_recurrence.defvjp(_vjp_fwd, _vjp_bwd)


# --------------------------------------------------------------------------
# Per-direction variant for LARGE hidden sizes (512/1024 sweep configs).
#
# The fused kernel keeps BOTH directions' weights + a direction-batched
# stream set resident, which blows past VMEM for hidden >= 512. This variant
# processes the directions sequentially inside ONE program: the recurrent
# weights live in HBM (compute dtype) and each direction's matrix is DMA'd
# into a single VMEM scratch slab before its time loop, so only one
# direction's weight is resident at a time. The backward kernel does NOT
# accumulate dW/db on-chip either: it streams out dgi and the reset gate r
# per timestep, and dW_hh/db_hh fall out of one big XLA einsum outside
# (dgh = dgi with the n-gate column scaled by r). A grid=(2,) formulation
# was rejected: XLA pins unblocked pallas outputs of gridded kernels into
# scoped VMEM, which OOMs at (T, 2, B, 1024) f32.


def _fwd_kernel_dir(gi_hbm, w_hbm, b_ref, h0_ref, ys_hbm, *, t_len, compute_dtype):
    """gi_hbm (T,2,B,3H) f32 HBM; w_hbm (2,H,3H) compute-dtype HBM;
    b_ref (2,1,3H) VMEM; h0_ref (2,B,H) VMEM; ys_hbm (T,2,B,H) f32 out."""

    def body(w_buf, gi_buf, ys_buf, h_ref, w_sem, in_sems, out_sems):
        for d in range(2):  # sequential directions, one weight resident
            w_dma = pltpu.make_async_copy(w_hbm.at[d], w_buf, w_sem)
            w_dma.start()

            def in_dma(slot, t, d=d):
                return pltpu.make_async_copy(
                    gi_hbm.at[t, d], gi_buf.at[slot], in_sems.at[slot]
                )

            def out_dma(slot, t, d=d):
                return pltpu.make_async_copy(
                    ys_buf.at[slot], ys_hbm.at[t, d], out_sems.at[slot]
                )

            in_dma(0, 0).start()
            h_ref[...] = h0_ref[d]
            w_dma.wait()
            bias = b_ref[d]

            def step(t, _, in_dma=in_dma, out_dma=out_dma, bias=bias):
                slot = t % 2
                nxt = (t + 1) % 2

                @pl.when(t + 1 < t_len)
                def _():
                    in_dma(nxt, t + 1).start()

                in_dma(slot, t).wait()
                gh = _mm(h_ref[...], w_buf[...], compute_dtype) + bias
                _r, _z, _n, _ghn, h_new = _gates(gi_buf[slot], gh, h_ref[...])
                h_ref[...] = h_new

                @pl.when(t >= 2)
                def _():
                    out_dma(slot, t - 2).wait()

                ys_buf[slot] = h_new
                out_dma(slot, t).start()
                return 0

            jax.lax.fori_loop(0, t_len, step, 0)

            @pl.when(t_len >= 2)
            def _():
                out_dma(t_len % 2, t_len - 2).wait()

            out_dma((t_len - 1) % 2, t_len - 1).wait()

    b_sz, h3 = gi_hbm.shape[2], gi_hbm.shape[3]
    h_sz = h3 // 3
    pl.run_scoped(
        body,
        w_buf=pltpu.VMEM((h_sz, h3), w_hbm.dtype),
        gi_buf=pltpu.VMEM((2, b_sz, h3), jnp.float32),
        ys_buf=pltpu.VMEM((2, b_sz, h_sz), jnp.float32),
        h_ref=pltpu.VMEM((b_sz, h_sz), jnp.float32),
        w_sem=pltpu.SemaphoreType.DMA(()),
        in_sems=pltpu.SemaphoreType.DMA((2,)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


def _bwd_kernel_dir(
    gi_hbm, w_hbm, b_ref, h0_ref, ys_hbm, g_hbm,
    dgi_hbm, r_hbm, dh0_ref,
    *, t_len, compute_dtype,
):
    """Reverse-time BPTT, directions sequential in one program.

    Emits per-timestep dgi AND the reset gate r (so dgh — and from it dW_hh,
    db_hh — can be reconstructed outside without keeping a (H, 3H) f32
    accumulator in VMEM). dh_{t-1} = dh*z + dgh @ W^T is computed via
    dot_general contracting the 3H axes, so W is never transposed on-chip."""

    def body(w_buf, gi_buf, hprev_buf, g_buf, dgi_buf, r_buf, dh_ref,
             w_sem, in_sems, hp_sems, g_sems, out_sems, r_sems):
        for d in range(2):
            w_dma = pltpu.make_async_copy(w_hbm.at[d], w_buf, w_sem)
            w_dma.start()

            def gi_dma(slot, t, d=d):
                return pltpu.make_async_copy(
                    gi_hbm.at[t, d], gi_buf.at[slot], in_sems.at[slot]
                )

            def hp_dma(slot, t, d=d):
                return pltpu.make_async_copy(
                    ys_hbm.at[t - 1, d], hprev_buf.at[slot], hp_sems.at[slot]
                )

            def g_dma(slot, t, d=d):
                return pltpu.make_async_copy(
                    g_hbm.at[t, d], g_buf.at[slot], g_sems.at[slot]
                )

            def dgi_dma(slot, t, d=d):
                return pltpu.make_async_copy(
                    dgi_buf.at[slot], dgi_hbm.at[t, d], out_sems.at[slot]
                )

            def r_dma(slot, t, d=d):
                return pltpu.make_async_copy(
                    r_buf.at[slot], r_hbm.at[t, d], r_sems.at[slot]
                )

            t0 = t_len - 1
            gi_dma(t0 % 2, t0).start()
            g_dma(t0 % 2, t0).start()

            @pl.when(t0 > 0)
            def _():
                hp_dma(t0 % 2, t0).start()

            dh_ref[...] = jnp.zeros_like(dh_ref)
            w_dma.wait()
            bias = b_ref[d]

            def step(i, _, gi_dma=gi_dma, hp_dma=hp_dma, g_dma=g_dma,
                     dgi_dma=dgi_dma, r_dma=r_dma, bias=bias, d=d):
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

                hprev = jax.lax.cond(t == 0, lambda: h0_ref[d], read_hprev)

                @pl.when(i >= 2)
                def _():
                    dgi_dma(slot, t + 2).wait()
                    r_dma(slot, t + 2).wait()

                gi_t = gi_buf[slot]
                gh = _mm(hprev, w_buf[...], compute_dtype) + bias
                r, z, n, gh_n, _h_new = _gates(gi_t, gh, hprev)

                dh = dh_ref[...] + g_buf[slot]
                dn = dh * (1.0 - z)
                dz = dh * (hprev - n)
                dgn = dn * (1.0 - n * n)
                dr = dgn * gh_n
                dghn = dgn * r
                dgz = dz * z * (1.0 - z)
                dgr = dr * r * (1.0 - r)
                dgi = jnp.concatenate([dgr, dgz, dgn], axis=-1)
                dgh = jnp.concatenate([dgr, dgz, dghn], axis=-1)

                # dh_{t-1} = dh*z + dgh @ w^T (contract both 3H axes)
                dh_ref[...] = dh * z + jax.lax.dot_general(
                    dgh.astype(compute_dtype), w_buf[...],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dgi_buf[slot] = dgi
                r_buf[slot] = r
                dgi_dma(slot, t).start()
                r_dma(slot, t).start()
                return 0

            jax.lax.fori_loop(0, t_len, step, 0)
            dh0_ref[d] = dh_ref[...]

            @pl.when(t_len >= 2)
            def _():
                dgi_dma(1, 1).wait()
                r_dma(1, 1).wait()

            dgi_dma(0, 0).wait()
            r_dma(0, 0).wait()

    b_sz, h3 = gi_hbm.shape[2], gi_hbm.shape[3]
    h_sz = h3 // 3
    pl.run_scoped(
        body,
        w_buf=pltpu.VMEM((h_sz, h3), w_hbm.dtype),
        gi_buf=pltpu.VMEM((2, b_sz, h3), jnp.float32),
        hprev_buf=pltpu.VMEM((2, b_sz, h_sz), jnp.float32),
        g_buf=pltpu.VMEM((2, b_sz, h_sz), jnp.float32),
        dgi_buf=pltpu.VMEM((2, b_sz, h3), jnp.float32),
        r_buf=pltpu.VMEM((2, b_sz, h_sz), jnp.float32),
        dh_ref=pltpu.VMEM((b_sz, h_sz), jnp.float32),
        w_sem=pltpu.SemaphoreType.DMA(()),
        in_sems=pltpu.SemaphoreType.DMA((2,)),
        hp_sems=pltpu.SemaphoreType.DMA((2,)),
        g_sems=pltpu.SemaphoreType.DMA((2,)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
        r_sems=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def gru_recurrence_dir(gi, w_hh, b_hh, h0, compute_dtype=jnp.float32):
    """Sequential-per-direction recurrence for large hidden sizes.

    gi: (T, 2, B, 3H) f32; w_hh: (2, H, 3H); b_hh: (2, 1, 3H);
    h0: (2, B, H) f32 -> ys (T, 2, B, H) f32."""
    return _fwd_partitioned_dir(compute_dtype)(gi, w_hh, b_hh, h0)


# Same batch-parallel declaration as gru_recurrence above: without it the
# dir-variant's pallas_calls are opaque custom calls that GSPMD would
# all-gather and run replicated on a dp mesh (silent scaling loss the
# interpret-mode CPU tests cannot catch). Weights replicate; dW/db are
# computed OUTSIDE in XLA (einsum over the sharded batch), so no
# reduce_outputs are needed here.
@functools.lru_cache(maxsize=None)
def _fwd_partitioned_dir(compute_dtype):
    from wav2vec2forbrain_tpu.parallel.kernel_partition import (
        partition_kernel,
    )

    def impl(gi, w_hh, b_hh, h0):
        return _fwd_impl_dir(gi, w_hh, b_hh, h0, compute_dtype)

    return partition_kernel(
        impl,
        arg_factors=[{0: 2}, None, None, {0: 1}],
        arg_ndims=(4, 3, 3, 3),
        out_factors=[{0: 2}],
        out_ndims=(4,),
    )


@functools.lru_cache(maxsize=None)
def _bwd_partitioned_dir(compute_dtype):
    from wav2vec2forbrain_tpu.parallel.kernel_partition import (
        partition_kernel,
    )

    def impl(gi, w_hh, b_hh, h0, ys, g):
        return _bwd_impl_dir(gi, w_hh, b_hh, h0, ys, g, compute_dtype)

    return partition_kernel(
        impl,
        arg_factors=[{0: 2}, None, None, {0: 1}, {0: 2}, {0: 2}],
        arg_ndims=(4, 3, 3, 3, 4, 4),
        out_factors=[{0: 2}, {0: 2}, {0: 1}],
        out_ndims=(4, 4, 3),
    )


def _fwd_impl_dir(gi, w_hh, b_hh, h0, compute_dtype):
    t_len = gi.shape[0]
    b_sz, h3 = gi.shape[2], gi.shape[3]
    h_sz = h3 // 3
    kern = functools.partial(
        _fwd_kernel_dir, t_len=t_len, compute_dtype=compute_dtype
    )
    return pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # gi stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),   # w (DMA'd per direction)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b
            pl.BlockSpec(memory_space=pltpu.VMEM),  # h0
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((t_len, 2, b_sz, h_sz), jnp.float32),
        interpret=_interpret(),
    )(
        gi.astype(jnp.float32),
        w_hh.astype(compute_dtype),
        b_hh.reshape(b_hh.shape[0], 1, -1).astype(jnp.float32),
        h0,
    )


def _vjp_fwd_dir(gi, w_hh, b_hh, h0, compute_dtype):
    # route through the PARTITIONED wrapper (see _vjp_fwd above)
    ys = _fwd_partitioned_dir(compute_dtype)(gi, w_hh, b_hh, h0)
    return ys, (gi, w_hh, b_hh, h0, ys)


def _vjp_bwd_dir(compute_dtype, residuals, g):
    gi, w_hh, b_hh, h0, ys = residuals
    h_sz = gi.shape[3] // 3
    dgi, r_seq, dh0 = _bwd_partitioned_dir(compute_dtype)(
        gi, w_hh, b_hh, h0, ys, g
    )
    # dgh = dgi with the n-gate column scaled by r; dW_hh/db_hh fall out of
    # one large MXU-friendly einsum over all timesteps (XLA, f32)
    dgh = jnp.concatenate(
        [dgi[..., : 2 * h_sz], dgi[..., 2 * h_sz :] * r_seq], axis=-1
    )
    hprev = jnp.concatenate([h0[None], ys[:-1]], axis=0)  # (T, 2, B, H)
    dw = jnp.einsum(
        "tdbh,tdbk->dhk", hprev, dgh, preferred_element_type=jnp.float32
    )
    db = jnp.sum(dgh, axis=(0, 2), keepdims=False)[:, None, :]  # (2, 1, 3H)
    return dgi, dw, db.reshape(b_hh.shape), dh0


def _bwd_impl_dir(gi, w_hh, b_hh, h0, ys, g, compute_dtype):
    t_len = gi.shape[0]
    d, b_sz, h3 = gi.shape[1], gi.shape[2], gi.shape[3]
    h_sz = h3 // 3
    kern = functools.partial(
        _bwd_kernel_dir, t_len=t_len, compute_dtype=compute_dtype
    )
    return pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # gi
            pl.BlockSpec(memory_space=pl.ANY),   # w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b
            pl.BlockSpec(memory_space=pltpu.VMEM),  # h0
            pl.BlockSpec(memory_space=pl.ANY),   # ys
            pl.BlockSpec(memory_space=pl.ANY),   # g
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # dgi
            pl.BlockSpec(memory_space=pl.ANY),   # r_seq
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dh0
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_len, d, b_sz, h3), jnp.float32),
            jax.ShapeDtypeStruct((t_len, d, b_sz, h_sz), jnp.float32),
            jax.ShapeDtypeStruct((d, b_sz, h_sz), jnp.float32),
        ],
        interpret=_interpret(),
    )(
        gi.astype(jnp.float32),
        w_hh.astype(compute_dtype),
        b_hh.reshape(b_hh.shape[0], 1, -1).astype(jnp.float32),
        h0,
        ys,
        g.astype(jnp.float32),
    )


gru_recurrence_dir.defvjp(_vjp_fwd_dir, _vjp_bwd_dir)


def bigru_layer_pallas(
    dirs: list,
    x: jnp.ndarray,
    h0: jnp.ndarray,
    compute_dtype=None,
    per_direction: bool = False,
) -> jnp.ndarray:
    """Drop-in for models.gru._bigru_layer_fused using the Pallas recurrence.

    x: (B, T, in); h0: (2, B, H) f32 -> (B, T, 2H). per_direction selects the
    large-hidden grid=(2,) kernels (one direction's weights VMEM-resident at
    a time); the default fused kernel batches both directions per step."""
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
    rec = gru_recurrence_dir if per_direction else gru_recurrence
    ys = rec(gi, w_hh, b_hh, h0, cd)  # (T, 2, B, H)
    fwd = jnp.transpose(ys[:, 0], (1, 0, 2))
    bwd = jnp.flip(jnp.transpose(ys[:, 1], (1, 0, 2)), axis=1)
    return jnp.concatenate([fwd, bwd], axis=-1)
