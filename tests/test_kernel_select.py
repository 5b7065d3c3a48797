"""ops/select.py: per-kernel Pallas selection policy."""

import jax.numpy as jnp
import pytest

from wav2vec2forbrain_tpu.ops import select


@pytest.fixture(autouse=True)
def _restore_policy():
    old = select._policy
    yield
    select._policy = old


def test_policy_validation():
    for ok in ("auto", "all", "none", "attention", "attention,gru"):
        select.validate_kernel_policy(ok)
    for bad in ("", "attn", "attention,conv", "auto,gru"):
        with pytest.raises(ValueError):
            select.validate_kernel_policy(bad)


def test_master_switch_wins():
    select.set_kernel_policy("all")
    assert not select.kernel_enabled("attention", use_pallas=False)


def test_all_none_and_list():
    select.set_kernel_policy("all")
    assert all(select.kernel_enabled(k) for k in select.KERNELS)
    select.set_kernel_policy("none")
    assert not any(select.kernel_enabled(k) for k in select.KERNELS)
    select.set_kernel_policy("attention,gru")
    assert select.kernel_enabled("attention")
    assert select.kernel_enabled("gru")
    assert not select.kernel_enabled("conv_glu")
    assert not select.kernel_enabled("preproc")


def test_auto_routes_conv_by_stream_dtype():
    select.set_kernel_policy("auto")
    assert select.kernel_enabled("conv_glu", activation_dtype=jnp.float32)
    assert not select.kernel_enabled("conv_glu", activation_dtype=jnp.bfloat16)
    # dtype-insensitive kernels stay on
    for k in ("gru", "preproc"):
        assert select.kernel_enabled(k, activation_dtype=jnp.bfloat16)
    # attention routes to the XLA-BTH dense path under auto (measured
    # faster than the kernel at the short-T encoder shapes; the kernel
    # stays selectable explicitly)
    assert not select.kernel_enabled("attention", activation_dtype=jnp.bfloat16)
    select.set_kernel_policy("attention")
    assert select.kernel_enabled("attention")


def test_env_override(monkeypatch):
    select.set_kernel_policy("all")
    monkeypatch.setenv("W2VB_PALLAS_KERNELS", "none")
    assert not select.kernel_enabled("attention")
    monkeypatch.delenv("W2VB_PALLAS_KERNELS")
    assert select.kernel_enabled("attention")


def test_cli_arg_accepts_policy():
    from wav2vec2forbrain_tpu.args.base_args import BaseExperimentArgsModel

    m = BaseExperimentArgsModel(pallas_kernels="attention,gru")
    assert m.pallas_kernels == "attention,gru"
