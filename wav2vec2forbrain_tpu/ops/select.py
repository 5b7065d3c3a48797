"""Per-kernel Pallas selection policy.

``--use_pallas`` is the master switch; this module decides, per fused
kernel, whether the Pallas implementation or the plain-XLA path runs.
The measured picture (tools/profile_step.py on v5e, bench shape) is not
uniform: the GRU kernel beats XLA at every stream dtype, but the
GLU->depthwise conv kernel only beats XLA's grouped conv for a float32
activation stream — at bfloat16 XLA's conv is ~20% faster than the
shift-add kernel, so "auto" routes the conv module back to XLA there.
The attention kernel lost its crown to XLA's batched GEMMs once the
dense path moved to the BTH layout with hash dropout
(ops/xla_attention.py): x24-layer fwd+bwd at the bench shape is 7.29 ms
dense vs 14.37 ms kernel (the kernel issues 3584 tiny per-(batch, head)
MXU dots and pays fixed overhead on each), so "auto" routes attention
to XLA; the kernel stays selectable for A/B and longer-T regimes.
The fused LayerNorm kernel (ops/pallas_layernorm.py) beats XLA's
convert+reduce LN fusions in ISOLATION at both stream dtypes
(tools/ab_layernorm.py on v5e, bench shape: fwd+bwd 0.319 -> 0.268 ms/LN
at bf16, 0.382 -> 0.311 at f32) but LOSES end-to-end: the full-step A/B
measured 116.6 ms with LN on XLA vs 117.5-119 with the kernel (unrolled)
and 191.7 vs 196.4 (scanned) — the opaque custom call breaks XLA's fusion
of the LN with its surrounding residual adds/converts, costing more than
the kernel saves. "auto" therefore routes layernorm to XLA; the kernel
stays selectable for explicit A/B. Stateless hash dropout
(ops/hash_dropout.py, policy name "dropout") recomputes its mask in the
backward instead of storing a pred residual: measured full-step A/B
113.9-115.4 ms on vs 116.4-117.0 off (unrolled) and 178.7 vs 191.7-192.2
(scanned, where the masks otherwise ride the remat residuals) — "auto"
keeps it on.
A/B at the bf16 headline shape (conformer-large bs32, v5e, env override):
gru+preproc kernels off 117.2-117.7 vs all-auto 116.2-118.9 ms/step (a
wash here — the conformer's brain frontend is small; those kernels earn
their keep on the gru+w2v family and the 512/1024-hidden sweep configs).
(Historical: the attention kernel used to save ~12 ms against the OLD
per-head dense path — eight transposes/layer + jax.random dropout; the
BTH hash-dropout dense path beats both, see the paragraph above.)

Policy values (CLI ``--pallas_kernels``, env ``W2VB_PALLAS_KERNELS``
overrides for tooling/A-B runs):
  - "auto" (default): per-kernel measured best, may depend on dtype
  - "all" / "none": force every kernel on / off
  - comma list, e.g. "attention,gru": exactly these kernels

Decisions are trace-time static (consulted while tracing a jitted
program), so a policy change means a recompile, never a silent split.
"""

import os
from typing import Optional

import jax.numpy as jnp

# "dropout" is not a Pallas kernel but an XLA formulation choice (stateless
# hash mask recomputed in the backward, ops/hash_dropout.py); it rides the
# same policy knob so A/B runs can flip it like the kernels.
KERNELS = ("preproc", "gru", "attention", "conv_glu", "layernorm", "dropout")

_policy = "auto"


def set_kernel_policy(policy: str) -> None:
    """Install the process-wide kernel policy (validated)."""
    global _policy
    validate_kernel_policy(policy)
    _policy = policy


def get_kernel_policy() -> str:
    return os.environ.get("W2VB_PALLAS_KERNELS", _policy)


def validate_kernel_policy(policy: str) -> None:
    if policy in ("auto", "all", "none"):
        return
    names = {s.strip() for s in policy.split(",") if s.strip()}
    unknown = names - set(KERNELS)
    if unknown or not names:
        raise ValueError(
            f"pallas_kernels={policy!r}: expected 'auto', 'all', 'none' or "
            f"a comma list drawn from {KERNELS}"
        )


def kernel_enabled(
    name: str, use_pallas: bool = True, activation_dtype: Optional[object] = None
) -> bool:
    """Should the Pallas kernel `name` run? Trace-time static.

    activation_dtype: the stream dtype the kernel's IO rides (only the
    dtype-sensitive kernels need to pass it).
    """
    assert name in KERNELS, name
    if not use_pallas:
        return False
    policy = get_kernel_policy()
    if policy == "all":
        return True
    if policy == "none":
        return False
    if policy == "auto":
        if name == "conv_glu":
            # XLA's bf16 grouped conv beats the shift-add kernel; at f32
            # the fused kernel wins (see module docstring).
            return (
                activation_dtype is None
                or jnp.dtype(activation_dtype) != jnp.bfloat16
            )
        if name == "layernorm":
            # wins isolated, loses e2e to broken fusion boundaries (see
            # module docstring) — XLA keeps the LN at every stream dtype
            return False
        if name == "attention":
            # XLA's batched GEMMs beat the kernel's thousands of tiny
            # per-(batch, head) MXU dots at the short encoder sequences
            # this framework runs (v5e A/B, x24 fwd+bwd at the bench
            # shape: XLA-BTH 7.29 ms vs kernel 14.37)
            # — ops/xla_attention.py runs instead,
            # with bit-identical dropout streams. The kernel stays
            # selectable ('all' or a comma list) for A/B and for future
            # long-T regimes where recompute-free HBM traffic could flip
            # the verdict.
            return False
        return True
    names = {s.strip() for s in policy.split(",") if s.strip()}
    return name in names
