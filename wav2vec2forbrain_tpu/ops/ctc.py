"""CTC loss with torch-compatible semantics.

The reference uses torch.nn.CTCLoss(blank=0, reduction="mean",
zero_infinity=True) on log-softmaxed logits with per-sample logit/target
lengths (ref: src/model/w2v_custom_feat_extractor.py:59,81-90). Here the
forward algorithm is optax's log-semiring scan (XLA-friendly); this wrapper
reproduces:

- blank id 0
- "mean" reduction: per-sample loss divided by its target length, then
  averaged over the batch
- zero_infinity=True: samples whose alignment is impossible
  (logit_len < target_len + #repeats) contribute 0 but still count in the
  batch mean denominator
"""

import jax.numpy as jnp
import optax


def ctc_loss(
    logits: jnp.ndarray,
    logit_lens: jnp.ndarray,
    targets: jnp.ndarray,
    target_lens: jnp.ndarray,
    reduction: str = "mean",
    blank_id: int = 0,
    sample_mask: jnp.ndarray = None,
) -> jnp.ndarray:
    """logits: (B, T, K) raw (softmax applied internally); targets: (B, U)
    padded with any value beyond target_lens."""
    b, t, _ = logits.shape
    u = targets.shape[1]

    time_idx = jnp.arange(t)[None, :]
    logit_paddings = (time_idx >= logit_lens[:, None]).astype(jnp.float32)
    tgt_idx = jnp.arange(u)[None, :]
    label_paddings = (tgt_idx >= target_lens[:, None]).astype(jnp.float32)
    # optax requires labels free of the blank id in valid positions; padding
    # positions are masked but keep them nonzero for safety.
    labels = jnp.where(label_paddings > 0, 1, targets)

    per_sample = optax.ctc_loss(
        logits, logit_paddings, labels, label_paddings, blank_id=blank_id
    )

    # zero_infinity: alignment impossible when T < U + #(consecutive repeats)
    valid_pos = label_paddings[:, 1:] == 0
    repeats = jnp.sum(
        (targets[:, 1:] == targets[:, :-1]) & valid_pos, axis=1
    )
    feasible = logit_lens >= (target_lens + repeats)
    per_sample = jnp.where(feasible, per_sample, 0.0)

    if sample_mask is not None:
        per_sample = per_sample * sample_mask
    if reduction == "mean":
        denom = jnp.maximum(target_lens, 1).astype(per_sample.dtype)
        scaled = per_sample / denom
        if sample_mask is not None:
            return jnp.sum(scaled) / jnp.maximum(jnp.sum(sample_mask), 1.0)
        return jnp.mean(scaled)
    if reduction == "sum":
        return jnp.sum(per_sample)
    return per_sample
