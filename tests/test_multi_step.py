"""K-step scan-chunk parity tests (train/steps.py::build_multi_step).

The multi-step epoch program must be a pure transport optimization: K steps
dispatched as one lax.scan chunk produce the same parameters, RNG chain and
per-step evaluator payloads as K sequential single-step dispatches (same
gather contract as the device cache, same RNG threading). Tolerances are
float-reduction-order level: the scan body and the standalone step are the
same traced function, but XLA fuses them into different executables.
"""

import json
import os

import numpy as np
import pytest

import wav2vec2forbrain_tpu.experiments.impl as impl
from wav2vec2forbrain_tpu.train.device_cache import padded_index_row

from test_train_e2e import base_config, tiny_yaml_config
from test_train_e2e import tiny_encoders  # noqa: F401


def _experiment(tmp_path, synthetic_splits_dir, **cfg_kwargs):
    yaml_cfg = tiny_yaml_config(tmp_path, synthetic_splits_dir)
    cfg = base_config(device_data_cache="on", **cfg_kwargs)
    return impl.B2TGruAndW2VExperiment(cfg, yaml_cfg)


def test_multi_step_matches_sequential(tmp_path, synthetic_splits_dir, tiny_encoders):  # noqa: F811
    """One K=4 chunk whose 4th slot is tail padding (valid=False) == 3
    sequential single steps: same params, same RNG, same stacked
    loss/pred_ids/logit_lens — the skipped slot must not touch the carry."""
    import jax

    exp = _experiment(tmp_path, synthetic_splits_dir)
    cache = exp.get_device_caches()["train"]
    k, b = 3, exp.base_config.batch_size
    data_axis = exp.mesh.shape["data"] if exp.mesh else 1
    n = len(exp.dataloader_train.dataset)
    rng_np = np.random.default_rng(0)
    idx_rows, mask_rows = [], []
    for _ in range(k):
        idxs = rng_np.integers(0, n, size=(b,)).tolist()
        idx, mask, _tb = padded_index_row(idxs, b, data_axis)
        idx_rows.append(idx)
        mask_rows.append(mask)
    idx_mat, mask_mat = np.stack(idx_rows), np.stack(mask_rows)
    # pad a 4th slot (duplicate of the last row) flagged invalid
    idx_mat = np.concatenate([idx_mat, idx_mat[-1:]])
    mask_mat = np.concatenate([mask_mat, mask_mat[-1:]])
    valid = np.asarray([True] * k + [False])

    # sequential reference (fresh state; donation consumes the originals, so
    # capture host copies first)
    t0 = jax.device_get(exp.trainable)
    o0 = jax.device_get(exp.opt_state)
    s0 = jax.device_get(exp.model_state)
    r0 = jax.device_get(exp.step_rng)

    t, o, s, r = exp.trainable, exp.opt_state, exp.model_state, exp.step_rng
    seq_loss, seq_pred, seq_lens = [], [], []
    for j in range(k):
        batch = cache.device_batch(idx_mat[j], mask_mat[j])
        out = exp.train_step(t, exp.frozen, o, s, batch, r, 1e-3, 1e-4)
        t, o, s, r = out.params, out.opt_state, out.model_state, out.rng
        seq_loss.append(float(out.loss))
        seq_pred.append(np.asarray(out.pred_ids))
        seq_lens.append(np.asarray(out.logit_lens))
    seq_params = jax.device_get(t)
    seq_rng = np.asarray(r)

    # multi-step chunk from the identical initial state
    multi = exp.get_multi_step()
    mo = multi(
        jax.device_put(t0),
        exp.frozen,
        jax.device_put(o0),
        jax.device_put(s0),
        cache._dev,
        idx_mat,
        mask_mat,
        valid,
        jax.device_put(r0),
        1e-3,
        1e-4,
        cache._t_full,
    )

    np.testing.assert_array_equal(np.asarray(mo.rng), seq_rng)
    np.testing.assert_allclose(
        np.asarray(mo.loss)[:k], np.asarray(seq_loss), rtol=2e-6, atol=1e-7
    )
    assert float(np.asarray(mo.loss)[k]) == 0.0  # skipped slot: zero output
    for j in range(k):
        np.testing.assert_array_equal(np.asarray(mo.pred_ids)[j], seq_pred[j])
        np.testing.assert_array_equal(np.asarray(mo.logit_lens)[j], seq_lens[j])
    flat_a = jax.tree_util.tree_leaves(jax.device_get(mo.params))
    flat_b = jax.tree_util.tree_leaves(seq_params)
    # scan-body vs standalone-step executables fuse differently, and Adam's
    # eps-division amplifies reduction-order noise on NEAR-ZERO second
    # moments: a handful of elements land anywhere up to ~a fifth of one
    # step's max update (lr 1e-3) after 3 steps — observed 2-4 outliers out
    # of 1.57M at <=1.8e-4 abs (grew from <=1.1e-5 when the attention core
    # moved to the jax.checkpoint'd XLA-BTH path, whose recomputed backward
    # fuses differently inside vs outside the scan body). A systematic
    # divergence (wrong RNG chain, mask leak, carry corruption) would touch
    # whole tensors, not lone elements: so pin "bit-close for essentially all
    # elements, small bounded noise on a vanishing fraction".
    total = mismatched = 0
    for a, bb in zip(flat_a, flat_b):
        a64 = np.asarray(a, np.float64)
        b64 = np.asarray(bb, np.float64)
        err = np.abs(a64 - b64)
        assert float(err.max(initial=0.0)) <= 5e-4, float(err.max())
        mismatched += int((err > 5e-5).sum())
        total += a64.size
    assert mismatched <= max(8, total // 100_000), (mismatched, total)


def test_trainer_chunked_equals_single_step(
    tmp_path, synthetic_splits_dir, tiny_encoders  # noqa: F811
):
    """Full e2e: --multi_step_chunk=2 reproduces the single-step cached run's
    losses (train AND val epochs use the chunked programs; the synthetic
    train split is 9 samples / batch 3 -> 3 batches = 1 chunk + 1 tail)."""
    histories = []
    for chunk in ("off", 2):
        yaml_cfg = tiny_yaml_config(tmp_path / str(chunk), synthetic_splits_dir)
        cfg = base_config(
            device_data_cache="on", multi_step_chunk=chunk, epochs=2
        )
        exp = impl.B2TGruAndW2VExperiment(cfg, yaml_cfg)
        exp.run()
        with open(os.path.join(exp.results_dir, "history.json")) as f:
            histories.append(json.load(f))
    off, on = histories
    for e_off, e_on in zip(off["epochs"], on["epochs"]):
        for split in ("train", "val"):
            assert e_off[split]["average"]["loss"] == pytest.approx(
                e_on[split]["average"]["loss"], rel=2e-5
            ), split
    assert off["test"]["average"]["loss"] == pytest.approx(
        on["test"]["average"]["loss"], rel=2e-5
    )


def test_auto_resolution(tmp_path, synthetic_splits_dir, tiny_encoders):  # noqa: F811
    """'auto' stays off on CPU (dispatch is cheap there); an explicit integer
    forces the chunk size; 'off' is 0."""
    exp = _experiment(tmp_path, synthetic_splits_dir)
    assert exp.resolve_multi_step_chunk() == 0  # CPU: auto -> off
    exp.base_config = exp.base_config.model_copy(update={"multi_step_chunk": 5})
    assert exp.resolve_multi_step_chunk() == 5
    exp.base_config = exp.base_config.model_copy(
        update={"multi_step_chunk": "off"}
    )
    assert exp.resolve_multi_step_chunk() == 0


def test_no_epoch2_retrace(tmp_path, synthetic_splits_dir, tiny_encoders):  # noqa: F811
    """The chunk program compiles ONCE for the whole run: epoch 2 must reuse
    epoch 1's executable. Regression for the rng sharding-type churn where a
    fresh `jax.random.PRNGKey` (`u32[4]({})`) compiled the first epoch and
    the step's mesh-typed output key recompiled everything in epoch 2 —
    ~2 min of silent recompile per run at the real conformer shape
    (canonical_rng in experiments/impl.py is the fix)."""
    yaml_cfg = tiny_yaml_config(tmp_path, synthetic_splits_dir)
    cfg = base_config(device_data_cache="on", multi_step_chunk=2, epochs=3)
    exp = impl.B2TGruAndW2VExperiment(cfg, yaml_cfg)
    exp.run()
    # one width bucket -> exactly one traced signature across all epochs
    assert exp.get_multi_step()._cache_size() == 1
    # multi_eval legitimately traces twice: the val and test device caches
    # are different sizes, so their cache_arrays shapes differ
    assert exp.get_multi_eval()._cache_size() == 2


def test_split_last_chunk_plan():
    """_split_last_chunk re-dispatches the final chunk's tail as a second
    padded chunk of the SAME (K, width) shape: batch coverage and order are
    unchanged, both parts stay padded to K, and small/empty plans pass
    through untouched (overlap optimization only, never a numerics change)."""
    from wav2vec2forbrain_tpu.train.train_loop import _split_last_chunk

    def row(i):
        # (idx, mask, true_b, idxs) stand-in; identity by batch index i
        return (i, None, 1, [i])

    k = 32
    run = [row(i) for i in range(30)]
    padded = run + [run[-1]] * (k - len(run))
    work = [(0, padded, 384, 30)]
    out = _split_last_chunk(work)
    assert len(out) == 2
    (i0_h, head, w_h, n_h), (i0_t, tail, w_t, n_t) = out
    assert (w_h, w_t) == (384, 384)
    assert len(head) == k and len(tail) == k  # same compiled (K, width)
    assert n_h + n_t == 30 and n_t == max(2, round(30 * 0.2))
    assert (i0_h, i0_t) == (0, n_h)
    # real slots cover the run in order; padding duplicates the last real row
    assert [r[0] for r in head[:n_h]] == list(range(n_h))
    assert [r[0] for r in tail[:n_t]] == list(range(n_h, 30))
    assert all(r[0] == head[n_h - 1][0] for r in head[n_h:])
    assert all(r[0] == tail[n_t - 1][0] for r in tail[n_t:])

    # below the split threshold: untouched
    small = [(0, [row(i) for i in range(7)] + [row(6)] * (k - 7), 384, 7)]
    assert _split_last_chunk(small) is small
    assert _split_last_chunk([]) == []
