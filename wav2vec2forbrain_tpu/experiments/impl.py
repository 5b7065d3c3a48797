"""Experiment lifecycle: construction, run(), prediction dumps.

TPU-native equivalent of the reference Experiment/B2TExperiment stack
(ref: src/experiments/experiment.py:31-364, b2t_experiment.py:14-111,
b2t_gru_w2v_experiment.py:79-207, b2t_gru_w2v_conformer_experiment.py:60-178).

Construction mirrors the reference call stack (SURVEY.md §3.1): seeds →
dataloaders → results dir + config.json (with repro_cmd) → model build
(+ pretrained weight conversion) → optimizer/scheduler/steps → optional
checkpoint resume. run() mirrors §3.2: logger init → Trainer.train() →
artifact store (model.msgpack / brain_encoder.msgpack / history.json /
history.png) → test prediction dump.

Divergences (documented):
- the GPT-2 "prefix beam search" LM that the reference loads but never uses
  (experiment.py:87-95 — dead RAM weight) is NOT loaded; the flags remain.
- checkpoints are flax msgpack pytrees, not torch state dicts.
"""

import json
import os
import random
import sys
from datetime import datetime
from types import SimpleNamespace
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from wav2vec2forbrain_tpu.args.base_args import PRETRAINED_LATENT_SIZES
from wav2vec2forbrain_tpu.args.yaml_config import YamlConfigModel
from wav2vec2forbrain_tpu.data.dataset import Brain2TextDataset
from wav2vec2forbrain_tpu.data.loader import Brain2TextBatchSampler, DataLoader
from wav2vec2forbrain_tpu.data.tokenizer import Wav2Vec2CTCTokenizer
from wav2vec2forbrain_tpu.experiments.args_models import (
    B2TGruAndW2VArgsModel,
    B2TGruAndW2VConformerArgsModel,
)
from wav2vec2forbrain_tpu.models.assembly import (
    ModelSpec,
    init_model_params,
    param_labels,
)
from wav2vec2forbrain_tpu.models.pretrained import (
    encoder_config_for_checkpoint,
    load_pretrained_encoder,
)
from wav2vec2forbrain_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
)
from wav2vec2forbrain_tpu.train.checkpoint import (
    load_checkpoint,
    save_checkpoint,
    save_subtree,
)
from wav2vec2forbrain_tpu.train.evaluator import EvaluatorWithLMDecoder
from wav2vec2forbrain_tpu.train.history import SingleEpochHistory, TrainHistory
from wav2vec2forbrain_tpu.train.logger import make_logger
from wav2vec2forbrain_tpu.train.optim import (
    LRSchedules,
    make_optimizer,
    step_lr,
    two_module_warmup_schedules,
)
from wav2vec2forbrain_tpu.train.steps import (
    StepConfig,
    build_steps,
    merge_params,
    partition_params,
    prune_labels,
)


def _mu_dtype(cfg):
    """--adam_mu_dtype -> optax mu_dtype (None = param dtype, torch parity)."""
    import jax.numpy as jnp

    return jnp.bfloat16 if cfg.adam_mu_dtype == "bfloat16" else None


def _nu_dtype(cfg):
    """--adam_nu_dtype -> second-moment storage dtype (None = torch parity)."""
    import jax.numpy as jnp

    if getattr(cfg, "adam_nu_dtype", "float32") == "bfloat16":
        return jnp.bfloat16
    return None


def _wire_jnp_dtype(wire: str):
    """--h2d_dtype -> the on-device feature dtype (batch AND device cache)."""
    return {
        "float32": jnp.float32,
        "float16": jnp.float16,
        "bfloat16": jnp.bfloat16,
    }[wire]


class B2TGruW2VExperimentBase:
    """Shared lifecycle for the two registered experiment types."""

    ARGS_MODEL = B2TGruAndW2VArgsModel
    NAME = "b2p2t_gru+w2v"
    ENCODER_FAMILY = "wav2vec2"

    def __init__(self, config: dict, yamlConfig: YamlConfigModel):
        self.base_config = self.ARGS_MODEL(**config)
        self.config = self.base_config  # alias, reference uses both names
        self.yaml_config = yamlConfig
        self.raw_config = config

        # seeds (ref: experiment.py:34-35) + fast TPU PRNG + multi-host init
        from wav2vec2forbrain_tpu.parallel.distributed import (
            maybe_initialize_distributed,
        )
        from wav2vec2forbrain_tpu.util.tpu_setup import configure_jax

        maybe_initialize_distributed()
        configure_jax()
        np.random.seed(self.base_config.seed)
        random.seed(self.base_config.seed)
        self._init_rng = jax.random.PRNGKey(self.base_config.seed)

        self.tokenizer = self._create_tokenizer()

        self.dataloader_train = self._create_dataloader("train")
        self.dataloader_val = self._create_dataloader("val")
        self.dataloader_test = self._create_dataloader("test")

        # results dir + config archive (ref: experiment.py:46-67)
        subdir = (
            [self.base_config.results_subdir_name]
            if self.base_config.results_subdir_name is not None
            else []
        )
        self.results_dir = os.path.join(
            yamlConfig.cache_dir,
            "experiment_results",
            self.get_name(),
            *subdir,
            f"{datetime.now():%Y-%m-%d_%H#%M#%S}",
        )
        from wav2vec2forbrain_tpu.parallel.distributed import is_coordinator

        if is_coordinator():
            os.makedirs(self.results_dir, exist_ok=True)
            with open(os.path.join(self.results_dir, "config.json"), "w") as f:
                config_copy = dict(config)
                config_copy["repro_cmd"] = "python " + " ".join(sys.argv)
                json.dump(config_copy, f, indent=5)

        # mesh (TPU-native; the reference is single-GPU `.cuda()`)
        self.mesh = make_mesh(
            self.base_config.mesh_data_parallel,
            self.base_config.mesh_model_parallel,
        )
        self.batch_sharding_fn = batch_sharding(self.mesh)

        self._build_model()
        self._build_optimizer_and_steps()

        # checkpoint resume (ref: experiment.py:70-84)
        self.checkpoint_history = None
        if self.base_config.from_checkpoint is not None:
            print(
                f"loading model from checkpoint {self.base_config.from_checkpoint}"
            )
            self._load_full_checkpoint(self.base_config.from_checkpoint)
            history_path = os.path.join(
                os.path.dirname(self.base_config.from_checkpoint), "history.json"
            )
            if os.path.exists(history_path):
                print("Attempting to load history from checkpoint")
                try:
                    self.checkpoint_history = TrainHistory.from_json(history_path)
                except Exception:
                    print("Failed to load history from checkpoint")

        self.step_rng = self.canonical_rng(
            jax.random.PRNGKey(self.base_config.seed + 1)
        )
        self.logger = None  # created in run()

    # --- subclass hooks -----------------------------------------------------

    @classmethod
    def get_args_model(cls):
        return cls.ARGS_MODEL

    def get_name(self) -> str:
        return self.NAME

    def get_vocab(self):
        return self.tokenizer.get_vocab_list()

    # --- construction pieces ------------------------------------------------

    def _create_tokenizer(self) -> Wav2Vec2CTCTokenizer:
        cfg = self.base_config
        if cfg.tokenizer != "wav2vec_pretrained":
            raise NotImplementedError(
                f"Tokenizer {cfg.tokenizer} not implemented (reference parity: "
                "only wav2vec_pretrained is live, b2t_experiment.py:37-48)"
            )
        if cfg.tokenizer_checkpoint != cfg.wav2vec_checkpoint:
            print(
                "Warning: tokenizer checkpoint differs from wav2vec checkpoint "
                "(ref warns the same, b2t_gru_w2v_experiment.py:83-87)"
            )
        return Wav2Vec2CTCTokenizer.from_pretrained(cfg.tokenizer_checkpoint)

    def _create_dataset(self, split: Literal["train", "val", "test"]):
        return Brain2TextDataset(
            config=self.base_config,
            dataset_splits_dir=self.yaml_config.dataset_splits_dir,
            split=split,
        )

    def _create_dataloader(self, split: Literal["train", "val", "test"]):
        ds = self._create_dataset(split)
        collate = ds.get_collate_fn(
            self.tokenizer,
            pad_to_multiple=self.base_config.pad_to_multiple,
            target_pad_to_multiple=self.base_config.target_pad_to_multiple,
        )
        length_key = None
        if getattr(self.base_config, "length_sorted_batches", False):
            # raw (pre-resample) frame counts: resampling scales every sample
            # by the same rate factor, so the sort order — all the bucketing
            # needs — is identical to sorting post-resample lengths
            t_axis = self._cache_time_axis()
            length_key = lambda i: ds.samples[i].input.shape[t_axis]  # noqa: E731
        sampler = None
        if getattr(self.base_config, "day_batches", False):
            sampler = Brain2TextBatchSampler(
                ds,
                self.base_config.batch_size,
                shuffle=(split == "train"),
                rng=random.Random(self.base_config.seed),
                length_key=length_key,
            )
        return DataLoader(
            ds,
            batch_size=self.base_config.batch_size,
            collate_fn=collate,
            shuffle=(split == "train"),
            batch_sampler=sampler,
            seed=self.base_config.seed,
            length_key=length_key,
        )

    def _encoder_config(self):
        family, enc_cfg = encoder_config_for_checkpoint(
            self.base_config.wav2vec_checkpoint
        )
        assert family == self.ENCODER_FAMILY, (
            f"checkpoint {self.base_config.wav2vec_checkpoint} is a {family} "
            f"model but experiment {self.get_name()} expects {self.ENCODER_FAMILY}"
        )
        if family == "wav2vec2" and getattr(
            self.base_config, "w2v_do_stable_layer_norm", False
        ):
            enc_cfg.do_stable_layer_norm = True
        return enc_cfg

    # probe the compile cache only when unrolling could save meaningful
    # wall-clock: below this step count the per-step win can't add up to
    # more than a few seconds, so skip the (seconds of) trace+lower cost
    _SCAN_PROBE_MIN_STEPS = 50

    def _resolve_scan_layers(self, make_spec=None) -> bool:
        """--scan_layers=auto: unroll the layer loop only when the run is
        long enough to amortize the extra compile time — OR when that
        compile time is ~zero because the unrolled program is already in
        the persistent compile cache (warmed by an earlier run of the same
        config; probed without compiling, util/compile_probe.py).

        Unrolled is faster per step but costs minutes of extra XLA compile
        on the 12/24-layer encoders (scanned compiles ~10x faster); below
        the break-even step count a COLD unrolled program loses on
        wall-clock. The threshold is conservative vs the measured TPU
        numbers in README.md's performance table."""
        cfg = self.base_config
        if cfg.scan_layers != "auto":
            return bool(cfg.scan_layers)
        if cfg.only_test:
            return True
        planned_steps = cfg.epochs * max(len(self.dataloader_train), 1)
        unroll = planned_steps >= 1500
        why = f"{planned_steps} planned train steps"
        if (
            not unroll
            and make_spec is not None
            and planned_steps >= self._SCAN_PROBE_MIN_STEPS
        ):
            try:
                if self._probe_unrolled_cached(make_spec(False)):
                    unroll = True
                    why = (
                        f"{planned_steps} planned train steps, but the "
                        "unrolled program is already compiled in the "
                        "persistent cache"
                    )
            except Exception as e:  # noqa: BLE001 — probe is best-effort
                why += f" (cache probe failed: {e})"
        print(
            f"scan_layers=auto: {'unrolled' if unroll else 'scanned'} encoder "
            f"({why})"
        )
        return not unroll

    def _probe_unrolled_cached(self, spec_unrolled) -> bool:
        """Would the unrolled train program be a persistent-compile-cache
        hit?

        Rebuilds the EXACT program the Trainer would compile FIRST — the
        K-step chunk program when --multi_step_chunk and the device cache
        are active (the TPU default), the single-step program otherwise —
        then lowers it and asks the cache (no compilation either way).
        Probing the wrong program reads a warm cache as cold: that is how
        the round-4 chunked Trainer silently broke scan_layers=auto."""
        from wav2vec2forbrain_tpu.util.compile_probe import lowered_is_cached

        lowered = self._lower_trainer_program(spec_unrolled)
        return lowered is not None and lowered_is_cached(lowered) is True

    def _trainer_would_chunk(self) -> bool:
        """Mirror of the Trainer's chunked-epoch condition WITHOUT building
        the device cache: chunk size K >= 2 and the train split's cache
        mode resolves on for this platform (train_loop._train_epoch
        dispatches chunks only when both hold)."""
        if self.resolve_multi_step_chunk() < 2:
            return False
        mode = getattr(self.base_config, "device_data_cache", "off")
        if mode == "off":
            return False
        if mode == "auto" and jax.devices()[0].platform not in ("tpu", "gpu"):
            return False
        return True

    def _lower_trainer_program(self, spec):
        """Lower the train program the Trainer will actually compile first
        for `spec` (chunked or single-step), or None when its shapes can't
        be predicted."""
        if self._trainer_would_chunk():
            return self._lower_multi_step(spec, self.resolve_multi_step_chunk())
        lowered = self._lower_train_step(spec)
        return None if lowered is None else lowered[0]

    def _lower_multi_step(self, spec, k: int):
        """Lower the (K, width) train chunk program exactly as the Trainer
        compiles it (train/steps.py::build_multi_step): same builder jit
        (donation, static width), the device cache's arrays abstracted at
        their real shapes with the mesh-replicated placement
        DeviceDatasetCache.upload gives them, index/mask/valid matrices as
        the uncommitted host arrays _train_epoch_chunked feeds, and the
        canonical rng sharding. None when shapes can't be predicted
        (multi-bucket or multichannel configs compile several programs —
        stay conservative and let auto keep the scanned encoder)."""
        cfg = self.base_config
        if getattr(cfg, "length_buckets", "off") != "off":
            return None
        shapes = self._predict_batch_shapes()
        if shapes is None:
            return None
        t_max, u_max, n_ch = shapes
        n = len(self.dataloader_train.dataset)
        env = self._abstract_step_env(spec)

        from wav2vec2forbrain_tpu.train.steps import build_multi_step

        multi_step = build_multi_step(
            spec,
            env.tlabels,
            env.tx,
            self._step_cfg(),
            state_constraints=self._state_constraints(
                env.trainable, env.opt_state
            ),
            time_axis=self._cache_time_axis(),
        )

        rep = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(self.mesh, PartitionSpec())

        def cache_abs(shape, dtype):
            return jax.ShapeDtypeStruct(shape, dtype, sharding=rep)

        wire_dt = _wire_jnp_dtype(getattr(cfg, "h2d_dtype", "float32"))
        cache_arrays = (
            cache_abs((n, t_max, n_ch), wire_dt),
            cache_abs((n, u_max), jnp.int32),
            cache_abs((n,), jnp.int32),
            cache_abs((n,), jnp.int32),
            cache_abs((n,), jnp.int32),
        )
        data_axis = self.mesh.shape["data"] if self.mesh is not None else 1
        b = ((cfg.batch_size + data_axis - 1) // data_axis) * data_axis
        return multi_step.lower(
            env.with_shardings(env.trainable),
            env.with_shardings(env.frozen),
            env.with_opt_shardings(env.opt_state),
            env.with_shardings(env.model_state),
            cache_arrays,
            jax.ShapeDtypeStruct((k, b), jnp.int32),
            jax.ShapeDtypeStruct((k, b), jnp.float32),
            jax.ShapeDtypeStruct((k,), jnp.bool_),
            self._rng_abstract(),
            1e-4,
            1e-5,
            t_max,
        )

    def _lower_train_step(self, spec):
        """Lower the exact train-step program the Trainer would run for
        `spec` (same build_steps jit, mesh shardings, predicted
        single-bucket batch shapes) WITHOUT compiling it.

        Returns (lowered, live_bytes) — live_bytes is the footprint of the
        buffers that would be resident alongside the step's temporaries:
        params + opt state + model state + one batch — or None when batch
        shapes can't be predicted (multi-bucket/channel configs)."""
        cfg = self.base_config
        shapes = self._predict_batch_shapes()
        if shapes is None:
            return None
        t_max, u_max, n_ch = shapes
        from wav2vec2forbrain_tpu.data.batch import B2tBatch

        env = self._abstract_step_env(spec)
        train_step, _ = build_steps(
            spec,
            env.tlabels,
            env.tx,
            env.step_cfg,
            state_constraints=self._state_constraints(
                env.trainable, env.opt_state
            ),
        )

        wire_dt = _wire_jnp_dtype(getattr(cfg, "h2d_dtype", "float32"))
        # the Trainer pads every batch up to batch_size rounded to the data
        # axis (train_loop.Trainer._put) — the compiled program's row count
        data_axis = self.mesh.shape["data"] if self.mesh is not None else 1
        b = ((cfg.batch_size + data_axis - 1) // data_axis) * data_axis
        bs = self.batch_sharding_fn

        def batch_abs(shape, dtype):
            return jax.ShapeDtypeStruct(shape, dtype, sharding=bs)

        batch = B2tBatch(
            input=batch_abs((b, t_max, n_ch), wire_dt),
            target=batch_abs((b, u_max), jnp.int32),
            day_idxs=batch_abs((b,), jnp.int32),
            input_lens=batch_abs((b,), jnp.int32),
            target_lens=batch_abs((b,), jnp.int32),
            sample_mask=batch_abs((b,), jnp.float32),
        )
        rng_abs = self._rng_abstract()
        lowered = train_step.lower(
            env.with_shardings(env.trainable),
            env.with_shardings(env.frozen),
            env.with_opt_shardings(env.opt_state),
            env.with_shardings(env.model_state),
            batch,
            rng_abs,
            1e-4,
            1e-5,
        )

        def tree_bytes(tree):
            return sum(
                int(np.prod(a.shape)) * a.dtype.itemsize
                for a in jax.tree_util.tree_leaves(tree)
            )

        live = tree_bytes(
            (env.trainable, env.frozen, env.opt_state, env.model_state, batch)
        )
        return lowered, live

    def _abstract_step_env(self, spec):
        """Abstract train-state trees (trainable/frozen/opt/model-state via
        eval_shape — no real allocation), the optimizer, and the
        sharding-attach helpers the program-lowering probes share. The trees
        and shardings must match Trainer construction EXACTLY or a lowered
        probe program keys differently from the real compile."""
        cfg = self.base_config
        params_abs, state_abs = jax.eval_shape(
            lambda k: init_model_params(k, spec),
            jax.random.PRNGKey(0),
        )
        labels = param_labels(params_abs, cfg.unfreeze_strategy)
        trainable_abs, frozen_abs = partition_params(params_abs, labels)
        tlabels = prune_labels(labels, trainable_abs)
        tx = make_optimizer(
            tlabels,
            optimizer=cfg.optimizer,
            weight_decay=cfg.weight_decay,
            eps=cfg.optimizer_epsilon,
            mu_dtype=_mu_dtype(cfg),
            nu_dtype=_nu_dtype(cfg),
        )
        opt_abs = jax.eval_shape(tx.init, trainable_abs)

        def _attach(tree, shardings):
            return jax.tree_util.tree_map(
                lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
                tree,
                shardings,
            )

        def with_shardings(tree):
            return _attach(tree, param_shardings(tree, self.mesh))

        def with_opt_shardings(tree):
            if not self._zero1_active():
                return with_shardings(tree)
            from wav2vec2forbrain_tpu.parallel.zero import opt_state_shardings

            return _attach(tree, opt_state_shardings(tree, self.mesh))

        return SimpleNamespace(
            trainable=trainable_abs,
            frozen=frozen_abs,
            opt_state=opt_abs,
            model_state=state_abs,
            tlabels=tlabels,
            tx=tx,
            step_cfg=self._step_cfg(),
            with_shardings=with_shardings,
            with_opt_shardings=with_opt_shardings,
        )

    # accept a remat policy only when the resident buffers plus the step's
    # XLA-reported temporaries leave this fraction of HBM free for the eval
    # executable's temps and allocator slack (fragmentation next to
    # long-lived buffers is what made a fitting-but-tight policy slower
    # end-to-end in round 2)
    _REMAT_HBM_MARGIN = 0.90

    def _resolve_remat_policy(self, make_spec) -> str:
        """--remat_policy=auto for the scanned encoder: pick the fastest
        policy whose memory footprint fits the device.

        'dots_nowide' (save every matmul output except the (B,T,4096)-wide
        FFN intermediates) steps ~15% faster than 'min' but keeps ~24x more
        residuals; whether it fits depends on batch/seq/model size and on
        what else is resident (params, opt state, device dataset cache).
        Rather than model that by hand, AOT-compile the candidate program
        and ask XLA for its temp footprint (`compiled.memory_analysis()`):
        accepted only if live bytes + temps fit within _REMAT_HBM_MARGIN of
        the reported HBM limit. The probe compile is a scanned program
        (tens of seconds) and warms the persistent cache for future
        processes of this config (the Trainer's own jit in THIS process
        re-traces to a different Mosaic payload — see
        bench.py::bench_isolated_step — so one scanned compile is the
        real cost of the probe). On CPU (tests/smokes) the answer is
        always 'min': there is no HBM to budget and golden numerics
        expect the default."""
        if jax.devices()[0].platform not in ("tpu", "gpu"):
            return "min"
        # fastest-first; fall through to the next candidate when the AOT
        # memory analysis says a policy does not fit HBM
        for candidate in ("blocks", "dots_nowide"):
            try:
                lowered = self._lower_train_step(
                    make_spec(True, remat=candidate)
                )
                if lowered is None:
                    return "min"
                lowered, live = lowered
                compiled = lowered.compile()
                temps = int(compiled.memory_analysis().temp_size_in_bytes)
                limit = self._hbm_bytes_limit()
                need = live + temps + self._estimate_device_cache_bytes()
                ok = need <= self._REMAT_HBM_MARGIN * limit
                print(
                    "remat_policy=auto: "
                    f"{candidate if ok else 'next candidate'} "
                    f"(live+temps {need / 2**30:.2f}G vs "
                    f"{self._REMAT_HBM_MARGIN:.0%} of {limit / 2**30:.2f}G HBM)"
                )
                if ok:
                    # the cache-budget probe asks for the chosen program's
                    # footprint next; spare it the identical compile
                    self._remat_probe_mem = (candidate, live, temps)
                    return candidate
            except Exception as e:  # noqa: BLE001 — chooser is best-effort
                print(f"remat_policy=auto: probe for {candidate} failed: {e}")
        return "min"

    @staticmethod
    def _hbm_bytes_limit() -> int:
        """Device memory capacity for the HBM-budget probes.
        `memory_stats()` is None through the axon remote-attach tunnel;
        fall back to the v5e usable-HBM figure measured in round 2
        (allocations succeeded at 15.75G, failed 60M above it)."""
        stats = jax.local_devices()[0].memory_stats()
        if stats and stats.get("bytes_limit"):
            return int(stats["bytes_limit"])
        return int(15.75 * 2**30)

    def _estimate_device_cache_bytes(self) -> int:
        """Upper-bound estimate of --device_data_cache HBM usage, for the
        remat chooser (the caches are built later, at Trainer setup)."""
        cfg = self.base_config
        if getattr(cfg, "device_data_cache", "off") == "off":
            return 0
        shapes = self._predict_batch_shapes()
        if shapes is None:
            return 0
        t_max, _u_max, n_ch = shapes
        wire = {"float32": 4, "float16": 2, "bfloat16": 2}[
            getattr(cfg, "h2d_dtype", "float32")
        ]
        n = sum(
            len(dl.dataset)
            for dl in (
                self.dataloader_train,
                self.dataloader_val,
                self.dataloader_test,
            )
        )
        est = n * t_max * n_ch * wire
        cap = getattr(cfg, "device_data_cache_max_bytes", None)
        if getattr(cfg, "device_data_cache", "off") == "auto" and cap:
            est = min(est, int(cap))
        return est

    def _predict_batch_shapes(self):
        """(T, U, C) of the dataset-wide padding bucket — the shapes every
        full batch runs at under a single-bucket config (and exactly the
        device-cache shapes). None when the train split is empty."""
        ds = self.dataloader_train.dataset
        n = len(ds)
        if n == 0:
            return None
        multiple_channels = self.base_config.preprocessing in (
            "seperate_zscoring_2channels",
            "seperate_zscoring_4channels",
        )
        if multiple_channels:
            return None  # (B, ch, T, F) layouts: no single predicted shape
        from wav2vec2forbrain_tpu.data.dataset import _PUNCTUATION_RE
        from wav2vec2forbrain_tpu.util.seq import round_up

        samples = [ds[i] for i in range(n)]
        t_max = round_up(
            max(s.input.shape[0] for s in samples),
            self.base_config.pad_to_multiple,
        )
        labels = [
            _PUNCTUATION_RE.sub("", s.target)
            if self.base_config.remove_punctuation
            else s.target
            for s in samples
        ]
        ids = self.tokenizer(labels, padding="longest").input_ids
        u_max = round_up(
            ids.shape[1], self.base_config.target_pad_to_multiple
        )
        return t_max, u_max, samples[0].input.shape[-1]

    def _build_model(self):
        cfg = self.base_config
        from wav2vec2forbrain_tpu.ops.select import set_kernel_policy

        set_kernel_policy(cfg.pallas_kernels)
        latent = PRETRAINED_LATENT_SIZES[cfg.wav2vec_checkpoint]
        enc_cfg = self._encoder_config()

        def make_spec(scan: bool, remat: str = None) -> ModelSpec:
            return ModelSpec.from_args(
                cfg,
                latent_size=latent,
                encoder_family=self.ENCODER_FAMILY,
                encoder_cfg=enc_cfg,
                ctc_loss_reduction=cfg.ctc_loss_reduction,
                compute_dtype=(
                    jnp.bfloat16
                    if cfg.compute_dtype == "bfloat16"
                    else jnp.float32
                ),
                use_pallas=cfg.use_pallas,
                scan_layers=scan,
                remat_policy=remat or cfg.remat_policy,
                activation_dtype=(
                    jnp.bfloat16
                    if cfg.activation_dtype == "bfloat16"
                    else jnp.float32
                ),
            )

        scan = self._resolve_scan_layers(make_spec)
        remat = cfg.remat_policy
        if remat == "auto":
            # only the scanned layer loop is remat'd; pin the unrolled
            # spec's field to the baseline so the spec is deterministic
            remat = self._resolve_remat_policy(make_spec) if scan else "min"
        self.spec = make_spec(scan, remat)
        self._init_rng, k = jax.random.split(self._init_rng)
        params, state = init_model_params(k, self.spec)

        if not cfg.w2v_skip_loading_weights:
            enc, head, enc_state = load_pretrained_encoder(
                cfg.wav2vec_checkpoint, cache_dir=self.yaml_config.cache_dir
            )
            enc = jax.tree_util.tree_map(jnp.asarray, enc)
            enc_state = jax.tree_util.tree_map(jnp.asarray, enc_state)
            if self.spec.scan_layers:
                if self.ENCODER_FAMILY == "conformer":
                    from wav2vec2forbrain_tpu.models.conformer import (
                        stack_conformer_layers,
                    )

                    enc, inner = stack_conformer_layers(
                        enc, enc_state["encoder"]
                    )
                    enc_state = {"encoder": inner}
                else:
                    from wav2vec2forbrain_tpu.models.wav2vec2 import (
                        stack_w2v_layers,
                    )

                    enc = stack_w2v_layers(enc)
            params["w2v"] = {
                "encoder": enc,
                "lm_head": jax.tree_util.tree_map(jnp.asarray, head),
            }
            state = enc_state

        if cfg.brain_encoder_path is not None:
            # partial brain-encoder restore (ref: brain_feature_extractor.py:96-123)
            loaded, _ = load_checkpoint(cfg.brain_encoder_path)
            from flax import serialization

            params["brain"] = serialization.from_state_dict(
                jax.device_get(params["brain"]), loaded
            )

        self.labels = param_labels(params, cfg.unfreeze_strategy)
        trainable, frozen = partition_params(params, self.labels)
        self.trainable_labels = prune_labels(self.labels, trainable)

        # place on mesh (params replicated unless a model axis is configured)
        self.trainable = self.shard_params(trainable)
        self.frozen = self.shard_params(frozen)
        self.model_state = self.shard_params(state)

    def shard_params(self, tree):
        shardings = param_shardings(tree, self.mesh)
        return jax.tree_util.tree_map(jax.device_put, tree, shardings)

    def canonical_rng(self, key):
        """Place a PRNG key mesh-replicated, matching the sharding TYPE of
        the step programs' rng OUTPUT. A fresh `jax.random.PRNGKey` is
        mesh-less (`u32[4]({})`) while the rng threaded out of a jitted step
        is mesh-typed (`u32[4]({Auto: ('data','model')})`); feeding the
        fresh key to the first call and the output key to the second gives
        two different signatures and recompiles the entire step/chunk
        program (a second ~2-min compile for the unrolled conformer, paid in
        epoch 2). Canonicalizing at every rng entry point (init, reset,
        checkpoint restore) makes call 1 and call N identical."""
        if self.mesh is None:
            return key
        from jax.sharding import NamedSharding, PartitionSpec

        return jax.device_put(key, NamedSharding(self.mesh, PartitionSpec()))

    def _rng_abstract(self):
        """Abstract value of the rng the Trainer feeds its step programs:
        the active PRNG impl's key shape/dtype WITH canonical_rng's
        mesh-replicated sharding attached. A sharding-less rng abstract
        lowers to a different entry-parameter sharding and therefore a
        different persistent-compile-cache key than the Trainer's real
        compile — the mismatch that silently broke the scan_layers=auto
        warm-cache probe when canonical_rng landed."""
        k = jax.random.PRNGKey(0)
        if self.mesh is None:
            return jax.ShapeDtypeStruct(k.shape, k.dtype)
        from jax.sharding import NamedSharding, PartitionSpec

        return jax.ShapeDtypeStruct(
            k.shape, k.dtype, sharding=NamedSharding(self.mesh, PartitionSpec())
        )

    def _zero1_active(self) -> bool:
        return (
            getattr(self.base_config, "optimizer_state_sharding", "replicated")
            == "zero1"
            and self.mesh is not None
            and self.mesh.shape["data"] > 1
        )

    def shard_opt_state(self, tree):
        """Place optimizer state on the mesh (replicated or ZeRO-1 layout).

        Used at init and on train-state restore so a resumed run lands in
        the same layout it checkpointed from."""
        if not self._zero1_active():
            return self.shard_params(tree)
        from wav2vec2forbrain_tpu.parallel.zero import opt_state_shardings

        return jax.tree_util.tree_map(
            jax.device_put, tree, opt_state_shardings(tree, self.mesh)
        )

    def _state_constraints(self, trainable, opt_state):
        """(trainable, opt_state) output-sharding pins for build_steps when
        ZeRO-1 is on; None keeps the propagation-only default."""
        if not self._zero1_active():
            return None
        from wav2vec2forbrain_tpu.parallel.zero import opt_state_shardings

        return (
            param_shardings(trainable, self.mesh),
            opt_state_shardings(opt_state, self.mesh),
        )

    def _step_cfg(self) -> StepConfig:
        cfg = self.base_config
        return StepConfig(
            gradient_clipping=cfg.gradient_clipping,
            white_noise_sd=cfg.whiteNoiseSD,
            constant_offset_sd=cfg.constantOffsetSD,
        )

    def _build_optimizer_and_steps(self):
        cfg = self.base_config
        self.tx = make_optimizer(
            self.trainable_labels,
            optimizer=cfg.optimizer,
            weight_decay=cfg.weight_decay,
            eps=cfg.optimizer_epsilon,
            mu_dtype=_mu_dtype(cfg),
            nu_dtype=_nu_dtype(cfg),
        )
        # place with explicit NamedShardings (like params): jit-inferred
        # output shardings leave some leaves on empty-mesh/unannotated
        # shardings, which would make the train step's lowered module differ
        # from the scan_layers=auto cache probe's reconstruction
        self.opt_state = self.shard_opt_state(jax.jit(self.tx.init)(self.trainable))
        self.train_step, self.eval_step = build_steps(
            self.spec,
            self.trainable_labels,
            self.tx,
            self._step_cfg(),
            state_constraints=self._state_constraints(self.trainable, self.opt_state),
        )
        self.lr_schedules = self._make_lr_schedules()

    def _make_lr_schedules(self) -> LRSchedules:
        cfg = self.base_config
        if cfg.unfreeze_strategy == "brain_encoder":
            # frozen w2v: default StepLR on the brain group
            # (ref: b2t_gru_w2v_experiment.py:150-158, experiment.py:356-364)
            assert cfg.w2v_learning_rate is None, (
                "w2v_learning_rate can only be set if unfreeze strategy is "
                "brain_encoder+w2v"
            )
            assert cfg.w2v_warmup_steps is None, (
                "w2v_warmup_steps can only be set if unfreeze strategy is "
                "brain_encoder+w2v"
            )
            assert cfg.adjust_global_lr_to_w2v_postwarmup_lr is None, (
                "adjust_global_lr_to_w2v_postwarmup_lr can only be set if "
                "unfreeze strategy is brain_encoder+w2v"
            )
            brain = step_lr(
                cfg.learning_rate, cfg.scheduler_step_size, cfg.scheduler_gamma
            )
            return LRSchedules(brain=brain, w2v=lambda e: 0.0)
        return two_module_warmup_schedules(
            cfg.learning_rate,
            cfg.w2v_warmup_start_step or 0,
            cfg.w2v_warmup_steps or 0,
            (
                cfg.w2v_learning_rate
                if cfg.w2v_learning_rate is not None
                else cfg.learning_rate
            ),
            cfg.adjust_global_lr_to_w2v_postwarmup_lr == True,
        )

    # --- multi-step epoch chunks ---------------------------------------------

    def resolve_multi_step_chunk(self) -> int:
        """Chunk size K for the multi-step epoch program (0 = off).

        'auto' enables K=32 on accelerators (where each dispatch/fetch is an
        RTT worth amortizing — measured 70-85 ms through the axon tunnel,
        tools/profile_e2e.py; larger K amortizes further, tail slots are
        lax.cond-skipped so over-sized chunks cost ~nothing, and compile
        time is K-independent under lax.scan) and stays off elsewhere; the
        Trainer additionally requires the split's device cache to be
        resident."""
        v = getattr(self.base_config, "multi_step_chunk", "off")
        if v == "off":
            return 0
        if v == "auto":
            return 32 if jax.devices()[0].platform in ("tpu", "gpu") else 0
        return max(0, int(v))

    def _cache_time_axis(self) -> int:
        """Time axis within a cached sample (1 for the (ch, T, F)
        multichannel layouts, 0 for the standard (T, C) one)."""
        return (
            1
            if self.base_config.preprocessing
            in ("seperate_zscoring_2channels", "seperate_zscoring_4channels")
            else 0
        )

    def get_multi_step(self):
        """The K-step train chunk program (lazy: compiled only when the
        Trainer actually chunks an epoch). K itself is carried by the index
        matrix's shape, so one builder serves any chunk size."""
        if not hasattr(self, "_multi_step"):
            from wav2vec2forbrain_tpu.train.steps import build_multi_step

            self._multi_step = build_multi_step(
                self.spec,
                self.trainable_labels,
                self.tx,
                self._step_cfg(),
                state_constraints=self._state_constraints(
                    self.trainable, self.opt_state
                ),
                time_axis=self._cache_time_axis(),
            )
        return self._multi_step

    def get_multi_eval(self):
        """The K-batch eval chunk program (no logits; lazy)."""
        if not hasattr(self, "_multi_eval"):
            from wav2vec2forbrain_tpu.train.steps import build_multi_eval

            self._multi_eval = build_multi_eval(
                self.spec,
                self.trainable_labels,
                self.tx,
                self._step_cfg(),
                time_axis=self._cache_time_axis(),
            )
        return self._multi_eval

    # --- device-resident dataset cache --------------------------------------

    def get_device_caches(self) -> dict:
        """{split: DeviceDatasetCache} per --device_data_cache; built on the
        first call (i.e. at Trainer construction, after model params are
        placed) and empty when disabled. See train/device_cache.py."""
        if not hasattr(self, "_device_caches"):
            self._device_caches = self._build_device_caches()
        return self._device_caches

    def _build_device_caches(self) -> dict:
        cfg = self.base_config
        mode = getattr(cfg, "device_data_cache", "off")
        if mode == "off":
            return {}
        if mode == "auto" and jax.devices()[0].platform not in ("tpu", "gpu"):
            # auto is an accelerator optimization; tests opt in with 'on'
            return {}
        from wav2vec2forbrain_tpu.train.device_cache import build_split_caches

        max_bytes = None
        if mode == "auto":
            max_bytes = cfg.device_data_cache_max_bytes
            fit = self._device_cache_hbm_budget()
            if fit is not None:
                max_bytes = min(max_bytes, fit)
        return build_split_caches(
            {
                "train": self.dataloader_train,
                "val": self.dataloader_val,
                "test": self.dataloader_test,
            },
            self.tokenizer,
            cfg,
            mesh=self.mesh,
            batch_sharding=self.batch_sharding_fn,
            max_bytes=max_bytes,
        )

    def _device_cache_hbm_budget(self):
        """HBM left for the dataset cache NEXT TO the actual train-step
        program, via the same AOT memory analysis the remat chooser uses
        (a static per-run flag cap cannot know this: e.g. the scanned
        min-remat program at the headline batch leaves <243 MB free, so a
        cache that 'fits its cap' OOMs the first step).

        Probed only for SCANNED programs: their compiles cost tens of
        seconds, and they are the memory-tight ones (remat exists because
        unrolled residuals never fit at all; the unrolled bench config is
        measured to fit next to the cache). An in-process re-trace lowers
        to a different Mosaic payload than the Trainer's own jit (see
        bench.py::bench_isolated_step), so this probe compile is NOT
        reused — minutes of unrolled compile would be paid twice.
        None = can't tell: fall back to the configured cap alone."""
        if not self.spec.scan_layers:
            return None
        try:
            probed = getattr(self, "_remat_probe_mem", None)
            if probed is not None and probed[0] == self.spec.remat_policy:
                _, live, temps = probed
            else:
                lowered = self._lower_train_step(self.spec)
                if lowered is None:
                    return None
                lowered, live = lowered
                mem = lowered.compile().memory_analysis()
                temps = int(mem.temp_size_in_bytes)
            limit = self._hbm_bytes_limit()
            budget = int(self._REMAT_HBM_MARGIN * limit - live - temps)
            print(
                "device_data_cache: HBM budget next to the train step "
                f"{budget / 1e6:.0f} MB"
            )
            return max(budget, 0)
        except Exception as e:  # noqa: BLE001 — sizing probe is best-effort
            print(f"device_data_cache: HBM budget probe failed ({e})")
            return None

    # --- evaluator ----------------------------------------------------------

    def _make_lm_decoder(self):
        cfg = self.base_config
        if not cfg.lm_decode_test_predictions:
            return None
        # real n-gram models are GBs — build the decoder (and parse the ARPA)
        # once, not per test evaluator
        if hasattr(self, "_lm_decoder_cache"):
            return self._lm_decoder_cache
        try:
            from wav2vec2forbrain_tpu.decode.lm_decode import make_lm_decoder

            self._lm_decoder_cache = make_lm_decoder(
                vocab=self.tokenizer.get_vocab_list(),
                lm_path=self.yaml_config.n3gram_lm_model_path,
                beam_width=cfg.lm_decode_beam_width,
                beam_prune_logp=cfg.lm_decode_beam_prune_logp,
                token_min_logp=cfg.lm_decode_token_min_logp,
                alpha=cfg.lm_decode_alpha,
                beta=cfg.lm_decode_beta,
                score_boundary=cfg.lm_score_boundary,
            )
        except Exception as e:
            print(f"WARNING: LM decoder unavailable ({e}); greedy decode only")
            self._lm_decoder_cache = None
        return self._lm_decoder_cache

    def create_evaluator(
        self,
        mode: Literal["train", "val", "test"],
        track_non_test_predictions: bool = False,
    ):
        return EvaluatorWithLMDecoder(
            self.tokenizer,
            mode,
            lm_decoder=self._make_lm_decoder() if mode == "test" else None,
            track_non_test_predictions=track_non_test_predictions,
            lm_decode_test_predictions=self.base_config.lm_decode_test_predictions,
            crop_lens=self.base_config.greedy_decode_crop_lens,
        )

    def decode_predictions(self, pred_ids, targets=None):
        """Greedy CTC decode (ref: b2t_experiment.py:53-65)."""
        predicted = self.tokenizer.batch_decode(pred_ids, group_tokens=True)
        labels = (
            self.tokenizer.batch_decode(targets, group_tokens=False)
            if targets is not None
            else None
        )
        return predicted, labels

    # --- checkpointing ------------------------------------------------------

    def _merged_params(self):
        return merge_params(
            jax.device_get(self.trainable), jax.device_get(self.frozen)
        )

    def _normalize_encoder_layout(self, params: dict, state: dict, template: dict):
        """Convert a checkpoint between per-layer-list and scan-stacked
        encoder layouts to match the current --scan_layers setting."""
        enc_t = template["w2v"]["encoder"]
        enc_l = params.get("w2v", {}).get("encoder", {})
        want_stacked = "layers_stacked" in enc_t
        have_stacked = "layers_stacked" in enc_l
        if want_stacked == have_stacked:
            return params, state
        def destr(d):
            # msgpack state dicts index lists as {"0": ..., "1": ...}
            if isinstance(d, dict) and d and all(k.isdigit() for k in d):
                return [destr(d[str(i)]) for i in range(len(d))]
            if isinstance(d, dict):
                return {k: destr(v) for k, v in d.items()}
            return d

        enc_l = destr(enc_l)
        st_l = destr(state) if state else state
        if self.ENCODER_FAMILY == "conformer":
            from wav2vec2forbrain_tpu.models.conformer import (
                stack_conformer_layers,
                unstack_conformer_layers,
            )

            n = self.spec.conformer_cfg.num_hidden_layers
            if want_stacked:
                enc_l, inner = stack_conformer_layers(
                    enc_l, st_l["encoder"]
                )
                st_l = {"encoder": inner}
            else:
                enc_l, inner = unstack_conformer_layers(
                    enc_l, st_l["encoder"], n
                )
                st_l = {"encoder": inner}
        else:
            from wav2vec2forbrain_tpu.models.wav2vec2 import (
                stack_w2v_layers,
                unstack_w2v_layers,
            )

            n = self.spec.w2v_cfg.num_hidden_layers
            enc_l = (
                stack_w2v_layers(enc_l)
                if want_stacked
                else unstack_w2v_layers(enc_l, n)
            )
        params = dict(params)
        params["w2v"] = dict(params["w2v"])
        params["w2v"]["encoder"] = enc_l
        return params, st_l

    def _load_full_checkpoint(self, path: str):
        from flax import serialization

        params, state = load_checkpoint(path)
        template = self._merged_params()
        params, state = self._normalize_encoder_layout(params, state, template)
        # normalization may introduce real python lists; from_state_dict
        # expects the {"0": ...} indexed form
        params = serialization.to_state_dict(params)
        state = serialization.to_state_dict(state)
        params = serialization.from_state_dict(template, params)
        trainable, frozen = partition_params(params, self.labels)
        self.trainable = self.shard_params(trainable)
        self.frozen = self.shard_params(frozen)
        if state:
            self.model_state = self.shard_params(
                serialization.from_state_dict(
                    jax.device_get(self.model_state), state
                )
            )

    def store_trained_model(self):
        save_checkpoint(
            os.path.join(self.results_dir, "model.msgpack"),
            self._merged_params(),
            jax.device_get(self.model_state),
        )
        if getattr(self.base_config, "store_brain_encoder", False):
            # (ref: b2t_gru_w2v_experiment.py:202-207)
            save_subtree(
                os.path.join(self.results_dir, "brain_encoder.msgpack"),
                self._merged_params()["brain"],
            )

    # --- run ----------------------------------------------------------------

    def run(self):
        from wav2vec2forbrain_tpu.train.train_loop import Trainer

        self.logger = make_logger(
            self.results_dir,
            self.raw_config,
            self.base_config.use_wandb,
            wandb_api_key=self.yaml_config.wandb_api_key,
            wandb_project=self.yaml_config.wandb_project_name,
            wandb_entity=self.yaml_config.wandb_entity,
            experiment_name=self.base_config.experiment_name,
        )
        trainer = Trainer(self)
        try:
            if not self.base_config.only_test:
                history = trainer.train()
                # adopt trainer's (possibly best-reloaded) device state
                self.trainable = trainer.trainable
                self.frozen = trainer.frozen
                self.opt_state = trainer.opt_state
                self.model_state = trainer.model_state
                from wav2vec2forbrain_tpu.parallel.distributed import (
                    is_coordinator,
                )

                # artifact writes: coordinator only (every process holds
                # identical history/metrics; multi-host runs share one
                # results tree)
                if self.base_config.store_final_model and is_coordinator():
                    self.store_trained_model()
                if is_coordinator():
                    with open(
                        os.path.join(self.results_dir, "history.json"), "w"
                    ) as f:
                        json.dump(history.to_dict(), f, indent=5)
                    self.plot_results(history)
                    self.process_test_results(history.test_losses)
            else:
                from wav2vec2forbrain_tpu.parallel.distributed import (
                    is_coordinator,
                )

                test_results = self.run_real_world_test(trainer)
                if test_results is not None:
                    self.logger.log(
                        trainer._get_wandb_metrics(test_results, "test")
                    )
                    if is_coordinator():
                        self.process_test_results(test_results)
            if self.base_config.log_results_as_artifact:
                self._log_results_artifact()
            print(f"Done. Saved results to {self.results_dir}")
        finally:
            self.logger.finish()

    def _log_results_artifact(self):
        """W&B results artifact (ref: experiment.py:131-134); no-op without
        an active wandb run."""
        try:
            import wandb

            if wandb.run is not None:
                artifact = wandb.Artifact(
                    name="results", type="experiment_results"
                )
                artifact.add_dir(f"{self.results_dir}/")
                wandb.run.log_artifact(artifact)
        except ImportError:
            print("log_results_as_artifact: wandb not installed, skipping")

    def plot_results(self, history: TrainHistory):
        history.plot(
            os.path.join(self.results_dir, "history.png"),
            loss_name=self.base_config.loss_function,
        )

    def process_test_results(self, test_results: SingleEpochHistory):
        pass

    def run_real_world_test(self, trainer):
        test_results = self._predict_and_store(trainer, "test")
        if self.base_config.predict_on_train:
            self._predict_and_store(trainer, "train")
        return test_results

    def _predict_and_store(self, trainer, mode: Literal["train", "test"]):
        from wav2vec2forbrain_tpu.parallel.distributed import is_coordinator

        prediction = self._predict(trainer, mode)
        if prediction is not None and is_coordinator():
            with open(
                os.path.join(self.results_dir, f"{mode}_predictions.json"), "w"
            ) as f:
                json.dump(prediction.to_dict(), f, indent=5)
        return prediction

    def _predict(self, trainer, mode: Literal["train", "test"]):
        """Lag-1 pipelined prediction pass: batch i+1 is dispatched on the
        device before batch i's full logits are fetched and decoded, so the
        logits D2H (an RTT per batch through remote tunnels — the largest
        fetch the framework does) overlaps the next batch's eval compute.
        Same pipeline shape as the Trainer's epochs; matters most for
        --predict_on_train over the full train split."""
        from wav2vec2forbrain_tpu.parallel.distributed import is_coordinator
        from wav2vec2forbrain_tpu.train.train_loop import _copy_to_host_async

        dataloader = (
            self.dataloader_train if mode == "train" else self.dataloader_test
        )
        evaluator = self.create_evaluator("test" if mode == "test" else "train", True)
        n = len(dataloader)
        pending = None

        def process(loss, logits, logit_lens, pred_ids, host_batch, true_b, i):
            preds = {
                "loss": float(loss),
                "pred_ids": np.asarray(pred_ids)[:true_b],
                "logits": np.asarray(logits)[:true_b],
                "logit_lens": np.asarray(logit_lens)[:true_b],
            }
            evaluator.track_batch(preds, host_batch)
            if (
                i < self.base_config.visualize_predictions_n_batches
                and is_coordinator()
            ):
                out_dir = os.path.join(self.results_dir, f"{mode}_predictions")
                os.makedirs(out_dir, exist_ok=True)
                self.visualize_predictions(
                    host_batch,
                    preds,
                    os.path.join(out_dir, f"batch_{i}.png"),
                    i,
                )
            print(
                f"Running predictions on {mode}. Batch {i + 1}/{n} done\r",
                end="",
            )

        for i, host_batch in enumerate(dataloader):
            batch, true_b = trainer._put(host_batch)
            loss, logits, logit_lens, pred_ids, _metrics = trainer.eval_step(
                trainer.trainable, trainer.frozen, trainer.model_state, batch
            )
            logits, logit_lens, pred_ids = trainer._host_payload(
                logits, logit_lens, pred_ids
            )
            _copy_to_host_async(loss, logits, logit_lens, pred_ids)
            if pending is not None:
                process(*pending)
            pending = (loss, logits, logit_lens, pred_ids, host_batch, true_b, i)
        if pending is not None:
            process(*pending)
        result = evaluator.evaluate()
        evaluator.clean_up()
        return result

    def visualize_predictions(self, batch, preds, out_path: str, batch_id: int):
        """Per-sample probability tables (ref: experiment.py:265-346)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from matplotlib.colors import Normalize

        vocab = self.get_vocab()
        logits = preds["logits"]
        probs = np.exp(logits - logits.max(axis=-1, keepdims=True))
        probs = probs / probs.sum(axis=-1, keepdims=True)
        batch_size, seq_len, vocab_size = probs.shape
        nrows = min(batch_size, 4)
        px = 1 / plt.rcParams["figure.dpi"]
        fig, _axs = plt.subplots(
            nrows=nrows,
            figsize=(
                max(seq_len * 18 * px, 4),
                max(((vocab_size + 1) * 1.5) * nrows * 18 * px, 4),
            ),
        )
        axs = np.atleast_1d(_axs)
        norm = Normalize(vmin=0, vmax=1)
        pred_strs, label_strs = self.decode_predictions(
            np.argmax(probs, axis=-1),
            np.asarray(batch.target) if batch.target is not None else None,
        )
        for sample_index in range(nrows):
            ax = axs[sample_index]
            ax.imshow(
                probs[sample_index].T,
                aspect="auto",
                cmap="Blues",
                norm=norm,
                interpolation="nearest",
            )
            ax.set_yticks(range(vocab_size))
            ax.set_yticklabels(vocab, fontsize=5)
            ax.set_xlabel("frame")
            title = f"pred: {pred_strs[sample_index]!r}"
            if label_strs is not None:
                title += f"  target: {label_strs[sample_index]!r}"
            ax.set_title(title, fontsize=7)
        plt.tight_layout()
        plt.savefig(out_path)
        plt.close(fig)


class B2TGruAndW2VExperiment(B2TGruW2VExperimentBase):
    """b2p2t_gru+w2v (ref: src/experiments/b2t_gru_w2v_experiment.py)."""

    ARGS_MODEL = B2TGruAndW2VArgsModel
    NAME = "b2p2t_gru+w2v"
    ENCODER_FAMILY = "wav2vec2"


class B2TGruAndW2VConformerExperiment(B2TGruW2VExperimentBase):
    """b2p2t_gru+w2v_conformer
    (ref: src/experiments/b2t_gru_w2v_conformer_experiment.py)."""

    ARGS_MODEL = B2TGruAndW2VConformerArgsModel
    NAME = "b2p2t_gru+w2v_conformer"
    ENCODER_FAMILY = "conformer"
