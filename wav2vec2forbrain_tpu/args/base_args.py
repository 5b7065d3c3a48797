"""Argument models (pydantic v2) for the experiment CLI.

Public flag surface mirrors the reference CLI exactly
(ref: src/args/base_args.py:14-134) — same names, same defaults — so a user
of the reference can switch without changing their command lines.
"""

from typing import Literal, Optional, Union

from pydantic import BaseModel, Field, field_validator

# Latent sizes of the supported pretrained wav2vec2 checkpoints
# (ref: src/args/base_args.py:5-11).
PRETRAINED_LATENT_SIZES = {
    "jonatasgrosman/wav2vec2-large-xlsr-53-english": 1024,
    "facebook/wav2vec2-base-960h": 768,
    "facebook/wav2vec2-large-960h": 1024,
    "facebook/wav2vec2-conformer-rope-large-960h-ft": 1024,
    "facebook/wav2vec2-lv-60-espeak-cv-ft": 1024,
}

PreprocessingName = Literal[
    "competition_recommended",
    "seperate_zscoring",
    "only_tx_unnormalized",
    "only_tx_zscored",
    "only_spikepow_unnormalized",
    "only_spikepow_zscored",
    "seperate_zscoring_2channels",
    "seperate_zscoring_4channels",
]


class B2TDatasetArgsModel(BaseModel):
    """Dataset flags (ref: src/args/base_args.py:14-31)."""

    preprocessing: PreprocessingName = "seperate_zscoring"
    competition_mode: bool = False
    limit_samples: Optional[int] = Field(
        default=None, description="Cap the dataset at this many samples (debug/overfit runs)"
    )
    sample_rate: int = 50
    remove_punctuation: bool = True
    area: Literal["6v", "44"] = "6v"


class CTCTextDatasetArgsModel(BaseModel):
    """Flags of the reference's synthetic CTC-text corruption dataset
    (ref: src/args/base_args.py:34-48). VESTIGIAL there: no experiment in
    the reference tree consumes this model (its `b2t_ctc_lm*` experiment
    types are unregistered and crash at dispatch); kept as public module
    surface with the same field names/defaults."""

    limit_samples: Optional[int] = Field(
        default=None, description="Cap the dataset at this many samples"
    )
    train_ratio: float = 0.8
    val_ratio: float = 0.1
    test_ratio: float = 0.1
    avg_num_blank_after_char: int = 6
    insert_wrong_char_prob: float = 0.05
    remove_char_prob: float = 0.05
    noise_mean: float = -16
    noise_std: float = 2
    correct_as_second_prob: float = 0.2
    random_second_id_in_blank_prob: float = 0.1
    cache_generated_samples: bool = False
    remove_punctuation: bool = True


class BaseExperimentArgsModel(BaseModel):
    """Base experiment flags (ref: src/args/base_args.py:50-134).

    Flags that are vestigial in the reference (members of the experiment_type
    Literal that are not registered) are preserved for CLI compatibility but
    only the two registered experiment types run.
    """

    batch_size: int = Field(16, description="Samples per step, shared by the train and val loaders")
    epochs: int = 10
    learning_rate: float = 0.001
    optimizer: Literal["adam", "sgd"] = "adam"
    loss_function: Literal[
        "ctc",
        "contrastive_loss",
        "cross_entropy",
        "bce",
        "ctc+discriminator",
        "combined_ctc",
    ] = "ctc"
    ctc_loss_reduction: Literal["sum", "mean"] = "mean"
    experiment_name: str = "experiment_1"
    experiment_type: Literal[
        "audio_wav2vec2",
        "b2t_audio_wav2vec",
        "onehot_index",
        "b2t_cnn",
        "b2t_gru",
        "b2t_gru+trafo",
        "mvts_transformer",
        "b2t_mamba",
        "ctc_lm",
        "b2t_ctc_lm_mamba_finetuning",
        "b2p2t_mamba",
        "b2p2t_gru",
        "b2p2t_mvtst",
        "timit_w2v_suc",
        "timit_w2v_suc_ctc",
        "b2p_suc",
        "discriminator",
        "b2p2t_gru+w2v",
        "b2p2t_phonemegru+w2v",
        "b2p2t_gru+w2v_conformer",
        "b2p2t_gru_w2vphoneme",
        "a2p_w2vphoneme_head",
        "a2t_w2vphoneme_head",
        "b2p_w2vphoneme_head",
    ] = Field("b2p2t_gru+w2v")
    log_every_n_batches: int = 10
    scheduler: Literal["step"] = "step"
    scheduler_step_size: int = 10
    scheduler_gamma: float = 0.1
    return_best_model: bool = True
    best_model_metric: str = Field(
        "loss",
        description=(
            'Metric that selects the best checkpoint: "loss" (the training '
            "loss function) or the name of any metric the model reports"
        ),
    )
    minimize_best_model_metric: bool = Field(
        True,
        description="True when a smaller best_model_metric is better; false to maximize",
    )
    use_wandb: bool = False
    from_checkpoint: Optional[str] = Field(
        None, description="Start from the weights in this checkpoint file (optional)"
    )
    only_test: bool = Field(False, description="Evaluate the test split directly without any training")
    predict_on_train: bool = Field(
        False, description="Additionally dump predictions for the train split once training ends"
    )
    gradient_clipping: Optional[float] = None
    weight_decay: float = 0.0
    visualize_predictions_n_batches: int = 1
    use_fast_tokenizer: bool = False
    use_prefix_beam_search: bool = True
    beam_search_language_model: str = "openai-community/gpt2"
    whiteNoiseSD: float = 0.0
    constantOffsetSD: float = 0.0
    seed: int = 42
    optimizer_epsilon: float = 1e-8
    early_stopping_patience: Optional[int] = Field(
        None,
        description=(
            "Early-stopping window size n: stop when none of the most recent "
            "n-1 epochs beat the val metric from n epochs ago. Disabled when "
            "unset"
        ),
    )
    early_stopping_delta: float = Field(
        0.0001,
        description=(
            "Val-metric change below this threshold does not count as an "
            "improvement for the early-stopping window"
        ),
    )
    train_on_val_once: bool = Field(
        False, description="Do one extra training pass over the val split after the epoch loop"
    )
    log_results_as_artifact: bool = False
    results_subdir_name: Optional[str] = None

    # --- TPU-native additions (not in the reference CLI; defaults preserve
    # reference semantics where applicable) ---
    pad_to_multiple: int = Field(
        1,
        description=(
            "Round batch time length up to this multiple to bound jit "
            "recompilations (1 = exact reference batch-max padding)"
        ),
    )
    target_pad_to_multiple: int = Field(
        1,
        description=(
            "Round batch target length up to this multiple to bound jit "
            "recompilations (1 = exact reference behaviour)"
        ),
    )
    compute_dtype: Literal["float32", "bfloat16"] = Field(
        "float32",
        description="Matmul/activation dtype on device (params stay float32)",
    )
    activation_dtype: Literal["float32", "bfloat16"] = Field(
        "float32",
        description=(
            "Dtype of the encoder's activation stream between blocks "
            "(residuals and saved backward residuals). bfloat16 halves "
            "the HBM-bound glue traffic and training memory; norm/softmax/"
            "loss internals and params stay float32. float32 = exact "
            "reference numerics"
        ),
    )
    mesh_data_parallel: int = Field(
        0,
        description=(
            "Data-parallel mesh axis size; 0 = use all visible devices "
            "for data parallelism"
        ),
    )
    mesh_model_parallel: int = Field(
        1, description="Model-parallel (tensor) mesh axis size"
    )
    use_pallas: bool = Field(
        False,
        description=(
            "Use fused Pallas TPU kernels (preprocessing chain, biGRU "
            "recurrence, multi-head attention, conv module)"
        ),
    )
    pallas_kernels: str = Field(
        "auto",
        description=(
            "Which Pallas kernels run when --use_pallas is on: 'auto' "
            "(measured best per kernel/dtype), 'all', 'none', or a comma "
            "list from preproc,gru,attention,conv_glu (ops/select.py)"
        ),
    )

    @field_validator("pallas_kernels")
    @classmethod
    def _check_pallas_kernels(cls, v: str) -> str:
        from wav2vec2forbrain_tpu.ops.select import validate_kernel_policy

        validate_kernel_policy(v)
        return v
    scan_layers: Union[bool, Literal["auto"]] = Field(
        "auto",
        description=(
            "Run the encoder's layer loop as one lax.scan over stacked "
            "layer params (identical numerics, ~10x faster compile; the "
            "unrolled chain is faster per step once compiled). 'auto' "
            "unrolls only when the planned step count amortizes the extra "
            "compile time"
        ),
    )
    host_prefetch: bool = Field(
        True,
        description=(
            "Collate/pad/device_put batches one step ahead on a worker "
            "thread so H2D transfers overlap device compute"
        ),
    )
    device_data_cache: Literal["auto", "on", "off"] = Field(
        "auto",
        description=(
            "Keep the whole dataset resident in device HBM (features at "
            "--h2d_dtype) and assemble batches on device with a jitted "
            "gather, eliminating the per-step feature H2D transfer. 'auto' "
            "enables it on accelerator platforms when the splits fit "
            "--device_data_cache_max_bytes; shuffle order is identical to "
            "streaming, every batch runs at the dataset-wide (T, U) bucket "
            "(see train/device_cache.py)"
        ),
    )
    multi_step_chunk: Union[int, Literal["auto", "off"]] = Field(
        "auto",
        description=(
            "Train K optimizer steps per dispatch: a lax.scan whose body "
            "gathers its batch from the device-resident dataset cache and "
            "runs the train step, so the host pays one dispatch + one "
            "stacked-output fetch per K steps instead of per step (each is "
            "an RTT on remote-attached TPUs). Requires the train split to "
            "be cache-resident; numerics are identical to K sequential "
            "steps (same RNG chain and gather contract). 'auto' picks 32 on "
            "accelerators when the cache is resident, 'off' elsewhere; an "
            "integer forces that chunk size. Epoch tails shorter than K are "
            "padded with valid=False slots the scan skips on device (no "
            "extra compute, no state change)"
        ),
    )
    length_bucket_order: Literal["preserve", "grouped"] = Field(
        "preserve",
        description=(
            "Within-epoch TRAIN batch order when length buckets are on: "
            "'preserve' keeps the loader's shuffle order (streaming-"
            "identical numerics; interleaved widths cost one dispatch per "
            "same-width run), 'grouped' stably reorders batches by bucket "
            "width so each width forms one chunkable run (fewest "
            "dispatches; batch composition and per-batch numerics are "
            "unchanged but the optimizer visits batches in a different "
            "order — standard bucketed-training semantics). Eval epochs "
            "always group: their averaged results are order-invariant"
        ),
    )
    precompile_buckets: bool = Field(
        True,
        description=(
            "Compile every (split, bucket width) chunk program BEFORE the "
            "first epoch by dispatching one all-invalid (valid=False) chunk "
            "per width — the scan body is lax.cond-skipped so no compute "
            "runs and no state changes, but XLA compiles the full program. "
            "Without it, a bucket width first hit in a late epoch pays its "
            "~17 s compile inside that epoch (a hidden 8x per-epoch "
            "throughput collapse). Only active when chunking + the device "
            "cache are on"
        ),
    )
    length_sorted_batches: bool = Field(
        False,
        description=(
            "Compose each day's batches from length-sorted samples instead "
            "of a uniform shuffle, so batches are length-homogeneous and "
            "land in the smallest covering length bucket (standard bucketed "
            "batching, e.g. fairseq/torchaudio). Without it a batch's width "
            "is the max of batch_size random draws — nearly every batch "
            "pays the longest bucket. Batch composition becomes "
            "deterministic per day (order still shuffles per epoch); "
            "training numerics differ from the reference's uniform "
            "composition, so this is opt-in"
        ),
    )
    length_buckets: Union[int, Literal["off", "exact"]] = Field(
        "off",
        description=(
            "Length buckets for device-cached batches: each batch is "
            "gathered at the smallest bucket width covering its longest "
            "sample, instead of the dataset-wide max width every batch pays "
            "in single-bucket mode. An integer N derives up to N widths "
            "from the cached splits' length quantiles (rounded to "
            "pad_to_multiple); 'exact' uses every pad_to_multiple width — "
            "each batch then runs at exactly the streaming collate's "
            "batch-max width, i.e. exact reference numerics even for "
            "padding-consuming models (the biGRU, like the reference's "
            "unpacked torch GRU). Costs one step compile per distinct "
            "width hit; pays off on heterogeneous-length data (the real "
            "T12 regime, ~100-700 frames). 'off' (default) keeps the "
            "single dataset-max bucket"
        ),
    )
    device_data_cache_max_bytes: int = Field(
        1_500_000_000,
        description=(
            "Byte budget for --device_data_cache=auto across all splits; "
            "exceeding it falls back to streaming. Sized so the headline "
            "conformer-large training state + the T12 corpus at float16 "
            "coexist in a 16 GB-HBM chip"
        ),
    )
    optimizer_state_sharding: Literal["replicated", "zero1"] = Field(
        "replicated",
        description=(
            "Layout of the optimizer moments across the mesh's data axis. "
            "'zero1' scatters every moment leaf over the data shards (ZeRO "
            "stage 1: each shard owns 1/dp of the Adam state and updates "
            "its slice; XLA inserts the reduce-scatter/all-gather pair), "
            "freeing (dp-1)/dp of the moment HBM per chip. 'replicated' "
            "keeps the single-chip layout. No effect when the data axis "
            "is 1"
        ),
    )
    adam_mu_dtype: Literal["float32", "bfloat16"] = Field(
        "float32",
        description=(
            "Storage dtype of Adam's first moment (optax mu_dtype). "
            "bfloat16 halves the moment's HBM footprint and its read+write "
            "traffic in the fused update (~630 MB and ~2 ms/step for the "
            "317M-param conformer); float32 = exact torch-Adam parity"
        ),
    )
    adam_nu_dtype: Literal["float32", "bfloat16"] = Field(
        "float32",
        description=(
            "Storage dtype of Adam's SECOND moment. bfloat16 cuts another "
            "2 x params bytes off the HBM-bound update's traffic; moments "
            "are computed in float32 each step (storage-only cast), so the "
            "EMA doesn't stall at bfloat16 resolution — the residual is "
            "round-to-nearest noise on the denominator (<=2^-9 relative). "
            "float32 (default) = exact torch-Adam parity"
        ),
    )
    h2d_dtype: Literal["float32", "float16", "bfloat16"] = Field(
        "float32",
        description=(
            "Wire dtype for the neural-feature H2D transfer; the device "
            "upcasts to float32 before the (float32) preprocessing chain. "
            "Halving transfer bytes matters on remote-attached TPUs where "
            "H2D serializes with compute; float16 keeps ~3 decimal digits "
            "of the z-scored features. float32 = exact reference numerics"
        ),
    )
    remat_policy: Literal["auto", "min", "dots", "dots_nowide", "blocks", "all_but_wide", "none"] = Field(
        "auto",
        description=(
            "Rematerialization policy for the scanned encoder layer loop: "
            "'auto' (default) picks the fastest of 'blocks' then "
            "'dots_nowide' whose AOT memory analysis says it fits HBM next "
            "to the resident params/optimizer/dataset-cache buffers, else "
            "'min' ('min' always, off-accelerator); "
            "'min' saves only non-batch matmul outputs (lowest memory), "
            "'dots' saves every matmul output, 'dots_nowide' is 'dots' "
            "minus the wide FFN intermediates, 'blocks' saves only the "
            "named block-boundary tensors in the activation-stream dtype "
            "and recomputes the glue, 'all_but_wide' saves everything "
            "except the wide FFN tensors (small shapes only), 'none' "
            "disables remat entirely (scan saves all residuals)"
        ),
    )
    checkpoint_every_n_epochs: Optional[int] = Field(
        None,
        description=(
            "Periodically save the FULL training state (params, optimizer "
            "moments, batch-norm stats, history) to results_dir/train_state "
            "for failure recovery; resume with --resume_train_state"
        ),
    )
    resume_train_state: Optional[str] = Field(
        None,
        description=(
            "Path to a periodic train_state checkpoint dir/file; restores "
            "params+optimizer+history and continues from the saved epoch "
            "(unlike --from_checkpoint, which restores params only and "
            "restarts schedulers, matching the reference)"
        ),
    )
    greedy_decode_crop_lens: bool = Field(
        False,
        description=(
            "Blank each sample's argmax ids past its own logit length "
            "before greedy decode, so WER/CER score only real frames. "
            "False = reference behaviour (every sample decodes at the "
            "batch-max width; shorter samples' pad frames contribute "
            "argmax garbage to the greedy metric)"
        ),
    )
    store_final_model: bool = Field(
        True,
        description=(
            "Write model.msgpack (and brain_encoder.msgpack when "
            "--store_brain_encoder) to the results dir after training. "
            "False skips the device-to-host parameter fetch — on "
            "remote-attached TPUs pulling the 317M-param conformer takes "
            "minutes; benchmark/sweep harnesses that only consume metrics "
            "can turn it off"
        ),
    )
