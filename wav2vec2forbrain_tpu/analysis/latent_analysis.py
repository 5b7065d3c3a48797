"""Latent-space comparison: brain-derived vs audio-derived w2v latents.

Replaces the reference's latent-analysis tooling
(ref: src/analysis/latent_analysis_util.py:39-222): embed neural recordings
through the trained brain encoder and real speech through the audio conv
frontend, then compare the two latent distributions (cosine similarity,
PCA projections) in BOTH spaces — the pre-encoder features and the
post-w2v-encoder hidden states (the reference's Representations carry
(pre, post) pairs, per-timestep and per-sample-mean;
latent_analysis_util.py:126-161 audio, :165-214 brain). The ElevenLabs TTS
generation step
(`generate_speech_audio`) mirrors the reference's resume-capable
generate→mp3→wav flow and only reaches the network when an API key is
configured; the TTS and mp3→wav callables are injectable so the
orchestration is testable offline.
"""

import os
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

# reference voice/format constants (latent_analysis_util.py:39-46)
ELEVENLABS_VOICE_ID = "pMsXgVXv3BLzUgSXRplE"
ELEVENLABS_OUTPUT_FORMAT = "mp3_22050_32"
AUDIO_SAMPLE_RATE = 16000


def make_elevenlabs_tts(api_key: Optional[str]) -> Optional[Callable]:
    """Real TTS callable (transcription, out_mp3_path) -> None, or None when
    no key / no elevenlabs package is available (offline-safe)."""
    if not api_key or api_key in ("", "<your value here>"):
        return None
    try:
        from elevenlabs.client import ElevenLabs
    except ImportError:
        print("elevenlabs package not installed; skipping TTS generation")
        return None

    client = ElevenLabs(api_key=api_key)

    def tts(transcription: str, out_mp3_path: str):
        audio = client.text_to_speech.convert(
            voice_id=ELEVENLABS_VOICE_ID,
            optimize_streaming_latency="0",
            output_format=ELEVENLABS_OUTPUT_FORMAT,
            text=transcription,
        )
        with open(out_mp3_path, "wb") as f:
            for chunk in audio:
                f.write(chunk)

    return tts


def _default_mp3_to_wav(mp3_path: str, wav_path: str):
    """mp3 -> 16 kHz wav (the reference uses pydub/ffmpeg; gated import)."""
    from pydub import AudioSegment

    audio = AudioSegment.from_file(mp3_path, format="mp3", frame_rate=44100)
    audio = audio.set_frame_rate(AUDIO_SAMPLE_RATE)
    audio.export(wav_path, format="wav")


def generate_speech_audio(
    transcriptions: List[str],
    working_dir: str,
    tts: Optional[Callable] = None,
    mp3_to_wav: Optional[Callable] = None,
    override_existing: bool = False,
) -> Dict[str, object]:
    """TTS generation for the brain-vs-audio comparison, resume-capable like
    the reference (ref: latent_analysis_util.py:55-80): transcript i ->
    mp3/<i>.mp3 -> wav/<i>.wav, skipping files that already exist. Returns
    {"wav_paths": [...], "newly_generated": n, "skipped": m}. With no TTS
    callable, existing audio is reused and missing entries reported rather
    than generated (graceful offline behavior)."""
    mp3_dir = os.path.join(working_dir, "mp3")
    wav_dir = os.path.join(working_dir, "wav")
    os.makedirs(mp3_dir, exist_ok=True)
    os.makedirs(wav_dir, exist_ok=True)
    convert = mp3_to_wav or _default_mp3_to_wav

    wav_paths: List[Optional[str]] = []
    newly = 0
    missing = 0
    for i, transcription in enumerate(transcriptions):
        mp3_path = os.path.join(mp3_dir, f"{i}.mp3")
        wav_path = os.path.join(wav_dir, f"{i}.wav")
        if not os.path.exists(mp3_path) or override_existing:
            if tts is None:
                if not os.path.exists(wav_path):
                    missing += 1
                    wav_paths.append(None)
                    continue
                wav_paths.append(wav_path)
                continue
            tts(transcription, mp3_path)
            newly += 1
        if not os.path.exists(wav_path) or override_existing:
            convert(mp3_path, wav_path)
        wav_paths.append(wav_path)
    return {
        "wav_paths": wav_paths,
        "newly_generated": newly,
        "missing": missing,
    }


def load_wav_batches(wav_paths: List[Optional[str]], batch_size: int = 8):
    """Yield zero-padded (B, T) float32 audio batches for embed_audio."""
    import soundfile

    clips = []
    for p in wav_paths:
        if p is None:
            continue
        data, _sr = soundfile.read(p)
        clips.append(np.asarray(data, np.float32))
    for i in range(0, len(clips), batch_size):
        chunk = clips[i : i + batch_size]
        t = max(len(c) for c in chunk)
        yield np.stack([np.pad(c, (0, t - len(c))) for c in chunk])


def embed_brain(
    experiment, max_batches: Optional[int] = None
) -> np.ndarray:
    """(N, latent) brain latents: preprocessing chain + GRU + FC, i.e. the
    encoder input the w2v stack sees."""
    import jax
    import jax.numpy as jnp

    latents = []
    spec = experiment.spec
    params = jax.tree_util.tree_map(
        jnp.asarray, experiment._merged_params()
    )
    from wav2vec2forbrain_tpu.models.gru import apply_gru
    from wav2vec2forbrain_tpu.models.fc import apply_fc
    from wav2vec2forbrain_tpu.models.preprocessing import (
        GAUSS_KERNEL_SIZE,
        apply_preproc,
        gaussian_kernel,
    )

    sk = gaussian_kernel(GAUSS_KERNEL_SIZE, spec.gaussian_smooth_width)

    @jax.jit
    def brain_forward(x, day_idxs, input_lens):
        feats, out_lens = apply_preproc(
            params["brain"]["preproc"], x, day_idxs, input_lens, sk,
            spec.unfolder_kernel_len, spec.unfolder_stride_len,
        )
        h = apply_gru(
            params["brain"]["gru"], feats, spec.gru_hidden_size,
            spec.gru_num_layers, spec.gru_bidirectional,
        )
        return apply_fc(params["brain"]["fc"], h, spec.fc_activation), out_lens

    for i, batch in enumerate(experiment.dataloader_test):
        if max_batches is not None and i >= max_batches:
            break
        lat, lens = brain_forward(
            jnp.asarray(batch.input),
            jnp.asarray(batch.day_idxs),
            jnp.asarray(batch.input_lens),
        )
        lat = np.asarray(lat)
        for row, l in zip(lat, np.asarray(lens)):
            latents.append(row[: max(int(l), 1)])
    return np.concatenate(latents, axis=0)


def embed_audio(
    audio_batches, frontend_params, frontend_cfg
) -> np.ndarray:
    """(N, hidden) audio latents via the conv feature encoder + projection."""
    import jax.numpy as jnp

    from wav2vec2forbrain_tpu.models.audio_frontend import apply_audio_frontend

    outs = []
    for audio in audio_batches:
        h = apply_audio_frontend(
            frontend_params, jnp.asarray(audio, jnp.float32), frontend_cfg
        )
        outs.append(np.asarray(h).reshape(-1, h.shape[-1]))
    return np.concatenate(outs, axis=0)


def embed_brain_representations(
    experiment, max_batches: Optional[int] = None
) -> Dict[str, np.ndarray]:
    """Brain stream PRE- and POST-encoder representations, per-timestep and
    per-sample-mean — the reference's Representations(non_aggregated,
    aggregated) with both spaces
    (ref: src/analysis/latent_analysis_util.py:165-214: brain latents go
    through model.w2v_encoder.forward and the returned hidden_states are
    compared alongside the features)."""
    import jax
    import jax.numpy as jnp

    from wav2vec2forbrain_tpu.models.assembly import forward

    spec = experiment.spec
    params = jax.tree_util.tree_map(jnp.asarray, experiment._merged_params())
    state = experiment.model_state

    @jax.jit
    def full_forward(x, day_idxs, input_lens):
        _logits, out_lens, _state, extras = forward(
            params, state, spec, x, day_idxs, input_lens,
            rng=None, train=False, return_extras=True,
        )
        return extras["latents"], extras["hidden_states"], out_lens

    pre_t, post_t, pre_a, post_a = [], [], [], []
    for i, batch in enumerate(experiment.dataloader_test):
        if max_batches is not None and i >= max_batches:
            break
        lat, hid, lens = full_forward(
            jnp.asarray(batch.input),
            jnp.asarray(batch.day_idxs),
            jnp.asarray(batch.input_lens),
        )
        lat, hid, lens = np.asarray(lat), np.asarray(hid), np.asarray(lens)
        for row_pre, row_post, l in zip(lat, hid, lens):
            n = max(int(l), 1)
            pre_t.append(row_pre[:n])
            post_t.append(row_post[:n])
            pre_a.append(row_pre[:n].mean(axis=0))
            post_a.append(row_post[:n].mean(axis=0))
    return {
        "pre": np.concatenate(pre_t, axis=0),
        "post": np.concatenate(post_t, axis=0),
        "pre_agg": np.stack(pre_a),
        "post_agg": np.stack(post_a),
    }


def embed_audio_representations(
    audio_batches,
    frontend_params,
    frontend_cfg,
    encoder_params,
    encoder_cfg,
) -> Dict[str, np.ndarray]:
    """Audio stream PRE- and POST-encoder representations: conv feature
    encoder + projection, then the same w2v transformer encoder
    (ref: latent_analysis_util.py:126-161)."""
    import jax
    import jax.numpy as jnp

    from wav2vec2forbrain_tpu.models.audio_frontend import apply_audio_frontend
    from wav2vec2forbrain_tpu.models.wav2vec2 import (
        apply_w2v_encoder,
        apply_w2v_encoder_scanned,
    )

    # accept either encoder layout (per-layer list or scan-stacked)
    enc = (
        apply_w2v_encoder_scanned
        if "layers_stacked" in encoder_params
        else apply_w2v_encoder
    )

    @jax.jit
    def fwd(audio):
        feats = apply_audio_frontend(frontend_params, audio, frontend_cfg)
        hidden = enc(
            encoder_params, feats, encoder_cfg, rng=None, train=False
        )
        return feats, hidden

    pre_t, post_t, pre_a, post_a = [], [], [], []
    for audio in audio_batches:
        feats, hidden = fwd(jnp.asarray(audio, jnp.float32))
        feats, hidden = np.asarray(feats), np.asarray(hidden)
        pre_t.append(feats.reshape(-1, feats.shape[-1]))
        post_t.append(hidden.reshape(-1, hidden.shape[-1]))
        pre_a.append(feats.mean(axis=1))
        post_a.append(hidden.mean(axis=1))
    return {
        "pre": np.concatenate(pre_t, axis=0),
        "post": np.concatenate(post_t, axis=0),
        "pre_agg": np.concatenate(pre_a, axis=0),
        "post_agg": np.concatenate(post_a, axis=0),
    }


def representation_statistics(
    brain: Dict[str, np.ndarray], audio: Dict[str, np.ndarray]
) -> Dict[str, object]:
    """latent_statistics for the pre- AND post-encoder spaces (per-timestep
    rows; the _agg per-sample means ride along for plotting)."""
    return {
        "pre": latent_statistics(brain["pre"], audio["pre"]),
        "post": latent_statistics(brain["post"], audio["post"]),
    }


def latent_statistics(
    brain: np.ndarray, audio: np.ndarray, n_pca: int = 2
) -> Dict[str, object]:
    """Distribution comparison: norms, centroid cosine, PCA projections of
    both sets in the joint principal space."""

    def _norm_stats(x):
        n = np.linalg.norm(x, axis=-1)
        return {"mean_norm": float(n.mean()), "std_norm": float(n.std())}

    stats: Dict[str, object] = {
        "brain": _norm_stats(brain),
        "audio": _norm_stats(audio),
    }
    cb, ca = brain.mean(axis=0), audio.mean(axis=0)
    stats["centroid_cosine"] = float(
        np.dot(cb, ca) / (np.linalg.norm(cb) * np.linalg.norm(ca) + 1e-9)
    )
    joint = np.concatenate([brain, audio], axis=0)
    joint = joint - joint.mean(axis=0)
    # PCA via SVD of the joint set
    _u, s, vt = np.linalg.svd(joint, full_matrices=False)
    proj = vt[:n_pca]
    stats["pca_explained"] = [
        float(v) for v in (s[:n_pca] ** 2 / np.sum(s**2))
    ]
    stats["brain_pca"] = (brain - joint.mean(axis=0)) @ proj.T
    stats["audio_pca"] = (audio - joint.mean(axis=0)) @ proj.T
    return stats


def plot_latent_comparison(stats: Dict[str, object], out_path: str):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 6))
    bp = np.asarray(stats["brain_pca"])
    ap = np.asarray(stats["audio_pca"])
    ax.scatter(bp[:, 0], bp[:, 1], s=4, alpha=0.4, label="brain latents")
    ax.scatter(ap[:, 0], ap[:, 1], s=4, alpha=0.4, label="audio latents")
    ax.set_xlabel("PC1")
    ax.set_ylabel("PC2")
    ax.legend()
    ax.set_title(
        f"centroid cosine = {stats['centroid_cosine']:.3f}"
    )
    plt.tight_layout()
    plt.savefig(out_path)
    plt.close(fig)
