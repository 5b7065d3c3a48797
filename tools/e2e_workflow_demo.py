"""Full paper-workflow demonstration on learnable synthetic T12 data.

Drives the REAL CLI (`run.py`) end to end, the way a reference user runs the
paper-headline experiment (ref README.md:34):

  1. generate synthetic T12 sessions with a character-aligned neural code
     (data/synthetic.py signal_strength>0) so the task is actually learnable
  2. estimate a word 3-gram ARPA LM from the train-split transcriptions
  3. train b2p2t_gru+w2v_conformer with best-model selection, then evaluate
     the test split with greedy decode AND the native C++ beam-search + LM
     rescoring (--lm_decode_test_predictions, decode/native)
  4. report test WER greedy vs lm_decode from the run's history.json

Run on the TPU:
  python tools/e2e_workflow_demo.py --workdir /tmp/e2e_demo --epochs 8
"""

import argparse
import json
import os
import subprocess
import sys
from collections import Counter

sys.path.insert(0, "/root/repo")

import numpy as np


def build_arpa_from_sentences(sentences, out_path):
    """Word 3-gram ARPA, MLE with a fixed discount — small and crude, but a
    valid Katz-backoff table (the decode LM; the reference points this at an
    external English n-gram model, yaml_config n3gram path)."""
    uni, bi, tri = Counter(), Counter(), Counter()
    for s in sentences:
        ws = ["<s>"] + s.upper().split() + ["</s>"]
        for w in ws[1:]:
            uni[w] += 1
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] += 1
        for a, b, c in zip(ws, ws[1:], ws[2:]):
            tri[(a, b, c)] += 1
    uni["<unk>"] = 1
    uni["<s>"] = len(sentences)
    n = sum(uni.values())
    v = len(uni)
    ctx1 = Counter()
    for (a, _), c in bi.items():
        ctx1[a] += c
    ctx2 = Counter()
    for (a, b, _), c in tri.items():
        ctx2[(a, b)] += c

    def lp(x):
        return f"{np.log10(max(x, 1e-12)):.6f}"

    lines = ["\\data\\", f"ngram 1={v}", f"ngram 2={len(bi)}",
             f"ngram 3={len(tri)}", "", "\\1-grams:"]
    for w, c in sorted(uni.items()):
        p = 0.9 * (c + 1) / (n + v)
        if w == "</s>":
            lines.append(f"{lp(p)}\t{w}")
        else:
            lines.append(f"{lp(p)}\t{w}\t-0.30")
    lines += ["", "\\2-grams:"]
    for (a, b), c in sorted(bi.items()):
        p = 0.8 * c / ctx1[a]
        if b == "</s>":
            lines.append(f"{lp(p)}\t{a} {b}")
        else:
            lines.append(f"{lp(p)}\t{a} {b}\t-0.30")
    lines += ["", "\\3-grams:"]
    for (a, b, c3), c in sorted(tri.items()):
        p = 0.8 * c / ctx2[(a, b)]
        lines.append(f"{lp(p)}\t{a} {b} {c3}")
    lines += ["", "\\end\\", ""]
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    return out_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/e2e_demo")
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--sessions", type=int, default=4)
    ap.add_argument("--trials", type=int, default=300)
    ap.add_argument("--signal", type=float, default=1.0)
    ap.add_argument("--beam_width", type=int, default=50)
    ap.add_argument("--crop_lens", action="store_true",
                    help="pass --greedy_decode_crop_lens=true")
    args = ap.parse_args()

    from scipy.io import loadmat

    from wav2vec2forbrain_tpu.data.dataset import sessionNames
    from wav2vec2forbrain_tpu.data.synthetic import make_synthetic_splits_dir

    ws = args.workdir
    os.makedirs(ws, exist_ok=True)
    splits = os.path.join(ws, "t12_signal")
    if not os.path.isdir(splits):
        make_synthetic_splits_dir(
            splits,
            session_names=sessionNames[: args.sessions],
            n_trials=args.trials,
            n_blocks=5,
            test_dir_n_trials=8,
            min_frames=280,
            max_frames=380,
            seed=7,
            signal_strength=args.signal,
        )

    sentences = []
    train_dir = os.path.join(splits, "train")
    for f in os.listdir(train_dir):
        m = loadmat(os.path.join(train_dir, f))
        sentences.extend(str(s).strip() for s in m["sentenceText"])
    arpa = build_arpa_from_sentences(
        sentences, os.path.join(ws, "demo_3gram.arpa")
    )
    print(f"LM: {len(sentences)} train sentences -> {arpa}")

    with open(os.path.join(ws, "config.yaml"), "w") as f:
        f.write(
            f"cache_dir: {ws}/cache\n"
            f"fig_dir: {ws}/figs\n"
            f"n3gram_lm_model_path: {arpa}\n"
            f"n5gram_lm_model_path: {arpa}\n"
            f"dataset_splits_dir: {splits}\n"
            "wandb_api_key: offline\n"
            "wandb_project_name: brain2text\n"
            "wandb_entity: machine-learning-hpi\n"
            'timit_dataset_splits_dir: ""\n'
            "elevenlabs_api_key: offline\n"
            "latent_analysis_working_dir: latent_analysis\n"
        )

    cmd = [
        sys.executable, "/root/repo/run.py",
        "--experiment_type=b2p2t_gru+w2v_conformer",
        "--wav2vec_checkpoint=facebook/wav2vec2-conformer-rope-large-960h-ft",
        "--tokenizer_checkpoint=facebook/wav2vec2-conformer-rope-large-960h-ft",
        "--w2v_skip_loading_weights=true",
        "--unfreeze_strategy=brain_encoder+w2v",
        "--learning_rate=1e-3", "--w2v_learning_rate=1e-4",
        "--w2v_warmup_start_step=0", "--w2v_warmup_steps=3",
        f"--batch_size={args.batch_size}", f"--epochs={args.epochs}",
        "--compute_dtype=bfloat16", "--activation_dtype=bfloat16",
        "--use_pallas=true", "--pad_to_multiple=384",
        "--target_pad_to_multiple=64", "--h2d_dtype=float16",
        "--adam_mu_dtype=bfloat16", "--scan_layers=auto",
        "--store_final_model=false", "--use_wandb=false", "--seed=0",
        # through the remote tunnel each improving epoch's best-model
        # checkpoint is a ~1.2 GB D2H fetch; final-weights eval keeps the
        # demo's wall time about the training, not the transfers
        "--return_best_model=false",
        "--lm_decode_test_predictions=true",
        f"--lm_decode_beam_width={args.beam_width}",
        "--lm_decode_alpha=0.5", "--lm_decode_beta=0.5",
    ]
    if args.crop_lens:
        cmd.append("--greedy_decode_crop_lens=true")
    print("+", " ".join(cmd), flush=True)
    env = dict(os.environ, PYTHONPATH="/root/repo:" + os.environ.get("PYTHONPATH", ""))
    subprocess.run(cmd, cwd=ws, check=True, env=env)

    results_root = os.path.join(
        ws, "cache", "experiment_results", "b2p2t_gru+w2v_conformer"
    )
    latest = sorted(os.listdir(results_root))[-1]
    with open(os.path.join(results_root, latest, "history.json")) as f:
        hist = json.load(f)
    test = hist["test"]["average"]["metrics"]
    print(json.dumps({
        "results_dir": os.path.join(results_root, latest),
        "epochs_ran": len(hist["epochs"]),
        "test_wer_greedy": test.get("word_error_rate"),
        "test_cer_greedy": test.get("char_error_rate"),
        "test_wer_lm_decode": test.get("word_error_rate_lm_decode"),
        "test_cer_lm_decode": test.get("char_error_rate_lm_decode"),
    }, indent=2))


if __name__ == "__main__":
    main()
