"""Offline checkpoint converter: HF torch / reference .pt -> msgpack pytrees.

Usage:
  # pretrained encoder (+lm_head, +batchnorm state) from an HF checkpoint:
  python tools/convert_checkpoint.py hf facebook/wav2vec2-base-960h out.msgpack

  # a reference repo brain_encoder.pt into our params["brain"] subtree:
  python tools/convert_checkpoint.py brain brain_encoder.pt out.msgpack

  # a reference full model.pt (pass family + layer count):
  python tools/convert_checkpoint.py model model.pt out.msgpack \
      [--family wav2vec2|conformer --layers N]

The converted artifacts load with --brain_encoder_path / the pretrained
loader, so models trained with the reference can be carried over.
"""

import sys


def convert_hf(checkpoint: str, out_path: str, cache_dir=None):
    from wav2vec2forbrain_tpu.models.pretrained import load_pretrained_encoder
    from wav2vec2forbrain_tpu.train.checkpoint import save_checkpoint

    enc, head, state = load_pretrained_encoder(checkpoint, cache_dir)
    save_checkpoint(out_path, {"encoder": enc, "lm_head": head}, state)
    print(f"wrote {out_path}")


def convert_brain(pt_path: str, out_path: str):
    import torch

    from wav2vec2forbrain_tpu.models.convert import (
        brain_encoder_from_torch,
        state_dict_to_numpy,
    )
    from wav2vec2forbrain_tpu.train.checkpoint import save_subtree

    sd = torch.load(pt_path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = state_dict_to_numpy(sd)
    brain = brain_encoder_from_torch(sd)
    save_subtree(out_path, brain)
    print(f"wrote {out_path}")


def convert_model(pt_path: str, out_path: str, family: str, layers: int):
    import torch

    from wav2vec2forbrain_tpu.models.convert import (
        full_model_from_torch,
        state_dict_to_numpy,
    )
    from wav2vec2forbrain_tpu.train.checkpoint import save_checkpoint

    sd = torch.load(pt_path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params, state = full_model_from_torch(
        state_dict_to_numpy(sd), family, layers
    )
    save_checkpoint(out_path, params, state)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    if len(sys.argv) < 4 or sys.argv[1] not in ("hf", "brain", "model"):
        print(__doc__)
        sys.exit(2)
    mode, src, dst = sys.argv[1:4]
    if mode == "hf":
        convert_hf(src, dst)
    elif mode == "brain":
        convert_brain(src, dst)
    else:
        family = "conformer" if "--family" not in sys.argv else sys.argv[
            sys.argv.index("--family") + 1
        ]
        layers = 24 if "--layers" not in sys.argv else int(
            sys.argv[sys.argv.index("--layers") + 1]
        )
        convert_model(src, dst, family, layers)
