"""Reference brain_encoder.pt -> params["brain"] conversion test.

Builds a torch module graph with the reference's exact parameter names
(ref: src/model/b2p2t_model.py:119-136, brain_feature_extractor.py:29-54)
and checks the converted pytree drives our forward to the same outputs as
torch for the GRU+FC core and the day-affine weights.
"""

import numpy as np
import torch

from wav2vec2forbrain_tpu.models.convert import (
    brain_encoder_from_torch,
    state_dict_to_numpy,
)

N_DAYS = 24
C = 256
IN = 64
H = 16
LATENT = 24


def make_reference_state_dict():
    torch.manual_seed(0)
    sd = {}
    sd["day_weights"] = torch.randn(N_DAYS, C, C)
    sd["day_bias"] = torch.zeros(N_DAYS, 1, C)
    for i in range(N_DAYS):
        lin = torch.nn.Linear(C, C)
        sd[f"inpLayer{i}.weight"] = lin.weight.data
        sd[f"inpLayer{i}.bias"] = lin.bias.data
    gru = torch.nn.GRU(IN, H, num_layers=2, bidirectional=True, batch_first=True)
    for k, v in gru.state_dict().items():
        sd[f"neural_decoder.encoder.gru.{k}"] = v
    fc = torch.nn.Sequential(torch.nn.Linear(2 * H, LATENT))
    for k, v in fc.state_dict().items():
        sd[f"neural_decoder.encoder.fc.{k}"] = v
    # keys the reference's partial load drops
    sd["discriminator.0.weight"] = torch.randn(3, 3)
    sd["suc_for_ctc.head.weight"] = torch.randn(3, 3)
    return sd, gru, fc


def test_brain_converter_round_trip():
    sd, gru, fc = make_reference_state_dict()
    brain = brain_encoder_from_torch(state_dict_to_numpy(sd))

    assert "discriminator" not in str(brain.keys())
    assert brain["preproc"]["day_weights"].shape == (N_DAYS, C, C)
    assert brain["preproc"]["inp_layers"]["weight"].shape == (N_DAYS, C, C)
    assert len(brain["gru"]["layers"]) == 2
    assert len(brain["gru"]["layers"][0]["directions"]) == 2

    # GRU + FC forward equivalence on the converted params
    from wav2vec2forbrain_tpu.models.fc import apply_fc
    from wav2vec2forbrain_tpu.models.gru import apply_gru

    x = np.random.default_rng(0).standard_normal((2, 12, IN)).astype(np.float32)
    with torch.no_grad():
        t_out, _ = gru(torch.tensor(x))
        t_lat = fc(t_out)
    j_out = np.asarray(apply_gru(brain["gru"], x, H, 2, True))
    np.testing.assert_allclose(j_out, t_out.numpy(), atol=1e-5)
    j_lat = np.asarray(apply_fc(brain["fc"], j_out))
    np.testing.assert_allclose(j_lat, t_lat.numpy(), atol=1e-5)


def test_full_model_from_torch():
    """Full reference model.pt layout (brain_encoder.* + w2v_encoder.*)."""
    from transformers import Wav2Vec2Config
    from transformers.models.wav2vec2.modeling_wav2vec2 import Wav2Vec2Encoder

    from wav2vec2forbrain_tpu.models.convert import full_model_from_torch

    sd_brain, _, _ = make_reference_state_dict()
    sd = {f"brain_encoder.{k}": v for k, v in sd_brain.items()}
    hf_cfg = Wav2Vec2Config(
        hidden_size=48, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, vocab_size=32,
    )
    torch.manual_seed(0)
    enc = Wav2Vec2Encoder(hf_cfg)
    for k, v in enc.state_dict().items():
        sd[f"w2v_encoder.wav2vec2.encoder.{k}"] = v
    head = torch.nn.Linear(48, 32)
    sd["w2v_encoder.lm_head.weight"] = head.weight.data
    sd["w2v_encoder.lm_head.bias"] = head.bias.data

    params, state = full_model_from_torch(
        state_dict_to_numpy(sd), "wav2vec2", hf_cfg.num_hidden_layers
    )
    assert set(params.keys()) == {"brain", "w2v"}
    assert len(params["w2v"]["encoder"]["layers"]) == 2
    assert params["w2v"]["lm_head"]["kernel"].shape == (48, 32)
    assert state == {"encoder": {}}


def test_converter_cli_brain(tmp_path):
    sd, _, _ = make_reference_state_dict()
    pt = tmp_path / "brain_encoder.pt"
    torch.save(sd, str(pt))
    out = tmp_path / "brain.msgpack"

    import sys

    sys.path.insert(0, "tools")
    from convert_checkpoint import convert_brain

    convert_brain(str(pt), str(out))
    from wav2vec2forbrain_tpu.train.checkpoint import load_checkpoint

    params, _ = load_checkpoint(str(out))
    assert "gru" in params and "preproc" in params and "fc" in params
