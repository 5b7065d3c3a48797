"""Model configuration models (pydantic).

Flag names/defaults mirror the reference models' arg models so CLI surface
and sweep YAMLs stay compatible:
- B2P2TModelArgsModel            (ref: src/model/b2p2t_model.py:20-24)
- BrainFeatureExtractorArgsModel (ref: src/model/brain_feature_extractor.py:13-21)
- W2VBrainEncoderModelArgs       (ref: src/model/w2v_custom_feat_extractor.py:18-19)
"""

from typing import List, Literal

from pydantic import BaseModel

DEFAULT_UNFOLDER_KERNEL_LEN = 32

ACTIVATION_FUNCTION = Literal[
    "gelu",
    "gelu_10",
    "gelu_fast",
    "gelu_new",
    "gelu_python",
    "gelu_pytorch_tanh",
    "gelu_accurate",
    "laplace",
    "linear",
    "mish",
    "quick_gelu",
    "relu",
    "relu2",
    "relu6",
    "sigmoid",
    "silu",
    "swish",
    "tanh",
]


class B2P2TModelArgsModel(BaseModel):
    input_layer_nonlinearity: Literal["softsign"] = "softsign"
    unfolder_kernel_len: int = DEFAULT_UNFOLDER_KERNEL_LEN
    unfolder_stride_len: int = 4
    gaussian_smooth_width: float = 0.3


class BrainFeatureExtractorArgsModel(BaseModel):
    encoder_gru_hidden_size: int = 256
    encoder_bidirectional: bool = True
    encoder_num_gru_layers: int = 2
    encoder_bias: bool = True
    encoder_dropout: float = 0.0
    encoder_learnable_inital_state: bool = False
    encoder_fc_hidden_sizes: List[int] = []
    encoder_fc_activation_function: ACTIVATION_FUNCTION = "gelu"


class B2P2TBrainFeatureExtractorArgsModel(
    BrainFeatureExtractorArgsModel, B2P2TModelArgsModel
):
    pass


class W2VBrainEncoderModelArgs(BaseModel):
    w2v_do_stable_layer_norm: bool = False
