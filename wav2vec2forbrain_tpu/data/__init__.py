from wav2vec2forbrain_tpu.data.batch import B2tBatch
from wav2vec2forbrain_tpu.data.dataset import Brain2TextDataset, sessionNames
from wav2vec2forbrain_tpu.data.loader import Brain2TextBatchSampler, DataLoader
from wav2vec2forbrain_tpu.data.tokenizer import Wav2Vec2CTCTokenizer

__all__ = [
    "B2tBatch",
    "Brain2TextDataset",
    "sessionNames",
    "Brain2TextBatchSampler",
    "DataLoader",
    "Wav2Vec2CTCTokenizer",
]
