from wav2vec2forbrain_tpu.util.seq import calc_seq_len, round_up

__all__ = ["calc_seq_len", "round_up"]
