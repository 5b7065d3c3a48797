"""Converted-checkpoint msgpack cache: the HF torch conversion runs once per
checkpoint; later constructions load msgpack and never touch torch
(models/pretrained.py). Conversion itself is golden-tested elsewhere
(test_golden_w2v.py / test_golden_conformer.py); here the expensive converter
is stubbed so the cache layer is tested in isolation."""

import numpy as np

from wav2vec2forbrain_tpu.models import pretrained


def _fake_tree():
    enc = {
        "layer_norm": {"scale": np.ones(4, np.float32)},
        "layers": [
            {"w": np.full((2, 2), float(i), np.float32)} for i in range(12)
        ],
    }
    head = {"kernel": np.arange(8, dtype=np.float32).reshape(4, 2)}
    state = {"encoder": {}}
    return enc, head, state


def _assert_tree_equal(a, b):
    assert type(a) is type(b), (type(a), type(b))
    if isinstance(a, dict):
        assert a.keys() == b.keys()
        for k in a:
            _assert_tree_equal(a[k], b[k])
    elif isinstance(a, list):
        assert len(a) == len(b)
        for x, y in zip(a, b):
            _assert_tree_equal(x, y)
    else:
        np.testing.assert_array_equal(a, b)


def test_second_load_skips_torch_conversion(tmp_path, monkeypatch):
    calls = []

    def fake_convert(checkpoint, cache_dir=None):
        calls.append(checkpoint)
        return _fake_tree()

    monkeypatch.setattr(pretrained, "_convert_from_hf", fake_convert)

    first = pretrained.load_pretrained_encoder("fake/ckpt", str(tmp_path))
    assert calls == ["fake/ckpt"]

    second = pretrained.load_pretrained_encoder("fake/ckpt", str(tmp_path))
    assert calls == ["fake/ckpt"], "second construction must not re-convert"

    for a, b in zip(first, second):
        _assert_tree_equal(a, b)
    # list-of-layers structure survives the msgpack round trip (not {"0": ...})
    assert isinstance(second[0]["layers"], list)
    assert len(second[0]["layers"]) == 12


def test_distinct_checkpoints_get_distinct_cache_files(tmp_path, monkeypatch):
    monkeypatch.setattr(
        pretrained, "_convert_from_hf", lambda c, cache_dir=None: _fake_tree()
    )
    pretrained.load_pretrained_encoder("fam/a", str(tmp_path))
    pretrained.load_pretrained_encoder("fam/b", str(tmp_path))
    cached = sorted(p.name for p in (tmp_path / "converted_encoders").iterdir())
    assert cached == ["fam--a.msgpack", "fam--b.msgpack"]
