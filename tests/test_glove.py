"""GloVe embedder for the Charades-VGG text path (file-based loader)."""

import numpy as np

from flashvtg_tpu.data.glove import GloveEmbedder


def test_glove_from_text_file(tmp_path):
    path = tmp_path / "glove.6B.300d.txt"
    vecs = {
        "person": np.arange(5, dtype=np.float32) / 10,
        "opens": np.ones(5, dtype=np.float32),
        "door": -np.ones(5, dtype=np.float32),
    }
    with open(path, "w") as f:
        for w, v in vecs.items():
            f.write(w + " " + " ".join(str(x) for x in v) + "\n")

    emb = GloveEmbedder.from_text_file(str(path))
    out = emb("Person opens THE door")
    assert out.shape == (4, 5)
    np.testing.assert_allclose(out[0], vecs["person"])
    np.testing.assert_allclose(out[1], vecs["opens"])
    np.testing.assert_allclose(out[2], np.zeros(5))  # OOV "the" -> zeros
    np.testing.assert_allclose(out[3], vecs["door"])

    # second construction uses the written cache files
    emb2 = GloveEmbedder.from_text_file(str(path))
    np.testing.assert_allclose(emb2("door")[0], vecs["door"])


def test_glove_torchtext_branch(monkeypatch):
    """Cover the torchtext fallback of GloveEmbedder.default() with an
    injected fake module (torchtext itself is not in this image and the
    real path downloads — egress-blocked). Pins the contract the branch
    relies on: pretrained_aliases factory -> object with .stoi dict and
    .vectors tensor exposing .numpy()."""
    import sys
    import types

    import numpy as np

    from flashvtg_tpu.data.glove import GloveEmbedder

    class FakeVectors:
        def __init__(self, arr):
            self._arr = arr

        def numpy(self):
            return self._arr

    class FakeGlove:
        stoi = {"hello": 0, "world": 1}
        vectors = FakeVectors(
            np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]], np.float32)
        )

    fake_vocab = types.SimpleNamespace(
        pretrained_aliases={"glove.6B.300d": lambda: FakeGlove()}
    )
    fake_tt = types.ModuleType("torchtext")
    fake_tt.vocab = fake_vocab
    monkeypatch.setitem(sys.modules, "torchtext", fake_tt)
    monkeypatch.setitem(sys.modules, "torchtext.vocab", fake_vocab)
    monkeypatch.delenv("FLASHVTG_GLOVE_PATH", raising=False)

    emb = GloveEmbedder.default()
    out = emb("Hello unknown WORLD")
    np.testing.assert_array_equal(out[0], [1.0, 2.0, 3.0])
    np.testing.assert_array_equal(out[1], [0.0, 0.0, 0.0])  # OOV -> zeros
    np.testing.assert_array_equal(out[2], [4.0, 5.0, 6.0])


def test_glove_default_error_message(monkeypatch):
    """No env path + no torchtext -> actionable RuntimeError."""
    import builtins

    import pytest

    from flashvtg_tpu.data.glove import GloveEmbedder

    monkeypatch.delenv("FLASHVTG_GLOVE_PATH", raising=False)
    real_import = builtins.__import__

    def block_torchtext(name, *a, **k):
        if name.startswith("torchtext"):
            raise ImportError(name)
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", block_torchtext)
    with pytest.raises(RuntimeError, match="FLASHVTG_GLOVE_PATH"):
        GloveEmbedder.default()
