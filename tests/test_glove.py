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
