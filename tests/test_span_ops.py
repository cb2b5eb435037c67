"""Span math parity vs the reference torch implementation (span_utils.py)."""

import sys

import numpy as np
import pytest

from flashvtg_tpu.ops import (
    generalized_temporal_iou,
    span_cxw_to_xx,
    span_xx_to_cxw,
    temporal_iou_and_union,
)

sys.path.insert(0, "/root/reference")


@pytest.fixture(scope="module")
def oracle():
    torch = pytest.importorskip("torch")
    from FlashVTG import span_utils

    return torch, span_utils


def _rand_spans(rng, n):
    st = rng.uniform(0, 100, size=(n,))
    w = rng.uniform(0, 50, size=(n,))
    return np.stack([st, st + w], axis=-1).astype(np.float32)


def test_xx_cxw_roundtrip():
    rng = np.random.default_rng(0)
    spans = _rand_spans(rng, 64)
    cxw = np.asarray(span_xx_to_cxw(spans))
    back = np.asarray(span_cxw_to_xx(cxw))
    np.testing.assert_allclose(back, spans, atol=1e-5)


def test_against_reference(oracle):
    torch, span_utils = oracle
    rng = np.random.default_rng(1)
    a, b = _rand_spans(rng, 33), _rand_spans(rng, 17)

    ref_cxw = span_utils.span_xx_to_cxw(torch.from_numpy(a)).numpy()
    np.testing.assert_allclose(np.asarray(span_xx_to_cxw(a)), ref_cxw, atol=1e-6)

    ref_iou, ref_union = span_utils.temporal_iou(
        torch.from_numpy(a), torch.from_numpy(b)
    )
    iou, union = temporal_iou_and_union(a, b)
    np.testing.assert_allclose(np.asarray(iou), ref_iou.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(union), ref_union.numpy(), atol=1e-4)

    ref_giou = span_utils.generalized_temporal_iou(
        torch.from_numpy(a), torch.from_numpy(b)
    ).numpy()
    giou = np.asarray(generalized_temporal_iou(a, b))
    np.testing.assert_allclose(giou, ref_giou, atol=1e-5)


def test_batched_leading_dims():
    rng = np.random.default_rng(2)
    spans = np.stack([_rand_spans(rng, 8) for _ in range(4)])  # (4, 8, 2)
    cxw = np.asarray(span_xx_to_cxw(spans))
    assert cxw.shape == (4, 8, 2)
    iou, _ = temporal_iou_and_union(spans, spans)
    assert np.asarray(iou).shape == (4, 8, 8)
    np.testing.assert_allclose(
        np.asarray(iou)[0].diagonal(), np.ones(8), atol=1e-5
    )
