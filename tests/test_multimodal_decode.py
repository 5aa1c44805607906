"""Decode-kernel contract for the multimodal tier: the stub path is
deterministic, and — where an image library actually exists — the REAL
decoder branch in ``decode_image_batch`` is exercised byte-for-byte
(skipped cleanly in containers without Pillow; the Spark-side plumbing
is covered by the registry ids either way).
"""

from __future__ import annotations

import importlib.util

import pandas as pd
import pytest

from mongo_to_clickhouse_spark.operators.multimodal import (
    _fake_decode,
    decode_image_batch,
)

HAS_PIL = importlib.util.find_spec("PIL") is not None


def _run_kernel(payloads: list[bytes]) -> pd.DataFrame:
    batch = pd.DataFrame(
        {
            "doc_id": list(range(len(payloads))),
            "media_format": ["png"] * len(payloads),
            "byte_len": [len(p) for p in payloads],
            "payload": payloads,
        }
    )
    return pd.concat(list(decode_image_batch(iter([batch]))), ignore_index=True)


def test_stub_decoder_deterministic_and_bounded():
    a = _fake_decode(b"same payload")
    assert a == _fake_decode(b"same payload")
    w, h, n = a
    assert 64 <= w <= 255 and 64 <= h <= 255 and 1 <= n <= 4
    assert _fake_decode(b"other payload") != a  # digest-derived, not constant


@pytest.mark.skipif(HAS_PIL, reason="stub branch only runs without Pillow")
def test_kernel_uses_stub_without_pil():
    out = _run_kernel([b"payload-one", b"payload-two"])
    for _, row in out.iterrows():
        payload = [b"payload-one", b"payload-two"][int(row.doc_id)]
        assert (row.width, row.height, row.n_frames) == _fake_decode(payload)


@pytest.mark.skipif(not HAS_PIL, reason="Pillow not installed in container")
def test_kernel_uses_real_decoder_with_pil():
    # a real 7x3 PNG: the kernel must report the TRUE dimensions (which
    # the stub, being digest-derived with a 64px floor, cannot produce)
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (7, 3)).save(buf, format="PNG")
    png = buf.getvalue()
    out = _run_kernel([png])
    assert (out.width[0], out.height[0], out.n_frames[0]) == (7, 3, 1)
    assert (7, 3, 1) != _fake_decode(png)
