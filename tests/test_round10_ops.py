"""Round-10 gates.

1. The FOURTH knob-perturbed oracle-lockstep tier (VERDICT r9 item 8):
   graph + streaming-window knobs were the last un-perturbed tuning
   surface. Run the public driver contract in a fresh process with
   non-default graph/stream tuning and require hash MATCH on the ids
   those knobs feed — a knob that leaks into only one engine's SQL
   diverges here long before a production retune would find it.
2. Autoscale-derived-knob invariants specific to the four relational
   exhibit forms (the occupancy contracts the sf1 rehearsal measures).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_graph_stream_knob_lockstep_sweep():
    env = dict(os.environ)
    # every override MOVES its knob away from the default and changes
    # results at sf0.001: deeper/shallower iteration chains, a 2h
    # window with 20-min slides (6 overlaps instead of 2), a 3h session
    # gap, a 25-min watermark
    env["SPARK_GRAFT_TUNING"] = json.dumps({
        "pagerank_rounds": 4, "lpa_rounds": 3, "kcore_k": 3,
        "kcore_rounds": 5, "triangle_knn_k": 6, "window_hours": 2,
        "slide_minutes": 20, "session_gap_hours": 3,
        "watermark_minutes": 25,
    })
    ids = [
        "graph_pagerank", "graph_kcore_onion", "graph_label_propagation",
        "graph_triangle_count", "graph_modularity",
        "stream_tumbling_window_agg", "stream_sliding_window_agg",
        "stream_session_window", "stream_session_window_dynamic_gap",
        "stream_watermark_late_drop",
    ]
    proc = subprocess.run(
        [sys.executable, "scripts/driver_sim.py",
         "/root/testdata/sf0.001", *ids],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=420,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert proc.stdout.count("MATCH") >= len(ids)
    assert "MISMATCH" not in proc.stdout


def test_exhibit_occupancy_contracts():
    """The round-10 autoscale contract for the four relational exhibit
    forms: expected bucket occupancy stays ≤ its target (so the guard
    caps are NOT load-bearing) at every corpus size up to well past the
    sf1 rehearsal scale."""
    from mongo_to_clickhouse_spark.config import TUNING
    from mongo_to_clickhouse_spark.queries.pipelineops import phash_bits
    from mongo_to_clickhouse_spark.queries.vectorops import (
        cent_stride,
        ivf_k,
        lsh_bits,
        semdedup_k,
    )

    for n in (500, 2000, 20000, 200000, 2000000):
        # LSH: n / 2^bits ≤ target while the plane pool lasts; past the
        # pool (n > occ·2^max_bits ≈ 131k at defaults) occupancy grows
        # again and the per-bucket cap takes over as the guardrail —
        # production raises lsh_max_auto_bits (more literal planes) for
        # such corpora, the documented recall trade
        if n <= TUNING.lsh_target_occupancy << TUNING.lsh_max_auto_bits:
            assert n <= TUNING.lsh_target_occupancy * (1 << lsh_bits(n))
            assert n / (1 << lsh_bits(n)) <= TUNING.knn_bucket_cap
        else:
            assert lsh_bits(n) == TUNING.lsh_max_auto_bits
        # pHash: n / 2^bits ≤ target within the parity-bit budget
        if n <= TUNING.phash_target_occupancy << TUNING.phash_max_bits:
            assert n <= TUNING.phash_target_occupancy * (1 << phash_bits(n))
        # SemDeDup: mean cluster size ≤ target within the K clamp,
        # and always ≤ the reference cap (the bit-identical guard)
        k = semdedup_k(n)
        if TUNING.semdedup_k * 128 <= n <= TUNING.semdedup_max_k * 128:
            assert (n + k - 1) // k <= TUNING.semdedup_target_cluster
            assert (n + k - 1) // k <= TUNING.semdedup_ref_cap
        # IVF: lists stay ≈ √n (stride within 2x of K)
        assert cent_stride(n) <= 2 * ivf_k(n) + 1


def test_png_codec_hand_vectors():
    """Hand-built 2x2 vectors through the REAL stdlib PNG decoder: exact
    pixel recovery for every filter type (0/1/2 via the encoder, 3/4 via
    hand-assembled raw streams), RGB round-trip, and loud rejection of
    unsupported variants."""
    import zlib

    from mongo_to_clickhouse_spark.operators.multimodal import (
        decode_png_stdlib,
        encode_png_stdlib,
    )

    pix = bytes([10, 200, 30, 255])
    for filters in [(0,), (1,), (2,), (0, 1, 2)]:
        png = encode_png_stdlib(2, 2, pix, 0, filters)
        assert decode_png_stdlib(png) == (2, 2, pix), filters

    # RGB 3x2 with mixed Sub/Up filtering
    rgb = bytes((i * 41 + 7) % 256 for i in range(3 * 2 * 3))
    assert decode_png_stdlib(encode_png_stdlib(3, 2, rgb, 2, (1, 2))) == \
        (3, 2, rgb)

    def manual_png(w, h, raw):
        sig = b"\x89PNG\r\n\x1a\n"

        def chunk(t, d):
            body = t + d
            return (len(d).to_bytes(4, "big") + body
                    + (zlib.crc32(body) & 0xFFFFFFFF).to_bytes(4, "big"))

        ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
                + bytes([8, 0, 0, 0, 0]))
        return (sig + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw))
                + chunk(b"IEND", b""))

    # filter 3 (Average): enc = orig - (left + up) // 2
    r1, r2 = bytes([100, 50]), bytes([80, 120])
    enc2 = bytes([(80 - (0 + 100) // 2) & 255,
                  (120 - (80 + 50) // 2) & 255])
    got = decode_png_stdlib(manual_png(2, 2, bytes([0]) + r1
                                       + bytes([3]) + enc2))
    assert got == (2, 2, r1 + r2)

    # filter 4 (Paeth): predictor per spec
    enc2 = bytearray()
    for i in range(2):
        a = r2[i - 1] if i >= 1 else 0
        b = r1[i]
        c = r1[i - 1] if i >= 1 else 0
        q = a + b - c
        pa, pb, pc = abs(q - a), abs(q - b), abs(q - c)
        pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        enc2.append((r2[i] - pred) & 255)
    got = decode_png_stdlib(manual_png(2, 2, bytes([0]) + r1
                                       + bytes([4]) + bytes(enc2)))
    assert got == (2, 2, r1 + r2)

    import pytest

    with pytest.raises(ValueError):
        decode_png_stdlib(b"not a png at all")
    # 16-bit depth rejected loudly (fall back to the fake decoder)
    bad_ihdr = (2).to_bytes(4, "big") * 2 + bytes([16, 0, 0, 0, 0])

    def chunk(t, d):
        body = t + d
        return (len(d).to_bytes(4, "big") + body
                + (zlib.crc32(body) & 0xFFFFFFFF).to_bytes(4, "big"))

    bad = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", bad_ihdr)
           + chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError):
        decode_png_stdlib(bad)


def test_decode_route_prefers_real_png(spark, sf_dir):
    """A REAL planted PNG flowing through decode_media comes back with
    its true dimensions (n_frames 1), not the digest-derived fake dims —
    proving the routing seam, not just the codec."""
    from mongo_to_clickhouse_spark.operators.multimodal import (
        decode_media,
        encode_png_stdlib,
    )

    png = encode_png_stdlib(5, 3, bytes(range(15)), 0, (0, 1, 2))
    media = spark.createDataFrame(
        [(1, png, "png", len(png))],
        "doc_id long, payload binary, media_format string, byte_len long",
    )
    row = decode_media(media).collect()[0]
    assert (row.width, row.height, row.n_frames) == (5, 3, 1)
