"""Round-11 VP8L (lossless WebP) decoder tests — the last format on the
decode seam's fake path, now real (PNG r10, JPEG r11, WebP here).

Three layers, mirroring the PNG/JPEG test strategy:
- round-trip byte-exact vectors through the real encoder (the same
  arithmetic construction the `multimodal_decode_webp` oracle uses,
  including the duplicated-row LZ77 backward references);
- HAND-WRITTEN bitstreams (built bit-by-bit, not via the encoder) for
  the decoder paths the encoder never emits: repeat code 16, the
  max-symbol short-circuit, a degenerate 0-bit code-length tree;
- loud typed rejection of everything out of scope (lossy VP8 / VP8X,
  transforms, color cache, meta prefix image, short-distance map) and
  the _route fallback that keeps a bad payload from failing the task.
"""

from __future__ import annotations

import pandas as pd
import pytest

from mongo_to_clickhouse_spark.operators.multimodal import (
    _fake_decode,
    _LsbBitWriter,
    decode_webp_stdlib,
    encode_webp_stdlib,
    make_decode_kernel,
)


def _planted(d: int) -> tuple[int, int, bytes]:
    """The multimodal_decode_webp fixture: odd rows copy even rows (so
    the encoder emits one LZ77 ref per odd row), red constant, blue
    2-valued, alpha 255."""
    w = 4 + d % 13
    h = 2 * (1 + (d // 13) % 4)
    r = (d * 7 + 3) % 251
    argb = bytearray()
    for y in range(h):
        yy = y // 2
        for x in range(w):
            g = (d * 13 + (yy * w + x) * 37) % 251
            b = (d * 5 + (x % 2) * 19) % 251
            argb += bytes((255, r, g, b))
    return w, h, bytes(argb)


@pytest.mark.parametrize("d", [0, 1, 2, 3, 5, 7, 12, 37, 100, 255, 99999])
def test_webp_roundtrip_byte_exact(d):
    w, h, argb = _planted(d)
    w2, h2, out = decode_webp_stdlib(encode_webp_stdlib(w, h, argb))
    assert (w2, h2) == (w, h)
    assert out == argb  # canonical codes + LZ77 + bit packing all close


def test_webp_lz77_refs_actually_emitted():
    # The duplicated-row image must compress: its stream replaces whole
    # rows with one backref, so it is strictly smaller than the same
    # pixels with the duplication broken (all-literal rows).
    w, h, argb = _planted(9)
    broken = bytearray(argb)
    for y in range(1, h, 2):  # perturb one green byte per odd row
        broken[4 * w * y + 2] ^= 1
    assert len(encode_webp_stdlib(w, h, argb)) < len(
        encode_webp_stdlib(w, h, bytes(broken))
    )
    # and the perturbed image still round-trips (pure literal path)
    assert decode_webp_stdlib(encode_webp_stdlib(w, h, bytes(broken)))[2] \
        == bytes(broken)


def test_webp_simple_code_paths():
    # constant image: every channel is a single-symbol (0-bit) code
    argb = bytes((7, 8, 9, 10)) * 12
    assert decode_webp_stdlib(encode_webp_stdlib(4, 3, argb))[2] == argb
    # single pixel
    argb = bytes((255, 1, 2, 3))
    assert decode_webp_stdlib(encode_webp_stdlib(1, 1, argb))[2] == argb


def test_webp_wide_green_normal_code_path():
    # >2 distinct green values forces the code-length-coded form with
    # 17/18 zero runs across the 280-symbol alphabet
    argb = bytes(
        b for i in range(16 * 4) for b in (255, 0, (i * 41) % 256, 0)
    )
    assert decode_webp_stdlib(encode_webp_stdlib(16, 4, argb))[2] == argb


def _header(bw: _LsbBitWriter, w: int, h: int) -> None:
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix image


def _simple_code(bw: _LsbBitWriter, syms: list[int]) -> None:
    bw.write(1, 1)
    bw.write(len(syms) - 1, 1)
    if syms[0] <= 1:
        bw.write(0, 1)
        bw.write(syms[0], 1)
    else:
        bw.write(1, 1)
        bw.write(syms[0], 8)
    if len(syms) == 2:
        bw.write(syms[1], 8)


def _wrap(vp8l: bytes) -> bytes:
    chunk = b"VP8L" + len(vp8l).to_bytes(4, "little") + vp8l
    if len(vp8l) & 1:
        chunk += b"\x00"
    body = b"WEBP" + chunk
    return b"RIFF" + len(body).to_bytes(4, "little") + body


_CL_ORDER = (
    17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
)


def test_webp_repeat16_hand_vector():
    # HAND-WRITTEN stream: red code lengths use repeat-code 16 (repeat
    # previous nonzero), which the encoder never emits. 8×1 image,
    # red = x with all 8 symbols at length 3 via [lit 3, 16, 16, 18, 18].
    bw = _LsbBitWriter()
    _header(bw, 8, 1)
    _simple_code(bw, [77])        # green: constant 77, 0-bit
    # red: normal form
    bw.write(0, 1)                # not simple
    bw.write(15, 4)               # transmit all 19 cl lengths
    # cl code over {3: len2, 16: len2, 18: len1} (canonical: 18->0,
    # 3->10, 16->11)
    cl_len = {3: 2, 16: 2, 18: 1}
    for s in _CL_ORDER:
        bw.write(cl_len.get(s, 0), 3)
    bw.write(0, 1)                # no max-symbol short-circuit
    bw.write_code(0b10, 2)        # literal length 3 (symbol 0)
    bw.write_code(0b11, 2)        # 16: repeat 3+0 -> symbols 1..3
    bw.write(0, 2)
    bw.write_code(0b11, 2)        # 16: repeat 3+1 -> symbols 4..7
    bw.write(1, 2)
    bw.write_code(0b0, 1)         # 18: 11+127 = 138 zeros
    bw.write(127, 7)
    bw.write_code(0b0, 1)         # 18: 11+99 = 110 zeros -> 256 total
    bw.write(99, 7)
    _simple_code(bw, [0])         # blue constant 0
    _simple_code(bw, [255])       # alpha constant 255
    _simple_code(bw, [0])         # distance (unused)
    for x in range(8):            # pixels: only red consumes bits
        bw.write_code(x, 3)       # canonical: 8 syms at len 3 -> code=x
    w, h, out = decode_webp_stdlib(_wrap(bytes(bw.out)))
    assert (w, h) == (8, 1)
    assert out == bytes(b for x in range(8) for b in (255, x, 77, 0))


def test_webp_max_symbol_and_degenerate_cl_tree_hand_vector():
    # HAND-WRITTEN stream: red lengths {0:1, 1:1} transmitted through a
    # DEGENERATE one-symbol code-length tree (0-bit reads) bounded by
    # the max-symbol short-circuit (use_length=1, max_symbol=2).
    bw = _LsbBitWriter()
    _header(bw, 4, 1)
    _simple_code(bw, [5])         # green constant
    bw.write(0, 1)                # red: not simple
    bw.write(15, 4)
    for s in _CL_ORDER:           # only cl symbol 1 has a length
        bw.write(1 if s == 1 else 0, 3)
    bw.write(1, 1)                # use max-symbol
    bw.write(0, 3)                # length_nbits = 2
    bw.write(0, 2)                # max_symbol = 2
    # two cl tokens follow, each 0 bits: lengths[0]=1, lengths[1]=1
    _simple_code(bw, [0])         # blue
    _simple_code(bw, [255])       # alpha
    _simple_code(bw, [0])         # distance
    for x in range(4):            # red alternates 0,1 -> 1 bit each
        bw.write_code(x % 2, 1)
    w, h, out = decode_webp_stdlib(_wrap(bytes(bw.out)))
    assert (w, h) == (4, 1)
    assert out == bytes(b for x in range(4) for b in (255, x % 2, 5, 0))


def test_webp_short_distance_map_rejected_loudly():
    # A backref with plane code 1 (the 2-D neighborhood map) must raise
    # typed NotImplementedError, not silently mis-decode.
    bw = _LsbBitWriter()
    _header(bw, 2, 1)
    # green: {9, 256} needs the normal form (256 can't ride a simple code)
    bw.write(0, 1)
    bw.write(15, 4)
    cl_len = {1: 2, 17: 2, 18: 1}  # lengths: 9->1, 256->1, zero runs
    for s in _CL_ORDER:
        bw.write(cl_len.get(s, 0), 3)
    bw.write(0, 1)
    # canonical cl codes: 18->0, 1->10, 17->11
    bw.write_code(0b11, 2)        # 17: 3+6 = 9 zeros (symbols 0..8)
    bw.write(6, 3)
    bw.write_code(0b10, 2)        # symbol 9: length 1
    bw.write_code(0b0, 1)         # 18: 138 zeros
    bw.write(127, 7)
    bw.write_code(0b0, 1)         # 18: 108 zeros -> symbol 255 covered
    bw.write(97, 7)
    bw.write_code(0b10, 2)        # symbol 256: length 1
    bw.write_code(0b0, 1)         # 18: 11+12 = 23 zeros -> 257..279
    bw.write(12, 7)
    _simple_code(bw, [0])         # red
    _simple_code(bw, [0])         # blue
    _simple_code(bw, [255])       # alpha
    _simple_code(bw, [0])         # distance: code 0 -> value 1 -> plane 1
    # pixel 0: literal g=9 (code 0); then backref: green 256 (code 1)
    bw.write_code(0, 1)
    bw.write_code(1, 1)           # length code 0 -> length 1, no extras
    with pytest.raises(NotImplementedError, match="short-distance"):
        decode_webp_stdlib(_wrap(bytes(bw.out)))


def test_webp_out_of_scope_rejected_loudly():
    with pytest.raises(ValueError, match="RIFF"):
        decode_webp_stdlib(b"not a riff container")
    lossy = b"RIFF" + (12).to_bytes(4, "little") + b"WEBP" \
        + b"VP8 " + (0).to_bytes(4, "little")
    with pytest.raises(NotImplementedError, match="lossy"):
        decode_webp_stdlib(lossy)
    vp8x = b"RIFF" + (12).to_bytes(4, "little") + b"WEBP" \
        + b"VP8X" + (0).to_bytes(4, "little")
    with pytest.raises(NotImplementedError, match="lossy|extended"):
        decode_webp_stdlib(vp8x)

    def stream(transform=0, cache=0, meta=0):
        bw = _LsbBitWriter()
        bw.write(0x2F, 8)
        bw.write(0, 14)
        bw.write(0, 14)
        bw.write(0, 1)
        bw.write(0, 3)
        bw.write(transform, 1)
        if not transform:
            bw.write(cache, 1)
            if not cache:
                bw.write(meta, 1)
        bw.write(0, 8)  # padding so reads don't run off the end
        return _wrap(bytes(bw.out))

    with pytest.raises(NotImplementedError, match="transform"):
        decode_webp_stdlib(stream(transform=1))
    with pytest.raises(NotImplementedError, match="color cache"):
        decode_webp_stdlib(stream(cache=1))
    with pytest.raises(NotImplementedError, match="meta prefix"):
        decode_webp_stdlib(stream(meta=1))


def test_route_decodes_real_webp_and_falls_back_on_lossy():
    w, h, argb = _planted(21)
    real = encode_webp_stdlib(w, h, argb)
    lossy = b"RIFF" + (20).to_bytes(4, "little") + b"WEBP" \
        + b"VP8 " + (8).to_bytes(4, "little") + b"\x00" * 8
    kernel = make_decode_kernel(force_fake=False)
    out = pd.concat(list(kernel(iter([pd.DataFrame({
        "doc_id": [1, 2],
        "media_format": ["webp", "webp"],
        "byte_len": [len(real), len(lossy)],
        "payload": [real, lossy],
    })]))))
    assert (int(out.iloc[0]["width"]), int(out.iloc[0]["height"])) == (w, h)
    fw, fh, _ = _fake_decode(lossy)
    assert (int(out.iloc[1]["width"]), int(out.iloc[1]["height"])) == (fw, fh)


# --- WAV/PCM16 (same round, the audio tier's real parser) ---------------

from mongo_to_clickhouse_spark.operators.multimodal import (  # noqa: E402
    decode_wav_stdlib,
    encode_wav_stdlib,
)


@pytest.mark.parametrize("d", [0, 1, 2, 7, 64, 12345])
def test_wav_roundtrip_sample_exact(d):
    n = 64 + d % 129
    ch = 1 + d % 2
    rate = 8000 + (d % 3) * 4000
    samples = [((d * 31 + j * 97) % 4001) - 2000 for j in range(n * ch)]
    ch2, rate2, out = decode_wav_stdlib(encode_wav_stdlib(ch, rate, samples))
    assert (ch2, rate2) == (ch, rate)
    assert out == samples


def test_wav_negative_and_extreme_samples():
    samples = [-32768, 32767, 0, -1, 1]
    assert decode_wav_stdlib(encode_wav_stdlib(1, 44100, samples))[2] \
        == samples


def test_wav_odd_data_padding():
    # RIFF pads odd chunk bodies; PCM16 data is always even, but a
    # trailing LIST chunk after data must not confuse the walk
    wav = encode_wav_stdlib(1, 8000, [5, -5])
    wav += b"LIST" + (3).to_bytes(4, "little") + b"abc\x00"
    assert decode_wav_stdlib(wav)[2] == [5, -5]


def test_wav_out_of_scope_rejected_loudly():
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        decode_wav_stdlib(b"RIFF\x00\x00\x00\x00WEBP")
    # IEEE-float format tag (3)
    fmt = (3).to_bytes(2, "little") + (1).to_bytes(2, "little") \
        + (8000).to_bytes(4, "little") + (32000).to_bytes(4, "little") \
        + (4).to_bytes(2, "little") + (32).to_bytes(2, "little")
    wav = b"RIFF" + (20 + len(fmt)).to_bytes(4, "little") + b"WAVE" \
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt \
        + b"data" + (0).to_bytes(4, "little")
    with pytest.raises(NotImplementedError, match="non-PCM"):
        decode_wav_stdlib(wav)
    # 8-bit PCM
    fmt8 = (1).to_bytes(2, "little") + (1).to_bytes(2, "little") \
        + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little") \
        + (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
    wav8 = b"RIFF" + (20 + len(fmt8)).to_bytes(4, "little") + b"WAVE" \
        + b"fmt " + len(fmt8).to_bytes(4, "little") + fmt8 \
        + b"data" + (0).to_bytes(4, "little")
    with pytest.raises(NotImplementedError, match="8-bit"):
        decode_wav_stdlib(wav8)
    with pytest.raises(ValueError, match="missing fmt/data"):
        decode_wav_stdlib(b"RIFF" + (4).to_bytes(4, "little") + b"WAVE")


# --- the decode-kernel fan-out (round 11 scale finding #4; made
# unconditional and count-derived in optimization round 1) -------------


def test_decode_fanout_scales_with_corpus(spark, sf_dir, monkeypatch):
    # The fan-out repartition must ALWAYS be present (a compact parquet
    # gives a ~1 ms/row Python codec near-serial parallelism otherwise
    # — the jpeg oracle ran 4.4 s on one task at sf0.1), and its
    # partition count must grow with the corpus: defaultParallelism as
    # the floor, ceil(n / rows_per_task) once the corpus outgrows it.
    import re

    from mongo_to_clickhouse_spark.operators import autoscale
    from mongo_to_clickhouse_spark.queries import pipelineops as po

    def n_repart(df) -> int:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        m = re.search(r"Repartition (\d+)", plan)
        assert m, f"no Repartition in plan:\n{plan}"
        return int(m.group(1))

    par = spark.sparkContext.defaultParallelism
    assert n_repart(po.multimodal_decode_wav(spark, sf_dir)) == par

    big_n = autoscale.KERNEL_FANOUT_ROWS_PER_TASK * (par + 3)
    monkeypatch.setattr(
        autoscale, "corpus_count", lambda *a, **k: big_n,
    )
    assert n_repart(po.multimodal_decode_wav(spark, sf_dir)) == par + 3
