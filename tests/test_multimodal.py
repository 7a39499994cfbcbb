"""Multimodal plumbing tests: schemas, batch determinism, frame
sampling, and the media→embedding→similarity hand-off."""

from __future__ import annotations

import pytest

from etl_pipeline_orchestration_spark.operators import multimodal, similarity


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, "word " * (i + 1)) for i in range(30)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_encode_decode_roundtrip_deterministic(docs):
    media = multimodal.encode_as_media(docs)
    a = multimodal.decode_image_batch(media, fake=True).collect()
    b = multimodal.decode_image_batch(media, fake=True).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    by_id = {r["doc_id"]: r for r in a}
    assert by_id[0]["n_bytes"] == 5  # "word "
    assert by_id[0]["width"] == 16 + 5 % 64


def test_decode_real_path_is_honest_for_non_png(docs):
    """fake=False must still refuse non-PNG types (raise surfaces from
    the executor wrapped in Spark's PythonException)."""
    media = multimodal.encode_as_media(docs)  # media_type = image/fake
    with pytest.raises(Exception, match="NotImplementedError|image/fake"):
        multimodal.decode_image_batch(media, fake=False).collect()


# ------------------------------------------------------------- PNG --


def test_png_roundtrip_every_filter_type():
    """Each scanline filter (0-4) must invert exactly, including byte
    wrap-around (gradient spans the full 0..255 range)."""
    w, h = 13, 9
    rows = [bytes(((31 * x + 97 * y) % 256) for x in range(w)) for y in range(h)]
    expected = sum(sum(r) for r in rows)
    for ft in range(5):
        data = multimodal.png_encode_gray(rows, filters=[ft])
        assert multimodal.png_decode(data) == (w, h, expected), f"filter {ft}"
    # Default cycle mixes all five filters in one image.
    data = multimodal.png_encode_gray(rows)
    assert multimodal.png_decode(data) == (w, h, expected)


def test_png_decode_rejects_corruption():
    rows = [bytes(range(10))] * 4
    data = bytearray(multimodal.png_encode_gray(rows))
    with pytest.raises(ValueError, match="signature"):
        multimodal.png_decode(b"\x00" + bytes(data[1:]))
    data[40] ^= 0xFF  # flip a byte inside a chunk -> CRC mismatch
    with pytest.raises(ValueError, match="CRC|length|filter|error"):
        multimodal.png_decode(bytes(data))


def test_png_decode_rgb():
    """Hand-built 2x2 RGB PNG (color type 2, filter 0) — pins that the
    decoder honors bytes-per-pixel, not just greyscale."""
    import struct
    import zlib

    px = [
        [(10, 20, 30), (40, 50, 60)],
        [(70, 80, 90), (200, 250, 255)],
    ]
    raw = b"".join(
        b"\x00" + bytes(v for pix in row for v in pix) for row in px
    )
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    data = (
        multimodal.PNG_SIG
        + multimodal._png_chunk(b"IHDR", ihdr)
        + multimodal._png_chunk(b"IDAT", zlib.compress(raw))
        + multimodal._png_chunk(b"IEND", b"")
    )
    total = sum(v for row in px for pix in row for v in pix)
    assert multimodal.png_decode(data) == (2, 2, total)


def test_synth_png_media_decodes_to_closed_form(docs):
    """End-to-end on Spark: real PNG bytes through mapInPandas decode;
    dims and pixel sums must equal the fixture's closed form."""
    media = multimodal.synth_png_media(docs)
    out = {r["doc_id"]: r for r in multimodal.decode_image_batch(media).collect()}
    assert len(out) == 30
    for i in range(30):
        w, h, c = 8 + i % 9, 8 + i % 7, i % 100
        expect = sum((3 * x + 5 * y + c) for x in range(w) for y in range(h))
        r = out[i]
        assert (r["width"], r["height"], r["pixel_sum"]) == (w, h, expect)
        assert r["media_type"] == "image/png"
        assert r["feature_norm"] is None  # real decode: no fake feature
        assert r["n_bytes"] > 0  # real file size, not text length


def test_resize_targets_model_shape(docs):
    media = multimodal.encode_as_media(docs)  # non-PNG -> fake path
    out = multimodal.resize_batch(media, target_w=224, target_h=224).collect()
    assert len(out) == 30
    assert all(r["width"] == 224 and r["resized_bytes"] == 224 * 224 * 3 for r in out)
    assert all(r["pixel_sum"] is None for r in out)  # fake: no real pixels


def test_png_resize_matches_numpy_nearest_neighbor(docs):
    """Real resample: decode the resized PNGs and compare every pixel to
    numpy's nearest-neighbor reference on the fixture gradient."""
    import numpy as np

    tw, th = 8, 6
    media = multimodal.synth_png_media(docs)
    out = {
        r["doc_id"]: r
        for r in multimodal.resize_batch(media, target_w=tw, target_h=th).collect()
    }
    assert len(out) == 30
    for i in range(30):
        w, h, c = 8 + i % 9, 8 + i % 7, i % 100
        src = np.array(
            [[3 * x + 5 * y + c for x in range(w)] for y in range(h)], dtype=int
        )
        want = src[np.arange(th) * h // th][:, np.arange(tw) * w // tw]
        r = out[i]
        got_w, got_h, _bpp, rows = multimodal.png_decode_pixels(bytes(r["resized_png"]))
        assert (got_w, got_h) == (tw, th)
        got = np.array([list(row) for row in rows], dtype=int)
        assert (got == want).all(), i
        assert r["pixel_sum"] == int(want.sum())


def test_frame_sampling_row_per_frame(docs):
    media = multimodal.encode_as_media(docs)
    frames = multimodal.sample_frames(media, fps_keep=1, clip_secs=10).collect()
    per_doc = {}
    for r in frames:
        per_doc.setdefault(r["doc_id"], []).append(r["frame_no"])
    # doc 0: 5 bytes -> 1 frame; larger docs capped at clip budget
    assert per_doc[0] == [0]
    assert all(ns == sorted(ns) and ns[0] == 0 for ns in per_doc.values())
    assert max(len(ns) for ns in per_doc.values()) <= 10


def test_png_embedding_matches_numpy_histogram(docs):
    """PNG embeddings come from decoded pixels: compare to a numpy
    histogram of the fixture gradient."""
    import numpy as np

    media = multimodal.synth_png_media(docs)
    out = {
        r["doc_id"]: list(r["embedding"])
        for r in multimodal.extract_embedding_batch(media, fake=False).collect()
    }
    for i in (0, 7, 29):
        w, h, c = 8 + i % 9, 8 + i % 7, i % 100
        px = np.array(
            [3 * x + 5 * y + c for y in range(h) for x in range(w)], dtype=int
        )
        hist = np.bincount(px >> 4, minlength=16).astype(float)
        want = hist / np.linalg.norm(hist)
        got = np.array(out[i])
        assert np.allclose(got, want, atol=1e-6), i


def test_media_to_similarity_handoff(docs):
    media = multimodal.encode_as_media(docs)
    emb = multimodal.extract_embedding_batch(media, fake=True)
    first = emb.filter("doc_id = 0").head()["embedding"]
    assert len(first) == multimodal.EMBED_DIM
    probe = list(first)
    top = similarity.brute_force_topk(
        emb, probe, k=3, id_col="doc_id", vec_col="embedding"
    ).collect()
    assert top[0]["doc_id"] == 0  # self-similarity wins
    assert abs(top[0]["cosine_sim"] - 1.0) < 1e-5


def test_wav_roundtrip_and_known_waveform_physics(spark):
    """Decode is real: a pure sine's RMS must be ~A/sqrt(2) and its
    zero-crossing count ~2*f*duration — physics the decoder can only
    report by actually reading the PCM."""
    import math

    from etl_pipeline_orchestration_spark.operators import multimodal as mm

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    feats = {
        r["doc_id"]: r
        for r in mm.audio_features_batch(mm.synth_wav_media(docs)).collect()
    }
    assert len(feats) == 50
    for doc_id, r in feats.items():
        f = 200 + (doc_id % 20) * 20
        n = 400 + (doc_id % 5) * 200
        assert r["sample_rate"] == 8000
        assert r["n_samples"] == n
        assert r["duration_ms"] == n * 1000 // 8000
        # RMS of a quantized sine: amplitude/sqrt(2) within quantization slop
        assert abs(r["rms_3dp"] - 12000 / math.sqrt(2)) < 60
        # Zero crossings: 2 per cycle, f*n/8000 cycles, +-2 boundary slop
        expected_zc = 2 * f * n / 8000
        assert abs(r["n_zero_cross"] - expected_zc) <= 2


def test_wav_quantizer_margins_vs_libm_ulps(spark):
    """The oracle regenerates PCM with DuckDB's sin; a last-ulp libm
    disagreement flips a sample only if 12000*sin lands within ~1e-12
    of a half-integer. Measure the actual minimum margin over every
    sample at this SF — it must dwarf the ulp scale."""
    import numpy as np

    min_margin = 1.0
    for doc_id in range(500):
        f = 200 + (doc_id % 20) * 20
        n = 400 + (doc_id % 5) * 200
        i = np.arange(n, dtype=np.float64)
        v = 12000.0 * np.sin(2.0 * np.pi * f * i / 8000.0) + 0.5
        margin = np.abs(v - np.round(v)).min()
        # distance of x+0.5 to nearest integer == distance of x to a
        # half-integer boundary
        min_margin = min(min_margin, float(margin))
    assert min_margin > 1e-9, min_margin


def test_video_container_sampling_before_decode(spark):
    """Container round-trip, stride sampling, and decode correctness:
    only even frames come back, geometry matches the fixture, and a
    corrupted container raises rather than returning wrong frames."""
    import pytest as _pytest

    from etl_pipeline_orchestration_spark.operators import multimodal as mm

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(30)
    rows = mm.decode_sampled_frames(mm.synth_mpng_media(docs), stride=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc) == 30
    for doc_id, frames in by_doc.items():
        nf = 2 + doc_id % 4
        assert sorted(f["frame_no"] for f in frames) == list(range(0, nf, 2))
        for f in frames:
            assert f["width"] == 8 + doc_id % 9
            assert f["height"] == 8 + doc_id % 7
            w, h, c = f["width"], f["height"], (doc_id + f["frame_no"]) % 100
            assert f["pixel_sum"] == (
                h * 3 * (w - 1) * w // 2 + w * 5 * (h - 1) * h // 2 + w * h * c
            )
    with _pytest.raises(ValueError):
        mm.mpng_decode(b"NOPE" + b"\x00" * 16)


# ------------------------------------------------------------- JPEG --


def _grad_rows(w, h):
    return [bytes(min(255, 3 * x + 5 * y) for x in range(w)) for y in range(h)]


def test_jpeg_constant_blocks_decode_losslessly():
    from etl_pipeline_orchestration_spark.operators.multimodal import (
        _QTABLE_LUMA,
        jpeg_decode_pixels,
        jpeg_encode_gray,
    )

    qt = [8] + _QTABLE_LUMA[1:]
    for d in (0, 3, 17, 250):
        w, h = 8 * (1 + d % 3), 8 * (1 + d % 2)
        rows = [
            bytes((d + 7 * (x // 8) + 13 * (y // 8)) % 251 for x in range(w))
            for y in range(h)
        ]
        dw, dh, back = jpeg_decode_pixels(jpeg_encode_gray(rows, qtable=qt))
        assert (dw, dh) == (w, h) and back == rows


def test_jpeg_lossy_roundtrip_bounded_and_crops_padding():
    """General path: Annex K table on a smooth gradient with dims NOT
    multiples of 8 — decode must crop the block padding to the exact
    SOF0 geometry and stay within a small error bound."""
    from etl_pipeline_orchestration_spark.operators.multimodal import (
        jpeg_decode_pixels,
        jpeg_encode_gray,
    )

    w, h = 21, 13
    rows = _grad_rows(w, h)
    dw, dh, back = jpeg_decode_pixels(jpeg_encode_gray(rows))
    assert (dw, dh) == (w, h)
    err = max(
        abs(a - b) for r1, r2 in zip(rows, back) for a, b in zip(r1, r2)
    )
    assert err <= 10


def test_jpeg_corruption_fails_loudly():
    import struct

    import pytest

    from etl_pipeline_orchestration_spark.operators.multimodal import (
        jpeg_decode,
        jpeg_encode_gray,
    )

    good = jpeg_encode_gray(_grad_rows(16, 16))
    with pytest.raises(ValueError, match="SOI"):
        jpeg_decode(b"\x00\x00" + good[2:])
    with pytest.raises(ValueError):
        jpeg_decode(good[:40])  # truncated mid-segment
    # flip a byte inside the entropy stream: either an invalid Huffman
    # code, a bad AC index, or a truncated read — never silence
    sos = good.find(b"\xff\xda")
    corrupt = bytearray(good)
    for off in range(sos + 20, min(sos + 26, len(good) - 2)):
        corrupt[off] ^= 0x55
    with pytest.raises(ValueError):
        jpeg_decode(bytes(corrupt))
    # progressive (SOF2) and color streams are refused, not mis-decoded
    sof = good.find(b"\xff\xc0")
    prog = bytearray(good)
    prog[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        jpeg_decode(bytes(prog))
    # a 3-component SOF0 whose scan only covers one component is
    # malformed (color is now SUPPORTED, but a partial scan is not)
    ncomp = bytearray(good)
    ncomp[sof + 9] = 3  # component count byte of SOF0
    with pytest.raises(ValueError, match="component"):
        jpeg_decode(bytes(ncomp))
    # 4-component (CMYK-style) streams are refused, not mis-decoded
    four = bytearray(good)
    four[sof + 9] = 4
    with pytest.raises(ValueError, match="component"):
        jpeg_decode(bytes(four))
    assert struct is not None


def _grad_rgb_rows(w, h):
    rows = []
    for y in range(h):
        row = bytearray()
        for x in range(w):
            row += bytes(((2 * x + y) % 256, (x + 2 * y) % 256, (3 * x) % 256))
        rows.append(bytes(row))
    return rows


def test_jpeg_color_lossy_roundtrip_bounded():
    """General (gradient) color content through default Annex K tables:
    lossy, but every decoded channel must stay within a quantization-
    commensurate bound of the source, for all three sampling modes, and
    non-multiple-of-MCU dims must crop correctly."""
    import numpy as np

    from etl_pipeline_orchestration_spark.operators.multimodal import (
        jpeg_decode_pixels_color,
        jpeg_encode_color,
    )

    for samp in [(1, 1), (2, 1), (2, 2)]:
        src = _grad_rgb_rows(20, 12)  # not an MCU multiple
        w, h, nc, back = jpeg_decode_pixels_color(
            jpeg_encode_color(src, sampling=samp)
        )
        assert (w, h, nc) == (20, 12, 3)
        a = np.array([list(r) for r in src], dtype=float)
        b = np.array([list(r) for r in back], dtype=float)
        assert b.shape == a.shape
        # chroma-subsampled gradients move further than luma; bound is
        # loose but finite — a component swap or interleave bug blows it
        assert np.abs(a - b).mean() < 40.0
        # luma channel approx: Y of both images should track closely
        ya = 0.299 * a[:, 0::3] + 0.587 * a[:, 1::3] + 0.114 * a[:, 2::3]
        yb = 0.299 * b[:, 0::3] + 0.587 * b[:, 1::3] + 0.114 * b[:, 2::3]
        assert np.abs(ya - yb).mean() < 12.0


def test_jpeg_color_constant_mcu_exact():
    """Constant-per-MCU color with DC-step-8 tables decodes to the
    closed-form color round trip exactly (the oracle contract) in all
    sampling modes."""
    import numpy as np

    from etl_pipeline_orchestration_spark.operators.multimodal import (
        _QTABLE_CHROMA,
        _QTABLE_LUMA,
        jpeg_decode_pixels_color,
        jpeg_encode_color,
    )

    qt0, qt1 = [8] + _QTABLE_LUMA[1:], [8] + _QTABLE_CHROMA[1:]
    for samp in [(1, 1), (2, 1), (2, 2)]:
        for (r, g, b) in [(200, 30, 90), (0, 255, 128), (17, 17, 17)]:
            rows = [bytes((r, g, b) * 16) for _ in range(16)]
            w, h, nc, back = jpeg_decode_pixels_color(
                jpeg_encode_color(rows, qt_luma=qt0, qt_chroma=qt1,
                                  sampling=samp)
            )
            y = np.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5)
            cb = np.floor(128 - 0.168736 * r - 0.331264 * g + 0.5 * b + 0.5)
            cr = np.floor(128 + 0.5 * r - 0.418688 * g - 0.081312 * b + 0.5)
            exp = (
                int(min(max(np.floor(y + 1.402 * (cr - 128) + 0.5), 0), 255)),
                int(min(max(np.floor(
                    y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5
                ), 0), 255)),
                int(min(max(np.floor(y + 1.772 * (cb - 128) + 0.5), 0), 255)),
            )
            assert all(
                tuple(row[i : i + 3]) == exp
                for row in back
                for i in range(0, len(row), 3)
            ), (samp, (r, g, b))


def test_decode_image_batch_dispatches_jpeg(spark):
    """fake=False no longer raises for image/jpeg: the mapInPandas
    branch decodes the real bytes, and width/height/pixel_sum match
    the fixture's closed form."""
    from etl_pipeline_orchestration_spark.operators import multimodal

    from pyspark.sql import functions as F

    docs = spark.range(0, 12).select(F.col("id").alias("doc_id"))
    media = multimodal.synth_jpeg_media(docs)
    got = {
        r["doc_id"]: (r["width"], r["height"], r["pixel_sum"])
        for r in multimodal.decode_image_batch(media, fake=False).collect()
    }
    for d in range(12):
        w, h = 8 * (1 + d % 3), 8 * (1 + d % 2)
        want = 64 * sum(
            (d + 7 * bx + 13 * by) % 251
            for bx in range(w // 8)
            for by in range(h // 8)
        )
        assert got[d] == (w, h, want)


# ------------------------------------------------------------------ dHash


def test_dhash_invariances_and_locality():
    """dHash must be exactly invariant to uniform brightness and
    positive contrast scaling, and a single-pixel edit must move few
    bits — the properties the near-dup query's fixture plants."""
    from etl_pipeline_orchestration_spark.operators import multimodal as M

    rows = [
        bytes(M._neardup_base_pixel(42, x, y) for x in range(M.NEARDUP_W))
        for y in range(M.NEARDUP_H)
    ]
    base = M.dhash64(rows)
    bright = M.dhash64([bytes(p + 7 for p in r) for r in rows])
    contrast = M.dhash64([bytes(p * 2 for p in r) for r in rows])
    assert base == bright == contrast
    # the one-pixel edit moves at most 3 bits; for SOME group it must
    # actually move bits (locality is small but not always zero)
    flipped = []
    for g in range(10):
        rows_g = [
            bytes(M._neardup_base_pixel(g, x, y) for x in range(M.NEARDUP_W))
            for y in range(M.NEARDUP_H)
        ]
        noisy = [bytearray(r) for r in rows_g]
        noisy[3][3] += 50
        d = M.dhash64(rows_g) ^ M.dhash64([bytes(r) for r in noisy])
        flipped.append(bin(d & ((1 << 64) - 1)).count("1"))
    assert all(f <= 3 for f in flipped)
    assert any(f > 0 for f in flipped)
    # int64-signed mapping round-trips
    assert -(1 << 63) <= base < (1 << 63)


def test_dhash_uneven_cells_use_exact_mean_compare():
    """When width doesn't divide the 9-cell grid, cells carry unequal
    pixel counts; the cross-multiplied sum compare must equal the
    float mean compare."""
    from etl_pipeline_orchestration_spark.operators import multimodal as M

    w, h = 20, 11  # 20 % 9 != 0, 11 % 8 != 0
    rows = [bytes((x * 7 + y * 13 + x * y) % 101 for x in range(w)) for y in range(h)]
    got = M.dhash64(rows)
    # float replay
    gw, gh = M.DHASH_COLS + 1, M.DHASH_ROWS
    sums = [[0.0] * gw for _ in range(gh)]
    cnt = [[0] * gw for _ in range(gh)]
    for y in range(h):
        for x in range(w):
            sums[y * gh // h][x * gw // w] += rows[y][x]
            cnt[y * gh // h][x * gw // w] += 1
    bits = 0
    for r in range(gh):
        for c in range(M.DHASH_COLS):
            bits = (bits << 1) | (
                1 if sums[r][c] / cnt[r][c] > sums[r][c + 1] / cnt[r][c + 1] else 0
            )
    if bits >= 1 << 63:
        bits -= 1 << 64
    assert got == bits


def test_dhash_neardup_recovers_planted_groups(spark):
    """The banded join + Hamming verify returns EXACTLY the planted
    within-group pairs: all 6 pairs per group of 4 (brightness and
    contrast members hash-identical to base; the noisy member within
    Hamming 3 of every sibling), zero cross-group pairs."""
    from etl_pipeline_orchestration_spark.plans import registry

    registry.load_all()
    rows = registry.QUERIES["multimodal_dhash_neardup"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    import duckdb

    n_docs = duckdb.connect().execute(
        "SELECT count(*) FROM read_parquet('/root/testdata/sf0.001/documents.parquet')"
    ).fetchone()[0]
    full_groups = {
        g for g in range(n_docs // 4 + 2)
        if all(g * 4 + m < n_docs for m in range(4))
    }
    expected = {
        (g * 4 + a, g * 4 + b)
        for g in full_groups
        for a in range(4)
        for b in range(4)
        if a < b
    }
    got = {(r.id_a, r.id_b) for r in rows}
    # every planted pair found (recall is GUARANTEED by pigeonhole),
    # and nothing outside a group leaks in
    assert expected <= got
    assert all(a // 4 == b // 4 for a, b in got)
    # hash-identical members: base/bright/contrast pairs at hamming 0
    ham = {(r.id_a, r.id_b): r.hamming for r in rows}
    for g in sorted(full_groups)[:20]:
        assert ham[(g * 4, g * 4 + 1)] == 0
        assert ham[(g * 4, g * 4 + 2)] == 0
        assert ham[(g * 4, g * 4 + 3)] <= 3


# ------------------------------------------------------- audio spectral


def test_audio_spectral_recovers_planted_frequency_leaky(spark):
    """Spectral-LEAKAGE regime: the default fixture puts some tones
    mid-bin (f*n/sr half-integral), where the FFT dominant bin must
    still land within one frequency-resolution step (sr/n) of the
    planted sine for EVERY clip; centroid and rolloff sit near the
    tone for a pure sine. (The registered query uses the bin-aligned
    fixture and is hash-certified against its closed-form oracle —
    this test keeps the harder leaky case covered.)"""
    import etl_pipeline_orchestration_spark.operators.multimodal as mm
    from etl_pipeline_orchestration_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    rows = mm.audio_spectral_batch(mm.synth_wav_media(docs)).collect()
    assert len(rows) == 500
    for r in rows:
        f = 200 + (r.doc_id % 20) * 20
        resolution = r.sample_rate / r.n_samples
        assert abs(r.dom_freq_hz - f) <= resolution + 1e-9, (r.doc_id, f)
        # pure tone: nearly all energy at f -> centroid/rolloff nearby
        assert abs(r.centroid_hz - f) <= 3 * resolution, (r.doc_id, f)
        assert abs(r.rolloff85_hz - f) <= 2 * resolution, (r.doc_id, f)
        assert r.sample_rate == 8000
        assert r.n_samples == 400 + (r.doc_id % 5) * 200


def test_audio_spectral_query_is_exact_on_aligned_tones(spark):
    """The registered query's bin-aligned fixture makes every feature
    EXACTLY the planted frequency after the 3dp quantizer — the claim
    its closed-form oracle certifies cross-engine."""
    from etl_pipeline_orchestration_spark.plans import registry

    registry.load_all()
    rows = registry.QUERIES["multimodal_audio_spectral"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 500
    for r in rows:
        f = float(200 + (r.doc_id % 20) * 20)
        assert r.dom_freq_3dp == f, (r.doc_id, r.dom_freq_3dp, f)
        assert r.centroid_3dp == f, (r.doc_id, r.centroid_3dp, f)
        assert r.rolloff85_3dp == f, (r.doc_id, r.rolloff85_3dp, f)
        assert r.sample_rate == 8000
        assert r.n_samples == 800 + (r.doc_id % 5) * 400


# ---------------------------------------------------------------- VAD --


def test_vad_closing_bridges_one_frame_gap_only(spark):
    """Closed-form fixture semantics: even doc ids have a ONE-frame
    silence gap between bursts — the closing filter bridges it into a
    single long segment; odd ids have a two-frame gap — the bursts
    stay separate and the trailing 2-frame burst is dropped by the
    min-3-frames rule."""
    from pyspark.sql import functions as F

    from etl_pipeline_orchestration_spark.plans import registry

    registry.load_all()
    out = {
        r.doc_id: r
        for r in registry.QUERIES["multimodal_vad_segments"](
            spark, "/root/testdata/sf0.001"
        )
        .filter(F.col("doc_id").isin(0, 1, 6, 7))
        .collect()
    }
    # d=0: [sil 320][tone 480][sil 160][tone 320] = 1280 -> 8 frames;
    # active f2-f4 and f6-f7, gap f5 bridged -> one 6-frame segment
    assert (out[0].n_frames, out[0].n_segments, out[0].longest_ms) == (8, 1, 120)
    assert out[0].speech_ms == 120
    # d=6 same layout class (6%3==0, 6%2==0) -> identical shape
    assert (out[6].n_frames, out[6].n_segments) == (8, 1)
    # d=1: t1=560 straddles, s2=320 (two-frame gap): first burst
    # qualifies, trailing burst is 2 frames -> dropped
    assert out[1].n_segments == 1
    assert out[1].speech_ms == out[1].longest_ms
    # every doc has at least one qualifying segment and sane bounds
    all_rows = registry.QUERIES["multimodal_vad_segments"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    for r in all_rows:
        assert 0 <= r.speech_ms <= r.n_frames * 20
        assert r.longest_ms <= r.speech_ms


def test_scene_cuts_closed_form(spark):
    """Fixture law: every doc cuts at frame 3; even docs add frame 6 —
    so odd docs have exactly 2 scenes (3 + 5 frames, longest 5) and
    even docs 3 scenes (3 + 3 + 2, longest 3)."""
    from etl_pipeline_orchestration_spark.plans import registry

    registry.load_all()
    rows = registry.QUERIES["multimodal_scene_cuts"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 500
    for r in rows:
        assert r.n_frames == 8
        if r.doc_id % 2 == 0:
            assert (r.n_cuts, r.n_scenes, r.longest_scene_frames) == (2, 3, 3), r
        else:
            assert (r.n_cuts, r.n_scenes, r.longest_scene_frames) == (1, 2, 5), r
