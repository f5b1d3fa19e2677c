"""Raster↔vector round trip and multimodal media plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmgraft.geo.cells import GridSpec
from osmgraft.geo.raster import (
    cell_rollup,
    raster_roundtrip_assignment,
    rasterize_cells,
    vectorize_raster,
)
from osmgraft.multimodal import (
    attach_media,
    decode_image_stub,
    extract_image_features,
    resize_images,
    sample_video_frames,
)

SPEC = GridSpec()


@pytest.fixture(scope="module")
def points(spark):
    # clustered points: a dense blob + sparse background
    rng = np.random.default_rng(5)
    dense = np.column_stack([
        rng.normal(300000, 15000, 3000), rng.normal(300000, 15000, 3000)])
    sparse = np.column_stack([
        rng.uniform(0, 7e5, 500), rng.uniform(0, 7e5, 500)])
    pts = np.clip(np.vstack([dense, sparse]), 0, 699999)
    return spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "pid long, x double, y double",
    ).cache()


def test_rollup_rasterize(spark, points):
    roll = cell_rollup(points, SPEC, res=4)
    grid = rasterize_cells(roll, res=4)
    assert grid.sum() == points.count()
    # densest cell is in the blob's area
    ix, iy = np.unravel_index(grid.argmax(), grid.shape)
    w = SPEC.cell_width(4)
    assert abs((ix + 0.5) * w - 300000) < 2 * w
    assert abs((iy + 0.5) * w - 300000) < 2 * w


def test_vectorize_bands_cover_hot_cells(spark, points):
    roll = cell_rollup(points, SPEC, res=4)
    grid = rasterize_cells(roll, res=4)
    tiles = vectorize_raster(grid, SPEC, res=4, band_edges=[1, 50])
    # every cell with n >= 1 is covered by exactly one tile rectangle
    covered = np.zeros_like(grid, dtype=bool)
    for t in tiles:
        covered[t["ix0"] : t["ix1"] + 1, t["iy"]] = True
    assert (covered == (grid >= 1)).all()


def test_raster_roundtrip_assignment(spark, points):
    out = raster_roundtrip_assignment(points, SPEC, res=4, band_edges=[1, 50])
    assert out.count() == points.count()
    # every point sits in a cell with >= 1 point (its own) => band non-null
    assert out.where(F.col("band").isNull()).count() == 0
    # dense-blob points get the hot band
    hot = out.where(
        (F.col("x") > 290000) & (F.col("x") < 310000)
        & (F.col("y") > 290000) & (F.col("y") < 310000)
    )
    assert hot.where(F.col("band") != 2).count() == 0


@pytest.fixture(scope="module")
def media_pages(spark):
    pages = spark.createDataFrame(
        [(f"https://ex/{i}", f"text {i}") for i in range(200)],
        "url string, text string",
    )
    return attach_media(pages).cache()


def test_media_attach_deterministic(spark, media_pages):
    a = {r.url: (r.media.media_type, r.media.width) for r in media_pages.collect()}
    b = {
        r.url: (r.media.media_type, r.media.width)
        for r in attach_media(
            spark.createDataFrame(
                [(f"https://ex/{i}", f"text {i}") for i in range(200)],
                "url string, text string",
            )
        ).collect()
    }
    assert a == b
    types = {v[0] for v in a.values()}
    assert types == {"image/png", "image/jpeg", "video/mp4", "audio/opus"}


def test_image_features(media_pages):
    feats = extract_image_features(media_pages)
    rows = feats.collect()
    assert len(rows) > 0
    for r in rows:
        assert r.media_type.startswith("image")
        assert 0 <= r.luma_mean <= 255
        assert r.aspect == r.width / r.height
    # deterministic: same decode stub → same stats on recompute
    again = {r.url: r.luma_mean for r in extract_image_features(media_pages).collect()}
    assert {r.url: r.luma_mean for r in rows} == again


def test_thumbnails_shape(media_pages):
    th = resize_images(media_pages, 16, 16).collect()
    assert len(th) > 0
    assert all(len(bytes(r.thumb)) == 16 * 16 for r in th)


def test_frame_plan(media_pages):
    plan = sample_video_frames(media_pages, every_n=24)
    rows = plan.collect()
    assert len(rows) > 0
    for r in rows[:20]:
        assert r.frame_idx % 24 == 0 and r.frame_idx < r.n_frames
    # JVM-only: no Python stage in the plan
    assert "InPandas" not in plan._jdf.queryExecution().executedPlan().toString()


def test_strict_decode_boundary(media_pages):
    with pytest.raises(Exception) as ei:
        extract_image_features(media_pages, strict=True).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_rasterize_res_guard(spark, points):
    """Round-2 guard: rasterize_cells must refuse to materialize a 4^res
    driver grid for res > 10 and point at the distributed path."""
    roll = cell_rollup(points, SPEC, 4, x="x", y="y")
    with pytest.raises(ValueError, match="distributed"):
        rasterize_cells(roll, 11)


def test_png_codec_roundtrip_all_filters():
    """Round-2 real codec (multimodal/png.py): lossless round trip for all
    five PNG scanline filters, CRC corruption detected, unsupported color
    types rejected cleanly."""
    from osmgraft.multimodal.png import decode_png_gray, encode_png_gray

    rng = np.random.default_rng(3)
    for shape in [(1, 1), (5, 3), (48, 64)]:
        a = rng.integers(0, 256, shape, dtype=np.uint8)
        for filters in [None] + [[f] * shape[0] for f in (1, 2, 3, 4)] + [
            list(rng.integers(0, 5, shape[0]))
        ]:
            buf = encode_png_gray(a, filters)
            assert np.array_equal(decode_png_gray(buf), a)
    buf = bytearray(encode_png_gray(rng.integers(0, 256, (8, 8), dtype=np.uint8)))
    buf[20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png_gray(bytes(buf))


def test_strict_mode_decodes_real_png():
    """strict=True must DECODE a PNG payload (real path) and only raise for
    non-PNG formats."""
    from osmgraft.multimodal import decode_image_stub
    from osmgraft.multimodal.png import encode_png_gray

    rng = np.random.default_rng(4)
    a = rng.integers(0, 256, (12, 9), dtype=np.uint8)
    got = decode_image_stub(encode_png_gray(a), 9, 12, strict=True)
    assert np.array_equal(got, a)
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"\xff\xd8\xff\xe0 fake jpeg bytes", 4, 4, strict=True)


def test_poisoned_row_isolation(spark):
    """tolerate_errors=True: one corrupt PNG in a batch yields a NULL-stat
    row with the error class, the rest decode normally; the default mode
    still propagates."""
    from osmgraft.multimodal.png import PNG_MAGIC, encode_png_gray

    good = encode_png_gray(np.full((4, 4), 7, dtype=np.uint8))
    corrupt = PNG_MAGIC + b"\x00\x00\x00\x0dIHDRgarbagegarbage!!"
    rows = [
        ("https://ok", ("image/png", 4, 4, None, None, None, good)),
        ("https://bad", ("image/png", 4, 4, None, None, None, corrupt)),
    ]
    schema = (
        "url string, media struct<media_type:string,width:int,height:int,"
        "n_frames:int,sample_rate:int,duration_ms:int,payload:binary>"
    )
    pages = spark.createDataFrame(rows, schema)
    out = {
        r.url: (r.luma_mean, r.decode_error)
        for r in extract_image_features(
            pages, strict=True, tolerate_errors=True
        ).collect()
    }
    assert out["https://ok"] == (7.0, None)
    assert out["https://bad"][0] is None and out["https://bad"][1] == "ValueError"
    with pytest.raises(Exception):
        extract_image_features(pages, strict=True).collect()


class TestWavCodec:
    def test_roundtrip_is_sample_exact(self):
        import numpy as np

        from osmgraft.multimodal.wav import (
            decode_wav_pcm16,
            encode_wav_pcm16,
            pcm_for_key,
        )

        for d in [0, 3, 7, 63, 190, 1234567]:
            s, rate = pcm_for_key(d)
            s2, rate2 = decode_wav_pcm16(encode_wav_pcm16(s, rate))
            assert rate2 == rate
            assert np.array_equal(s2, s.astype(np.int64))

    def test_tolerates_extra_chunks_and_word_alignment(self):
        import struct

        import numpy as np

        from osmgraft.multimodal.wav import (
            decode_wav_pcm16,
            encode_wav_pcm16,
            pcm_for_key,
        )

        s, rate = pcm_for_key(11)
        payload = encode_wav_pcm16(s, rate)
        # splice an odd-length LIST chunk between fmt and data
        fmt_end = 12 + 8 + 16
        extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad
        spliced = (
            payload[:fmt_end]
            + extra
            + payload[fmt_end:8] if False else
            payload[:fmt_end] + extra + payload[fmt_end:]
        )
        # fix RIFF size
        spliced = (
            spliced[:4]
            + struct.pack("<I", len(spliced) - 8)
            + spliced[8:]
        )
        s2, rate2 = decode_wav_pcm16(spliced)
        assert rate2 == rate
        assert np.array_equal(s2, s.astype(np.int64))

    def test_raises_on_bad_payloads(self):
        import struct

        import pytest as _pytest

        from osmgraft.multimodal.wav import (
            decode_wav_pcm16,
            encode_wav_pcm16,
            pcm_for_key,
        )

        good = encode_wav_pcm16(*pcm_for_key(5))
        stereo = bytearray(good)
        # fmt chunk starts at offset 20; channels field at +2
        struct.pack_into("<H", stereo, 20 + 2, 2)
        for bad in [b"", b"RIFF\x00\x00\x00\x00WAVE", good[:40], bytes(stereo)]:
            with _pytest.raises(ValueError):
                decode_wav_pcm16(bad)


def test_waveform_stats_single_map_stage_before_agg(spark):
    """Payload bytes must never shuffle: the encode+decode mapInPandas
    kernels chain inside one stage — the plan has exactly one Exchange
    (the lang rollup) and no payload column crosses it."""
    from osmgraft.contract_media import media_waveform_stats
    from tests.conftest import SF_CORRECT

    df = media_waveform_stats(spark, SF_CORRECT)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # one hash exchange for the groupBy; the presentation sort may add a
    # range exchange over the tiny post-agg relation
    assert plan.count("hashpartitioning(") == 1
    assert "payload" not in plan.split("hashpartitioning(")[1]


def test_ahash_groups_cover_shared_rasters_exactly(spark):
    """Group membership equals the canonical-raster windows: images with
    the same rkey hash identically (decode+resize+hash are pixel-exact),
    and no group mixes rkeys (distinct rasters do not collide on the
    fixture); bytes never cross the shuffle."""
    from osmgraft.contract_media import (
        _AH_GROUP,
        _PNG_MOD,
        media_ahash_groups,
    )
    from tests.conftest import SF_CORRECT

    df = media_ahash_groups(spark, SF_CORRECT)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "payload" not in plan  # bytes stay inside the kernel
    rows = df.collect()
    assert rows

    docs = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .select("doc_id")
        .collect()
        if r["doc_id"] % _PNG_MOD == 0
    ]
    by_rkey: dict[int, list[int]] = {}
    for d in docs:
        by_rkey.setdefault(d // _AH_GROUP * _AH_GROUP, []).append(d)
    expected = {
        (min(v), max(v), len(v)) for v in by_rkey.values() if len(v) >= 2
    }
    got = {
        (r["min_doc_id"], r["max_doc_id"], r["n_images"]) for r in rows
    }
    assert got == expected
