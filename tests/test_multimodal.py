"""Real-media multimodal path: stdlib-built PNG/WAV/MP4 payloads must
round-trip through the Arrow-batched decode/resize/demux operators with
byte-exact, header-derived results (no closed-form shortcuts on the Spark
side — the decode parses actual file structure)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from windowsession_using_kafka_flink_docker_spark.operators import media_codec as C
from windowsession_using_kafka_flink_docker_spark.operators import multimodal as M


class TestCodecUnits:
    """Spark-free codec invariants (fast)."""

    def test_png_roundtrip_and_crc(self):
        png = C.build_png(33, 21, seed=42)
        assert C.parse_png_header(png) == (33, 21)
        w, h, px = C.decode_png_pixels(png)
        assert (w, h, px.shape) == (33, 21, (21, 33, 3))
        # pixel content is exactly the deterministic generator output
        assert px.reshape(-1).tobytes() == C._mix_bytes(33 * 21 * 3, 42).tobytes()
        # corrupt one IHDR byte -> CRC check must fire
        broken = bytearray(png)
        broken[18] ^= 0xFF
        with pytest.raises(ValueError, match="CRC|IHDR"):
            C.parse_png_header(bytes(broken))

    def test_png_resize_is_nearest_neighbor(self):
        png = C.build_png(40, 24, seed=3)
        _, _, px = C.decode_png_pixels(png)
        out = C.resize_png(png, 16, 16)
        w, h, rpx = C.decode_png_pixels(out)
        assert (w, h) == (16, 16)
        ys = np.arange(16) * 24 // 16
        xs = np.arange(16) * 40 // 16
        assert (rpx == px[ys][:, xs]).all()

    def test_wav_chunk_walk(self):
        wav = C.build_wav(12000, 12000 // 100 * 4, seed=9)
        info = C.parse_wav(wav)
        assert info == {"sample_rate": 12000, "channels": 1, "bits": 16,
                        "n_samples": 480, "duration_ms": 40}

    def test_mp4_box_walk_and_demux(self):
        sizes = [50, 57, 64]
        mp4 = C.build_mp4(128, 96, sizes, duration_ms=120, seed=5)
        info = C.parse_mp4(mp4)
        assert (info["width"], info["height"], info["duration_ms"]) == (128, 96, 120)
        assert info["sample_sizes"] == sizes
        frames = C.demux_mp4_samples(mp4)
        assert [len(f) for f in frames] == sizes
        assert frames[2] == C._mix_bytes(64, 5 * 31 + 2).tobytes()

    def test_not_a_png(self):
        with pytest.raises(ValueError):
            C.parse_png_header(b"JFIF not a png at all........")


class TestMediaFeatures:
    def test_decode_matches_planted_headers(self, spark):
        docs = spark.createDataFrame([(i,) for i in range(12)], "doc_id BIGINT")
        rows = {r.doc_id: r for r in
                M.extract_media_features(M.attach_media(docs)).collect()}
        assert len(rows) == 12
        for i in range(12):
            r = rows[i]
            payload, mtype = M.build_payload(i)
            assert r.media_type == mtype
            assert r.byte_size == len(payload)
            assert r.checksum == hashlib.md5(payload).hexdigest()
            if mtype == "image/png":
                assert (r.width, r.height) == (i % 48 + 16, i % 32 + 16)
                assert r.sample_rate is None and r.duration_ms is None
            elif mtype == "audio/wav":
                assert r.width is None and r.height is None
                assert r.sample_rate == 8000 + (i % 4) * 4000
                assert r.duration_ms == 10 * (i % 5 + 1)
            else:
                assert (r.width, r.height) == (i % 128 + 64, i % 96 + 48)
                assert r.duration_ms == 40 * (i % 5 + 2)

    def test_unknown_media_type_raises(self, spark):
        from pyspark.errors.exceptions.captured import PythonException

        media = spark.createDataFrame(
            [(1, bytearray(b"%PDF-1.4 ..."), "application/pdf")],
            "doc_id BIGINT, payload BINARY, media_type STRING")
        with pytest.raises(PythonException, match="NotImplementedError"):
            M.extract_media_features(media).collect()


class TestResizeAndFrames:
    def test_resize_real_pixels(self, spark):
        docs = spark.createDataFrame([(0,), (3,), (6,)], "doc_id BIGINT")
        out = {r.doc_id: r for r in
               M.resize_images(M.attach_media(docs), width=16, height=16).collect()}
        assert set(out) == {0, 3, 6}  # only the image/png rows
        for i, r in out.items():
            assert (r.width, r.height) == (16, 16)
            # output payload is a real PNG whose pixels are the
            # nearest-neighbor map of the original's decoded pixels
            src, _ = M.build_payload(i)
            w, h, px = C.decode_png_pixels(src)
            rw, rh, rpx = C.decode_png_pixels(bytes(r.payload))
            assert (rw, rh) == (16, 16)
            ys = np.arange(16) * h // 16
            xs = np.arange(16) * w // 16
            assert (rpx == px[ys][:, xs]).all()

    def test_frame_sample_demuxes_planted_sizes(self, spark):
        docs = spark.createDataFrame([(i,) for i in range(12)], "doc_id BIGINT")
        frames = M.sample_frames(M.attach_media(docs)).collect()
        vids = [i for i in range(12) if i % 3 == 2]
        assert {r.doc_id for r in frames} == set(vids)
        for r in frames:
            want_len = r.doc_id % 100 + 32 + 7 * r.frame_index
            assert r.frame_bytes == want_len
            assert len(r.frame) == want_len
            assert r.checksum == hashlib.md5(bytes(r.frame)).hexdigest()
        by_doc = {}
        for r in frames:
            by_doc.setdefault(r.doc_id, []).append(r.frame_index)
        for i in vids:
            n = i % 5 + 2
            assert sorted(by_doc[i]) == list(range(min(n, 4)))


class TestImageAhash:
    """_ahash_bits unit semantics + the resize-robustness property the
    catalog entry claims for STRUCTURED images (the parquet fixture's
    pseudorandom pixels intentionally exercise the near-tie adversarial
    case instead; oracle parity covers those)."""

    def test_gradient_lights_bright_half(self):
        import numpy as np

        from windowsession_using_kafka_flink_docker_spark.operators.multimodal import (
            _ahash_bits,
        )

        px = np.zeros((16, 16, 3), dtype=np.uint8)
        px[:, 8:, :] = 255
        bits = _ahash_bits(px)
        assert bits == ("0000" + "1111") * 8
        assert bits.count("1") == 32

    def test_structured_image_is_resize_robust(self):
        import numpy as np

        from windowsession_using_kafka_flink_docker_spark.operators import (
            media_codec as C,
        )
        from windowsession_using_kafka_flink_docker_spark.operators.multimodal import (
            _ahash_bits,
        )

        # smooth horizontal gradient, 48x32 — strong block structure
        w, h = 48, 32
        col = np.linspace(0, 255, w).astype(np.uint8)
        px = np.repeat(col[None, :, None], h, axis=0).repeat(3, axis=2)
        png = C.encode_png(w, h, px.tobytes())
        a1 = _ahash_bits(C.decode_png_pixels(png)[2])
        resized = C.resize_png(png, 32, 32)
        a2 = _ahash_bits(C.decode_png_pixels(resized)[2])
        ham = sum(x != y for x, y in zip(a1, a2))
        assert ham <= 4, (a1, a2, ham)
        # and the hash itself reads the gradient: left dark, right lit
        assert a1[0] == "0" and a1[7] == "1"

    def test_catalog_entry_covers_every_png(self, spark, sf_dir):
        from windowsession_using_kafka_flink_docker_spark.plans.catalog import (
            CATALOG,
        )
        from windowsession_using_kafka_flink_docker_spark.sources.batch import (
            load_table,
        )

        n_pngs = (load_table(spark, sf_dir, "documents")
                  .where("doc_id % 3 = 0").count())
        rows = CATALOG["image_ahash_fingerprints"] \
            .spark(spark, sf_dir).collect()
        assert len(rows) == n_pngs
        for r in rows:
            assert len(r.ahash) == 64 and set(r.ahash) <= {"0", "1"}
            assert len(r.ahash_resized) == 64
            assert 0 <= r.hamming_resize <= 64


class TestSampleLevelCodecParity:
    """Sample-level pins beneath the header parsers: the PCM16 payload a
    chunk walk locates must decode to exactly the closed-form values the
    builder planted — one wrong RIFF offset or endianness flip and every
    sample moves (the audio analogue of the aHash pixel-level parity)."""

    def test_wav_pcm16_samples_match_closed_form(self):
        import struct

        import numpy as np

        from windowsession_using_kafka_flink_docker_spark.operators import (
            media_codec as C,
        )

        for seed, rate, n in ((7, 8000, 160), (41, 16000, 480)):
            wav = C.build_wav(rate, n, seed=seed)
            info = C.parse_wav(wav)
            assert (info["sample_rate"], info["n_samples"]) == (rate, n)
            # locate the data chunk by the same walk the parser does
            b, off, payload = bytes(wav), 12, None
            while off + 8 <= len(b):
                ctype = b[off:off + 4]
                (length,) = struct.unpack("<I", b[off + 4:off + 8])
                if ctype == b"data":
                    payload = b[off + 8:off + 8 + length]
                off += 8 + length + (length & 1)
            samples = np.frombuffer(payload, dtype="<i2")
            want = (C._mix_bytes(n * 2, seed).view("<u2")
                    .astype(np.int32) - 32768).astype(np.int16)
            assert np.array_equal(samples, want)

    def test_mp4_demuxed_frames_match_planted_bytes(self):
        from windowsession_using_kafka_flink_docker_spark.operators import (
            media_codec as C,
        )
        from windowsession_using_kafka_flink_docker_spark.operators.multimodal import (
            build_payload,
        )

        # a video doc: doc_id % 3 == 2; frame i carries planted size
        # doc_id % 100 + 32 + 7*i — demux must return byte-identical
        # slices of the mdat, not just matching lengths
        doc_id = 5
        payload, mtype = build_payload(doc_id)
        assert mtype == "video/mp4"
        info = C.parse_mp4(payload)
        sizes = [doc_id % 100 + 32 + 7 * i
                 for i in range(doc_id % 5 + 2)]
        assert info["sample_sizes"] == sizes
        # slice the mdat at the stco offset with the stsz sizes and pin
        # every frame byte-identical to the planted _mix_bytes content
        b = bytes(payload)
        off = info["chunk_offset"]
        for i, s in enumerate(sizes):
            frame = b[off:off + s]
            want = C._mix_bytes(s, doc_id * 31 + i).tobytes()
            assert frame == want, f"frame {i} bytes diverge"
            off += s


class TestAhashPropertySweep:
    """_ahash_bits vs a naive double-loop reference over random small
    images — the np.add.at fancy-indexed block accumulation is exactly
    the kind of vectorization that silently breaks on off-by-one block
    boundaries, so sweep it."""

    def test_hypothesis_matches_naive(self):
        import numpy as np
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from windowsession_using_kafka_flink_docker_spark.operators.multimodal import (
            _ahash_bits,
        )

        @settings(max_examples=60, deadline=None)
        @given(w=st.integers(8, 40), h=st.integers(8, 40),
               seed=st.integers(0, 2**31 - 1))
        def check(w, h, seed):
            rng = np.random.default_rng(seed)
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            got = _ahash_bits(px)
            # naive reference: per-pixel loop into 8x8 blocks
            s = [[0] * 8 for _ in range(8)]
            n = [[0] * 8 for _ in range(8)]
            total = 0
            for y in range(h):
                for x in range(w):
                    g = int(px[y, x, 0]) + int(px[y, x, 1]) + int(px[y, x, 2])
                    by, bx = y * 8 // h, x * 8 // w
                    s[by][bx] += g
                    n[by][bx] += 1
                    total += g
            count = w * h
            want = "".join(
                "1" if s[by][bx] * count > total * n[by][bx] else "0"
                for by in range(8) for bx in range(8))
            assert got == want, (w, h, seed)

        check()


class TestJpegCodec:
    """Baseline JPEG (round-12 stretch): the encoder writes real
    entropy-coded bytes and the decoder must invert it bit-exactly at the
    quantized-coefficient level — not just on the block-flat fixture but
    on arbitrary images exercising the AC run-length/ZRL/EOB paths."""

    def test_header_parse_and_marker_walk(self):
        data = C.build_jpeg_flat_blocks(seed=7, quality=50)
        assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
        w, h, q00 = C.parse_jpeg_header(data)
        assert (w, h, q00) == (64, 64, 16)
        # quality scaling puts the DC quantizer at {32, 16, 8}
        for quality, want in ((25, 32), (50, 16), (75, 8)):
            d = C.build_jpeg_flat_blocks(seed=1, quality=quality)
            assert C.parse_jpeg_header(d)[2] == want

    def test_flat_fixture_decodes_to_closed_form(self):
        for seed in (0, 3, 11):
            for quality in (25, 50, 75):
                data = C.build_jpeg_flat_blocks(seed, quality)
                _, _, dec = C.decode_jpeg_gray(data)
                q00 = int(C.jpeg_scaled_quant(quality)[0, 0])
                vals = C._mix_bytes(64, seed).reshape(8, 8).astype(np.int64)
                t = (vals - 128) * 8
                mag = (2 * np.abs(t) + q00) // (2 * q00)
                recon = np.sign(t) * mag * q00
                want = np.clip(recon // 8 + 128, 0, 255).astype(np.uint8)
                want_img = np.repeat(np.repeat(want, 8, 0), 8, 1)
                assert np.array_equal(dec, want_img), (seed, quality)

    def test_general_image_decode_inverts_encoder_exactly(self):
        # random pixels maximize AC activity (ZRL runs, full categories);
        # the decode must equal the encoder's quantized reconstruction
        rng = np.random.RandomState(13)
        gray = rng.randint(0, 256, size=(16, 24)).astype(np.uint8)
        for quality in (25, 50, 75, 90):
            q = C.jpeg_scaled_quant(quality)
            data = C.encode_jpeg_gray(24, 16, gray, quality)
            w, h, dec = C.decode_jpeg_gray(data)
            assert (w, h) == (24, 16)
            B = C._DCT_BASIS
            px = gray.astype(np.float64) - 128.0
            for by in range(2):
                for bx in range(3):
                    blk = px[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                    coef = np.rint(B @ blk @ B.T).astype(np.int64)
                    quant = C._quantize_rha(coef, q)
                    rec = B.T @ (quant * q).astype(np.float64) @ B
                    want = np.clip(np.floor(rec + 128.5), 0, 255).astype(np.uint8)
                    got = dec[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                    assert np.array_equal(got, want), (quality, by, bx)

    def test_smooth_image_is_low_loss(self):
        # a horizontal gradient survives q=50 within 2 gray levels
        grad = np.tile((np.arange(64, dtype=np.int64) * 4).astype(np.uint8),
                       (16, 1))
        data = C.encode_jpeg_gray(64, 16, grad, 50)
        _, _, dec = C.decode_jpeg_gray(data)
        assert np.abs(dec.astype(int) - grad.astype(int)).max() <= 2

    def test_ff_byte_stuffing_roundtrip(self):
        # sweep random 8x8 images at q=90 until an entropy stream contains
        # a stuffed 0xFF00 (RandomState(1) is known to); decode must
        # de-stuff and still invert the encoder reconstruction exactly
        hit = False
        for seed in range(8):
            gray = np.random.RandomState(seed).randint(
                0, 256, size=(8, 8)).astype(np.uint8)
            data = C.encode_jpeg_gray(8, 8, gray, 90)
            scan_at = data.index(b"\xff\xda") + 14
            stuffed = b"\xff\x00" in data[scan_at:-2]
            hit = hit or stuffed
            q = C.jpeg_scaled_quant(90)
            B = C._DCT_BASIS
            coef = np.rint(
                B @ (gray.astype(np.float64) - 128.0) @ B.T).astype(np.int64)
            rec = B.T @ (C._quantize_rha(coef, q) * q).astype(np.float64) @ B
            want = np.clip(np.floor(rec + 128.5), 0, 255).astype(np.uint8)
            _, _, dec = C.decode_jpeg_gray(data)
            assert np.array_equal(dec, want), seed
        assert hit, "no seed produced a stuffed byte — the test is vacuous"

    def test_truncated_stream_raises(self):
        data = C.build_jpeg_flat_blocks(seed=5, quality=50)
        with pytest.raises(ValueError, match="SOI|marker|EOI|exhausted|truncated"):
            C.decode_jpeg_gray(data[:40] + b"\xff\xd9")
        with pytest.raises(ValueError, match="not a JPEG"):
            C.parse_jpeg_header(b"\x00" + data)


@pytest.mark.usefixtures("spark")
class TestJpegCatalogEntry:
    def test_jpeg_ahash_matches_closed_form(self, spark, sf_dir):
        from windowsession_using_kafka_flink_docker_spark.plans.llm_pipeline import image_jpeg_ahash
        rows = {r["doc_id"]: r
                for r in image_jpeg_ahash(spark, sf_dir).collect()}
        assert rows, "entry returned no rows"
        some = sorted(rows)[:8]
        for doc_id in some:
            r = rows[doc_id]
            q00 = {0: 32, 1: 16, 2: 8}[doc_id % 3]
            assert (r["width"], r["height"], r["q00"]) == (64, 64, q00)
            vals = C._mix_bytes(64, doc_id).reshape(8, 8).astype(np.int64)
            t = (vals - 128) * 8
            mag = (2 * np.abs(t) + q00) // (2 * q00)
            dec = np.clip((np.sign(t) * mag * q00) // 8 + 128, 0, 255)
            tot = int(dec.sum())
            want_hash = "".join(
                "1" if int(dec[by, bx]) * 64 > tot else "0"
                for by in range(8) for bx in range(8))
            assert r["ahash"] == want_hash, doc_id
            assert r["abs_err"] == 64 * int(np.abs(dec - vals).sum())
            # quality monotonicity: higher quality (smaller q00) can't
            # be lossier than the same image at lower quality — checked
            # per-block arithmetic, not asserted across doc_ids (the
            # content differs); q=75 (q00=8) is exact on flat blocks
            if q00 == 8:
                assert r["abs_err"] == 0


@pytest.mark.usefixtures("spark")
class TestJpegHammingNeardups:
    def test_same_content_pairs_all_recovered(self, spark, sf_dir):
        """The fixture's planted near-dups — same image 256 doc_ids apart
        at a different JPEG quality — must ALL surface at Hamming <= 1
        (recall 1.0 through the chunk blocking), each flagged
        same_content."""
        from windowsession_using_kafka_flink_docker_spark.plans.llm_pipeline import (
            jpeg_hamming_neardups,
        )
        from windowsession_using_kafka_flink_docker_spark.sources.batch import load_table

        ids = sorted(r[0] for r in
                     load_table(spark, sf_dir, "documents")
                     .select("doc_id").collect())
        idset = set(ids)
        planted = {(d, d + 256) for d in ids if d + 256 in idset}
        assert planted, "fixture has no 256-apart pairs at this sf"
        got = {(r["doc_lo"], r["doc_hi"]): r
               for r in jpeg_hamming_neardups(spark, sf_dir).collect()}
        missing = planted - set(got)
        assert not missing, f"planted near-dups missed: {sorted(missing)[:5]}"
        for p in planted:
            assert got[p]["same_content"] is True
            assert got[p]["hamming"] <= 1
        # flag correctness on the whole result, not just planted pairs
        for (lo, hi), r in got.items():
            assert r["same_content"] == ((hi - lo) % 256 == 0)


class TestJpegHypothesis:
    """Property sweep of the whole entropy pipeline: for ANY image and
    quality, the decoder must reproduce the encoder's quantized
    reconstruction bit-exactly (Huffman categories 1..11, ZRL chains,
    EOB placement, byte stuffing, DC differentials all exercised by the
    random draw)."""

    def test_decode_inverts_encode_for_any_image(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=40, deadline=None)
        @given(st.integers(1, 3), st.integers(1, 3),
               st.integers(1, 95), st.randoms(use_true_random=False))
        def check(bw, bh, quality, rnd):
            w, h = bw * 8, bh * 8
            gray = np.array([[rnd.randrange(256) for _ in range(w)]
                             for _ in range(h)], dtype=np.uint8)
            data = C.encode_jpeg_gray(w, h, gray, quality)
            gw, gh, dec = C.decode_jpeg_gray(data)
            assert (gw, gh) == (w, h)
            q = C.jpeg_scaled_quant(quality)
            B = C._DCT_BASIS
            px = gray.astype(np.float64) - 128.0
            for by in range(bh):
                for bx in range(bw):
                    blk = px[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                    coef = np.rint(B @ blk @ B.T).astype(np.int64)
                    rec = B.T @ (C._quantize_rha(coef, q) * q
                                 ).astype(np.float64) @ B
                    want = np.clip(np.floor(rec + 128.5), 0,
                                   255).astype(np.uint8)
                    got = dec[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                    assert np.array_equal(got, want), (quality, by, bx)

        check()


class TestJpeg420Codec:
    """4:2:0 color JPEG (the round-12 extension of the grayscale
    stretch): interleaved MCUs, three DC predictor chains, two quant
    tables — the decoder must invert the encoder exactly on arbitrary
    planes, and the block-flat fixture must match the closed-form
    reconstruction in every component."""

    def test_flat_fixture_closed_form_all_planes(self):
        def expect(vals, q00):
            t = (vals.astype(np.int64) - 128) * 8
            mag = (2 * np.abs(t) + q00) // (2 * q00)
            recon = np.sign(t) * mag * q00
            a = 0.35355339059327373
            return np.clip(np.floor((a * recon) * a + 128.5),
                           0, 255).astype(np.uint8)

        for seed in (0, 5, 9):
            for quality, ql00, qc00 in ((25, 32, 34), (50, 16, 17),
                                        (75, 8, 9)):
                data = C.build_jpeg420_flat_blocks(seed, quality)
                w, h, y, cb, cr = C.decode_jpeg_color420(data)
                assert (w, h) == (32, 32)
                info = C.parse_jpeg_segments(data)
                assert int(info["quant_tables"][0][0, 0]) == ql00
                assert int(info["quant_tables"][1][0, 0]) == qc00
                ye = np.repeat(np.repeat(expect(
                    C._mix_bytes(16, seed).reshape(4, 4), ql00), 8, 0), 8, 1)
                cbe = np.repeat(np.repeat(expect(
                    C._mix_bytes(4, seed * 7 + 1).reshape(2, 2), qc00),
                    8, 0), 8, 1)
                cre = np.repeat(np.repeat(expect(
                    C._mix_bytes(4, seed * 7 + 2).reshape(2, 2), qc00),
                    8, 0), 8, 1)
                assert np.array_equal(y, ye), (seed, quality)
                assert np.array_equal(cb, cbe), (seed, quality)
                assert np.array_equal(cr, cre), (seed, quality)

    def test_color_decode_inverts_encoder_exactly(self):
        rng = np.random.RandomState(11)
        y = rng.randint(0, 256, (16, 32)).astype(np.uint8)
        cb = rng.randint(0, 256, (8, 16)).astype(np.uint8)
        cr = rng.randint(0, 256, (8, 16)).astype(np.uint8)
        B = C._DCT_BASIS

        def recon(plane, q):
            out = np.zeros_like(plane)
            pf = plane.astype(np.float64) - 128.0
            for by in range(plane.shape[0] // 8):
                for bx in range(plane.shape[1] // 8):
                    blk = pf[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                    coef = np.rint(B @ blk @ B.T).astype(np.int64)
                    rec = B.T @ (C._quantize_rha(coef, q) * q
                                 ).astype(np.float64) @ B
                    out[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = np.clip(
                        np.floor(rec + 128.5), 0, 255).astype(np.uint8)
            return out

        for quality in (25, 50, 90):
            data = C.encode_jpeg_color420(32, 16, y, cb, cr, quality)
            w, h, yd, cbd, crd = C.decode_jpeg_color420(data)
            assert (w, h) == (32, 16)
            assert np.array_equal(yd, recon(y, C.jpeg_scaled_quant(quality)))
            assert np.array_equal(
                cbd, recon(cb, C.jpeg_scaled_quant_chroma(quality)))
            assert np.array_equal(
                crd, recon(cr, C.jpeg_scaled_quant_chroma(quality)))

    def test_shape_and_sampling_guards(self):
        y = np.zeros((16, 16), dtype=np.uint8)
        c8 = np.zeros((8, 8), dtype=np.uint8)
        with pytest.raises(ValueError, match="multiples of 16"):
            C.encode_jpeg_color420(8, 8, y[:8, :8], c8[:4, :4], c8[:4, :4])
        with pytest.raises(ValueError, match="half-resolution"):
            C.encode_jpeg_color420(16, 16, y, y, y)
        # a grayscale stream through the color decoder must refuse
        with pytest.raises(ValueError, match="3-component"):
            C.decode_jpeg_color420(C.build_jpeg_flat_blocks(1, 50))
        # and the color stream through the gray decoder must refuse
        with pytest.raises(ValueError, match="single-component"):
            C.decode_jpeg_gray(C.build_jpeg420_flat_blocks(1, 50))


class TestJpeg420Hypothesis:
    """Property sweep of the interleaved color pipeline: for ANY plane
    content and quality, the color decoder must reproduce all three of
    the encoder's quantized reconstructions bit-exactly (predictor
    chains crossing MCU boundaries, chroma-table categories, and
    interleaving order all exercised by the random draw)."""

    def test_color_decode_inverts_encode_for_any_planes(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        B = C._DCT_BASIS

        def recon(plane, q):
            out = np.zeros_like(plane)
            pf = plane.astype(np.float64) - 128.0
            for by in range(plane.shape[0] // 8):
                for bx in range(plane.shape[1] // 8):
                    blk = pf[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                    coef = np.rint(B @ blk @ B.T).astype(np.int64)
                    rec = B.T @ (C._quantize_rha(coef, q) * q
                                 ).astype(np.float64) @ B
                    out[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = np.clip(
                        np.floor(rec + 128.5), 0, 255).astype(np.uint8)
            return out

        @settings(max_examples=20, deadline=None)
        @given(st.integers(1, 2), st.integers(1, 2),
               st.integers(1, 95), st.randoms(use_true_random=False))
        def check(mw, mh, quality, rnd):
            w, h = mw * 16, mh * 16
            y = np.array([[rnd.randrange(256) for _ in range(w)]
                          for _ in range(h)], dtype=np.uint8)
            cb = np.array([[rnd.randrange(256) for _ in range(w // 2)]
                           for _ in range(h // 2)], dtype=np.uint8)
            cr = np.array([[rnd.randrange(256) for _ in range(w // 2)]
                           for _ in range(h // 2)], dtype=np.uint8)
            data = C.encode_jpeg_color420(w, h, y, cb, cr, quality)
            gw, gh, yd, cbd, crd = C.decode_jpeg_color420(data)
            assert (gw, gh) == (w, h)
            ql = C.jpeg_scaled_quant(quality)
            qc = C.jpeg_scaled_quant_chroma(quality)
            assert np.array_equal(yd, recon(y, ql)), quality
            assert np.array_equal(cbd, recon(cb, qc)), quality
            assert np.array_equal(crd, recon(cr, qc)), quality

        check()


class TestJpegConformance:
    """ADVICE r12: the zigzag table must be the ITU-T T.81 Figure A.6
    order (the pre-r13 table was its transpose — in-repo round-trips
    passed but emitted files were non-conformant JFIF), and the marker
    walk must handle multi-table DQT/DHT segments and refuse restart
    markers instead of losing sync."""

    # T.81 Figure A.6, flattened as row*8+col for each scan position.
    T81_ZIGZAG_FLAT = [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ]

    def test_zigzag_matches_t81_figure_a6(self):
        assert [r * 8 + c for r, c in C.JPEG_ZIGZAG] == self.T81_ZIGZAG_FLAT

    # Spec-transcribed conformance stream — generated (with provenance
    # comments and its own spec-constant transcription, importing
    # nothing from the engine) by tests/fixtures/gen_t81_conformance.py.
    # 16x16 gray baseline JFIF with the UNSCALED Annex K.1 quant table
    # and Annex K.3 Huffman tables in ONE combined DHT segment, a COM
    # segment, AC coefficients at zigzag 1 (natural (0,1)) and zigzag 2
    # (natural (1,0)) — the transposed-zigzag probe pair — a >15-zero
    # run forcing a ZRL code, an all-zero block, and a zigzag-63 tail.
    T81_FIXTURE_HEX = (
        "ffd8ffe000104a46494600010100000100010000fffe0022542e383120416e6e"
        "6578204b20636f6e666f726d616e63652066697874757265ffdb004300100b0c"
        "0e0c0a100e0d0e1211101318281a181616183123251d283a333d3c3933383740"
        "485c4e404457453738506d51575f626768673e4d71797064785c656763ffc000"
        "0b080010001001011100ffc400d2000001050101010101010000000000000000"
        "0102030405060708090a0b100002010303020403050504040000017d01020300"
        "041105122131410613516107227114328191a1082342b1c11552d1f024336272"
        "82090a161718191a25262728292a3435363738393a434445464748494a535455"
        "565758595a636465666768696a737475767778797a838485868788898a929394"
        "95969798999aa2a3a4a5a6a7a8a9aab2b3b4b5b6b7b8b9bac2c3c4c5c6c7c8c9"
        "cad2d3d4d5d6d7d8d9dae1e2e3e4e5e6e7e8e9eaf1f2f3f4f5f6f7f8f9faffda"
        "0008010100003f007ad57f339ff3fe78a96ad10c9fe7fcff009fd7ffd9"
    )
    T81_FIXTURE_PIXELS = [
        [130, 131, 132, 133, 135, 136, 137, 138, 118, 145, 122, 110, 140, 129, 109, 138],
        [130, 131, 132, 133, 135, 136, 137, 138, 129, 122, 125, 127, 120, 124, 130, 124],
        [130, 131, 132, 133, 135, 136, 137, 138, 136, 102, 126, 139, 103, 118, 144, 112],
        [130, 131, 132, 133, 135, 136, 137, 138, 128, 108, 121, 128, 108, 117, 132, 115],
        [130, 131, 132, 133, 135, 136, 137, 138, 111, 129, 113, 105, 125, 118, 105, 125],
        [130, 131, 132, 133, 135, 136, 137, 138, 103, 135, 108, 94, 129, 117, 93, 127],
        [130, 131, 132, 133, 135, 136, 137, 138, 110, 116, 109, 106, 113, 111, 107, 115],
        [130, 131, 132, 133, 135, 136, 137, 138, 121, 93, 113, 123, 93, 105, 128, 101],
        [128, 128, 128, 128, 128, 128, 128, 128, 145, 142, 151, 144, 157, 150, 159, 156],
        [128, 128, 128, 128, 128, 128, 128, 128, 140, 151, 134, 161, 136, 163, 145, 156],
        [128, 128, 128, 128, 128, 128, 128, 128, 146, 131, 160, 124, 166, 130, 159, 144],
        [128, 128, 128, 128, 128, 128, 128, 128, 138, 157, 123, 167, 119, 163, 129, 148],
        [128, 128, 128, 128, 128, 128, 128, 128, 152, 133, 166, 121, 167, 122, 154, 135],
        [128, 128, 128, 128, 128, 128, 128, 128, 150, 164, 134, 169, 126, 161, 130, 144],
        [128, 128, 128, 128, 128, 128, 128, 128, 164, 152, 168, 140, 163, 135, 151, 140],
        [128, 128, 128, 128, 128, 128, 128, 128, 164, 166, 157, 161, 148, 153, 143, 145],
    ]

    def test_spec_table_fixture_decode(self):
        """CI-visible conformance (VERDICT r13 item 9, replacing the
        env-gated Pillow interop in the sandbox): a baseline stream the
        engine's encoder never produced — hand-assembled from T.81 spec
        constants by an independent generator — must decode to its
        independently-IDCT'd pixels bit-exactly. The pre-r13
        transposed-zigzag bug class fails this (blocks 0/1 place their
        single AC at the mirrored frequency); in-repo round-trip tests
        alone could not see it."""
        data = bytes.fromhex(self.T81_FIXTURE_HEX)
        w, h, px = C.decode_jpeg_gray(data)
        assert (w, h) == (16, 16)
        assert np.array_equal(
            px, np.array(self.T81_FIXTURE_PIXELS, dtype=np.uint8))

    def test_pillow_interop_decode(self):
        """A standard decoder (libjpeg via Pillow) must agree with our
        decoder on emitted files. Env-gated: Pillow is not in the CI
        container; runs wherever it is installed."""
        PIL = pytest.importorskip("PIL.Image")
        import io

        data = C.build_jpeg_flat_blocks(seed=3, quality=50)
        img = PIL.open(io.BytesIO(data))
        ours = C.decode_jpeg_gray(data)[2]
        theirs = np.asarray(img.convert("L"))
        # libjpeg uses a fast integer IDCT; allow off-by-one rounding.
        assert np.abs(ours.astype(int) - theirs.astype(int)).max() <= 1

    def test_multi_table_dqt_dht_segments(self):
        """Repack the fixture's per-table DQT/DHT segments into single
        combined segments (as real encoders emit) — the parse must see
        identical tables and the decode must be byte-identical."""
        import struct

        data = C.build_jpeg420_flat_blocks(seed=9, quality=50)
        want = C.parse_jpeg_segments(data)

        # Walk markers, coalescing DQT bodies and DHT bodies.
        b = bytes(data)
        off, segs, dqt_body, dht_body = 2, [b"\xFF\xD8"], b"", b""
        while True:
            marker = (b[off] << 8) | b[off + 1]
            (length,) = struct.unpack(">H", b[off + 2:off + 4])
            body = b[off + 4:off + 2 + length]
            if marker == 0xFFDB:
                dqt_body += body
            elif marker == 0xFFC4:
                dht_body += body
            elif marker == 0xFFDA:
                segs.append(struct.pack(">HH", 0xFFDB, 2 + len(dqt_body))
                            + dqt_body)
                segs.append(struct.pack(">HH", 0xFFC4, 2 + len(dht_body))
                            + dht_body)
                segs.append(b[off:])
                break
            else:
                segs.append(b[off:off + 2 + length])
            off += 2 + length
        repacked = b"".join(segs)
        got = C.parse_jpeg_segments(repacked)
        assert np.array_equal(got["quant_tables"][0], want["quant_tables"][0])
        assert np.array_equal(got["quant_tables"][1], want["quant_tables"][1])
        assert got["huff"] == want["huff"]
        assert got["scan"] == want["scan"]
        w, h, y, cb, cr = C.decode_jpeg_color420(repacked)
        ww, wh, wy, wcb, wcr = C.decode_jpeg_color420(data)
        assert (w, h) == (ww, wh)
        assert np.array_equal(y, wy)
        assert np.array_equal(cb, wcb) and np.array_equal(cr, wcr)

    def test_dri_raises_instead_of_desyncing(self):
        import struct

        data = C.build_jpeg_flat_blocks(seed=2, quality=50)
        dri = struct.pack(">HHH", 0xFFDD, 4, 8)  # restart every 8 MCUs
        patched = data[:2] + dri + data[2:]
        with pytest.raises(ValueError, match="restart"):
            C.parse_jpeg_segments(patched)

    def test_truncated_packed_tables_raise(self):
        import struct

        # DQT segment whose body is 64 bytes (one byte short of a table)
        bad_dqt = (b"\xFF\xD8"
                   + struct.pack(">HH", 0xFFDB, 2 + 64) + bytes(64))
        with pytest.raises(ValueError, match="truncated DQT"):
            C.parse_jpeg_segments(bad_dqt)
        # DHT whose counts claim more values than the body holds
        counts = bytes([0, 0, 0, 200] + [0] * 12)
        bad_dht = (b"\xFF\xD8"
                   + struct.pack(">HH", 0xFFC4, 2 + 17 + 3)
                   + b"\x00" + counts + bytes(3))
        with pytest.raises(ValueError, match="truncated DHT"):
            C.parse_jpeg_segments(bad_dht)
