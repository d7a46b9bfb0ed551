"""Real PNG decode (ops/png.py): codec round-trips, decoder coverage of
all five scanline filters (the decoder must handle filters the encoder
never writes), malformed-input failure modes, and the payload_decode
pipeline vs its closed-form DuckDB oracle."""

import struct
import zlib

import numpy as np
import pytest

from noise_ray.ops.png import (_SIG, _chunk, decode_png, encode_png,
                               synth_image)

SF = "/root/testdata/sf0.001"


def _rand_img(rng, h, w, c):
    a = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    return a


def test_round_trip_all_channel_counts():
    rng = np.random.default_rng(7)
    for c in (1, 2, 3, 4):
        img = _rand_img(rng, 11, 13, c)
        out = decode_png(encode_png(img))
        assert out.shape == (11, 13, c)
        assert np.array_equal(out, img)


def _encode_with_filter(img: np.ndarray, ftype: int) -> bytes:
    """Hand-build a PNG whose every scanline uses ``ftype`` — exercises
    decoder paths our encoder (filter 0 only) never produces."""
    h, w, c = img.shape
    rows = img.reshape(h, w * c).astype(np.int16)
    stride = w * c
    out = bytearray()
    prev = np.zeros(stride, np.int16)
    for y in range(h):
        cur = rows[y]
        if ftype == 0:
            filt = cur
        elif ftype == 1:
            left = np.concatenate([np.zeros(c, np.int16), cur[:-c]])
            filt = (cur - left) % 256
        elif ftype == 2:
            filt = (cur - prev) % 256
        elif ftype == 3:
            left = np.concatenate([np.zeros(c, np.int16), cur[:-c]])
            filt = (cur - ((left + prev) // 2)) % 256
        else:  # Paeth
            filt = np.empty(stride, np.int16)
            for x in range(stride):
                a = int(cur[x - c]) if x >= c else 0
                b = int(prev[x])
                cc = int(prev[x - c]) if x >= c else 0
                p = a + b - cc
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb and pa_ <= pc) else (
                    b if pb <= pc else cc)
                filt[x] = (int(cur[x]) - pred) % 256
        out.append(ftype)
        out.extend(filt.astype(np.uint8).tobytes())
        prev = cur
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(out)))
            + _chunk(b"IEND", b""))


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_decoder_reconstructs_every_filter_type(ftype):
    rng = np.random.default_rng(ftype)
    img = _rand_img(rng, 9, 7, 3)
    assert np.array_equal(decode_png(_encode_with_filter(img, ftype)), img)


def test_malformed_inputs_raise():
    img = synth_image(5)
    buf = encode_png(img)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNK" + buf[4:])
    corrupt = bytearray(buf)
    corrupt[40] ^= 0xFF  # flip a byte inside IDAT payload
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupt))
    with pytest.raises(ValueError):
        decode_png(buf[:30])


def test_synth_image_matches_closed_form():
    img = synth_image(17)
    h, w, _ = img.shape
    assert (w, h) == (8 + 17 % 9, 8 + (17 * 7) % 9)
    assert img[3, 2, 1] == (17 * 31 + 3 * 17 + 2 * 5 + 11) % 256


def test_payload_decode_matches_oracle(ray_session):
    import duckdb

    import __ray_entry__ as e
    from noise_ray.ops.multimodal import payload_decode

    got = payload_decode(SF).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute(e.oracle_sql()["payload_decode"]).fetchdf()
    want = want.sort_values("doc_id").reset_index(drop=True)
    got = got[want.columns.tolist()].astype(want.dtypes.to_dict())
    assert len(got) > 0
    assert got.equals(want)


# ---------------------------------------------------------------- WAV


def test_wav_round_trip_and_chunk_skipping():
    import struct

    from noise_ray.ops.wav import decode_wav, encode_wav

    rng = np.random.default_rng(5)
    for ch in (1, 2):
        s = rng.integers(-32768, 32768, size=(501, ch)).astype(np.int16)
        out, rate = decode_wav(encode_wav(s, 16000))
        assert rate == 16000 and np.array_equal(out, s)
    # a LIST chunk between fmt and data must be skipped (RIFF contract)
    s = rng.integers(-32768, 32768, size=33).astype(np.int16)
    buf = encode_wav(s, 8000)
    fmt_at = buf.index(b"fmt ")
    fmt_end = fmt_at + 8 + 16
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd+pad
    patched = buf[:fmt_end] + extra + buf[fmt_end:]
    patched = patched[:4] + struct.pack(
        "<I", len(patched) - 8) + patched[8:]
    out, rate = decode_wav(patched)
    assert rate == 8000 and np.array_equal(out[:, 0], s)


def test_wav_malformed_inputs_raise():
    import struct

    from noise_ray.ops.wav import decode_wav, encode_wav, synth_audio

    s, rate = synth_audio(9)
    buf = encode_wav(s, rate)
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"JUNK" + buf[4:])
    with pytest.raises(ValueError):
        decode_wav(buf[:40])
    # non-PCM format code
    fmt_at = buf.index(b"fmt ") + 8
    bad = buf[:fmt_at] + struct.pack("<H", 3) + buf[fmt_at + 2:]
    with pytest.raises(ValueError, match="unsupported"):
        decode_wav(bad)


def test_audio_decode_matches_oracle(ray_session):
    import duckdb

    import __ray_entry__ as e
    from noise_ray.ops.multimodal import audio_decode

    got = audio_decode(SF).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute(e.oracle_sql()["audio_decode"]).fetchdf()
    want = want.sort_values("doc_id").reset_index(drop=True)
    got = got[want.columns.tolist()].astype(want.dtypes.to_dict())
    assert len(got) > 0
    assert got.equals(want)


# ------------------------------------------------------------- video


def test_video_frames_matches_oracle(ray_session):
    import duckdb

    import __ray_entry__ as e
    from noise_ray.ops.multimodal import video_frames

    got = video_frames(SF).to_pandas().sort_values(
        ["doc_id", "frame_idx"]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute(e.oracle_sql()["video_frames"]).fetchdf()
    want = want.sort_values(["doc_id", "frame_idx"]).reset_index(drop=True)
    got = got[want.columns.tolist()].astype(want.dtypes.to_dict())
    assert len(got) > len(set(got.doc_id))  # real fan-out: >1 frame/doc
    assert got.equals(want)


def test_frame_extractor_rejects_bad_container():
    import pytest as _pytest

    from noise_ray.ops.multimodal import FrameExtractor

    import pyarrow as _pa

    fx = FrameExtractor(stride=1)
    batch = _pa.table({"doc_id": _pa.array([1], _pa.int64()),
                       "payload": _pa.array([b"XXXX\x00\x00\x00\x00"],
                                            _pa.binary())})
    with _pytest.raises(ValueError, match="magic"):
        fx(batch)


def test_payload_decoder_empty_and_nonrgb_batches():
    """Ray Data can hand a stage 0-row batches, and a general decode
    stage must survive gray / gray+alpha / RGBA payloads (channel sums
    normalize to RGB semantics: luma replicated for c<3, alpha dropped
    for c=4) — mixed counts in one batch stay rectangular."""
    import numpy as np
    import pyarrow as pa

    from noise_ray.ops.multimodal import PayloadDecoder
    from noise_ray.ops.png import encode_png

    dec = PayloadDecoder(decode=True)

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "payload": pa.array([], pa.binary()),
                      "mime": pa.array([], pa.string())})
    out = dec(empty)
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "width", "height", "channels",
                                "sum_r", "sum_g", "sum_b"]

    rng = np.random.default_rng(7)
    imgs = [rng.integers(0, 256, (5, 4, c), dtype=np.uint8).reshape(5, 4, c)
            for c in (1, 2, 3, 4)]
    batch = pa.table({
        "doc_id": pa.array(list(range(4)), pa.int64()),
        "payload": pa.array([encode_png(i) for i in imgs], pa.binary()),
        "mime": pa.array(["image/png"] * 4),
    })
    out = dec(batch).to_pylist()
    for row, img in zip(out, imgs):
        c = img.shape[2]
        assert row["channels"] == c
        flat = img.reshape(-1, c).sum(axis=0, dtype=np.int64)
        if c < 3:
            assert (row["sum_r"] == row["sum_g"] == row["sum_b"]
                    == int(flat[0]))
        else:
            assert [row["sum_r"], row["sum_g"], row["sum_b"]] == \
                [int(flat[0]), int(flat[1]), int(flat[2])]


# ------------------------- adversarial property suites (round 5)


def test_png_truncation_at_every_offset_raises_never_hangs():
    """Every strict prefix must raise ValueError — including the
    zlib-stream region (domain error, not zlib.error) and the
    IEND-less tail (a truncated file must not silently decode)."""
    buf = encode_png(synth_image(3))
    for cut in range(len(buf)):
        with pytest.raises(ValueError):
            decode_png(buf[:cut])


def test_wav_truncation_at_every_offset_raises():
    from noise_ray.ops.wav import decode_wav, encode_wav, synth_audio

    s, rate = synth_audio(9)
    buf = encode_wav(s, rate)
    for cut in range(len(buf)):
        with pytest.raises(ValueError):
            decode_wav(buf[:cut])


def test_property_png_round_trip_random_dims_channels():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(h=st.integers(1, 24), w=st.integers(1, 24),
           c=st.sampled_from([1, 2, 3, 4]), seed=st.integers(0, 2**31))
    def inner(h, w, c, seed):
        img = _rand_img(np.random.default_rng(seed), h, w, c)
        out = decode_png(encode_png(img))
        assert out.shape == (h, w, c)
        assert np.array_equal(out, img)

    inner()


def test_property_wav_round_trip_random_lengths():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from noise_ray.ops.wav import decode_wav, encode_wav

    @settings(max_examples=30, deadline=None)
    @given(n=st.integers(1, 700), ch=st.sampled_from([1, 2]),
           rate=st.sampled_from([8000, 16000, 44100]),
           seed=st.integers(0, 2**31))
    def inner(n, ch, rate, seed):
        rng = np.random.default_rng(seed)
        s = rng.integers(-32768, 32768, size=(n, ch)).astype(np.int16)
        out, got_rate = decode_wav(encode_wav(s, rate))
        assert got_rate == rate
        assert np.array_equal(out, s)

    inner()
