"""WAV codec + real audio feature DSP."""

import numpy as np

from gdal_ray.io.audio import decode_wav, encode_wav


def test_wav_roundtrip_exact():
    rng = np.random.default_rng(5)
    for ch in (1, 2):
        pcm = rng.integers(-32768, 32767, (5000, ch)).astype(np.int16)
        buf = encode_wav(pcm, 22050)
        got, sr = decode_wav(buf)
        assert sr == 22050 and got.shape == (5000, ch)
        assert (got == pcm).all()
    # mono 1-D input round-trips as (n, 1)
    mono = rng.integers(-1000, 1000, 300).astype(np.int16)
    got, sr = decode_wav(encode_wav(mono, 8000))
    assert (got[:, 0] == mono).all()


def test_wav_extra_chunk_skipped():
    import struct

    pcm = np.arange(100, dtype=np.int16)
    buf = encode_wav(pcm, 16000)
    # inject an unknown LIST chunk between fmt and data
    fmt_end = buf.index(b"data")
    extra = b"LIST" + struct.pack("<I", 6) + b"abcdef"
    buf2 = buf[:fmt_end] + extra + buf[fmt_end:]
    got, sr = decode_wav(buf2)
    assert (got[:, 0] == pcm).all()


def test_audio_features_real_wav_tone(ray_session):
    """Real decode path: a pure tone's spectral centroid tracks its
    frequency and the hot band is the tone's band."""
    import ray.data as rd

    from gdal_ray.stages.multimodal import AudioFeatures, make_wav_audio_table

    t = make_wav_audio_table(24, sr=16000)
    feats = (
        rd.from_arrow(t)
        .map_batches(AudioFeatures, batch_format="pyarrow", batch_size=8,
                     concurrency=1, num_cpus=1)
        .to_pandas()
    )
    assert len(feats) == 24
    nyq = 8000.0
    for _, row in feats.iterrows():
        frac = row["tone_hz"] / nyq
        # spectral centroid close to the tone (noise floor pulls it slightly)
        assert abs(row["spectral_centroid"] - frac) < 0.08, (
            row["tone_hz"], row["spectral_centroid"])
        # the band containing the tone is the argmax band
        band = min(15, int(frac * 16))
        bands = np.asarray(row["features"])
        assert int(np.argmax(bands)) in (band - 1, band, band + 1)
        assert 0.2 < row["rms"] < 0.5  # 0.5-amplitude sine -> rms ~0.354
