"""Real-decode multimodal path: pure-python/numpy decoders for the
self-contained formats (PPM/BMP images, PCM WAV audio, PVID frame
containers) verified against analytic ground truth, plus the honest
unsupported-codec path through the Spark pipeline."""

import io
import struct
import wave

import numpy as np
import pytest

from blueprint_oss_spark.ops.multimodal import (
    FEATURE_DIM, audio_features, decode_bmp, decode_media, decode_png,
    decode_ppm, decode_wav, encode_png, image_features, resize_image,
    split_video_frames, synthesize_media_table, extract_media_features,
    UnsupportedMediaError)


def _ppm_bytes(img: np.ndarray) -> bytes:
  h, w = img.shape[:2]
  return f'P6\n{w} {h}\n255\n'.encode() + img.astype(np.uint8).tobytes()


def test_ppm_roundtrip_and_comments():
  rng = np.random.default_rng(3)
  img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
  assert np.array_equal(decode_ppm(_ppm_bytes(img)), img)
  # comments + arbitrary whitespace in the header
  blob = b'P6 # a comment\n# another\n 7\t5 # wh\n255\n' + img.tobytes()
  assert np.array_equal(decode_ppm(blob), img)


def test_bmp_roundtrip():
  rng = np.random.default_rng(4)
  img = rng.integers(0, 256, size=(4, 5, 3), dtype=np.uint8)
  h, w = img.shape[:2]
  row_bytes = (w * 3 + 3) & ~3
  body = b''
  for r in range(h - 1, -1, -1):  # bottom-up
    row = img[r][:, ::-1].tobytes()  # RGB → BGR
    body += row + b'\x00' * (row_bytes - len(row))
  header = (b'BM' + struct.pack('<IHHI', 54 + len(body), 0, 0, 54)
            + struct.pack('<IiiHHIIiiII', 40, w, h, 1, 24, 0,
                          len(body), 0, 0, 0, 0))
  assert np.array_equal(decode_bmp(header + body), img)


def test_constant_image_features_analytic():
  img = np.full((10, 20, 3), 200, dtype=np.uint8)
  f = image_features(img)
  assert len(f) == FEATURE_DIM
  assert f[0] == 20 / 1024.0 and f[1] == 10 / 1024.0
  assert f[2] == f[3] == f[4] == pytest.approx(200 / 255.0)
  for v in f[5:8]:  # constant → (numerically) zero std
    assert v == pytest.approx(0.0, abs=1e-12)
  hist = f[8:]
  assert sum(hist) == pytest.approx(1.0)
  assert hist[int(200 / 255.0 * 8)] == pytest.approx(1.0)  # one hot bin


def test_sine_wav_rms_analytic():
  rate, amp, freq = 8000, 0.25, 200.0
  t = np.arange(rate) / rate  # exactly 1 s, whole number of periods
  x = (np.sin(2 * np.pi * freq * t) * amp * 32767).astype(np.int16)
  buf = io.BytesIO()
  with wave.open(buf, 'wb') as wf:
    wf.setnchannels(1)
    wf.setsampwidth(2)
    wf.setframerate(rate)
    wf.writeframes(x.tobytes())
  samples, r = decode_wav(buf.getvalue())
  assert r == rate and len(samples) == rate
  f = audio_features(samples, r)
  assert f[0] == pytest.approx(1 / 60.0)
  assert f[1] == pytest.approx(rate / 48000.0)
  assert f[2] == pytest.approx(amp / np.sqrt(2), rel=1e-3)  # RMS
  # 200 Hz sine crosses zero 400 times/sec → ZCR ≈ 400/8000
  assert f[3] == pytest.approx(400 / rate, rel=0.02)


def test_resize_nearest():
  img = np.arange(16, dtype=np.uint8).reshape(4, 4)[..., None] \
      .repeat(3, axis=2)
  small = resize_image(img, 2, 2)
  assert small.shape == (2, 2, 3)
  assert small[0, 0, 0] == img[0, 0, 0] and small[1, 1, 0] == img[2, 2, 0]


def test_video_frame_sampling_means_frame_features():
  from blueprint_oss_spark.ops.multimodal import (
      _make_pvid, video_features)
  blob, w, h, dur = _make_pvid(5)
  frames = split_video_frames(blob)
  assert len(frames) == 2 + 5 % 4
  per_frame = np.array([image_features(decode_ppm(f)) for f in frames])
  idx = np.unique(np.linspace(0, len(frames) - 1, 4).astype(int))
  expect = per_frame[idx].mean(axis=0)
  assert video_features(blob) == pytest.approx(expect.tolist())


def test_unsupported_codecs_raise():
  with pytest.raises(UnsupportedMediaError):
    decode_media('image', b'\xff\xd8\xff\xe0\x00\x10JFIFxxxx')  # JPEG
  with pytest.raises(UnsupportedMediaError):
    decode_media('audio', b'ID3\x04xxxx')
  with pytest.raises(UnsupportedMediaError):
    decode_media('video', b'\x00\x00\x00\x18ftypmp42xxxx')
  # a PNG signature with garbage after it is a MALFORMED png (decode
  # error row), not an unsupported codec
  with pytest.raises(ValueError):
    decode_media('image', b'\x89PNG\r\n\x1a\nxxxx')


def test_png_roundtrip_all_filters_and_channels():
  rng = np.random.default_rng(11)
  rgb = rng.integers(0, 256, size=(13, 9, 3), dtype=np.uint8)
  for filt in (0, 1, 2, 3, 4, 'mixed'):
    assert np.array_equal(decode_png(encode_png(rgb, filters=filt)),
                          rgb), f'filter {filt}'
  # grayscale replicates to RGB; alpha channels are dropped
  gray = rng.integers(0, 256, size=(6, 5, 1), dtype=np.uint8)
  assert np.array_equal(decode_png(encode_png(gray, filters='mixed')),
                        np.repeat(gray, 3, axis=2))
  ga = rng.integers(0, 256, size=(6, 5, 2), dtype=np.uint8)
  assert np.array_equal(decode_png(encode_png(ga, filters=4)),
                        np.repeat(ga[:, :, :1], 3, axis=2))
  rgba = rng.integers(0, 256, size=(4, 7, 4), dtype=np.uint8)
  assert np.array_equal(decode_png(encode_png(rgba, filters=3)),
                        rgba[:, :, :3])


def test_png_malformed_and_unsupported_variants():
  rng = np.random.default_rng(12)
  img = rng.integers(0, 256, size=(5, 5, 3), dtype=np.uint8)
  good = encode_png(img)
  # flip one IDAT byte: CRC check must catch it
  bad = bytearray(good)
  bad[len(bad) - 20] ^= 0xFF
  with pytest.raises(ValueError):
    decode_png(bytes(bad))
  with pytest.raises(ValueError):
    decode_png(good[:30])  # truncated
  # 16-bit depth and Adam7 interlace are honestly unsupported
  import struct as _s
  import zlib as _z

  def patched_ihdr(depth, interlace):
    ihdr = _s.pack('>IIBBBBB', 5, 5, depth, 2, 0, 0, interlace)
    out = good[:8] + _s.pack('>I', 13) + b'IHDR' + ihdr \
        + _s.pack('>I', _z.crc32(b'IHDR' + ihdr)) + good[8 + 25:]
    return out

  with pytest.raises(UnsupportedMediaError):
    decode_png(patched_ihdr(16, 0))
  with pytest.raises(UnsupportedMediaError):
    decode_png(patched_ihdr(8, 1))


def test_png_features_match_ppm_features():
  """The PNG branch of decode_media yields byte-identical pixels, hence
  identical features, to the same image shipped as PPM."""
  rng = np.random.default_rng(13)
  img = rng.integers(0, 256, size=(12, 16, 3), dtype=np.uint8)
  assert decode_media('image', _ppm_bytes(img)) == \
      decode_media('image', encode_png(img, filters='mixed'))


def test_spark_pipeline_end_to_end(spark):
  media = synthesize_media_table(spark, n=32)
  out = extract_media_features(media).collect()
  assert len(out) == 32
  for r in out:
    i = int(r['media_ref'].split('/')[-1])
    assert len(r['feature']) == FEATURE_DIM
    if i % 8 == 7:
      assert r['decode_status'].startswith('unsupported:'), r
      assert r['feature'] == [0.0] * FEATURE_DIM
    else:
      assert r['decode_status'] == 'ok', r
      assert any(v != 0.0 for v in r['feature'])


def test_media_phash_near_dup_pairs(spark):
  """Planted perceptual near-dups: a copy of an image with a tiny
  brightness nudge keeps a small aHash hamming distance and is found
  by the banded join; unrelated random images are not paired; an exact
  byte copy pairs at hamming 0."""
  import numpy as np

  from blueprint_oss_spark.ops.multimodal import (
      MEDIA_SCHEMA, extract_media_phash, media_near_dup_pairs,
  )

  def ppm(img):
    h, w = img.shape[:2]
    return f'P6\n{w} {h}\n255\n'.encode() + img.astype('uint8').tobytes()

  rng = np.random.default_rng(5)
  base = rng.integers(0, 200, size=(32, 32, 3), dtype=np.uint8)
  near = base.copy()
  near[:2, :2] = np.clip(near[:2, :2].astype(int) + 40, 0, 255)
  other = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
  rows = [
      ('m/base', 'image', bytearray(ppm(base)), 32, 32, 0),
      ('m/copy', 'image', bytearray(ppm(base)), 32, 32, 0),
      ('m/near', 'image', bytearray(ppm(near)), 32, 32, 0),
      ('m/other', 'image', bytearray(ppm(other)), 32, 32, 0),
  ]
  media = spark.createDataFrame(rows, MEDIA_SCHEMA)
  ph = extract_media_phash(media)
  pairs = {(r['ref_a'], r['ref_b']): r['hamming']
           for r in media_near_dup_pairs(ph, max_hamming=6).collect()}
  assert pairs[('m/base', 'm/copy')] == 0
  assert ('m/base', 'm/near') in pairs and pairs[('m/base', 'm/near')] <= 6
  assert all('m/other' not in pair for pair in pairs), pairs


def test_media_near_dup_full_recall_vs_bruteforce(spark):
  """Recall 1 as a set equality, not constructed positives: for the
  whole synthetic media table, the banded join's pair set must equal
  the brute-force O(n²) hamming computation at several thresholds —
  including max_hamming > 3, which the old fixed-4-band split silently
  under-recalled (a 4-6 bit difference spread 2+2+1+1 over four bands
  collides nowhere)."""
  from blueprint_oss_spark.ops.multimodal import (
      extract_media_phash, media_near_dup_pairs, synthesize_media_table,
  )

  media = synthesize_media_table(spark, n=64)
  ph = extract_media_phash(media).cache()
  hashes = {r['media_ref']: r['ahash'] for r in ph.collect()
            if r['decode_status'] == 'ok'}
  assert len(hashes) >= 16
  refs = sorted(hashes)
  for max_h in (3, 6, 11):
    truth = {(a, b)
             for i, a in enumerate(refs) for b in refs[i + 1:]
             if bin((hashes[a] ^ hashes[b])
                    & 0xFFFFFFFFFFFFFFFF).count('1') <= max_h}
    got = {(r['ref_a'], r['ref_b'])
           for r in media_near_dup_pairs(ph, max_hamming=max_h)
           .collect()}
    assert got == truth, (max_h, truth - got, got - truth)


def test_media_near_dup_rejects_degenerate_threshold():
  """max_hamming >= 64 would make every band mask zero-width (all rows
  collide in those bands — a full cross join); the operator must refuse
  rather than silently degenerate."""
  import pytest

  from blueprint_oss_spark.ops.multimodal import media_near_dup_pairs

  for bad in (64, 100, -1):
    with pytest.raises(ValueError):
      media_near_dup_pairs(None, max_hamming=bad)
