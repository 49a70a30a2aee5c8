"""Audio fingerprinting (operators/audiofp.py): Wang-2003 constellation
hashes — offset/gain/noise/clip robustness on synthetic tone sequences,
cross-format WAV-vs-FLAC matching through the repo's own decoders, the
alignment-vote separation of true copies from collisions, reject rows,
and DuckDB parity for the vote."""

from __future__ import annotations

import io
import random
import wave

import numpy as np
import pytest

from apache_pinot_spark.operators import audiofp as AF

_RATE = 8000


def _tone_seq(seed, seconds=6.0, seg=0.25):
    rng = random.Random(seed)
    t = np.arange(int(_RATE * seg)) / _RATE
    parts = []
    for _ in range(int(seconds / seg)):
        f1, f2 = rng.uniform(200, 3500), rng.uniform(200, 3500)
        parts.append(0.4 * np.sin(2 * np.pi * f1 * t)
                     + 0.3 * np.sin(2 * np.pi * f2 * t))
    return np.concatenate(parts)


def _wav(x, gain=1.0):
    pcm = np.clip(x * gain * 32767, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(_RATE)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def _match(x1, x2, min_votes=20):
    f1 = dict(enumerate([AF.fingerprint_pcm(x1), AF.fingerprint_pcm(x2)]))
    hits = {}
    h2 = {}
    for h, t in f1[1]:
        h2.setdefault(h, []).append(t)
    for h, t in f1[0]:
        for t2 in h2.get(h, ()):
            hits[t2 - t] = hits.get(t2 - t, 0) + 1
    if not hits:
        return 0, None
    off, votes = max(hits.items(), key=lambda kv: (kv[1], -abs(kv[0])))
    return votes, off


def test_offset_and_gain_robust():
    x = _tone_seq(1)
    prefix = _tone_seq(99, seconds=2.0)
    shifted = np.concatenate([prefix, x * 0.3])
    votes, off = _match(x, shifted)
    assert votes >= 50
    expected_frames = len(prefix) // AF.HOP
    assert abs(off - expected_frames) <= 1


def test_noise_and_clip_robust():
    x = _tone_seq(2)
    rng = np.random.default_rng(5)
    noisy = x + 0.05 * rng.normal(size=len(x))
    votes, off = _match(x, noisy)
    assert votes >= 40 and off == 0
    clip = x[len(x) // 4 : 3 * len(x) // 4]
    votes, off = _match(x, clip)
    assert votes >= 30
    assert abs(off + (len(x) // 4) // AF.HOP) <= 1


def test_different_audio_does_not_match():
    votes, _ = _match(_tone_seq(3), _tone_seq(4))
    assert votes < 10


def test_spark_cross_format_near_dup(spark):
    from apache_pinot_spark.operators.flac import encode_flac

    x = _tone_seq(6)
    pcm16 = np.clip(x * 32767, -32768, 32767).astype(np.int64)
    rows = [
        (1, _wav(x)),                                   # original WAV
        (2, bytes(encode_flac(pcm16, _RATE))),          # same audio, FLAC
        (3, _wav(_tone_seq(7))),                        # different audio
        (4, b"not audio"),                              # reject
    ]
    df = spark.createDataFrame(rows, "media_id bigint, content binary")
    fps = AF.audio_fingerprints(df)
    assert fps.filter("media_id = 4 AND fp_hash IS NULL").count() == 1
    pairs = AF.audio_near_dup_pairs(fps, min_votes=30).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(1, 2)]
    assert abs(pairs[0].t_offset) <= 1


def test_vote_duckdb_parity(spark):
    import duckdb

    x = _tone_seq(8)
    rows = [(1, _wav(x)), (2, _wav(np.concatenate([_tone_seq(9, 1.0), x])))]
    df = spark.createDataFrame(rows, "media_id bigint, content binary")
    fps = AF.audio_fingerprints(df).filter("fp_hash IS NOT NULL")
    ours = AF.audio_near_dup_pairs(fps, min_votes=10).collect()
    con = duckdb.connect()
    con.register("fps", fps.toPandas())
    got = con.sql("""
      WITH votes AS (
        SELECT a.media_id AS id_a, b.media_id AS id_b,
               b.t - a.t AS t_offset, COUNT(*) AS votes
        FROM fps a JOIN fps b USING (fp_hash)
        WHERE a.media_id < b.media_id
        GROUP BY 1, 2, 3
      ), best AS (
        SELECT *, row_number() OVER (PARTITION BY id_a, id_b
                   ORDER BY votes DESC, t_offset) AS rn
        FROM votes)
      SELECT id_a, id_b, t_offset, votes FROM best
      WHERE rn = 1 AND votes >= 10 ORDER BY id_a, id_b
    """).fetchall()
    assert sorted((r.id_a, r.id_b, r.t_offset, r.votes) for r in ours) \
        == [tuple(r) for r in got]
