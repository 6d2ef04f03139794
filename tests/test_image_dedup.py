"""Perceptual image hashing + hamming near-dup join: dHash invariances,
pigeonhole recall guarantee, brute-force oracle, end-to-end image
near-dedup over PNG payloads."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import Row

from bigdataproject_formula1_telemetry_spark.operators import dedup as D
from bigdataproject_formula1_telemetry_spark.sources import multimodal as M


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def test_dhash_invariances():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 255, (40, 60, 3), dtype=np.uint8)
    h = M.dhash64(img)
    # small additive noise: identical or near-identical hash
    noisy = np.clip(
        img.astype(int) + rng.integers(-4, 5, img.shape), 0, 255
    ).astype(np.uint8)
    assert _ham(h, M.dhash64(noisy)) <= 4
    # nearest 2x upscale: near-identical hash
    up = img.repeat(2, axis=0).repeat(2, axis=1)
    assert _ham(h, M.dhash64(up)) <= 4
    # unrelated image: far
    other = rng.integers(0, 255, (40, 60, 3), dtype=np.uint8)
    assert _ham(h, M.dhash64(other)) > 10
    # grayscale and tiny inputs do not crash and are deterministic
    assert M.dhash64(img[:, :, 0]) == M.dhash64(img[:, :, 0])
    assert isinstance(M.dhash64(img[:3, :4]), int)


def test_hamming_pairs_match_bruteforce_oracle(spark):
    rng = np.random.default_rng(7)
    base = rng.integers(-(2**63), 2**63, 60, dtype=np.int64)
    hashes = list(base)
    # planted close pairs at distances 0..4 off existing entries
    for d in range(5):
        v = int(base[d])
        for bit in rng.choice(64, size=d, replace=False):
            v ^= 1 << int(bit)
        hashes.append(np.int64(v))
    df = spark.createDataFrame(
        [Row(doc_id=i, simhash=int(h)) for i, h in enumerate(hashes)],
        schema="doc_id long, simhash long",
    )
    for max_h in (0, 2, 4):
        got = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in D.hamming_near_dup_pairs(df, max_hamming=max_h).collect()
        }
        exp = set()
        for i in range(len(hashes)):
            for j in range(i + 1, len(hashes)):
                hd = _ham(int(hashes[i]), int(hashes[j]))
                if hd <= max_h:
                    exp.add((i, j, hd))
        assert got == exp, f"max_hamming={max_h}"


def test_hamming_recall_guaranteed_at_threshold(spark):
    # a pair at EXACTLY max_hamming must be found (pigeonhole, not luck)
    a = 0
    for max_h in (1, 3, 5):
        b = 0
        for bit in range(max_h):
            b ^= 1 << (bit * 11)  # spread flips across bands
        df = spark.createDataFrame(
            [Row(doc_id=0, simhash=a), Row(doc_id=1, simhash=b)],
            schema="doc_id long, simhash long",
        )
        out = D.hamming_near_dup_pairs(df, max_hamming=max_h).collect()
        assert len(out) == 1 and out[0]["hamming"] == max_h


def test_near_dup_images_end_to_end(spark):
    rng = np.random.default_rng(3)
    img_a = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
    img_a2 = np.clip(
        img_a.astype(int) + rng.integers(-3, 4, img_a.shape), 0, 255
    ).astype(np.uint8)  # near-dup of a
    img_b = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
    rows = [
        (1, "image", "png", bytearray(M.encode_png(img_a)), 32, 24, 3, None, None),
        (2, "image", "png", bytearray(M.encode_png(img_a2)), 32, 24, 3, None, None),
        (3, "image", "png", bytearray(M.encode_png(img_b)), 32, 24, 3, None, None),
        # non-image rows must be ignored
        (4, "audio", "pcm16", bytearray(b"\x00\x00"), None, None, None, 8000, None),
    ]
    df = spark.createDataFrame(rows, schema=M.MEDIA_SCHEMA)
    pairs = {(r["id_a"], r["id_b"]) for r in M.near_dup_images(df, max_hamming=4).collect()}
    assert pairs == {(1, 2)}
    # fingerprints are deterministic across runs
    h1 = {r["media_id"]: r["dhash"] for r in M.image_dhash(df).collect()}
    h2 = {r["media_id"]: r["dhash"] for r in M.image_dhash(df).collect()}
    assert h1 == h2 and set(h1) == {1, 2, 3}


def test_near_dedup_simhash_text(spark):
    from tests.conftest import SF_SMOKE
    from bigdataproject_formula1_telemetry_spark import io

    docs = io.read_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    first = docs.orderBy("doc_id").limit(2).collect()
    planted = spark.createDataFrame(
        [
            Row(doc_id=900_000, text=first[0]["text"]),                 # exact copy
            Row(doc_id=900_001, text=first[1]["text"] + " tail token"),  # near copy
            Row(doc_id=900_002, text="wholly unrelated new content that matches nothing"),
        ]
    )
    corpus = docs.unionByName(planted)
    kept = {r["doc_id"] for r in D.near_dedup_simhash(corpus, max_hamming=3).collect()}
    from bigdataproject_formula1_telemetry_spark.operators.dedup import release_barriers
    release_barriers()
    assert 900_000 not in kept            # exact copy dropped
    assert 900_001 not in kept            # near copy dropped
    assert 900_002 in kept                # fresh doc survives
    assert first[0]["doc_id"] in kept     # keep-lowest-id: originals stay
    assert first[1]["doc_id"] in kept


def test_scene_changes(spark):
    rng = np.random.default_rng(9)
    # two scenes: 10 frames of image A (+tiny noise), then 10 of image B
    A = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    B = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    frames = []
    for _ in range(10):
        frames.append(np.clip(A.astype(int) + rng.integers(-2, 3, A.shape), 0, 255).astype(np.uint8))
    for _ in range(10):
        frames.append(np.clip(B.astype(int) + rng.integers(-2, 3, B.shape), 0, 255).astype(np.uint8))
    payload = np.stack(frames).tobytes()
    df = spark.createDataFrame(
        [(7, "video", "raw", bytearray(payload), 16, 16, 3, None, 20)],
        schema=M.MEDIA_SCHEMA,
    )
    out = {r["frame_idx"]: r for r in M.scene_changes(df, threshold=16).collect()}
    assert len(out) == 20
    assert out[0]["is_scene_change"] and out[0]["hamming_prev"] is None
    changes = [i for i in range(1, 20) if out[i]["is_scene_change"]]
    assert changes == [10]  # exactly the A→B cut
    assert out[10]["hamming_prev"] >= 16


def test_audio_fingerprint_invariances_and_near_dup(spark):
    t = np.arange(16000) / 8000.0
    melody = np.sin(2 * np.pi * 440 * t) * np.sin(2 * np.pi * 0.7 * t)
    other = np.sin(2 * np.pi * 523 * t) * np.cos(2 * np.pi * 1.3 * t + 0.4)
    fp = M.audio_fingerprint64
    # gain invariance: comparisons are scale-free
    assert fp(melody) == fp(melody * 0.25)
    # small noise: close; different content: far
    noisy = melody + np.random.default_rng(4).normal(0, 0.01, len(melody))
    ham = lambda a, b: bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert ham(fp(melody), fp(noisy)) <= 4
    assert ham(fp(melody), fp(other)) > 10
    assert fp(np.array([])) == 0

    def pcm(w):
        return bytearray((np.clip(w, -1, 1) * 32767).astype("<i2").tobytes())

    df = spark.createDataFrame(
        [
            (1, "audio", "pcm16", pcm(melody), None, None, None, 8000, None),
            (2, "audio", "pcm16", pcm(melody * 0.5), None, None, None, 8000, None),
            (3, "audio", "pcm16", pcm(other), None, None, None, 8000, None),
        ],
        schema=M.MEDIA_SCHEMA,
    )
    pairs = {(r["id_a"], r["id_b"]) for r in M.near_dup_audio(df, max_hamming=4).collect()}
    assert pairs == {(1, 2)}


def test_sample_scene_frames(spark):
    rng = np.random.default_rng(31)
    A = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    B = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    C = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    frames = [A] * 5 + [B] * 7 + [C] * 3
    payload = np.stack(frames).tobytes()
    df = spark.createDataFrame(
        [(9, "video", "raw", bytearray(payload), 16, 16, 3, None, 15)],
        schema=M.MEDIA_SCHEMA,
    )
    out = M.sample_scene_frames(df, threshold=16).collect()
    # exactly one frame per scene, at the scene-opening indices
    assert sorted(r["frame_idx"] for r in out) == [0, 5, 12]
    # the emitted payloads are the opening frames themselves
    got0 = np.frombuffer(out[0]["payload"], dtype=np.uint8).reshape(16, 16, 3)
    assert (got0 == A).all() or (got0 == B).all() or (got0 == C).all()


def test_dedup_images_and_audio_survivors(spark):
    from bigdataproject_formula1_telemetry_spark.operators.dedup import (
        release_barriers,
    )

    rng = np.random.default_rng(13)
    A = rng.integers(0, 255, (20, 20, 3), dtype=np.uint8)
    A2 = np.clip(A.astype(int) + rng.integers(-2, 3, A.shape), 0, 255).astype(np.uint8)
    A3 = np.clip(A2.astype(int) + rng.integers(-2, 3, A.shape), 0, 255).astype(np.uint8)
    B = rng.integers(0, 255, (20, 20, 3), dtype=np.uint8)
    t = np.arange(8000) / 8000.0
    mel = np.sin(2 * np.pi * 330 * t) * np.sin(2 * np.pi * 0.5 * t)

    def pcm(w):
        return bytearray((np.clip(w, -1, 1) * 32767).astype("<i2").tobytes())

    rows = [
        (1, "image", "png", bytearray(M.encode_png(A)), 20, 20, 3, None, None),
        (2, "image", "png", bytearray(M.encode_png(A2)), 20, 20, 3, None, None),
        (3, "image", "png", bytearray(M.encode_png(A3)), 20, 20, 3, None, None),
        (4, "image", "png", bytearray(M.encode_png(B)), 20, 20, 3, None, None),
        (10, "audio", "pcm16", pcm(mel), None, None, None, 8000, None),
        (11, "audio", "pcm16", pcm(mel * 0.7), None, None, None, 8000, None),
    ]
    df = spark.createDataFrame(rows, schema=M.MEDIA_SCHEMA)
    # transitive chain 1~2~3 collapses to min id 1; B and audio keep
    kept_img = {r["media_id"] for r in M.dedup_images(df, max_hamming=6).collect()}
    release_barriers()
    assert kept_img == {1, 4, 10, 11}
    kept_aud = {r["media_id"] for r in M.dedup_audio(df, max_hamming=4).collect()}
    release_barriers()
    assert kept_aud == {1, 2, 3, 4, 10}


def test_short_audio_clips_are_flagged_not_pad_matched(spark):
    """Two unrelated clips shorter than the 65-window budget share all
    their trailing pad bits; padding must not count as similarity —
    short clips are excluded from the near-dup join and flagged via
    n_valid_bits."""
    rng = np.random.default_rng(11)
    w1 = rng.normal(0, 1, 40)
    w2 = rng.normal(0, 1, 40)
    fp1, nv1 = M.audio_fingerprint_with_validity(w1)
    _, nv2 = M.audio_fingerprint_with_validity(w2)
    assert nv1 < 64 and nv2 < 64
    assert M.audio_fingerprint64(w1) == fp1  # scalar form unchanged

    def pcm(w):
        return bytearray((np.clip(w, -1, 1) * 32767).astype("<i2").tobytes())

    df = spark.createDataFrame(
        [
            (1, "audio", "pcm16", pcm(w1), None, None, None, 8000, None),
            (2, "audio", "pcm16", pcm(w2), None, None, None, 8000, None),
        ],
        schema=M.MEDIA_SCHEMA,
    )
    fps = {r["media_id"]: r for r in M.audio_fingerprints(df).collect()}
    assert fps[1]["n_valid_bits"] < 64 and fps[2]["n_valid_bits"] < 64
    assert M.near_dup_audio(df, max_hamming=4).collect() == []
