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
