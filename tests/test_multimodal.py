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


def test_decode_real_path_is_honest(docs):
    media = multimodal.encode_as_media(docs)
    with pytest.raises(NotImplementedError):
        multimodal.decode_image_batch(media, fake=False)


def test_resize_targets_model_shape(docs):
    media = multimodal.encode_as_media(docs)
    out = multimodal.resize_batch(media, target_w=224, target_h=224).collect()
    assert len(out) == 30
    assert all(r["width"] == 224 and r["resized_bytes"] == 224 * 224 * 3 for r in out)


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
