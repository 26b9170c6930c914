"""Unit tests for the training-data operators (dedup / similarity / text
analysis / multimodal) on small synthetic corpora with Python brute-force
oracles."""

import itertools

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from the_yelp_collaborative_knowledge_graph_ray.functions.joins import (
    attach_column,
)
from the_yelp_collaborative_knowledge_graph_ray.stages import (
    dedup,
    multimodal,
    similarity,
    textstats,
)


def _docs_ds():
    """12 docs: 2 exact-dup groups, 2 near-dup pairs, rest distinct."""
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon")
    texts = {
        0: base,
        1: base,                             # exact dup of 0
        2: base.replace("gamma", "GAMMA2"),  # near dup of 0
        3: "totally different words entirely here now forever and ever more",
        4: "totally different words entirely here now forever and ever more",
        5: "one two three four five six seven eight nine ten eleven twelve",
        6: "one two three four five six seven eight nine ten eleven xxx",
        7: "unrelated content about completely other topics with no overlap",
        8: "the weather today is sunny with a light breeze from the north",
        9: "stock prices rose sharply after the earnings announcement today",
        10: "recipe calls for flour sugar butter eggs vanilla and patience",
        11: "distant galaxies emit radio waves detected by large arrays",
    }
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(texts), pa.int64()),
        "text": pa.array(list(texts.values()), pa.string())}))


def _brute_jaccard(texts: dict[int, str], threshold: float):
    out = set()
    for a, b in itertools.combinations(sorted(texts), 2):
        sa, sb = dedup._shingles(texts[a]), dedup._shingles(texts[b])
        if len(sa & sb) / len(sa | sb) >= threshold:
            out.add((a, b))
    return out


def test_exact_dedup(ray_session):
    df = dedup.exact_dedup(_docs_ds()).to_pandas()
    assert df["n_dups"].sum() == 12
    dups = df[df["n_dups"] > 1]
    assert len(dups) == 2
    assert sorted(dups["keep_doc_id"]) == [0, 3]


def test_ngram_jaccard_matches_brute_force(ray_session):
    ds = _docs_ds()
    texts = dict(zip(ds.to_pandas()["doc_id"], ds.to_pandas()["text"]))
    got = dedup.ngram_jaccard_pairs(ds, threshold=0.5).to_pandas()
    want = _brute_jaccard(texts, 0.5)
    assert set(zip(got["doc_a"], got["doc_b"])) == want
    assert (got["jaccard"] >= 0.5).all()


def test_minhash_lsh_matches_brute_force(ray_session):
    ds = _docs_ds()
    texts = dict(zip(ds.to_pandas()["doc_id"], ds.to_pandas()["text"]))
    got = dedup.minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
    assert set(zip(got["doc_a"], got["doc_b"])) == _brute_jaccard(texts, 0.5)


def test_minhash_cogroup_verify_beyond_broadcast(ray_session, monkeypatch):
    """The sort-join verify path (taken when candidate texts exceed the
    broadcast cutoff) on a corpus whose candidate volume exceeds the old
    per-pair-Python comfort zone: 400 docs in 100 planted near-dup clusters
    of 4 (≈600 surviving pairs, plus band-collision candidates). Both the
    forced co-group path and the broadcast path must be bit-identical to
    the exact inverted-index engine."""
    rng = np.random.RandomState(7)
    words = [f"w{i}" for i in range(500)]
    texts, ids = [], []
    for c in range(100):
        base = [words[j] for j in rng.choice(len(words), 30, replace=False)]
        for v in range(4):
            t = list(base)
            if v:  # mutate one word -> J ≈ 27/33 ≈ 0.82 vs base
                t[rng.randint(30)] = f"mut{c}_{v}"
            ids.append(c * 4 + v)
            texts.append(" ".join(t))
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string())}))
    exact = dedup.ngram_jaccard_pairs(ds, threshold=0.5,
                                      max_posting=None).to_pandas()
    bcast = dedup.minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
    monkeypatch.setattr(dedup, "_BROADCAST_TEXT_BYTES", -1)
    cogroup = dedup.minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
    assert len(exact) >= 600
    assert bcast.equals(exact)
    assert cogroup.equals(exact)


def test_real_wav_and_ppm_decode():
    """The media_codecs decoders do REAL byte-level work: a WAV round-trip
    through the stdlib writer/reader recovers the exact samples, features
    match a direct numpy computation, corrupted payloads raise; the PPM
    path parses a real P6 header and the 2x box average is exact."""
    import io
    import wave as _wave

    import pytest

    from the_yelp_collaborative_knowledge_graph_ray.stages import (
        media_codecs as mc,
    )

    # WAV: handcrafted payload -> decoder recovers exact samples
    x = mc._saw_samples(7)
    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(mc.WAV_SR)
        w.writeframes(x.tobytes())
    out = mc.WavFeatureExtractor()(pa.table({
        "media_id": pa.array([7], pa.int64()),
        "payload": pa.array([buf.getvalue()], pa.large_binary())}))
    xi = x.astype(np.int64)
    assert out["n_samples"][0].as_py() == len(x)
    assert out["sum_abs"][0].as_py() == int(np.abs(xi).sum())
    assert out["sum_sq"][0].as_py() == int((xi * xi).sum())
    assert out["zero_crossings"][0].as_py() == int(
        np.count_nonzero((x[1:] < 0) != (x[:-1] < 0)))
    with pytest.raises(Exception):  # corrupted container must raise
        mc.WavFeatureExtractor()(pa.table({
            "media_id": pa.array([1], pa.int64()),
            "payload": pa.array([b"RIFFgarbage"], pa.large_binary())}))

    # PPM: real header parse + exact integer box average
    img = mc._ppm_pixels(3).astype(np.int64)
    payload = (f"P6\n{mc.PPM_W} {mc.PPM_H}\n255\n".encode()
               + mc._ppm_pixels(3).tobytes())
    o = mc.PpmResizeFeatures()(pa.table({
        "media_id": pa.array([3], pa.int64()),
        "payload": pa.array([payload], pa.large_binary())}))
    small = (img[0::2, 0::2] + img[1::2, 0::2]
             + img[0::2, 1::2] + img[1::2, 1::2]) // 4
    assert o["out_w"][0].as_py() == mc.PPM_W // 2
    assert [o[c][0].as_py() for c in ("sum_r", "sum_g", "sum_b")] \
        == [int(small[:, :, i].sum()) for i in range(3)]


def test_real_png_compressed_decode():
    """The PNG path crosses a REAL compression boundary: payloads are
    zlib-DEFLATE'd with CRC'd chunks and per-row filters cycling through
    all five PNG filter types; the decoder must verify CRCs, concatenate
    split IDAT chunks, inflate and reconstruct. Round-trip is bit-exact;
    single-byte corruption anywhere in a chunk raises."""
    import pytest
    import zlib as _zlib

    from the_yelp_collaborative_knowledge_graph_ray.stages import (
        media_codecs as mc,
    )

    for mid in (0, 1, 42, 1234):
        img = mc._png_pixels(mid)
        payload = mc._png_encode(img)
        # genuinely compressed and smaller than the raw plane
        assert len(payload) < img.size
        assert payload.count(b"IDAT") == 2  # split-IDAT path exercised
        assert (mc._png_decode(payload) == img).all()

    # height 20 -> rows exercise filters 0..4 (y % 5)
    assert mc.PNG_H >= 5

    # corruption in the compressed stream AND in the header both raise
    good = mc._png_encode(mc._png_pixels(9))
    for pos in (12, 40, len(good) - 20):
        bad = bytearray(good)
        bad[pos] ^= 0xFF
        with pytest.raises(ValueError):
            mc._png_decode(bytes(bad))
    with pytest.raises((ValueError, _zlib.error)):
        mc._png_decode(good[:60])

    # extractor features match a direct numpy computation
    o = mc.PngFeatureExtractor()(pa.table({
        "media_id": pa.array([42], pa.int64()),
        "payload": pa.array([mc._png_encode(mc._png_pixels(42))],
                            pa.large_binary())}))
    img = mc._png_pixels(42).astype(np.int64)
    wx = (np.arange(mc.PNG_W) + 1)[None, :, None]
    wy = (np.arange(mc.PNG_H) + 1)[:, None, None]
    assert o["width"][0].as_py() == mc.PNG_W
    assert [o[c][0].as_py() for c in ("sum_r", "sum_g", "sum_b")] \
        == [int(img[:, :, i].sum()) for i in range(3)]
    assert [o[c][0].as_py() for c in ("wsum_r", "wsum_g", "wsum_b")] \
        == [int((img * wx * wy)[:, :, i].sum()) for i in range(3)]


def test_real_jpeg_lossy_decode():
    """The JPEG path is a REAL lossy codec: std-Huffman-coded baseline
    stream, pinned integer DCT on both ends. The entropy layer must
    round-trip coefficients exactly (decode == the pinned integer
    replay), the decode must genuinely differ from the source (it IS
    lossy), and corruption anywhere must raise."""
    import pytest

    from the_yelp_collaborative_knowledge_graph_ray.stages import (
        media_codecs as mc,
    )

    any_loss = False
    for mid in (0, 1, 42, 999, 65535):
        img = mc._jpeg_pixels(mid)
        payload = mc._jpeg_encode(img)
        assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
        dec = mc._jpeg_decode(payload)
        # bit-equal to the pinned integer forward+inverse replay — the
        # property that makes the lossy decode oracle-gateable
        ref = mc._jpeg_decode_plane(mc._jpeg_quant_coeffs(img))
        assert np.array_equal(dec, ref)
        any_loss |= not np.array_equal(dec, img.astype(np.int64))
    assert any_loss  # the codec is genuinely lossy

    good = mc._jpeg_encode(mc._jpeg_pixels(7))
    with pytest.raises(ValueError):
        mc._jpeg_decode(b"\x00\x01" + good[2:])   # bad SOI
    with pytest.raises(ValueError):
        mc._jpeg_decode(good[:40])                # truncated segment
    # structural corruption raises (JPEG carries no CRC, so a bitflip in
    # entropy data may decode silently — that is the format, not a bug;
    # PNG is the integrity-checked row of this family)
    bad = bytearray(good)
    bad[6] ^= 0xFF                                # DQT precision/id byte
    with pytest.raises(ValueError):
        mc._jpeg_decode(bytes(bad))

    # extractor features match a direct replay computation
    o = mc.JpegFeatureExtractor()(pa.table({
        "media_id": pa.array([42], pa.int64()),
        "payload": pa.array([mc._jpeg_encode(mc._jpeg_pixels(42))],
                            pa.large_binary())}))
    plane = mc._jpeg_decode_plane(mc._jpeg_quant_coeffs(mc._jpeg_pixels(42)))
    wx = (np.arange(mc.JPEG_W) + 1)[None, :]
    wy = (np.arange(mc.JPEG_H) + 1)[:, None]
    assert o["width"][0].as_py() == mc.JPEG_W
    assert o["sum_p"][0].as_py() == int(plane.sum())
    assert o["wsum_p"][0].as_py() == int((plane * wx * wy).sum())


def test_real_flac_lossless_decode():
    """The FLAC path is a real entropy-coded lossless codec: Rice-coded
    order-2 fixed-predictor residuals, bit-level decode, and ALL THREE
    integrity layers verified (frame-header CRC-8, frame CRC-16,
    STREAMINFO MD5 of the decoded samples)."""
    import pytest

    from the_yelp_collaborative_knowledge_graph_ray.stages import (
        media_codecs as mc,
    )

    for mid in (0, 1, 42, 999):
        x = mc._flac_samples(mid)
        payload = mc._flac_encode(x)
        assert payload[:4] == b"fLaC"
        assert len(payload) < 2 * len(x)          # genuinely compressed
        assert np.array_equal(mc._flac_decode(payload),
                              x.astype(np.int64))

    good = mc._flac_encode(mc._flac_samples(7))
    with pytest.raises(ValueError):
        mc._flac_decode(b"fLaX" + good[4:])       # bad magic
    with pytest.raises(ValueError):
        mc._flac_decode(good[:60])                # truncated
    # corrupt one byte of the Rice-coded residual stream: either the
    # frame CRC-16 or the sample MD5 must catch it (never silent)
    bad = bytearray(good)
    bad[len(bad) - 40] ^= 0x55
    with pytest.raises(ValueError):
        mc._flac_decode(bytes(bad))
    # corrupt the frame header: CRC-8 layer
    hdr_off = good.index(b"\xff\xf8", 4)
    bad2 = bytearray(good)
    bad2[hdr_off + 3] ^= 0x01
    with pytest.raises(ValueError):
        mc._flac_decode(bytes(bad2))
    # corrupt the stored MD5 itself: the sample check must fire
    bad3 = bytearray(good)
    bad3[8 + 18] ^= 0xFF                          # first MD5 byte
    with pytest.raises(ValueError):
        mc._flac_decode(bytes(bad3))

    # extractor features equal the WAV-style direct computation
    o = mc.FlacFeatureExtractor()(pa.table({
        "media_id": pa.array([42], pa.int64()),
        "payload": pa.array([mc._flac_encode(mc._flac_samples(42))],
                            pa.large_binary())}))
    x = mc._flac_samples(42).astype(np.int64)
    assert o["n_samples"][0].as_py() == len(x)
    assert o["sum_abs"][0].as_py() == int(np.abs(x).sum())
    assert o["sum_sq"][0].as_py() == int((x * x).sum())
    assert o["zero_crossings"][0].as_py() == int(
        np.count_nonzero((x[1:] < 0) != (x[:-1] < 0)))


def test_real_avi_mjpeg_decode():
    """The AVI path is a real video container over the real lossy JPEG
    codec: RIFF/LIST walk, per-'00dc' frame decode bit-equal to the
    pinned integer replay, structural corruption raises."""
    import pytest

    from the_yelp_collaborative_knowledge_graph_ray.stages import (
        media_codecs as mc,
    )

    for mid in (0, 1, 42, 999):
        payload = mc._avi_encode(mid)
        frames = mc._avi_decode(payload)
        assert len(frames) == mc._avi_n_frames(mid)
        for f, img in enumerate(frames):
            ref = mc._jpeg_decode_plane(
                mc._jpeg_quant_coeffs(mc._avi_frame_pixels(mid, f)))
            assert np.array_equal(img, ref)

    good = mc._avi_encode(7)
    with pytest.raises(ValueError):
        mc._avi_decode(b"RIFX" + good[4:])          # bad magic
    with pytest.raises(ValueError):
        mc._avi_decode(good[:-10])                  # RIFF size mismatch
    # corrupt the first embedded JPEG's DQT precision byte: the per-frame
    # codec layer must catch it
    joff = good.index(b"\xff\xd8")
    bad = bytearray(good)
    bad[joff + 6] ^= 0xFF
    with pytest.raises(ValueError):
        mc._avi_decode(bytes(bad))
    # avih frame-count disagreement: structural check fires
    aoff = good.index(b"avih") + 8 + 16
    bad2 = bytearray(good)
    bad2[aoff] ^= 0x07
    with pytest.raises(ValueError):
        mc._avi_decode(bytes(bad2))

    # extractor features equal a direct replay fold
    o = mc.AviFeatureExtractor()(pa.table({
        "media_id": pa.array([42], pa.int64()),
        "payload": pa.array([mc._avi_encode(42)], pa.large_binary())}))
    frames = [mc._jpeg_decode_plane(
        mc._jpeg_quant_coeffs(mc._avi_frame_pixels(42, f)))
        for f in range(mc._avi_n_frames(42))]
    wx = (np.arange(mc.JPEG_W) + 1)[None, :]
    wy = (np.arange(mc.JPEG_H) + 1)[:, None]
    assert o["n_frames"][0].as_py() == len(frames)
    assert o["sum_p"][0].as_py() == int(sum(f.sum() for f in frames))
    assert o["fwsum_p"][0].as_py() == int(sum(
        (k + 1) * (f * wx * wy).sum() for k, f in enumerate(frames)))


def test_text_bucket_lru_reads_each_bucket_once(tmp_path):
    """The worker-level text-bucket LRU reads a committed bucket from
    storage ONCE per worker however many id batches probe it, and
    invalidates itself when the layout gains part files (append)."""
    import pyarrow.parquet as pq2

    from the_yelp_collaborative_knowledge_graph_ray.stages import dedup as D

    d = tmp_path / "bucket=0"
    d.mkdir()
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["a", "b"], pa.string())})
    pq2.write_table(t, str(d / "part-0.parquet"))
    D._TEXT_BUCKET_CACHE.clear()
    D._TEXT_BUCKET_READS.clear()
    for _ in range(5):
        got = D._cached_text_bucket(str(d))
    assert D._TEXT_BUCKET_READS[str(d)] == 1
    assert got.num_rows == 2
    # append a part file -> the (dir, files) key changes -> one fresh read
    pq2.write_table(pa.table({"doc_id": pa.array([3], pa.int64()),
                              "text": pa.array(["c"], pa.string())}),
                    str(d / "part-1.parquet"))
    got2 = D._cached_text_bucket(str(d))
    assert D._TEXT_BUCKET_READS[str(d)] == 2
    assert got2.num_rows == 3


def test_incremental_dedup_cross_snapshot_and_index_update(ray_session,
                                                           tmp_path):
    """Cross-snapshot exact dedup against the committed digest index:
    history dup, within-delta dup, novel; then update_index=True appends
    the novel keepers, so an immediate re-ingestion of the same delta
    reports EVERY row as already-present (idempotent ingestion)."""
    from the_yelp_collaborative_knowledge_graph_ray.stages.dedup import (
        build_digest_index,
        incremental_exact_dedup,
    )

    def ds_of(rows):
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string())}))

    hist = ds_of([(1, "alpha beta gamma"), (2, "delta epsilon zeta")])
    delta = ds_of([(10, "alpha beta gamma"),   # dup of history keeper 1
                   (11, "brand new content"),  # novel keeper
                   (12, "brand new content"),  # within-delta dup of 11
                   (13, "another unique")])    # novel
    idx = build_digest_index(hist, str(tmp_path / "index"), n_buckets=8)

    out = incremental_exact_dedup(delta, idx, str(tmp_path / "s1"),
                                  update_index=True).to_pandas()
    got = {int(r.doc_id): (None if r.dup_of != r.dup_of or r.dup_of is None
                           else int(r.dup_of))
           for r in out.itertuples()}
    assert got == {10: 1, 11: None, 12: 11, 13: None}

    # re-ingest the SAME delta against the updated index: nothing novel
    out2 = incremental_exact_dedup(delta, idx, str(tmp_path / "s2"),
                                   update_index=False).to_pandas()
    got2 = {int(r.doc_id): int(r.dup_of) for r in out2.itertuples()}
    assert got2 == {10: 1, 11: 11, 12: 11, 13: 13}


def test_simhash_finds_exact_and_near_dups(ray_session):
    got = dedup.simhash_pairs(_docs_ds(), max_hamming=3).to_pandas()
    pairs = set(zip(got["doc_a"], got["doc_b"]))
    assert (0, 1) in pairs          # identical -> hamming 0
    assert (3, 4) in pairs
    ham = dict(zip(zip(got["doc_a"], got["doc_b"]), got["hamming"]))
    assert ham[(0, 1)] == 0
    assert (7, 11) not in pairs     # unrelated docs


def _emb_ds(n=64, dim=16, seed=3):
    rng = np.random.RandomState(seed)
    m = rng.standard_normal((n, dim))
    m[1] = m[0] + 0.01 * rng.standard_normal(dim)  # planted near-dup
    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(m.tolist(), pa.list_(pa.float32()))})), m


def test_embedding_near_dup_and_brute_topk(ray_session):
    ds, m = _emb_ds()
    near = dedup.embedding_near_dup_pairs(ds, threshold=0.99).to_pandas()
    assert (0, 1) in set(zip(near["doc_a"], near["doc_b"]))

    got = similarity.brute_force_topk(ds, k=5, n_queries=4).to_pandas()
    # numpy oracle (float32 round trip to match the stored values)
    m32 = m.astype(np.float32).astype(np.float64)
    mn = m32 / np.linalg.norm(m32, axis=1, keepdims=True)
    for q in range(4):
        s = np.round(mn[q] @ mn.T, 6)
        cand = [i for i in range(len(mn)) if i >= 4]
        order = sorted(cand, key=lambda i: (-s[i], i))[:5]
        sub = got[got["query_id"] == q]
        assert sub["vec_id"].tolist() == order, q


def test_vectorized_signatures_match_reference_impls():
    """The batch-vectorized MinHash/SimHash paths must be bit-identical to
    the per-doc reference implementations (incl. empty and short docs)."""
    texts = [
        "alpha beta gamma delta epsilon zeta",
        "one two three",
        "short doc",          # < SHINGLE_K words: no minhash signature
        "",                   # empty text
        "alpha beta gamma delta epsilon zeta",  # repeat of 0
        "x " * 50 + "y",
    ]
    col = pa.chunked_array([pa.array(texts, pa.string())])

    doc_idx, sigs = dedup._minhash_signatures(col)
    expect = {i: dedup.minhash_signature(t) for i, t in enumerate(texts)}
    assert doc_idx.tolist() == [i for i, s in expect.items() if s is not None]
    for pos, i in enumerate(doc_idx.tolist()):
        assert sigs[pos].tolist() == expect[i].tolist(), i

    fps = dedup._simhash_batch(col)
    for i, t in enumerate(texts):
        assert int(fps[i]) == dedup.simhash64(t), i


def test_short_docs_drop_out_of_shingle_dedup(ray_session):
    """Docs with < k words emit ZERO shingles (matching the SQL oracle's
    CTE) — identical 2-word docs must NOT pair in jaccard or minhash."""
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["tiny doc", "tiny doc",
                          "a full length document with many words here",
                          "a full length document with many words here"])}))
    jac = dedup.ngram_jaccard_pairs(ds, threshold=0.5).to_pandas()
    assert set(zip(jac.doc_a, jac.doc_b)) == {(2, 3)}
    mh = dedup.minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
    assert set(zip(mh.doc_a, mh.doc_b)) == {(2, 3)}
    assert dedup._shingles("tiny doc") == set()


def test_hot_group_cap_warns(caplog):
    from the_yelp_collaborative_knowledge_graph_ray.functions import grouped
    d = np.arange(100, dtype=np.int64)
    with caplog.at_level("WARNING"):
        out = grouped._cap_group(d, 10, "test-group")
    assert len(out) == 10
    assert any("capped" in r.message and "90 ids dropped" in r.message
               for r in caplog.records)
    caplog.clear()
    with caplog.at_level("WARNING"):
        assert len(grouped._cap_group(d, 100, "t")) == 100  # at cap: no warn
    assert not caplog.records


def test_embedding_lsh_equals_blocked_on_planted_pairs(ray_session):
    """The LSH scale path must reproduce the exact blocked engine on a corpus
    with PLANTED >=0.9-cosine near-dup pairs (30 of them), run with the
    high-threshold banding (b=16, r=8) AND with multi-block blocking forced
    (tiny target_block_rows) so both scale mechanisms are exercised."""
    rng = np.random.RandomState(11)
    n, dim = 200, 32
    m = rng.standard_normal((n + 30, dim))
    for t in range(30):  # ids 200..229 are near-dups of ids 0..29
        m[n + t] = m[t] + 0.05 * rng.standard_normal(dim)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(n + 30), pa.int64()),
        "embedding": pa.array(m.tolist(), pa.list_(pa.float32()))}))

    exact = dedup._blocked_pairs(ds, 0.9, None, target_block_rows=64) \
        .sort(["doc_a", "doc_b"]).to_pandas() \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    lsh = dedup.embedding_near_dup_pairs(
        ds, threshold=0.9, bands=16, rows_per_band=8).to_pandas() \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)

    assert len(exact) >= 30  # the planted pairs are really there
    assert exact[["doc_a", "doc_b"]].values.tolist() == \
        lsh[["doc_a", "doc_b"]].values.tolist()
    assert np.allclose(exact["cosine"], lsh["cosine"])

    # the ride-along vector transport (the beyond-node-memory regime,
    # forced by a zero broadcast budget) must emit identical pairs
    ride = dedup.embedding_near_dup_pairs(
        ds, threshold=0.9, bands=16, rows_per_band=8,
        broadcast_bytes=0).to_pandas() \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    assert ride[["doc_a", "doc_b"]].values.tolist() == \
        lsh[["doc_a", "doc_b"]].values.tolist()
    assert np.allclose(ride["cosine"], lsh["cosine"])


def test_ivf_recall_vs_brute_force(ray_session):
    ds, _ = _emb_ds(n=256, dim=16)
    brute = similarity.brute_force_topk(ds, k=10, n_queries=4).to_pandas()
    approx = similarity.ivf_topk(ds, k=10, n_queries=4, n_clusters=8,
                                 n_probe=4).to_pandas()
    recalls = []
    for q in range(4):
        b = set(brute[brute["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        recalls.append(len(a & b) / len(b))
    assert np.mean(recalls) >= 0.5, recalls  # probing half the buckets


def test_langid_on_real_sentences():
    clf = textstats.LangIdClassifier()
    assert clf.classify_one("the cat sat on the mat with the other cats") == "en"
    assert clf.classify_one("der hund lief schnell durch den wald nach hause") == "de"
    assert clf.classify_one("el gato come pescado en la casa de mi abuela") == "es"
    assert clf.classify_one("le chien court dans le jardin avec les enfants") == "fr"
    assert clf.classify_one("狐狸跳过了懒狗然后跑走了") == "zh"


def test_repetition_stats_vs_brute_force(ray_session):
    """Vectorized repetition counts == a per-doc Counter recomputation,
    including edge docs (empty, single word, all-same-word)."""
    from collections import Counter
    texts = ["the cat the cat the cat", "a b c d e", "", "word",
             "x x x x x x", "one two one two three", "A a A a"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    got = textstats.repetition_stats(ds).to_pandas()
    for i, t in enumerate(texts):
        ws = t.lower().split(" ")
        bgs = Counter(zip(ws, ws[1:]))
        row = got[got["doc_id"] == i].iloc[0]
        assert row["n_words"] == len(ws)
        assert row["n_distinct_words"] == len(set(ws))
        assert row["n_bigrams"] == max(len(ws) - 1, 0)
        assert row["top_bigram_count"] == (max(bgs.values()) if bgs else 0)


def test_pack_sequences_vs_brute_force(ray_session):
    """searchsorted-hop packing == the literal greedy loop, including the
    overflow-starts-new-sequence rule and oversized-doc-alone case."""
    from the_yelp_collaborative_knowledge_graph_ray.stages.textstats import (
        pack_sequences,
    )
    import random
    rng = random.Random(5)
    rows = []
    for i in range(200):
        nw = rng.choice([3, 40, 80, 120, 200])  # 200 > budget: alone
        rows.append((i, " ".join("w" * 1 for _ in range(nw)),
                     f"s{rng.randint(0, 3)}"))
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string())}))
    got = pack_sequences(ds, budget=128).to_pandas()
    for src in sorted({r[2] for r in rows}):
        docs = sorted((r[0], len(r[1].split(" ")))
                      for r in rows if r[2] == src)
        want, cur, si = [], 0, 0
        for did, n in docs:
            if cur + n > 128 and cur > 0:
                si, cur = si + 1, n
            else:
                cur += n
            want.append((did, n, si))
        sub = got[got["source"] == src].sort_values("doc_id")
        assert list(zip(sub["doc_id"], sub["n_tokens"],
                        sub["seq_idx"])) == want, (src, want)


def test_chunk_documents_vs_brute_force(ray_session):
    """Zero-copy chunking == python slicing: exact word coverage, last
    chunk keeps the remainder, empty/short docs yield one chunk, text
    round-trips (joining chunks with the boundary space reproduces the
    doc)."""
    texts = ["", "one", " ".join(f"w{i}" for i in range(32)),
             " ".join(f"w{i}" for i in range(33)),
             " ".join(f"w{i}" for i in range(100)),
             "a  b", "Mixed CASE kept"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    got = textstats.chunk_documents(ds).to_pandas()
    for i, t in enumerate(texts):
        ws = t.split(" ")
        want = [" ".join(ws[s:s + 32]) for s in range(0, len(ws), 32)]
        sub = got[got["doc_id"] == i].sort_values("chunk_idx")
        assert list(sub["chunk_text"]) == want, (i, want, list(sub["chunk_text"]))
        assert list(sub["n_tokens"]) == [len(ws[s:s + 32])
                                         for s in range(0, len(ws), 32)]
        assert " ".join(sub["chunk_text"]) == t  # lossless round-trip


def test_bm25_vs_brute_force(ray_session):
    """bm25_topk == a direct python BM25 on a small corpus, including the
    fixed-point floor, ranking, and doc_id tie-breaks."""
    import math
    from the_yelp_collaborative_knowledge_graph_ray.stages.search import (
        BM25_B, BM25_K1, bm25_topk,
    )
    texts = ["hash join fast", "hash hash join join join", "slow scan table",
             "join", "nothing relevant here", "hash join hash join hash",
             "scan scan scan slow slow"]
    queries = ["hash join", "slow scan"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    got = bm25_topk(ds, queries, k=3).to_pandas()

    words = [t.lower().split(" ") for t in texts]
    N = len(words)
    avgdl = sum(len(w) for w in words) / N
    k1p1, one_m_b = BM25_K1 + 1.0, 1.0 - BM25_B

    def score(q, ws):
        s = 0
        for t in dict.fromkeys(q.split(" ")):
            df = sum(1 for w in words if t in set(w))
            idf = math.log((N - df + 0.5) / (df + 0.5) + 1.0)
            tf = float(ws.count(t))
            if tf == 0:
                continue
            denom = tf + BM25_K1 * (one_m_b + BM25_B * (len(ws) / avgdl))
            s += int(math.floor((idf * ((tf * k1p1) / denom)) * 1e6))
        return s

    for qi, q in enumerate(queries):
        want = sorted(((score(q, ws), -i) for i, ws in enumerate(words)
                       if score(q, ws) > 0 or any(t in ws for t in q.split())),
                      reverse=True)[:3]
        want = [(-i, s) for s, i in want]
        sub = got[got["query_id"] == qi].sort_values("rank")
        assert list(zip(sub["doc_id"], sub["score"])) == want, (qi, want, sub)
    """Seeded randomized equivalence of the vectorized within-group pair
    enumeration against itertools.combinations, across empty blocks,
    duplicate ids, drop_over and max_group combinations."""
    import itertools
    import logging
    import random
    from the_yelp_collaborative_knowledge_graph_ray.functions.grouped import (
        _pair_index_arrays,
    )
    logging.disable(logging.WARNING)
    try:
        rng = random.Random(3)

        def brute(gid, ids, drop_over, max_group):
            out = []
            for g in sorted(set(gid.tolist())):
                d = np.unique(ids[gid == g])
                if len(d) < 2 or (drop_over is not None
                                  and len(d) > drop_over):
                    continue
                if max_group is not None:
                    d = d[:max_group]
                out += list(itertools.combinations(d.tolist(), 2))
            return sorted(out)

        for _ in range(200):
            n = rng.randint(0, 40)
            gid = np.sort(np.array([rng.randint(0, 6) for _ in range(n)],
                                   np.int64))
            ids = np.array([rng.randint(0, 12) for _ in range(n)], np.int64)
            drop_over = rng.choice([None, 2, 3])
            max_group = rng.choice([None, 2, 4])
            sel, first, second = _pair_index_arrays(
                gid, ids, drop_over, max_group, "t")
            d = ids[sel]
            got = sorted(zip(d[first].tolist(), d[second].tolist()))
            assert got == brute(gid, ids, drop_over, max_group)
    finally:
        logging.disable(logging.NOTSET)


def test_dup_span_stats_vs_brute_force(ray_session):
    """Shared-fingerprint counts == a brute-force dict recomputation:
    an exact duplicate shares ALL picks; a unique doc shares none (in a
    corpus of otherwise-distinct texts); a doc with a copied sentence
    shares some."""
    from collections import Counter
    a = "the quick brown fox jumps over the lazy dog near the river bank"
    texts = [a, a,  # exact dups
             "completely different words about completely other topics here",
             "unique sentence with rare tokens zyx wvu tsr qpo nml kji",
             a + " plus an original trailing clause nobody else wrote ever"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    got = textstats.dup_span_stats(ds).to_pandas().set_index("doc_id")
    fps = {i: set(textstats.winnow_fingerprints(t))
           for i, t in enumerate(texts)}
    df = Counter(f for s in fps.values() for f in s)
    for i in range(len(texts)):
        assert got.loc[i, "n_fp"] == len(fps[i])
        assert got.loc[i, "n_shared_fp"] == sum(df[f] >= 2 for f in fps[i])
    assert got.loc[0, "n_shared_fp"] == got.loc[0, "n_fp"]  # exact dup
    assert got.loc[4, "n_shared_fp"] > 0                    # copied span


def test_langid_batch_equals_per_row():
    """The vectorized batch scorer (codepoint bigrams -> searchsorted ->
    bincount scatter) must agree with the reference per-row loop on every
    edge case: empty text, one char, no profile hits ('und'), mixed
    scripts, uppercase (lowered first), and doc-boundary bigrams (the
    straddle mask)."""
    import random
    clf = textstats.LangIdClassifier()
    rng = random.Random(11)
    seeds = ["the cat sat on the mat", "der hund lief schnell nach hause",
             "el gato come pescado en la casa", "le chien court dans le jardin",
             "狐狸跳过了懒狗", "", "x", "123 !!!", "ZZQQ XXYY",
             "The Quick BROWN Fox", "über die straße", "düsseldorf café"]
    texts = list(seeds)
    for _ in range(300):
        words = (rng.choice(seeds) + " " + rng.choice(seeds)).split()
        rng.shuffle(words)
        texts.append(" ".join(words))
    b = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got = clf(b)["pred_lang"].to_pylist()
    want = [clf.classify_one(t) for t in texts]
    assert got == want


def test_winnow_fingerprints_locality():
    a = "the quick brown fox jumps over the lazy dog near the river bank"
    b = a.replace("river", "creek")
    fa = set(textstats.winnow_fingerprints(a))
    fb = set(textstats.winnow_fingerprints(b))
    overlap = len(fa & fb) / len(fa | fb)
    assert overlap > 0.5            # local edit -> most fingerprints shared
    assert fa != fb                 # but the change is detected
    assert textstats.winnow_fingerprints(a) == textstats.winnow_fingerprints(a)


def test_multimodal_plumbing(ray_session):
    media = multimodal.synthesize_media(_docs_ds())
    feats = multimodal.extract_features(media).to_pandas()
    assert len(feats) == 12
    assert set(feats["media_type"]) <= {"image", "audio", "video"}
    v = feats["feature"].iloc[0]
    assert len(v) == multimodal.FEATURE_DIM
    assert abs(np.linalg.norm(v) - 1.0) < 1e-5
    # deterministic: same payload -> same features (docs 0 and 1 identical)
    f0 = feats[feats["media_id"] == 0]["feature"].iloc[0]
    f1 = feats[feats["media_id"] == 1]["feature"].iloc[0]
    assert np.allclose(f0, f1)
    with pytest.raises(NotImplementedError):
        multimodal.MediaFeatureExtractor(mode="real")(
            pa.table({"media_id": [1], "payload": [b"x"],
                      "media_type": ["image"]}))


def test_attach_column_sparse_left(ray_session):
    """The co-group join must survive a tiny left side over many partitions
    (the case where Dataset.join crashes — functions/joins.py docstring)."""
    left = ray.data.from_arrow(pa.table({
        "doc_a": pa.array([3], pa.int64()), "v": pa.array([7], pa.int64())}))
    src = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(100), pa.int64()),
        "text": pa.array([f"t{i}" for i in range(100)], pa.string())}))
    out = attach_column(
        left, src, left_cols=[("doc_a", pa.int64()), ("v", pa.int64())],
        left_key="doc_a", source_key="doc_id", source_val="text",
        out_col="text_a").to_pandas()
    assert out.to_dict("records") == [{"doc_a": 3, "v": 7, "text_a": "t3"}]


def test_sorted_aggregate_matches_pandas(ray_session):
    from the_yelp_collaborative_knowledge_graph_ray.functions.grouped import (
        sorted_aggregate,
    )
    rng = np.random.RandomState(5)
    n = 20_000
    k = rng.randint(0, 50, size=n)
    v = rng.randint(0, 1000, size=n)
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array(k, pa.int64()), "v": pa.array(v, pa.int64())}))
    got = sorted_aggregate(ds.repartition(8), ["k"],
                           [("v", "sum"), ("v", "min"), ("v", "count")],
                           ["k", "v_sum", "v_min", "v_n"]).to_pandas()
    import pandas as pd
    want = pd.DataFrame({"k": k, "v": v}).groupby("k")["v"] \
        .agg(v_sum="sum", v_min="min", v_n="count").reset_index()
    got = got.sort_values("k").reset_index(drop=True)
    assert got.astype("int64").equals(want.astype("int64"))
    # output arrives already sorted by the group key
    assert got["k"].is_monotonic_increasing


def test_grouped_count_matches_pandas(ray_session):
    from the_yelp_collaborative_knowledge_graph_ray.functions.grouped import (
        grouped_count,
    )
    rng = np.random.RandomState(6)
    k = rng.randint(0, 37, size=10_000)
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array(k, pa.int64()),
        "other": pa.array(rng.rand(len(k)))}))
    got = grouped_count(ds.repartition(6), ["k"], num_partitions=4) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    import pandas as pd
    want = pd.DataFrame({"k": k}).groupby("k").size() \
        .rename("n").reset_index()
    assert got.astype("int64").equals(want.astype("int64"))


def test_salted_aggregate_exact_on_hot_keys(ray_session):
    from the_yelp_collaborative_knowledge_graph_ray.functions.salting import (
        salted_aggregate,
    )
    # one key holds 90% of the rows — the skew case salting exists for
    k = ["hot"] * 18_000 + [f"k{i % 40}" for i in range(2_000)]
    v = list(range(20_000))
    ds = ray.data.from_arrow(pa.table({
        "key": pa.array(k, pa.string()), "v": pa.array(v, pa.int64())}))
    got = salted_aggregate(
        ds.repartition(8), "key",
        level1=[("v", "count"), ("v", "min"), ("v", "max")],
        level2=[("n", "sum"), ("v_min", "min"), ("v_max", "max")],
        out_names=["key", "n", "v_min", "v_max"], num_salts=8).to_pandas()
    import pandas as pd
    want = pd.DataFrame({"key": k, "v": v}).groupby("key")["v"] \
        .agg(n="count", v_min="min", v_max="max").reset_index()
    got = got.sort_values("key").reset_index(drop=True)
    want = want.sort_values("key").reset_index(drop=True)
    assert got.equals(want[["key", "n", "v_min", "v_max"]])


def test_curation_pipeline_drops_quality_and_dups(ray_session):
    """Quality gate, exact dedup keep-lowest, and near-dup doc_b drop all
    fire on the synthetic corpus; survivors keep their stats."""
    from the_yelp_collaborative_knowledge_graph_ray.pipelines.curation import (
        curate_documents,
    )
    ds = _docs_ds()
    out = curate_documents(ds, min_words=5, min_alpha=0.5,
                           jaccard_threshold=0.5).to_pandas()
    kept = set(out["doc_id"])
    # exact dups of 0 and 3 drop; near dups (2 of 0, 6 of 5) drop
    assert 1 not in kept and 4 not in kept
    assert 2 not in kept and 6 not in kept
    assert {0, 3, 5}.issubset(kept)
    row0 = out[out.doc_id == 0].iloc[0]
    assert row0["n_words"] == 20 and row0["n_chars"] > 0


def test_curation_high_dup_rate_anti_join_path(ray_session):
    """~67% near-dup corpus: the distributed anti-join drop path (no
    driver-collected drop set) must keep exactly the lowest id of every
    dup cluster, verified against a sequential pairwise-Jaccard oracle."""
    import random

    from the_yelp_collaborative_knowledge_graph_ray.pipelines.curation import (
        curate_documents,
    )

    rng = random.Random(7)
    words = [f"w{i}" for i in range(50)]
    base_texts = [" ".join(rng.choices(words, k=30)) for _ in range(60)]
    rows = []
    did = 0
    for text in base_texts:
        # one original + two near-copies (one word substituted) -> the
        # cluster's lowest id must be the sole survivor
        for _ in range(3):
            toks = text.split(" ")
            if did % 3 != 0:
                toks[rng.randrange(len(toks))] = rng.choice(words)
            rows.append((did, " ".join(toks)))
            did += 1
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string())})) \
        .repartition(8)
    out = curate_documents(ds, min_words=5, min_alpha=0.1,
                           jaccard_threshold=0.5).to_pandas()

    # sequential oracle: exact dedup keep-lowest, then drop any doc whose
    # word-3-gram Jaccard vs a LOWER surviving-or-not id is >= 0.5
    def shingles(t):
        w = t.split(" ")
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}
    first_by_text = {}
    for i, t in rows:
        first_by_text.setdefault(t, i)
    exact_survivors = sorted(first_by_text.values())
    sh = {i: shingles(dict(rows)[i]) for i in exact_survivors}
    drop = set()
    for j in exact_survivors:
        for i in exact_survivors:
            if i >= j:
                break
            inter = len(sh[i] & sh[j])
            union = len(sh[i] | sh[j])
            if union and inter / union >= 0.5:
                drop.add(j)
                break
    want = [i for i in exact_survivors if i not in drop]
    assert out["doc_id"].tolist() == want
    assert len(want) < len(rows) // 2  # the dup rate actually bites


def test_curate_multimodal_gates_all_three_modalities(ray_session):
    """The cross-modality join keeps exactly the docs passing text AND
    audio AND video gates, verified against a sequential replay of the
    decoded-media signals per doc id."""
    from the_yelp_collaborative_knowledge_graph_ray.pipelines.curation import (
        MM_MIN_MOTION_PEAK, MM_MIN_WORDS, MM_MIN_ZC, curate_multimodal)
    from the_yelp_collaborative_knowledge_graph_ray.stages import (
        media_codecs as mc,
    )

    n = 40
    texts = ["w " * (10 + 3 * i) for i in range(n)]  # 10..127 words+1 pad
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array([t.strip() if i % 2 else t for i, t in
                          enumerate(texts)], pa.string())})) \
        .repartition(4)
    out = curate_multimodal(ds).to_pandas()

    def zc(mid):
        x = mc._flac_samples(mid).astype(np.int64)
        return int(np.count_nonzero((x[1:] < 0) != (x[:-1] < 0)))

    def peak(mid):
        fr = [mc._jpeg_decode_plane(
            mc._jpeg_quant_coeffs(mc._avi_frame_pixels(mid, f)))
            for f in range(mc._avi_n_frames(mid))]
        return max(int(np.abs(fr[f] - fr[f - 1]).sum())
                   for f in range(1, len(fr)))

    want = []
    for i in range(n):
        t = texts[i].strip() if i % 2 else texts[i]
        nw = len(t.split(" "))
        if nw >= MM_MIN_WORDS and zc(i) >= MM_MIN_ZC \
                and peak(i) >= MM_MIN_MOTION_PEAK:
            want.append((i, nw, zc(i), peak(i)))
    got = list(out.itertuples(index=False, name=None))
    assert got == want
    assert 0 < len(want) < n  # gates genuinely partition the corpus


def test_asof_join_strictness_ties_and_group_isolation(ray_session):
    """Hand-built case: equal-ts rights are NOT matched (strict <), ties
    among rights at the matched ts resolve to max id, and matches never
    leak across key groups."""
    import datetime as dt

    from the_yelp_collaborative_knowledge_graph_ray.functions.asof import (
        asof_join,
    )

    def t(s):
        return dt.datetime(2025, 1, 1, 0, 0, s)

    left = ray.data.from_arrow(pa.table({
        "event_id": pa.array([100, 101, 102, 103], pa.int64()),
        "user_id": pa.array([1, 1, 2, 3], pa.int64()),
        "ts": pa.array([t(10), t(5), t(10), t(10)], pa.timestamp("us"))}))
    right = ray.data.from_arrow(pa.table({
        "event_id": pa.array([200, 201, 202, 203, 204], pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
        # 200/201 tie at s=3 (match -> max id 201); 202 at s=5 equals
        # left 101's ts (strict: NOT matched for 101); 203 later than all
        "ts": pa.array([t(3), t(3), t(5), t(30), t(10)],
                       pa.timestamp("us"))}))
    out = asof_join(left, right, by="user_id", ts_col="ts",
                    id_col="event_id").to_pandas()
    got = {r.event_id: (r.src_id, r.src_ts.second)
           for r in out.itertuples()}
    assert got[100] == (202, 5)   # latest strictly-earlier right
    assert got[101] == (201, 3)   # equal-ts 202 excluded; tie -> max id
    assert 102 not in got         # user 2's only right is at the SAME ts
    assert 103 not in got         # user 3 has no rights (no cross-group leak)


def test_interval_join_boundaries_and_bin_straddle(ray_session):
    """start inclusive, end exclusive; an interval straddling a bin
    boundary still catches points in both bins exactly once."""
    import datetime as dt

    from the_yelp_collaborative_knowledge_graph_ray.functions.ranges import (
        interval_join,
    )

    def t(s):
        return dt.datetime(2025, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s)

    # bin width 10s; interval [5, 15) straddles the 10s boundary
    points = ray.data.from_arrow(pa.table({
        "pid": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "uid": pa.array([7, 7, 7, 7, 8], pa.int64()),
        "ts": pa.array([t(5), t(9), t(12), t(15), t(9)],
                       pa.timestamp("us"))}))
    ivs = ray.data.from_arrow(pa.table({
        "iid": pa.array([100], pa.int64()),
        "uid": pa.array([7], pa.int64()),
        "s": pa.array([t(5)], pa.timestamp("us")),
        "e": pa.array([t(15)], pa.timestamp("us"))}))
    out = interval_join(points, ivs, by="uid", ts_col="ts",
                        start_col="s", end_col="e", point_id="pid",
                        interval_id="iid",
                        bin_width_us=10_000_000).to_pandas()
    pairs = sorted(zip(out["pid"], out["iid"]))
    # pid 1 (start, inclusive), 2, 3 (second bin) match ONCE each;
    # pid 4 at end (exclusive) and pid 5 (other user) do not
    assert pairs == [(1, 100), (2, 100), (3, 100)]

    # interval longer than the bin width is rejected loudly
    big = ray.data.from_arrow(pa.table({
        "iid": pa.array([101], pa.int64()),
        "uid": pa.array([7], pa.int64()),
        "s": pa.array([t(0)], pa.timestamp("us")),
        "e": pa.array([t(25)], pa.timestamp("us"))}))
    with pytest.raises(Exception, match="exceeds bin_width"):
        interval_join(points, big, by="uid", ts_col="ts", start_col="s",
                      end_col="e", point_id="pid", interval_id="iid",
                      bin_width_us=10_000_000).to_pandas()


def test_pagerank_matches_sequential_reference(ray_session):
    """Distributed fixed-point PageRank == a sequential numpy run of the
    same integer recurrence on a small directed graph (star + chain +
    dangling node)."""
    import numpy as np

    from the_yelp_collaborative_knowledge_graph_ray.functions.pagerank import (
        BASE, SCALE, pagerank)

    edges = [("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a"),
             ("a", "b"), ("b", "c"), ("c", "d")]  # d is dangling
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges]),
        "dst": pa.array([e[1] for e in edges])}))
    out = pagerank(ds, iters=5, num_partitions=2).to_pandas()

    nodes = sorted({n for e in edges for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    outdeg = np.zeros(len(nodes), np.int64)
    for s, _ in edges:
        outdeg[idx[s]] += 1
    rank = np.full(len(nodes), SCALE, np.int64)
    for _ in range(5):
        s = np.zeros(len(nodes), np.int64)
        for u, v in edges:
            s[idx[v]] += rank[idx[u]] // outdeg[idx[u]]
        rank = BASE + 85 * (s // 100) + (85 * (s % 100)) // 100
    got = dict(zip(out["node"], out["rank"]))
    assert got == {n: int(rank[idx[n]]) for n in nodes}
    # the hub (in-degree 3) must outrank everything else
    assert got["hub"] == max(got.values())


def test_pagerank_join_path_equals_broadcast_path(ray_session, monkeypatch):
    """The above-cap join path (forced via BROADCAST_NODES_MAX=0) must be
    bit-equal to the broadcast BSP fast path — same floor arithmetic, only
    the execution plan differs. Covers eigenvector centrality too."""
    from the_yelp_collaborative_knowledge_graph_ray.functions import (
        pagerank as pr,
    )

    rng = __import__("numpy").random.default_rng(7)
    src = [f"n{int(i)}" for i in rng.integers(0, 40, 200)]
    dst = [f"n{int(i)}" for i in rng.integers(0, 40, 200)]
    pairs = sorted({(s, d) for s, d in zip(src, dst) if s != d})
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array([p[0] for p in pairs]),
        "dst": pa.array([p[1] for p in pairs])}))
    fast = pr.pagerank(ds, iters=4, num_partitions=2).to_pandas()
    fast_e = pr.eigenvector_centrality(ds, iters=3,
                                       num_partitions=2).to_pandas()
    monkeypatch.setattr(pr, "BROADCAST_NODES_MAX", 0)
    join = pr.pagerank(ds, iters=4, num_partitions=2).to_pandas()
    join_e = pr.eigenvector_centrality(ds, iters=3,
                                       num_partitions=2).to_pandas()
    k = lambda df: df.sort_values("node").reset_index(drop=True)  # noqa
    assert k(fast).equals(k(join))
    assert k(fast_e).equals(k(join_e))


def test_kmeans_fp_local_equals_distributed(ray_session):
    """semantic_dedup's driver-local Lloyd over the bounded sample must be
    arithmetic-identical to the distributed trainer on the same input."""
    import numpy as np

    from the_yelp_collaborative_knowledge_graph_ray.functions.kmeans import (
        _fp_matrix, kmeans_fp)
    from the_yelp_collaborative_knowledge_graph_ray.stages.dedup import (
        _kmeans_fp_local)

    rng = np.random.default_rng(11)
    mat = rng.normal(size=(300, 16))
    tab = pa.table({
        "vec_id": pa.array(range(300), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(tab).repartition(5)
    _, cents_dist = kmeans_fp(ds, k=6, iters=4)
    cents_local = _kmeans_fp_local(_fp_matrix(tab, "embedding"), 6, 4)
    assert np.array_equal(cents_dist, cents_local)


def test_semantic_dedup_matches_sequential_reference(ray_session):
    """Distributed SemDeDup == a sequential numpy run of the same pipeline
    (same fixed-point Lloyd centroids, same integer-L2 assignment, same
    in-cluster greedy) on a corpus with planted near-duplicate groups."""
    import numpy as np

    from the_yelp_collaborative_knowledge_graph_ray.stages.dedup import (
        semantic_dedup)

    rng = np.random.default_rng(42)
    base = rng.normal(size=(12, 16))
    rows, ids = [], []
    vid = 0
    for i in range(12):
        # each base vector plus 0-3 tiny perturbations (near-dups)
        for _ in range(1 + i % 4):
            rows.append(base[i] + rng.normal(scale=1e-3, size=16))
            ids.append(vid)
            vid += 1
    mat = np.asarray(rows)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float32()))}))
    out = semantic_dedup(ds, threshold=0.9, n_clusters=4).to_pandas()

    # sequential reference: fp-Lloyd (lowest-id init, integer L2 argmin
    # with first-min ties, floor-division centroid means, empty clusters
    # keep their centroid), final integer routing, then the greedy
    m32 = mat.astype(np.float32).astype(np.float64)
    norm = m32 / np.maximum(np.linalg.norm(m32, axis=1, keepdims=True),
                            1e-12)
    mfp = np.floor(m32 * (1 << 20)).astype(np.int64)

    def assign_int(m, c):
        xx = np.einsum("ij,ij->i", m, m)
        cc = np.einsum("ij,ij->i", c, c)
        return (xx[:, None] - 2 * (m @ c.T) + cc[None, :]).argmin(axis=1)

    cent = mfp[:4].copy()
    for _ in range(5):
        a = assign_int(mfp, cent)
        nxt = cent.copy()
        for c in range(4):
            sel = mfp[a == c]
            if len(sel):
                nxt[c] = sel.sum(axis=0) // len(sel)
        cent = nxt
    cl = assign_int(mfp, cent)
    keep_ref = {}
    for c in sorted(set(cl.tolist())):
        members = [i for i in range(len(ids)) if cl[i] == c]
        kept = []
        for i in members:  # ids ascending by construction
            sims = np.round(norm[i] @ norm[kept].T, 6) if kept else None
            if kept and sims.max() >= 0.9:
                keep_ref[ids[i]] = False
            else:
                kept.append(i)
                keep_ref[ids[i]] = True
    got = dict(zip(out["vec_id"], out["keep"]))
    assert got == keep_ref
    # sanity: something was actually dropped and something kept
    assert any(got.values()) and not all(got.values())


def test_bfs_distances_vs_sequential(ray_session):
    """Frontier-BSP BFS == sequential BFS on a chain + star + unreachable
    component, including the max_depth cap and multi-seed min semantics."""
    from collections import deque

    from the_yelp_collaborative_knowledge_graph_ray.functions.bfs import (
        bfs_distances,
    )
    edges = ([(f"c{i}", f"c{i+1}") for i in range(12)]          # long chain
             + [("hub", f"s{i}") for i in range(5)]             # star
             + [("c4", "hub"), ("x0", "x1")])                   # bridge; isl.
    seeds = ["c0", "s3"]
    adj: dict[str, list] = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    exp, q = {s: 0 for s in seeds}, deque(seeds)
    while q:
        u = q.popleft()
        for v in adj[u]:
            if v not in exp:
                exp[v] = exp[u] + 1
                q.append(v)
    max_depth = 5
    exp = {n: d for n, d in exp.items() if d <= max_depth}

    eds = ray.data.from_arrow(pa.table({
        "src": [u for u, _ in edges], "dst": [v for _, v in edges]}))
    sds = ray.data.from_arrow(pa.table({"node": seeds + ["c0"]}))  # dup seed
    got = {r["node"]: r["dist"]
           for r in bfs_distances(eds, sds, max_depth=max_depth).take_all()}
    assert got == exp
    assert "x0" not in got and "x1" not in got    # unreachable excluded
    assert max(got.values()) == max_depth          # chain tail was capped


def test_ed1_pairs_vs_brute_force(ray_session):
    """Deletion-neighborhood ED<=1 matching == brute-force Levenshtein on a
    dense random corpus (short alphabet -> many true pairs AND many blocking
    false-positives like 'ab'/'ba' that the verifier must reject)."""
    import itertools
    import random

    from the_yelp_collaborative_knowledge_graph_ray.functions.editdist import (
        _ed_le1_mask,
        ed1_pairs,
    )

    def lev(a, b):
        m = np.zeros((len(a) + 1, len(b) + 1), int)
        m[:, 0] = np.arange(len(a) + 1)
        m[0, :] = np.arange(len(b) + 1)
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                m[i, j] = min(m[i - 1, j] + 1, m[i, j - 1] + 1,
                              m[i - 1, j - 1] + (a[i - 1] != b[j - 1]))
        return m[-1, -1]

    random.seed(7)
    words = sorted(set("".join(random.choice("abcd")
                               for _ in range(random.randint(1, 6)))
                       for _ in range(500)))
    exp = sorted((a, b) for a, b in itertools.combinations(words, 2)
                 if lev(a, b) <= 1)
    ds = ray.data.from_arrow(pa.table({"w": words})).repartition(4)
    got = sorted((r["form_a"], r["form_b"])
                 for r in ed1_pairs(ds, "w").take_all())
    assert got == exp and len(exp) > 500
    # the verifier alone is exact on every |len diff|<=1 pair
    cand = [(a, b) for a, b in itertools.combinations(words, 2)
            if abs(len(a) - len(b)) <= 1]
    m = _ed_le1_mask(np.array([c[0] for c in cand]),
                     np.array([c[1] for c in cand]))
    assert [c for c, ok in zip(cand, m) if ok] == \
        [c for c in cand if lev(*c) <= 1]


def test_zip_with_index_contiguous(ray_session):
    """zip_with_index assigns exactly 0..n-1, each once, across blocks."""
    from the_yelp_collaborative_knowledge_graph_ray.functions.joins import (
        zip_with_index,
    )
    ds = ray.data.from_arrow(pa.table({"v": np.arange(1234) * 3})) \
        .repartition(7)
    out = zip_with_index(ds).to_pandas()
    assert sorted(out["nid"].tolist()) == list(range(1234))
    # the id is attached to the row, not positional garbage
    assert len(out) == 1234 and set(out["v"] % 3) == {0}


def test_personalized_pagerank_vs_sequential(ray_session):
    """Seeded (RWR) pagerank == a sequential numpy reference on a graph
    where only some nodes are seeds; non-seeds get no restart mass and
    unreachable nodes stay at 0."""
    import pyarrow.compute as pc

    from the_yelp_collaborative_knowledge_graph_ray.functions.pagerank import (
        BASE,
        SCALE,
        pagerank,
    )
    edges = [("s_a", "x1"), ("x1", "x2"), ("x2", "s_a"), ("s_b", "x1"),
             ("y1", "y2")]  # y-island unreachable from any seed
    eds = ray.data.from_arrow(pa.table({
        "src": [u for u, _ in edges], "dst": [v for _, v in edges]}))
    got = {r["node"]: r["rank"]
           for r in pagerank(eds, iters=5,
                             seed_filter=lambda a: pc.starts_with(
                                 a, "s_")).take_all()}

    nodes = sorted({n for e in edges for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    out: dict[int, list[int]] = {}
    for u, v in edges:
        out.setdefault(idx[u], []).append(idx[v])
    seed = np.array([n.startswith("s_") for n in nodes])
    rank = np.where(seed, SCALE, 0).astype(np.int64)
    for _ in range(5):
        s = np.zeros(len(nodes), np.int64)
        for u, vs in out.items():
            for v in vs:
                s[v] += rank[u] // len(vs)
        rank = np.where(seed, BASE, 0) + 85 * (s // 100) \
            + (85 * (s % 100)) // 100
    exp = {n: int(rank[idx[n]]) for n in nodes}
    assert got == exp
    assert got["y2"] == 0 and got["s_a"] > 0 and got["x2"] > 0


def test_kcore_vs_sequential_peeling(ray_session):
    """Distributed k-core == sequential peeling on a random sparse graph
    (dense core + tree fringe), incl. the empty result above max core."""
    from the_yelp_collaborative_knowledge_graph_ray.functions.kcore import (
        kcore_edges,
    )
    rng = np.random.RandomState(8)
    core = [(f"c{i}", f"c{j}") for i in range(8) for j in range(i + 1, 8)]
    fringe = [(f"c{rng.randint(8)}", f"f{i}") for i in range(30)] \
        + [(f"f{i}", f"g{i}") for i in range(30)]
    edges = sorted({(min(u, v), max(u, v)) for u, v in core + fringe})

    def peel(k):
        import collections
        adj = collections.defaultdict(set)
        for u, v in edges:
            adj[u].add(v)
            adj[v].add(u)
        changed = True
        while changed:
            changed = False
            for n in [n for n, s in adj.items() if len(s) < k]:
                changed = True
                for m in adj[n]:
                    adj[m].discard(n)
                del adj[n]
        return sorted((u, v) for u in adj for v in adj[u] if u < v)

    eds = ray.data.from_arrow(pa.table({
        "u": [u for u, _ in edges], "v": [v for _, v in edges]}))
    for k in (2, 4, 9):
        got_ds, rounds = kcore_edges(eds, k=k)
        got = sorted((r["u"], r["v"]) for r in got_ds.take_all())
        assert got == peel(k), k
        assert rounds >= 1
    assert peel(9) == []          # above the max core -> empty, covered


def test_kwic_planted_positions(ray_session):
    """First-occurrence-only, 1-based positions, left/right clamped
    context — on docs planted at the string edges."""
    import pyarrow as pa
    import ray.data

    from the_yelp_collaborative_knowledge_graph_ray.stages.textstats import (
        kwic_concordance,
    )

    pad = "x" * 40
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": [
            "merge starts here " + pad,          # pos 1, no left context
            pad + " merge " + pad + " merge",    # first occurrence only
            pad + " ends with merge",            # right-truncated context
            "no hits at all",                    # dropped
        ]}))
    out = kwic_concordance(docs, terms=("merge",), width=24).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [1, 2, 3]
    assert out["pos"].tolist() == [1, 42, 52]
    assert out["ctx"][0] == ("merge starts here " + pad)[:5 + 24]
    # doc 2: 24 chars left of the FIRST merge + term + 24 right
    t2 = pad + " merge " + pad + " merge"
    assert out["ctx"][1] == t2[41 - 24:41 + 5 + 24]
    # doc 3: term at the very end -> right side clamps
    t3 = pad + " ends with merge"
    assert out["ctx"][2] == t3[51 - 24:]


def test_random_projection_matches_numpy_and_is_deterministic(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from the_yelp_collaborative_knowledge_graph_ray.stages.similarity import (
        random_projection,
        rp_sign_matrix,
    )

    rng = np.random.RandomState(3)
    vecs = rng.randn(20, 16).astype(np.float32) / 4
    emb = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(20, dtype=np.int64)),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32()))}))
    out = random_projection(emb, out_dim=4, seed=7).to_pandas() \
        .sort_values(["vec_id", "j"]).reset_index(drop=True)
    sm = rp_sign_matrix(16, 4, 7)
    want = np.floor(vecs.astype(np.float64) * 1e6).astype(np.int64) @ sm
    assert (out["proj_c"].to_numpy() == want.ravel()).all()
    # matrix is a pure function of (dims, seed)
    assert (rp_sign_matrix(16, 4, 7) == sm).all()
    assert not (rp_sign_matrix(16, 4, 8) == sm).all()
    # Rademacher balance sanity: both signs present
    assert (sm == 1).any() and (sm == -1).any()


def test_sorted_neighborhood_vs_brute_force(ray_session):
    """SNM window pairs == brute-force pairs over the global sort order,
    including pairs that straddle block boundaries (forced via
    repartition into many tiny blocks)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from the_yelp_collaborative_knowledge_graph_ray.stages.dedup import (
        SNM_KEY8,
        SNM_KEY_LEN,
        sorted_neighborhood_pairs,
    )

    rng = np.random.RandomState(11)
    words = ["alpha", "beta", "gamma", "delta", "epsi"]
    texts = [" ".join(rng.choice(words, size=rng.randint(2, 6)))
             for _ in range(40)]
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(40, dtype=np.int64)),
        "text": pa.array(texts)}))
    got = sorted_neighborhood_pairs(docs, window=2, num_partitions=13) \
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)

    keys = ["".join(t.lower().split())[:SNM_KEY_LEN] for t in texts]
    order = sorted(range(40), key=lambda i: (keys[i], i))
    want = []
    for i in range(40):
        for d in (1, 2):
            if i + d < 40:
                a, b = order[i], order[i + d]
                want.append((a, b, d,
                             int(keys[a][:SNM_KEY8] == keys[b][:SNM_KEY8])))
    want.sort()
    got_t = list(zip(got["doc_a"], got["doc_b"], got["dist"],
                     got["same_key8"]))
    assert got_t == want
