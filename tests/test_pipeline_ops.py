"""Training-data pipeline operators: dedup, similarity, text,
multimodal — known-answer tests on sf0.001 testdata + constructed
fixtures."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from json_schema_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_duplicates,
    dedup_keep_first,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from json_schema_spark.operators.multimodal import (
    frame_sample,
    image_features,
    synth_binary_column,
)
from json_schema_spark.operators.similarity import brute_force_topk, build_ivf, ivf_topk
from json_schema_spark.operators.text import (
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


# ------------------------------------------------------------------ dedup

def test_exact_duplicates(spark, docs):
    dup = docs.limit(3).select((F.col("doc_id") + 100000).alias("doc_id"),
                               "text", "lang", "source", "n_chars")
    with_dups = docs.unionByName(dup)
    groups = exact_duplicates(with_dups).collect()
    planted = [g for g in groups if g["group_size"] == 2 and g["canonical_id"] < 100000
               and g["member_ids"][1] == g["canonical_id"] + 100000]
    assert len(planted) == 3
    kept = dedup_keep_first(with_dups)
    assert kept.count() == with_dups.count() - len(groups)
    assert kept.filter(F.col("doc_id") >= 100000).count() == 0


def test_minhash_lsh_finds_near_dups(spark, docs):
    # near-duplicate: copy first 5 docs with a tiny suffix edit
    near = docs.limit(5).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat("text", F.lit(" xyzzy")).alias("text"),
    )
    pool = docs.select("doc_id", "text").unionByName(near)
    pairs = minhash_lsh_pairs(pool, threshold=0.8).collect()
    found = {(p["id_a"], p["id_b"]) for p in pairs}
    for i in range(5):
        expected = tuple(sorted([i, i + 100000]))
        assert expected in found, f"missing near-dup pair {expected}"
    for p in pairs:
        assert p["jaccard"] >= 0.8


def test_ngram_jaccard_exact(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different text with no overlap at all here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(df, shingle_n=3, threshold=0.1).collect()}
    # doc1 vs doc2: 7 word-3-grams each, 6 shared → J = 6/8
    assert (1, 2) in pairs
    assert abs(pairs[(1, 2)] - 6 / 8) < 1e-9
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_ngram_jaccard_prefix_filter_equality(spark):
    """AllPairs prefix filtering returns the IDENTICAL pair set and
    jaccard values as the plain inverted-index join — including on a
    corpus with a planted hot token shared by every doc (the case
    where the plain path's candidate join goes quadratic)."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(120):
        # every doc shares 'common common filler' grams; near-dup pairs
        # planted as (i, i+1000)
        uniq = " ".join(f"tok{i}_{j}" for j in range(rng.randint(4, 9)))
        rows.append((i, f"common common filler {uniq}"))
        if i % 7 == 0:
            rows.append((i + 1000, f"common common filler {uniq} extra"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    def run(pf):
        return {(r["id_a"], r["id_b"]): round(r["jaccard"], 9)
                for r in ngram_jaccard_pairs(
                    df, shingle_n=3, threshold=0.5, prefix_filter=pf).collect()}

    plain, pref = run(False), run(True)
    assert plain == pref
    assert any(b - a == 1000 for a, b in plain)  # planted dups found


def test_simhash_pairs(spark, docs):
    clones = docs.limit(4).select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    pool = docs.select("doc_id", "text").unionByName(clones)
    sigs = simhash(pool)
    # identical docs → identical simhash → hamming 0
    pairs = {(p["id_a"], p["id_b"]): p["hamming"] for p in simhash_pairs(sigs, 3).collect()}
    for i in range(4):
        assert pairs.get((i, i + 100000)) == 0
    # deterministic across invocations
    s1 = {r["id"]: r["simhash"] for r in sigs.collect()}
    s2 = {r["id"]: r["simhash"] for r in simhash(pool).collect()}
    assert s1 == s2


def test_embedding_neardup(spark, emb):
    near = emb.limit(3).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.001).alias("embedding"),
    )
    pool = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding")) \
        .unionByName(near.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding")))
    pairs = {(p["id_a"], p["id_b"]) for p in
             embedding_neardup_pairs(pool, threshold=0.999).collect()}
    for i in range(3):
        assert (i, i + 100000) in pairs


def test_embedding_banded_lsh_recall_vs_allpairs(spark, emb):
    """Banded LSH (8 bands × 12 planes = 8×4096 effective buckets) must
    recover ≥90% of true near-dup pairs at cosine ≥ 0.98: plant 50
    noise-perturbed twins, compare against the exact all-pairs truth.
    Expected recall at c≈0.99 is 1-(1-(1-θ/π)^12)^8 ≈ 0.999."""
    rng = np.random.default_rng(7)
    base = emb.limit(50).toPandas()
    rows = []
    for _, r in base.iterrows():
        v = np.asarray(r["embedding"], dtype=np.float64)
        noise = rng.normal(0.0, 0.02 * np.linalg.norm(v) / np.sqrt(len(v)), len(v))
        rows.append((int(r["vec_id"]) + 100000, (v + noise).tolist()))
    near = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    pool = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding")) \
        .unionByName(near)
    # exact all-pairs truth at tau=0.98 (numpy)
    pdf = pool.toPandas()
    ids = pdf["vec_id"].to_numpy()
    E = np.array(pdf["embedding"].tolist())
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    C = En @ En.T
    iu = np.triu_indices(len(ids), k=1)
    truth = {(int(min(ids[i], ids[j])), int(max(ids[i], ids[j])))
             for i, j in zip(*iu) if C[i, j] >= 0.98}
    assert len(truth) >= 40  # the planted twins are in the truth set
    got = {(p["id_a"], p["id_b"]) for p in
           embedding_neardup_pairs(pool, threshold=0.98).collect()}
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"banded LSH recall {recall:.3f} < 0.9"


# -------------------------------------------------------------- similarity

def test_brute_force_topk_matches_numpy(spark, emb):
    queries = emb.limit(8)
    got = brute_force_topk(emb, queries, k=5).collect()
    E = np.array(emb.orderBy("vec_id").select("embedding").toPandas()["embedding"].tolist())
    ids = emb.orderBy("vec_id").select("vec_id").toPandas()["vec_id"].to_numpy()
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["item_id"], r["cosine"]))
    for qid, rows in by_q.items():
        qv = En[np.where(ids == qid)[0][0]]
        sims = En @ qv
        order = np.lexsort((ids, -sims))[:5]
        expect = [int(ids[i]) for i in order]
        rows.sort()
        assert [r[1] for r in rows] == expect, f"query {qid}"
        assert rows[0][1] == qid  # self-match first
        np.testing.assert_allclose(rows[0][2], 1.0, atol=1e-9)


def test_ivf_recall(spark, emb):
    corpus = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    assigned, cents = build_ivf(corpus, n_centroids=8)
    queries = corpus.limit(10)
    exact = brute_force_topk(corpus, queries, k=10).collect()
    approx = ivf_topk(assigned, cents, queries, k=10, n_probe=3).collect()
    e_by_q, a_by_q = {}, {}
    for r in exact:
        e_by_q.setdefault(r["query_id"], set()).add(r["item_id"])
    for r in approx:
        a_by_q.setdefault(r["query_id"], set()).add(r["item_id"])
    recalls = [len(e_by_q[q] & a_by_q.get(q, set())) / 10 for q in e_by_q]
    assert sum(recalls) / len(recalls) >= 0.5, recalls
    for q in a_by_q:  # self-match must survive probing
        assert q in a_by_q[q]


def test_ivf_udf_path_agrees_with_unroll(spark, emb):
    """Above max_unroll_terms the assignment switches to the
    Arrow-batched gemm+argmax UDF; on the same (small) shape both paths
    must produce near-identical assignments (numpy pairwise summation
    vs left-assoc doubles can differ in the last ulp, so allow 1%)."""
    corpus = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    a_unroll, _ = build_ivf(corpus, n_centroids=8, iters=2)
    a_udf, _ = build_ivf(corpus, n_centroids=8, iters=2, max_unroll_terms=0)
    u = {r["item_id"]: r["centroid_id"] for r in a_unroll.collect()}
    v = {r["item_id"]: r["centroid_id"] for r in a_udf.collect()}
    assert set(u) == set(v)
    agree = sum(u[k] == v[k] for k in u) / len(u)
    assert agree >= 0.99, f"only {agree:.3f} assignment agreement"


def test_ivf_large_shape_builds_no_corpus_exchange(spark):
    """Real-IVF shape (n_centroids=1024, dim=512 → 524k terms, far past
    any sane SQL unroll): the build must complete and the assignment
    plan must stay Exchange-free (one Arrow projection)."""
    import numpy as np

    rng = np.random.default_rng(11)
    rows = [(int(i), rng.standard_normal(512).tolist()) for i in range(300)]
    corpus = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    assigned, cents = build_ivf(corpus, n_centroids=1024, iters=1)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan  # the gemm+argmax projection
    n = assigned.count()
    assert n == 300
    assert cents.count() <= 1024


# -------------------------------------------------------------------- text

def test_token_counts(spark):
    df = spark.createDataFrame(
        [(1, "hello world  foo"), (2, ""), (3, "internationalization, yes!")],
        ["id", "text"],
    )
    got = {r["id"]: (r["wc"], r["bc"]) for r in df.select(
        "id", token_count(F.col("text")).alias("wc"),
        bpe_ish_token_count(F.col("text")).alias("bc")).collect()}
    assert got[1][0] == 3
    assert got[2][0] == 0
    # "internationalization" (20 chars → 5 units) + "," + "yes" (1) + "!" = 8
    assert got[3][1] == 8


def test_quality_and_langid(spark):
    rows = [
        (1, "The cat sat on the mat and it was a good day for the cats."),
        (2, "xx yy zz 11 22 33 !!! ??? ### $$$ %%%"),
        (3, "der Hund ist nicht auf der Straße und das ist gut für die Katze"),
        (4, "el perro es grande y no es una casa con los gatos por la noche"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    q = {r["id"]: r["quality_score"] for r in quality_score(df).collect()}
    assert q[1] > q[2]
    l = {r["id"]: r["lang_pred"] for r in lang_id(df).collect()}
    assert l[1] == "en" and l[3] == "de" and l[4] == "es"


def test_fingerprint(spark, docs):
    fp = fingerprint(docs.limit(20))
    rows = fp.collect()
    assert len({r["fp_sha256"] for r in rows}) == 20  # all distinct docs
    # normalization-invariance: case/whitespace changes keep both fingerprints
    df = docs.limit(5).select("doc_id", F.upper(F.col("text")).alias("text"))
    fp2 = {r["doc_id"]: r for r in fingerprint(df).collect()}
    fp1 = {r["doc_id"]: r for r in rows if r["doc_id"] < 5}
    for i in fp1:
        assert fp1[i]["fp_sha256"] == fp2[i]["fp_sha256"]
        assert fp1[i]["fp_rolling64"] == fp2[i]["fp_rolling64"]


# -------------------------------------------------------------- multimodal

def test_multimodal_plumbing(spark):
    base = spark.range(0, 50).select(F.col("id").alias("row_id"))
    imgs = synth_binary_column(base)
    feats = image_features(imgs, decode="fake").collect()
    assert len(feats) == 50
    assert all(r["width"] == 32 and r["n_bytes"] > 0 for r in feats)
    f2 = {r["id"]: r["phash"] for r in image_features(imgs, decode="fake").collect()}
    assert all(f2[r["id"]] == r["phash"] for r in feats)  # deterministic
    frames = frame_sample(imgs, every_n=10)
    assert frames.count() > 0
    with pytest.raises(Exception):  # real decode is a declared stub
        image_features(imgs, decode="real").collect()


def test_audio_features_real_wav_decode(spark):
    """decode='real' decodes genuine 16-bit PCM WAV bytes (pure-numpy
    RIFF walk, no codec library) — features match a local numpy ground
    truth exactly; non-WAV bytes raise at the codec integration point."""
    from json_schema_spark.operators.multimodal import (
        _decode_wav_pcm16, audio_features, synth_wav_bytes)

    rows = [(i, bytearray(synth_wav_bytes(i, n_samples=4000 + 100 * i)))
            for i in range(5)]
    df = spark.createDataFrame(rows, "id long, data binary")
    got = {r["id"]: r for r in audio_features(df, decode="real").collect()}
    for i, data in rows:
        x, rate = _decode_wav_pcm16(bytes(data))
        r = got[i]
        assert r["sample_rate"] == 8000
        assert r["n_samples"] == len(x) == 4000 + 100 * i
        np.testing.assert_allclose(r["rms"], np.sqrt((x * x).mean()), rtol=1e-9)
        np.testing.assert_allclose(r["peak"], np.abs(x).max(), rtol=1e-9)
        assert 0.02 < r["zero_cross_rate"] < 0.5  # ~440 Hz tone at 8 kHz
    # fake mode: deterministic plumbing for arbitrary bytes
    junk = spark.createDataFrame([(9, bytearray(b"not-audio"))], "id long, data binary")
    fk = audio_features(junk, decode="fake").collect()[0]
    assert fk["sample_rate"] == 8000 and fk["n_samples"] == 4096
    with pytest.raises(Exception):  # non-WAV in real mode = declared stub
        audio_features(junk, decode="real").collect()


def test_video_features_real_y4m_decode(spark):
    """decode='real' decodes genuine YUV4MPEG2 bytes (pure-numpy
    header + FRAME walk) — sampled-frame luma stats match a local
    numpy ground truth exactly; non-Y4M bytes raise at the codec
    integration point."""
    from json_schema_spark.operators.multimodal import (
        _decode_y4m, frame_sample, synth_y4m_bytes, video_features)

    rows = [(i, bytearray(synth_y4m_bytes(i, n_frames=7 + 3 * i)))
            for i in range(4)]
    df = spark.createDataFrame(rows, "id long, data binary")
    got = {}
    for r in video_features(df, every_n=3, decode="real").collect():
        got.setdefault(r["id"], []).append(r)
    for i, data in rows:
        w, h, frames = _decode_y4m(bytes(data))
        assert (w, h, len(frames)) == (16, 8, 7 + 3 * i)
        recs = sorted(got[i], key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in recs] == list(range(0, len(frames), 3))
        for r in recs:
            y = frames[r["frame_idx"]].astype(np.float64)
            assert (r["width"], r["height"]) == (16, 8)
            np.testing.assert_allclose(r["mean_y"], y.mean(), rtol=1e-12)
            np.testing.assert_allclose(r["std_y"], y.std(), rtol=1e-12)
    # frame_sample real mode agrees on the sampled index set
    fs = frame_sample(df, every_n=3, decode="real").collect()
    assert {(r["id"], r["frame_idx"]) for r in fs} == {
        (r["id"], r["frame_idx"]) for rs in got.values() for r in rs}
    junk = spark.createDataFrame([(9, bytearray(b"mp4?nope"))], "id long, data binary")
    with pytest.raises(Exception):  # compressed codecs = declared stub
        video_features(junk, decode="real").collect()


def test_y4m_decoder_edge_cases():
    """Pure-unit: 4:4:4 colorspace, FRAME params, truncated payload,
    bad markers and unsupported colorspaces raise ValueError."""
    from json_schema_spark.operators.multimodal import _decode_y4m

    y = bytes(range(16)) * 4  # 8x8 luma
    c444 = (b"YUV4MPEG2 W8 H8 F30:1 C444\n"
            + b"FRAME Xsome-param\n" + y + y + y)
    w, h, frames = _decode_y4m(c444)
    assert (w, h, len(frames)) == (8, 8, 1)
    assert frames[0].tobytes() == y
    trunc = b"YUV4MPEG2 W8 H8\nFRAME\n" + b"\x00" * 10
    for bad in (trunc, b"YUV4MPEG2 H8\nFRAME\n", b"YUV4MPEG2 W8 H8\nNOTAFRAME\n",
                b"YUV4MPEG2 W8 H8 Cmono\nFRAME\n" + b"\x00" * 64):
        with pytest.raises(ValueError):
            _decode_y4m(bad)


def test_wav_decoder_edge_cases():
    """Pure-unit coverage of the RIFF walk: stereo downmix, odd-sized
    chunks pad to even offsets, unknown chunks are skipped, and
    malformed/non-PCM inputs raise ValueError."""
    from json_schema_spark.operators.multimodal import _decode_wav_pcm16

    def wav(pcm: bytes, n_ch=1, rate=8000, extra_chunks=b"", fmt_code=1, bps=16):
        fmt = (fmt_code.to_bytes(2, "little") + n_ch.to_bytes(2, "little")
               + rate.to_bytes(4, "little")
               + (rate * 2 * n_ch).to_bytes(4, "little")
               + (2 * n_ch).to_bytes(2, "little") + bps.to_bytes(2, "little"))
        body = (b"fmt " + len(fmt).to_bytes(4, "little") + fmt + extra_chunks
                + b"data" + len(pcm).to_bytes(4, "little") + pcm)
        return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body

    # stereo: L=+16384, R=-16384 per frame → mono mean exactly 0
    frame = (16384).to_bytes(2, "little", signed=True) + (-16384).to_bytes(2, "little", signed=True)
    x, rate = _decode_wav_pcm16(wav(frame * 10, n_ch=2))
    assert rate == 8000 and len(x) == 10 and np.all(x == 0.0)
    # odd-sized unknown chunk before data: walk must pad to even offset
    odd = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"
    x, _ = _decode_wav_pcm16(wav((1000).to_bytes(2, "little", signed=True) * 4,
                                 extra_chunks=odd))
    assert len(x) == 4 and np.allclose(x, 1000 / 32768.0)
    for bad in (b"", b"RIFF\x00\x00\x00\x00WAVE", wav(b"\x00\x00", fmt_code=3),
                wav(b"\x00\x00", bps=8), b"not audio at all" * 4):
        with pytest.raises(ValueError):
            _decode_wav_pcm16(bad)


def test_multimodal_real_bmp_decode(spark):
    """decode='real' decodes genuine uncompressed 24-bit BMP bytes
    (pure-numpy decoder, no codec library) — features match a local
    numpy ground truth exactly."""
    import numpy as np

    def encode_bmp(px_rgb: "np.ndarray") -> bytes:
        h, w, _ = px_rgb.shape
        row = (w * 3 + 3) & ~3
        body = bytearray()
        for y in range(h - 1, -1, -1):  # bottom-up
            line = bytearray()
            for x in range(w):
                r, g, b = px_rgb[y, x]
                line += bytes((int(b), int(g), int(r)))  # BGR on disk
            line += b"\x00" * (row - len(line))
            body += line
        off = 54
        size = off + len(body)
        hdr = b"BM" + size.to_bytes(4, "little") + b"\x00\x00\x00\x00" + off.to_bytes(4, "little")
        info = (40).to_bytes(4, "little") + w.to_bytes(4, "little", signed=True) \
            + h.to_bytes(4, "little", signed=True) + (1).to_bytes(2, "little") \
            + (24).to_bytes(2, "little") + (0).to_bytes(4, "little") \
            + len(body).to_bytes(4, "little") + b"\x00" * 16
        return bytes(hdr + info + body)

    rng = np.random.RandomState(7)
    rows, truth = [], {}
    for i, (w, h) in enumerate([(16, 16), (16, 16), (24, 8)]):
        px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        rows.append((i, "image", bytearray(encode_bmp(px)),
                     {"width": w, "height": h, "format": "bmp"}))
        luma = (0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]).astype(np.float64)
        truth[i] = (w, h, float(luma.mean()))
    df = spark.createDataFrame(
        rows, "id long, modality string, data binary, "
              "meta struct<width:int, height:int, format:string>")
    feats = {r["id"]: r for r in image_features(df, decode="real").collect()}
    assert set(feats) == set(truth)
    for i, (w, h, mean) in truth.items():
        assert feats[i]["width"] == w and feats[i]["height"] == h
        assert abs(feats[i]["mean_luma"] - mean) < 1e-9
        assert feats[i]["n_bytes"] > 54


def test_ivf_null_and_degenerate_inputs(spark):
    """A NULL embedding must assign a NULL centroid on BOTH assignment
    paths (the unrolled greatest() would otherwise tie on NULL dots and
    pick an arbitrary centroid via the nid tie-break; the gemm UDF
    would die on a ragged np.array), and an all-zero corpus — no
    electable centroid — must assign NULL everywhere instead of
    crashing the norm / indexing an empty struct list."""
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 2.0]), (2, None), (3, [0.5, 0.5])],
        "vec_id long, embedding array<double>")
    for unroll_limit in (4096, 1):
        a, _ = build_ivf(df, n_centroids=2, iters=2, max_unroll_terms=unroll_limit)
        got = {r["item_id"]: r["centroid_id"] for r in a.collect()}
        assert got[2] is None, (unroll_limit, got)
        assert all(got[i] is not None for i in (0, 1, 3)), (unroll_limit, got)

    zeros = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [0.0, 0.0])], "vec_id long, embedding array<double>")
    for unroll_limit in (4096, 1):
        a, _ = build_ivf(zeros, n_centroids=2, iters=2, max_unroll_terms=unroll_limit)
        assert [r["centroid_id"] for r in a.collect()] == [None, None]


def test_candidate_persist_is_bounded_not_leaked(spark, docs):
    """Gated-mode LSH verify persists its candidate set; the per-call-site
    cache keeps the last ``_PERSIST_SLOTS`` plans (so interleaved
    invocations over different inputs don't evict each other before the
    verify join consumes them — round-3 ADVICE) and releases the oldest
    beyond that bound instead of accumulating for the session's
    lifetime."""
    from json_schema_spark.operators import dedup as D

    def cached_rdd_ids():
        sc = spark.sparkContext
        return {info.id() for info in sc._jsc.sc().getRDDStorageInfo()}

    D._LAST_PERSISTED.clear()
    docs.count()  # materialize the fixture's own cache BEFORE the baseline
    before = cached_rdd_ids()
    # DIFFERENT inputs → distinct cache entries (same input would dedupe
    # in the CacheManager and mask a leak)
    first = D.minhash_lsh_pairs(docs.limit(100), max_broadcast_pairs=10_000)
    first.count()
    first_ids = cached_rdd_ids() - before
    assert first_ids, "gated mode should persist the candidate set"
    # a second, different invocation must NOT evict the first (interleaved
    # consumers), only grow the slot
    second = D.minhash_lsh_pairs(docs.limit(120), max_broadcast_pairs=10_000)
    second.count()
    after_second = cached_rdd_ids() - before
    assert first_ids <= after_second, \
        "earlier call's cache was evicted while within the slot bound"
    # warm re-run of an identical plan reuses the existing entry
    slot = next(iter(D._LAST_PERSISTED.values()))
    n_entries = len(slot)
    again = D.minhash_lsh_pairs(docs.limit(120), max_broadcast_pairs=10_000)
    again.count()
    assert len(slot) == n_entries, "identical plan should reuse its slot entry"
    # past the bound the OLDEST entry is released
    for i in range(D._PERSIST_SLOTS):
        D.minhash_lsh_pairs(docs.limit(130 + i), max_broadcast_pairs=10_000).count()
    final_ids = cached_rdd_ids() - before
    assert not (first_ids & final_ids), "oldest cache entry was never released"
    assert all(len(s) <= D._PERSIST_SLOTS for s in D._LAST_PERSISTED.values())
