"""Behavioral tests for the training-data operators that have no SQL
oracle (hash-function-specific): planted near-duplicates must be found,
and estimates must track exact values."""

import pytest
from pyspark.sql import functions as F

from table_computing_spark.operators import dedup, multimodal, similarity


@pytest.fixture(scope="module")
def docs(spark):
    """Corpus with planted duplicate structure:
    1/2: identical modulo whitespace/case → exact dups
    3/4: one word changed in 30 → high jaccard near-dups
    5/6: unrelated texts."""
    base = " ".join(f"word{i}" for i in range(30))
    near = " ".join(f"word{i}" if i != 7 else "CHANGED" for i in range(30))
    rows = [
        (1, base),
        (2, "  " + base.upper().replace(" ", "   ") + " "),
        (3, base),
        (4, near),
        (5, " ".join(f"alpha{i}" for i in range(40))),
        (6, " ".join(f"beta{i}" for i in range(25))),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_finds_planted(docs):
    out = {r["doc_id"]: r for r in dedup.exact(docs).collect()}
    # 1, 2, 3 normalize identically → one group, canonical = min id = 1
    assert out[1]["group_size"] == 3
    assert out[2]["canonical_id"] == 1 and out[2]["is_canonical"] == 0
    assert out[1]["is_canonical"] == 1
    assert out[5]["group_size"] == 1


def test_minhash_lsh_finds_near_dup(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in dedup.minhash_lsh(
            docs, num_hashes=64, bands=16, jaccard_threshold=0.5
        ).collect()
    }
    # identical docs estimate 1.0
    assert pairs[(1, 3)] == 1.0
    # 3 vs 4: 1 word of 30 changed → shingle jaccard ~ (28-3+1-3)/(28+3+...) high
    assert (3, 4) in pairs and pairs[(3, 4)] > 0.5
    # unrelated docs never pair
    assert not any(5 in p or 6 in p for p in pairs)


def test_minhash_estimate_tracks_exact_jaccard(docs):
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.0).collect()
    }
    est = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in dedup.minhash_lsh(
            docs, num_hashes=128, bands=32, jaccard_threshold=0.0
        ).collect()
    }
    # token-level jaccard of (3,4): 29 shared / 31 union ≈ 0.935; the
    # minhash estimate is over 3-shingles (lower) — just require the
    # estimator to be within 0.25 of the shingle-exactness proxy
    assert abs(est[(1, 3)] - 1.0) < 1e-9
    assert exact[(3, 4)] > 0.9 and est[(3, 4)] > 0.6


def test_simhash_pairs_planted(docs):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             dedup.simhash_pairs(docs, max_hamming=10).collect()}
    assert pairs[(1, 3)] == 0  # identical text → identical fingerprint
    assert (3, 4) in pairs and pairs[(3, 4)] <= 10
    assert (5, 6) not in pairs


def test_lsh_topk_same_bucket_correctness(spark):
    """sign-LSH top-k guarantees: (a) every result shares the query's
    bucket, (b) within a bucket the ranking equals brute force. (On
    isotropic random embeddings recall vs global brute force is ~2^-bits
    by construction, so recall is NOT asserted here — the operator's
    value shows on clustered corpora.)"""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    approx = similarity.lsh_topk(emb, queries, k=5, bits=4).collect()
    assert approx
    buckets = {
        r["vec_id"]: r["b"]
        for r in emb.select("vec_id", similarity.sign_bucket(F.col("embedding"), 4).alias("b")).collect()
    }
    assert all(buckets[r["query_id"]] == buckets[r["neighbor_id"]] for r in approx)
    # within-bucket ranking matches brute force restricted to the bucket
    q0 = approx[0]["query_id"]
    bucket_members = [v for v, b in buckets.items() if b == buckets[q0]]
    restricted = similarity.cosine_topk(
        emb.filter(F.col("vec_id").isin(bucket_members)),
        emb.filter(F.col("vec_id") == q0),
        k=5,
    ).collect()
    want = [(r["neighbor_id"], r["rank"]) for r in restricted]
    got = [(r["neighbor_id"], r["rank"]) for r in approx if r["query_id"] == q0]
    assert sorted(got) == sorted(want)


def test_lsh_auto_bits_and_ivf_auto_nlist(spark):
    """bits="auto" resolves to log2(N / target_bucket) clamped to the
    embedding dim; n_centroids="auto" to ~sqrt(N). Both must produce
    the same result as passing the resolved value explicitly — the
    auto rule only picks the parameter, it never changes semantics."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    n = emb.count()
    dim = len(emb.first()["embedding"])
    import math as _math

    want_bits = max(4, min(dim, _math.ceil(_math.log2(max(n / 8, 2)))))
    auto = similarity.lsh_topk(emb, queries, k=3, bits="auto", target_bucket=8)
    explicit = similarity.lsh_topk(emb, queries, k=3, bits=want_bits)
    assert sorted(map(tuple, auto.collect())) == sorted(map(tuple, explicit.collect()))

    from table_computing_spark.operators import similarity as sim

    want_nlist = max(16, int(round(_math.sqrt(n))))
    a = sim.ivf_topk(emb, queries, k=3, n_centroids="auto", n_probe=2, iters=1)
    e = sim.ivf_topk(emb, queries, k=3, n_centroids=want_nlist, n_probe=2, iters=1)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, e.collect()))


def test_lsh_multiprobe_improves_recall(spark):
    """Multi-probe LSH: (a) every candidate is within Hamming 1 of the
    query bucket, (b) per-query recall@5 vs brute force is >= the
    single-bucket recall (the probe set is a strict superset), (c)
    strictly more (query, neighbor) results overall on this corpus."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    single = similarity.lsh_topk(emb, queries, k=5, bits=4).collect()
    multi = similarity.lsh_topk(emb, queries, k=5, bits=4, multiprobe=4).collect()
    buckets = {
        r["vec_id"]: r["b"]
        for r in emb.select(
            "vec_id", similarity.sign_bucket(F.col("embedding"), 4).alias("b")
        ).collect()
    }
    assert all(
        bin(buckets[r["query_id"]] ^ buckets[r["neighbor_id"]]).count("1") <= 1
        for r in multi
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(emb, queries, k=5).collect()
    }
    rec_single = len({(r["query_id"], r["neighbor_id"]) for r in single} & exact)
    rec_multi = len({(r["query_id"], r["neighbor_id"]) for r in multi} & exact)
    assert rec_multi >= rec_single
    # superset candidate pool → at every (query, rank) the multiprobe
    # similarity dominates the single-bucket one, strictly somewhere
    s_at = {(r["query_id"], r["rank"]): r["cos_sim"] for r in single}
    m_at = {(r["query_id"], r["rank"]): r["cos_sim"] for r in multi}
    assert all(m_at[k] >= s for k, s in s_at.items())
    assert any(m_at[k] > s for k, s in s_at.items())


def test_multimodal_feature_plumbing(spark):
    media = multimodal.make_demo_media(spark, 64)
    out = multimodal.extract_features(media).collect()
    assert len(out) == 64
    by_id = {r["media_id"]: r for r in out}
    # image/audio with content decode to 8 floats
    ok = [r for r in out if r["decode_ok"]]
    assert all(len(r["feature"]) == 8 for r in ok)
    assert all(0.0 <= v <= 1.0 for r in ok for v in r["feature"])
    # null content → decode_ok false, n_bytes null
    nulls = [r for r in out if r["n_bytes"] is None]
    assert nulls and all(not r["decode_ok"] for r in nulls)
    # video modality is stubbed NotImplemented → decode_ok False
    vids = [r for r in out if r["modality"] == "video" and r["n_bytes"] is not None]
    assert vids and all(not r["decode_ok"] for r in vids)
    # determinism: first image feature reproducible
    img0 = by_id[0]
    assert img0["modality"] == "image" and img0["decode_ok"]

def test_ivf_full_probe_equals_brute_force(spark):
    """IVF with n_probe == n_centroids scans every inverted list →
    must reproduce exact brute-force top-k (machinery correctness);
    a shallow probe must stay a subset-ranked result."""
    from table_computing_spark.operators import similarity as sim
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    exact = sim.cosine_topk(emb, queries, k=5)
    ivf_all = sim.ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=8, iters=2)
    key = lambda df: {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim) for r in df.collect()
    }
    assert key(ivf_all) == key(exact)

    ivf_shallow = sim.ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=2, iters=2)
    got = key(ivf_shallow)
    exact_k = key(exact)
    # shallow probe: every returned neighbor's similarity is <= the
    # exact best at that rank, and recall@5 is nontrivial
    hits = sum(
        1 for qk, v in got.items() if qk in exact_k and v[0] == exact_k[qk][0]
    )
    assert hits / max(len(exact_k), 1) > 0.3


def test_salted_join_equals_plain_join(spark):
    """Salting must not change join semantics (inner and left, with
    unmatched left rows surviving)."""
    from table_computing_spark.operators.skew import salted_join

    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d")] * 50, "k int, v string"
    )
    right = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, w double")

    for how in ("inner", "left"):
        plain = left.join(right, "k", how)
        salted = salted_join(left, right, on=["k"], how=how, salt=8)
        assert sorted(map(tuple, salted.collect())) == sorted(
            map(tuple, plain.collect())
        ), how


def test_multimodal_resize_and_frame_sampling(spark):
    """Resize stub surfaces resize_ok=false without corrupting rows;
    frame sampling fans one video row out to N frame rows."""
    media = multimodal.make_demo_media(spark, 30)
    resized = multimodal.resize_images(media, 32, 32).collect()
    assert len(resized) == 30
    assert all(not r["resize_ok"] for r in resized)  # stub: no codec
    frames = multimodal.sample_frames(media, every_n=2, max_frames=2).collect()
    videos_with_content = [
        r for r in media.collect() if r["modality"] == "video" and r["content"]
    ]
    assert len(frames) == 2 * len(videos_with_content)
    assert all(len(r["frame"]) == 4 for r in frames)


def test_deterministic_sampling_properties(spark):
    """Hash-keyed sampling: stable across repartitioning, fraction
    within tolerance, split is a partition of the corpus."""
    from pyspark.sql import functions as F
    from table_computing_spark.operators.sampling import (
        deterministic_sample,
        train_test_split,
    )

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    s1 = {r["doc_id"] for r in deterministic_sample(d, "doc_id", 0.25).select("doc_id").collect()}
    s2 = {
        r["doc_id"]
        for r in deterministic_sample(d.repartition(17), "doc_id", 0.25)
        .select("doc_id").collect()
    }
    assert s1 == s2  # layout-independent
    n = d.count()
    assert abs(len(s1) / n - 0.25) < 0.05

    split = train_test_split(d, "doc_id", test_fraction=0.125)
    counts = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["test"] + counts["train"] == n
    assert abs(counts["test"] / n - 0.125) < 0.04
    # full-fraction edge: threshold 'g' keeps everything
    assert deterministic_sample(d, "doc_id", 1.0).count() == n


def test_heavy_hitters_exact_under_mg_pruning(spark):
    """Skewed keys + tiny MG capacity: the per-partition summaries must
    prune (distinct >> capacity) yet heavy_hitters stays EXACT — the
    Misra-Gries superset guarantee means no true heavy hitter is lost
    at the candidate stage."""
    from collections import Counter

    from table_computing_spark.operators import frequency

    # key i in 0..19 appears (i+1)^2 times (skew), plus 3000 singletons
    rows = [(f"k{i}",) for i in range(20) for _ in range((i + 1) ** 2)]
    rows += [(f"tail{j}",) for j in range(3000)]
    df = spark.createDataFrame(rows, "key string").repartition(8)

    cap = 8
    summaries = frequency.misra_gries_summaries(df, "key", capacity=cap)
    per_part = (
        summaries.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert all(r["n"] <= cap for r in per_part)
    assert summaries.count() < df.count()  # pruning actually happened

    k = 24
    got = {r["key"]: r["cnt"] for r in frequency.heavy_hitters(df, "key", k=k, capacity=cap * 3).collect()}
    exact = Counter(r[0] for r in rows)
    n = len(rows)
    want = {key: c for key, c in exact.items() if c * k > n}
    assert got == want and want  # non-trivial and exact


def test_heavy_hitters_rejects_capacity_below_k(spark):
    import pytest as _pytest

    from table_computing_spark.operators import frequency

    df = spark.createDataFrame([("a",)], "key string")
    with _pytest.raises(ValueError):
        frequency.heavy_hitters(df, "key", k=16, capacity=8)


def test_connected_components_chain_clique_singleton(spark):
    """Chain (worst case for plain label propagation), clique, isolated
    pair, and a document with no pairs — large-star/small-star must
    label each with its component minimum within the iteration cap."""
    from table_computing_spark.operators.graph import connected_components, dedup_groups

    edges = [(i, i + 1) for i in range(19)]
    edges += [(a, b) for a in range(100, 105) for b in range(a + 1, 105)]
    edges += [(200, 201)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")

    cc = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert all(cc[i] == 0 for i in range(20))
    assert all(cc[i] == 100 for i in range(100, 105))
    assert cc[200] == 200 and cc[201] == 200

    docs = spark.createDataFrame([(i,) for i in [*range(20), 300]], "doc_id long")
    g = {
        r["doc_id"]: (r["canonical_id"], r["group_size"])
        for r in dedup_groups(docs, pairs).collect()
    }
    assert g[300] == (300, 1)  # pairless doc → singleton group
    assert g[5] == (0, 20)


# moment_stats repartition-invariance now lives in
# tests/test_invariance.py (the shared parametrized harness)


def test_pack_sequences_invariants(spark):
    """Budget respected (oversized items alone in a bin), every item
    placed exactly once, and the packing is identical under any input
    partitioning."""
    from table_computing_spark.operators.text import pack_sequences

    rows = [(i, w) for i, w in enumerate([100, 400, 50, 700, 512, 1, 511, 300, 299, 2])]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_sequences(df, budget=512, shards=2).collect()
    assert sorted(r["doc_id"] for r in out) == [r[0] for r in rows]
    from collections import defaultdict
    fills = defaultdict(int)
    for r in out:
        fills[(r["shard"], r["bin"])] += r["n_tokens"]
    for (s, b), tot in fills.items():
        members = [r for r in out if (r["shard"], r["bin"]) == (s, b)]
        assert tot <= 512 or len(members) == 1  # oversized → alone
    a = {(r["doc_id"], r["shard"], r["bin"]) for r in out}
    b = {
        (r["doc_id"], r["shard"], r["bin"])
        for r in pack_sequences(df.repartition(7), budget=512, shards=2).collect()
    }
    assert a == b


def test_prefix_filtered_jaccard_equals_plain(spark):
    """PPJoin-style prefix filtering is an exact optimization: same pair
    set as the plain inverted-index join at any threshold (the prefix
    bound only discards pairs that cannot reach t)."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    for t in (0.8, 0.5):
        base = dedup.ngram_jaccard_pairs(docs, threshold=t).select("id_a", "id_b")
        pf = dedup.ngram_jaccard_pairs(docs, threshold=t, prefix_filter=True).select(
            "id_a", "id_b"
        )
        assert base.exceptAll(pf).count() == 0
        assert pf.exceptAll(base).count() == 0


def test_corpus_invariants_behind_lsh_and_simhash_oracles(spark):
    """The q_minhash_lsh and q_simhash_pairs DRIVER oracles are
    data-dependent (ADVICE r04): 16-band/4-row banding misses a j=0.5
    pair ~35% of the time, and the simhash gate passes on recall margin.
    Pin the corpus properties those oracles rely on, so a testdata
    regeneration fails HERE (loudly, with the reason) instead of as an
    unexplained red in the driver gate.

    Invariant 1: every true 3-shingle-Jaccard >= 0.5 pair sits at
      j >= 0.8 — outside the banding miss zone (per-pair miss <= 2e-4).
    Invariant 2: banded candidates actually cover the full truth set
      (recall == 1 — what makes the exact value-hash oracle satisfiable).
    Invariant 3: simhash Hamming<=7 multi-probe recall over the truth
      set clears the oracle's 0.9 bar with margin (>= 0.95 here)."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

    truth = dedup.shingle_jaccard_pairs(docs, threshold=0.5)
    truth_rows = truth.select("id_a", "id_b", "jaccard").collect()
    assert truth_rows, "regeneration removed all planted near-dups"

    min_j = min(r["jaccard"] for r in truth_rows)
    assert min_j >= 0.8, (
        f"corpus now has a true pair at j={min_j:.3f} inside the "
        "16x4-banding miss zone [0.5, 0.8) — the q_minhash_lsh exact "
        "value-hash oracle is no longer probabilistically safe"
    )

    truth_set = {(r["id_a"], r["id_b"]) for r in truth_rows}
    cand = dedup.minhash_lsh_candidates(docs, num_hashes=64, bands=16)
    cand_set = {(r["id_a"], r["id_b"]) for r in cand.select("id_a", "id_b").collect()}
    missed = truth_set - cand_set
    assert not missed, f"banding missed true pairs {sorted(missed)[:5]} — oracle red incoming"

    sim_cand = dedup.simhash_pairs(docs, max_hamming=7)
    sim_set = {(r["id_a"], r["id_b"]) for r in sim_cand.select("id_a", "id_b").collect()}
    recall = len(truth_set & sim_set) / len(truth_set)
    assert recall >= 0.95, (
        f"simhash recall {recall:.3f} is inside the margin band — the "
        "q_simhash_pairs gate (bar 0.9) is one regeneration from red"
    )


def test_codec_roundtrips():
    """Pure-numpy codecs: encode→decode is the identity for PPM, BMP
    (incl. odd width → 4-byte row padding, bottom-up storage), and WAV
    PCM16 (RIFF chunk walk)."""
    import numpy as np

    rng = np.random.default_rng(7)
    for w, h in [(8, 6), (5, 4), (1, 1), (7, 3)]:
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (multimodal.decode_image(multimodal.encode_ppm(arr)) == arr).all()
        assert (multimodal.decode_image(multimodal.encode_bmp24(arr)) == arr).all()

    samples = (rng.integers(-32768, 32768, size=64)).astype(np.int16)
    decoded, rate = multimodal.decode_audio(
        multimodal.encode_wav_pcm16(samples, 8000)
    )
    assert rate == 8000 and decoded.shape == (64, 1)
    assert np.allclose(decoded[:, 0], samples / 32768.0)

    # PPM comments in header + unsupported formats raise (not crash)
    ppm = multimodal.encode_ppm(np.zeros((2, 2, 3), dtype=np.uint8))
    commented = b"P6\n# a comment\n2 2\n255\n" + ppm.split(b"255\n", 1)[1]
    assert multimodal.decode_image(commented).shape == (2, 2, 3)
    if multimodal._optional_pil() is None:
        # no optional codec installed: the honest decode_ok=false path
        with pytest.raises(NotImplementedError):
            multimodal.decode_image(b"\x89PNG\r\n\x1a\n....")
    if multimodal._optional_soundfile() is None:
        with pytest.raises(NotImplementedError):
            multimodal.decode_audio(b"ID3\x04rubbish")


@pytest.mark.skipif(
    "table_computing_spark.operators.multimodal" and
    __import__("importlib").util.find_spec("PIL") is None,
    reason="optional-codec dispatch test needs PIL installed "
    "(env waiver, same class as the Kafka broker gate)",
)
def test_pil_dispatch_decodes_what_builtins_reject():
    """Where PIL exists, formats the pure-python codecs reject (here: a
    GIF) must decode through the dispatch to the same (h, w, 3) uint8
    contract — and the built-in formats must still take the built-in
    path byte-identically."""
    import io

    import numpy as np
    from PIL import Image

    arr = np.zeros((4, 5, 3), dtype=np.uint8)
    arr[..., 0] = 200
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="GIF")
    got = multimodal.decode_image(buf.getvalue())
    assert got.shape == (4, 5, 3)
    assert (got[..., 0] > 150).all()
    # built-in format still served by the pure-python codec
    assert (multimodal.decode_image(multimodal.encode_ppm(arr)) == arr).all()


@pytest.mark.skipif(
    __import__("importlib").util.find_spec("soundfile") is None,
    reason="optional-codec dispatch test needs soundfile installed "
    "(env waiver, same class as the Kafka broker gate)",
)
def test_soundfile_dispatch_decodes_what_builtins_reject():
    import io

    import numpy as np
    import soundfile as sf

    samples = (np.sin(np.linspace(0, 6.28, 64)) * 0.5).astype(np.float32)
    buf = io.BytesIO()
    sf.write(buf, samples, 8000, format="FLAC")
    decoded, rate = multimodal.decode_audio(buf.getvalue())
    assert rate == 8000 and decoded.shape[0] == 64


def test_resize_images_real_pixels(spark):
    """resize_images now computes REAL pixels for PPM/BMP: the output
    binary decodes to exactly resize_nearest(decode(src)) — and raw
    byte-blob media still degrade honestly to resize_ok=false."""
    import numpy as np

    media = multimodal.make_demo_codec_media(spark, 6)
    out = {r["media_id"]: r for r in multimodal.resize_images(media, 4, 3).collect()}
    src = {r["media_id"]: r for r in media.collect()}
    n_img = 0
    for i, r in out.items():
        if src[i]["modality"] != "image":
            continue
        assert r["resize_ok"] is True
        got = multimodal.decode_image(bytes(r["content"]))
        want = multimodal.resize_nearest(
            multimodal.decode_image(bytes(src[i]["content"])), 4, 3
        )
        assert got.shape == (3, 4, 3) and (got == want).all()
        n_img += 1
    assert n_img == 4  # 2 ppm + 2 bmp in the first 6 demo rows

    # raw blobs (no container magic) keep the honest false path
    blob = multimodal.make_demo_media(spark, 6)
    blob_out = multimodal.resize_images(blob, 4, 3).collect()
    assert all(r["resize_ok"] is False for r in blob_out)


def test_extract_features_real_decode(spark):
    """extract_features uses the real codec path for container formats
    (image: dims + probe pixels; audio: rate/duration/moments) and the
    byte-stub fallback for raw blobs — decode_ok splits accordingly."""
    import numpy as np

    feats = {
        r["media_id"]: r
        for r in multimodal.extract_features(
            multimodal.make_demo_codec_media(spark, 6)
        ).collect()
    }
    for i, r in feats.items():
        assert r["decode_ok"] is True, i
        f = r["feature"]
        assert len(f) == 8
        if i % 3 == 0:  # ppm 8x6: f[0]=w/255, f[1]=h/255
            assert abs(f[0] - 8 / 255) < 1e-6 and abs(f[1] - 6 / 255) < 1e-6
        elif i % 3 == 1:  # bmp 5x4
            assert abs(f[0] - 5 / 255) < 1e-6 and abs(f[1] - 4 / 255) < 1e-6
        else:  # wav: f[0]=n/1e6, f[1]=rate/1e6, f[7]=duration
            assert abs(f[0] - 32 / 1e6) < 1e-7
            assert abs(f[1] - 8000 / 1e6) < 1e-7
            assert abs(f[7] - 32 / 8000) < 1e-6


def test_decontaminate_flags_planted_overlap(spark):
    from table_computing_spark.operators import text as tx

    span = " ".join(f"eval{i}" for i in range(5))  # one exact 5-gram
    corpus = spark.createDataFrame(
        [
            (1, "clean doc with plenty of its own unrelated words here"),
            (2, f"prefix words then {span} then suffix words follow after"),
            (3, "short doc"),  # < 5 tokens → zero n-grams, never flagged
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, f"benchmark question {span} benchmark answer")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in tx.decontaminate(corpus, bench, n=5).collect()}
    assert out[2]["contaminated"] == 1 and out[2]["hit_ngrams"] >= 1
    assert out[1]["contaminated"] == 0 and out[1]["hit_positions"] == 0
    assert out[3]["contaminated"] == 0 and out[3]["hit_ngrams"] == 0


def test_dup_span_ratio_planted(spark):
    from table_computing_spark.operators import text as tx

    shared = " ".join(f"s{i}" for i in range(10))
    df = spark.createDataFrame(
        [
            (1, shared),                                   # fully duplicated vs 2
            (2, shared + " tail1 tail2 tail3 tail4 tail5"),
            (3, " ".join(f"u{i}" for i in range(12))),     # all unique
            (4, "tiny"),                                   # < n tokens → 0 spans
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in tx.dup_span_ratio(df, n=5).collect()}
    assert out[1]["dup_ratio"] == 1.0 and out[1]["n_spans"] == 6
    assert 0.0 < out[2]["dup_ratio"] < 1.0
    assert out[3]["dup_ratio"] == 0.0 and out[3]["dup_spans"] == 0
    assert out[4]["n_spans"] == 0 and out[4]["dup_ratio"] == 0.0


def test_unigram_logprob_orders_rare_heavy_docs_higher(spark):
    from table_computing_spark.operators import text as tx
    import math

    # "common" appears 12x corpus-wide, each rare* once → doc 2 (all
    # rare tokens) must score a higher avg NLL than doc 1 (all common).
    df = spark.createDataFrame(
        [
            (1, "common common common common common common"),
            (2, "rare1 rare2 rare3 rare4 rare5 rare6"),
            (3, "common common common common common common"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in tx.unigram_logprob(df).collect()}
    assert out[1]["n_tokens"] == 6
    assert out[2]["avg_nll"] > out[1]["avg_nll"]
    # closed form: T=18; common c=12 → nll=log2(18/12); rare c=1 → log2(18)
    assert abs(out[1]["avg_nll"] - math.log2(18 / 12)) < 1e-6
    assert abs(out[2]["avg_nll"] - math.log2(18.0)) < 1e-6


def test_mixture_weights_plan_invariants(spark):
    from table_computing_spark.operators import text as tx

    df = spark.createDataFrame(
        [(i, "w " * (10 * (1 + i % 2)), f"d{i % 2}") for i in range(40)],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in tx.mixture_weights(df, {"d0": 3.0, "d1": 1.0}).collect()}
    # shares: actual d0 = 200/600, d1 = 400/600; targets 0.75 / 0.25
    assert abs(out["d0"]["actual_share"] - 1 / 3) < 1e-6
    assert abs(out["d0"]["target_share"] - 0.75) < 1e-6
    # d0 must be upsampled (rate > 1 → epochs >= 2), d1 downsampled
    assert out["d0"]["sample_rate"] > 1.0 and out["d0"]["epochs"] >= 2
    assert out["d1"]["sample_rate"] < 1.0 and out["d1"]["epochs"] == 1
    for r in out.values():
        assert 0.0 < r["rate_within_epoch"] <= 1.0
        # epochs is the ceiling of the rate
        assert r["epochs"] - 1 < r["sample_rate"] <= r["epochs"]


def test_nb_classify_separable_corpus(spark):
    from table_computing_spark.operators import classify

    # two fully separable vocabularies -> self-train must reach 100%
    rows = []
    for i in range(8):
        rows.append((i, " ".join(f"cat{j % 5}" for j in range(i, i + 12)), "cats"))
        rows.append((100 + i, " ".join(f"dog{j % 5}" for j in range(i, i + 12)), "dogs"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = classify.nb_classify(df)
    res = {r["doc_id"]: r for r in out.collect()}
    assert len(res) == 16
    assert all(r["correct"] == 1 for r in res.values())
    assert res[0]["pred"] == "cats" and res[100]["pred"] == "dogs"
    # scores are log-probabilities: strictly negative
    assert all(r["score"] < 0 for r in res.values())


def test_nb_score_backoff_on_unseen_tokens(spark):
    from table_computing_spark.operators import classify

    train = spark.createDataFrame(
        [(1, "aa aa bb", "x"), (2, "cc cc dd", "y")],
        "doc_id long, text string, lang string",
    )
    priors, lik = classify.nb_train(train)
    # scoring corpus contains a token never seen in training ("zz") —
    # the backoff constant must apply and prediction still follows the
    # seen tokens
    test = spark.createDataFrame(
        [(10, "aa zz"), (11, "dd zz")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in classify.nb_score(test, priors, lik, vocab_size=4).collect()}
    assert out[10]["pred"] == "x"
    assert out[11]["pred"] == "y"


def test_jaccard_join_bipartite_only(spark):
    from table_computing_spark.operators import dedup

    base = " ".join(f"w{i}" for i in range(20))
    ref = spark.createDataFrame(
        [(1, base), (2, base), (3, " ".join(f"r{i}" for i in range(20)))],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(100, base), (101, " ".join(f"x{i}" for i in range(20)))],
        "doc_id long, text string",
    )
    out = dedup.jaccard_join(new, ref, threshold=0.9)
    pairs = {(r["id_new"], r["id_ref"]): r["jaccard"] for r in out.collect()}
    # the planted copy pairs with BOTH identical ref docs at 1.0
    assert pairs[(100, 1)] == 1.0 and pairs[(100, 2)] == 1.0
    # ref x ref (1,2) must NOT appear even though they are identical —
    # the reference side is never paired against itself
    assert all(k[0] in (100, 101) for k in pairs)
    # unrelated new doc pairs with nothing
    assert not any(k[0] == 101 for k in pairs)


def test_rp_project_preserves_distances_and_is_deterministic(spark):
    from table_computing_spark.operators import similarity as sim
    import math

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(60)
    proj = {r["vec_id"]: r["proj"] for r in sim.rp_project(emb, out_dim=16).collect()}
    orig = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    assert all(len(v) == 16 for v in proj.values())
    # determinism: a second run reproduces bit-identical projections
    again = {r["vec_id"]: r["proj"] for r in sim.rp_project(emb, out_dim=16).collect()}
    assert proj == again
    # JL property (loose): median pairwise-distance ratio near 1
    ids = sorted(proj)[:20]
    ratios = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            d_orig = math.dist(orig[a], orig[b])
            d_proj = math.dist(proj[a], proj[b])
            if d_orig > 0:
                ratios.append(d_proj / d_orig)
    ratios.sort()
    med = ratios[len(ratios) // 2]
    assert 0.6 < med < 1.4, med


def test_gopher_rules_planted_violations(spark):
    from table_computing_spark.operators import text as tx

    good = "the quick brown fox jumps over a lazy dog and it runs far " * 6
    bullets = "\n".join(f"- item {i}" for i in range(10))
    ellipses = "\n".join(f"line {i} trails off..." for i in range(10))
    symbols = " ".join("#tag" for _ in range(60))
    df = spark.createDataFrame(
        [(1, good), (2, bullets), (3, ellipses), (4, symbols),
         (5, "short doc only")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in tx.gopher_rules(df, min_words=20).collect()}
    assert out[1]["keep"] == 1
    assert out[2]["ok_bullet_lines"] == 0 and out[2]["keep"] == 0
    assert out[2]["bullet_line_frac"] == 1.0
    assert out[3]["ok_ellipsis_lines"] == 0 and out[3]["keep"] == 0
    assert out[4]["ok_symbol_ratio"] == 0 and out[4]["symbol_ratio"] >= 1.0
    assert out[5]["ok_words"] == 0 and out[5]["keep"] == 0


def test_dup_span_intervals_merging(spark):
    from table_computing_spark.operators import text as tx

    shared = " ".join(f"s{i}" for i in range(8))      # tokens 0..7 shared
    mid = "uA uB uC uD uE uF uG"                       # unique separator
    shared2 = " ".join(f"z{i}" for i in range(6))     # second shared run
    df = spark.createDataFrame(
        [
            (1, f"{shared} {mid} {shared2}"),
            (2, f"other1 other2 {shared} trailer1 trailer2"),
            (3, f"front1 front2 front3 {shared2} back1"),
            (4, " ".join(f"q{i}" for i in range(15))),  # fully unique
        ],
        "doc_id long, text string",
    )
    out = {}
    for r in tx.dup_span_intervals(df, n=5).collect():
        out.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["span_grams"])
        )
    # doc 1: tokens 0-7 duplicated (grams at pos 0..3 merge into one
    # island) and tokens 15-20 (shared2 at offset 15, grams pos 15..16)
    assert sorted(out[1]) == [(0, 7, 4), (15, 20, 2)]
    # doc 2: shared sits at offset 2 → one island covering tokens 2-9
    assert out[2] == [(2, 9, 4)]
    # doc 3: shared2 at offset 3 → tokens 3-8
    assert out[3] == [(3, 8, 2)]
    # doc 4: no duplicated spans at all
    assert 4 not in out


def test_apply_mixture_replication_semantics(spark):
    from table_computing_spark.operators import text as tx
    from pyspark.sql import functions as F

    # d0 rate = 0.75*600/200 = 2.25 -> every doc gets 2 or 3 epochs;
    # d1 rate = 0.25*600/400 = 0.375 -> 0 or 1
    df = spark.createDataFrame(
        [(i, "w " * (10 * (1 + i % 2)), f"d{i % 2}") for i in range(40)],
        "doc_id long, text string, source string",
    )
    out = tx.apply_mixture(df, {"d0": 3.0, "d1": 1.0})
    rows = out.collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    for doc, eps in per_doc.items():
        # epochs are 1..n with no gaps
        assert sorted(eps) == list(range(1, len(eps) + 1))
        if doc % 2 == 0:
            assert len(eps) in (2, 3)
        else:
            assert len(eps) == 1
    # d1 docs absent from per_doc are the hash-dropped ones; some must
    # survive and some must drop at rate 0.375
    d1_present = [d for d in per_doc if d % 2 == 1]
    assert 0 < len(d1_present) < 20
    # determinism
    again = tx.apply_mixture(df, {"d0": 3.0, "d1": 1.0}).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_quantize_embeddings_roundtrip_error_bound(spark):
    from table_computing_spark.operators import similarity as sim
    import collections

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    orig = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    rows = sim.quantize_embeddings(emb).collect()
    by_vec = collections.defaultdict(dict)
    scales = {}
    for r in rows:
        by_vec[r["vec_id"]][r["j"]] = r["q"]
        scales[r["vec_id"]] = r["scale"]
    for vid, vec in orig.items():
        s = scales[vid]
        qs = by_vec[vid]
        assert len(qs) == len(vec)
        for j, x in enumerate(vec):
            q = qs[j]
            assert -127 <= q <= 127
            # dequantization error bounded by half a quantization step
            assert abs(q * s - x) <= s / 2 + 1e-9


def test_png_codec_roundtrip_and_all_filters():
    import struct
    import zlib

    import numpy as np

    from table_computing_spark.operators import multimodal as mm

    h, w = 13, 11
    y, x, c = np.meshgrid(np.arange(h), np.arange(w), np.arange(3), indexing="ij")
    arr = ((3 * y + 5 * x + 7 * c) % 256).astype(np.uint8)

    # encoder round-trip (filter 0)
    assert np.array_equal(mm.decode_image(mm.encode_png(arr)), arr)

    def build_png(raw_filtered: bytes, color_type: int, width: int) -> bytes:
        def chunk(ctype, data):
            return (
                struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
            )
        ihdr = struct.pack(">IIBBBBB", width, h, 8, color_type, 0, 0, 0)
        return (mm.PNG_SIGNATURE + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw_filtered)) + chunk(b"IEND", b""))

    # every filter type must de-filter back to the same pixels
    bpp = 3
    flat = arr.reshape(h, w * bpp).astype(np.int32)
    for ftype in (0, 1, 2, 3, 4):
        lines = []
        prev = np.zeros(w * bpp, dtype=np.int32)
        for row in flat:
            a = np.concatenate([np.zeros(bpp, dtype=np.int32), row[:-bpp]])
            b = prev
            cdiag = np.concatenate([np.zeros(bpp, dtype=np.int32), prev[:-bpp]])
            if ftype == 0:
                pred = np.zeros_like(row)
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cdiag
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - cdiag)
                pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, cdiag))
            lines.append(bytes([ftype]) + ((row - pred) % 256).astype(np.uint8).tobytes())
            prev = row
        png = build_png(b"".join(lines), color_type=2, width=w)
        assert np.array_equal(mm.decode_image(png), arr), f"filter {ftype}"

    # RGBA (color type 6): alpha plane dropped after de-filtering
    rgba = np.dstack([arr, ((y[:, :, 0] + x[:, :, 0]) % 256).astype(np.uint8)])
    raw = b"".join(b"\x00" + rgba[r].tobytes() for r in range(h))
    png = build_png(raw, color_type=6, width=w)
    assert np.array_equal(mm.decode_image(png), arr)

    # unsupported flavors surface as NotImplementedError, not garbage
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        ihdr16 = build_png(b"", color_type=2, width=w)  # empty IDAT
        mm.decode_image(ihdr16)


def test_png_flows_through_feature_extraction(spark):
    import numpy as np

    from table_computing_spark.operators import multimodal as mm

    arr = (np.arange(6 * 5 * 3).reshape(6, 5, 3) % 256).astype(np.uint8)
    rows = [(0, "image", mm.encode_png(arr), None, '{"fmt": "png"}')]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = mm.extract_features(df).collect()
    assert len(out) == 1 and out[0]["decode_ok"] is True
    # f[0]=w/255, f[1]=h/255 per the image feature contract
    f = out[0]["feature"]
    assert abs(f[0] - 5 / 255) < 1e-6 and abs(f[1] - 6 / 255) < 1e-6


def test_audio_spectrum_detects_planted_tone_and_rejects_nonwav(spark):
    import numpy as np

    from table_computing_spark.operators import multimodal as mm

    rate, N = 8000, 512
    j = np.arange(N)
    # mix: strong 1000 Hz (bin 64) + weak 250 Hz (bin 16) → dominant 64
    tone = (0.4 * 32767 * np.sin(2 * np.pi * 64 * j / N)
            + 0.1 * 32767 * np.sin(2 * np.pi * 16 * j / N)).astype(np.int16)
    rows = [
        (0, "audio", mm.encode_wav_pcm16(tone, rate), None, "{}"),
        (1, "audio", b"not a wav at all", None, "{}"),
        (2, "audio", None, "s3://x", "{}"),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in mm.audio_spectrum(df).collect()}
    assert out[0]["decode_ok"] and out[0]["dominant_bin"] == 64
    assert abs(out[0]["dominant_hz"] - 1000.0) < 1e-9
    assert not out[1]["decode_ok"] and out[1]["dominant_bin"] is None
    assert not out[2]["decode_ok"]


def test_image_dhash_brightness_invariance_and_png_input(spark):
    import numpy as np

    from table_computing_spark.operators import multimodal as mm

    # same gradient scene at two exposures -> identical dhash; the
    # reversed-slope scene -> different hash. PNG and PPM containers of
    # the same pixels must hash identically (container-independent).
    w, h = 9, 8
    base = np.tile(100 + 6 * np.arange(w, dtype=np.int32), (h, 1))
    bright = base + 40
    reverse = base[:, ::-1].copy()
    def rgb(g):
        return np.clip(g, 0, 255).astype(np.uint8)[:, :, None].repeat(3, axis=2)
    rows = [
        (0, "image", mm.encode_ppm(rgb(base)), None, "{}"),
        (1, "image", mm.encode_ppm(rgb(bright)), None, "{}"),
        (2, "image", mm.encode_ppm(rgb(reverse)), None, "{}"),
        (3, "image", mm.encode_png(rgb(base)), None, "{}"),
        (4, "image", b"\xff\xd8garbage-jpeg", None, "{}"),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in mm.image_dhash(df).collect()}
    assert out[0]["dhash"] == out[1]["dhash"] == out[3]["dhash"]
    assert out[0]["dhash"] != out[2]["dhash"]
    assert not out[4]["decode_ok"] and out[4]["dhash"] is None


def test_ppm_stream_video_frames_decode(spark):
    import numpy as np

    from table_computing_spark.operators import multimodal as mm

    vids = mm.make_demo_video_media(spark, 3, n_frames=7)
    frames = mm.sample_frames(vids, every_n=2, max_frames=3).collect()
    # 3 videos x frames 0,2,4
    assert sorted((r["media_id"], r["frame_idx"]) for r in frames) == [
        (i, f) for i in range(3) for f in (0, 2, 4)
    ]
    # every sampled frame is a standalone decodable PPM with the
    # closed-form pixels of its (video, frame) coordinates
    for r in frames:
        arr = mm.decode_image(bytes(r["frame"]))
        assert arr.shape == (3, 4, 3)
        i, f = r["media_id"], r["frame_idx"]
        assert arr[0, 0, 0] == (9 * i + 5 * f) % 256
        assert arr[2, 3, 1] == (9 * i + 5 * f + 7 * 11 + 11) % 256
    # split_ppm_stream round-trips the container exactly
    yy, xx, cc = np.meshgrid(np.arange(3), np.arange(4), np.arange(3), indexing="ij")
    stream = b"".join(
        mm.encode_ppm(((f + yy + xx + cc) % 256).astype(np.uint8)) for f in range(5)
    )
    parts = mm.split_ppm_stream(stream)
    assert len(parts) == 5 and b"".join(parts) == stream


def test_chunk_documents_overlap_invariants(spark):
    from table_computing_spark.operators import text as tx

    text = " ".join(f"t{i}" for i in range(100))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        tx.chunk_documents(df, max_tokens=40, stride=30).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # 100 tokens, windows at 0/30/60: 60+40=100 covers the end -> 3
    assert len(rows) == 3 and rows[0]["n_chunks"] == 3
    assert [r["chunk_tokens"] for r in rows] == [40, 40, 40]
    # window k starts at token 30k; consecutive windows overlap by 10
    for k, r in enumerate(rows):
        toks = r["chunk_text"].split(" ")
        assert toks[0] == f"t{30 * k}" and len(toks) == 40
        if k:
            prev = rows[k - 1]["chunk_text"].split(" ")
            assert prev[-10:] == toks[:10]
    # every token position appears in at least one window
    covered = {30 * k + j for k in range(3) for j in range(40)}
    assert covered == set(range(100))
    # stride = max_tokens stays the old disjoint behavior
    disjoint = tx.chunk_documents(df, max_tokens=40).collect()
    assert sorted(r["chunk_tokens"] for r in disjoint) == [20, 40, 40]


def test_dup_span_interval_and_ratio_consistency(spark):
    """Cross-operator invariant on a seeded random small-vocab corpus:
    the interval view and the ratio view of duplicated spans must
    agree — per doc, sum(span_grams) == dup_spans, intervals are
    disjoint (merged), in-bounds, and every interval is at least n
    tokens wide."""
    import random

    from table_computing_spark.operators import text as tx

    rng = random.Random(42)
    vocab = [f"v{i}" for i in range(8)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 15))))
        for i in range(30)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    n = 3
    ratio = {r["doc_id"]: r for r in tx.dup_span_ratio(df, n=n).collect()}
    intervals = {}
    for r in tx.dup_span_intervals(df, n=n).collect():
        intervals.setdefault(r["doc_id"], []).append(r)
    n_tokens = {i: len(t.split()) for i, t in docs}
    for doc, rows in intervals.items():
        rows.sort(key=lambda r: r["span_start"])
        assert sum(r["span_grams"] for r in rows) == ratio[doc]["dup_spans"]
        prev_end = -2
        for r in rows:
            assert r["span_start"] > prev_end + 1  # disjoint AND non-adjacent
            assert r["span_end"] - r["span_start"] + 1 == r["span_tokens"] >= n
            assert 0 <= r["span_start"] and r["span_end"] < n_tokens[doc]
            prev_end = r["span_end"]
    # docs with dup_spans == 0 must have no intervals at all
    for doc, r in ratio.items():
        if r["dup_spans"] == 0:
            assert doc not in intervals


def test_decontaminate_self_benchmark_flags_everything(spark):
    """decontaminate(corpus, corpus) must flag every doc that has at
    least one full n-gram (each shares its own n-grams)."""
    from table_computing_spark.operators import text as tx

    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "one two three four five six"), (3, "too short")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in tx.decontaminate(docs, docs, n=5).collect()}
    assert out[1]["contaminated"] == 1 and out[2]["contaminated"] == 1
    assert out[3]["contaminated"] == 0  # < n tokens -> no n-grams at all


def test_bm25_ranking_properties(spark):
    from table_computing_spark.operators import text as tx

    # doc 1: target term twice in a short doc -> highest score;
    # doc 2: once in a longer doc; doc 3: no match -> absent
    df = spark.createDataFrame(
        [
            (1, "apple pie apple tart"),
            (2, "apple with many other words diluting the match here now"),
            (3, "banana only no match"),
            (4, "pie crust and pie again with filler words to lengthen"),
        ],
        "doc_id long, text string",
    )
    out = tx.bm25_topk(df, ("apple", "pie"), k=10).collect()
    ids = [r["doc_id"] for r in out]
    scores = {r["doc_id"]: r["score"] for r in out}
    assert 3 not in ids
    # doc 1 matches both terms with high tf in a short doc -> rank 1
    assert ids[0] == 1
    assert scores[1] > scores[2] and scores[1] > scores[4]
    # scores sorted descending
    assert [r["score"] for r in out] == sorted((r["score"] for r in out), reverse=True)
    # k truncation
    assert len(tx.bm25_topk(df, ("apple", "pie"), k=2).collect()) == 2


def test_jpeg_codec_roundtrip_exact_vs_reference_pipeline():
    """decode(encode(x)) must equal an independently assembled
    numpy pipeline (color convert → FDCT → quantize → dequant → IDCT →
    color convert) EXACTLY — this pins the Huffman tables, byte
    stuffing, marker layout, and MCU interleave, since any bit slip
    would desync the entropy stream, not just perturb pixels."""
    import numpy as np

    from table_computing_spark.operators import jpeg as J

    rng = np.random.default_rng(7)

    def codec_plane(p, qt):
        ph, pw = p.shape
        o = np.zeros((ph, pw), dtype=np.int64)
        for y0 in range(0, ph, 8):
            for x0 in range(0, pw, 8):
                q = J.quantize(J._fdct(p[y0 : y0 + 8, x0 : x0 + 8] - 128.0), qt)
                o[y0 : y0 + 8, x0 : x0 + 8] = np.clip(
                    np.round(J._idct(q * qt)) + 128, 0, 255
                )
        return o

    # 4:4:4
    arr = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
    ycc = J.rgb_to_ycbcr(arr).astype(np.float64)
    planes = [codec_plane(ycc[:, :, ci], J.DEMO_QTABLE) for ci in range(3)]
    expected = J.ycbcr_to_rgb(np.stack(planes, axis=-1))
    got = J.decode_jpeg(J.encode_jpeg_baseline(arr))
    assert np.array_equal(got, expected)

    # 4:2:0 — chroma 2x2 mean + half-up round, nearest upsample
    arr = rng.integers(0, 256, size=(32, 48, 3), dtype=np.uint8)
    h, w = arr.shape[:2]
    ycc = J.rgb_to_ycbcr(arr).astype(np.float64)
    cb = np.floor(ycc[:, :, 1].reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3)) + 0.5)
    cr = np.floor(ycc[:, :, 2].reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3)) + 0.5)
    yr = codec_plane(ycc[:, :, 0], J.DEMO_QTABLE)
    cbr = codec_plane(cb, J.DEMO_QTABLE).repeat(2, axis=0).repeat(2, axis=1)
    crr = codec_plane(cr, J.DEMO_QTABLE).repeat(2, axis=0).repeat(2, axis=1)
    expected = J.ycbcr_to_rgb(np.stack([yr, cbr, crr], axis=-1))
    got = J.decode_jpeg(J.encode_jpeg_baseline(arr, subsampling="420"))
    assert np.array_equal(got, expected)

    # a non-uniform quant table also round-trips exactly
    qt = (1 + (np.arange(64).reshape(8, 8) % 7) * 4).astype(np.int32)
    arr = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    ycc = J.rgb_to_ycbcr(arr).astype(np.float64)
    planes = [codec_plane(ycc[:, :, ci], qt) for ci in range(3)]
    expected = J.ycbcr_to_rgb(np.stack(planes, axis=-1))
    assert np.array_equal(J.decode_jpeg(J.encode_jpeg_baseline(arr, qtable=qt)), expected)


def test_jpeg_flat_block_closed_form():
    """Flat 8x8 blocks with the uniform-16 quant table decode to the
    exact integer chain the q_jpeg_decode oracle reproduces in SQL."""
    import numpy as np

    from table_computing_spark.operators import jpeg as J

    def closed_form(r, g, b):
        Y = (19595 * r + 38470 * g + 7471 * b + 32768) >> 16
        Cb = 128 + ((-11059 * r - 21709 * g + 32768 * b + 32768) >> 16)
        Cr = 128 + ((32768 * r - 27439 * g - 5329 * b + 32768) >> 16)

        def rec(v):
            F = 8 * (v - 128)
            q = (2 * abs(F) + 16) // 32 * (1 if F >= 0 else -1)
            return max(0, min(255, 2 * q + 128))

        Yp, cb, cr = rec(Y), rec(Cb) - 128, rec(Cr) - 128
        return (
            max(0, min(255, Yp + ((91881 * cr + 32768) >> 16))),
            max(0, min(255, Yp - ((22554 * cb + 46802 * cr + 32768) >> 16))),
            max(0, min(255, Yp + ((116130 * cb + 32768) >> 16))),
        )

    rng = np.random.default_rng(11)
    for _ in range(30):
        colors = rng.integers(0, 256, size=(2, 2, 3))
        img = np.zeros((16, 16, 3), dtype=np.uint8)
        for by in range(2):
            for bx in range(2):
                img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = colors[by, bx]
        dec = J.decode_jpeg(J.encode_jpeg_baseline(img))
        for by in range(2):
            for bx in range(2):
                exp = closed_form(*[int(v) for v in colors[by, bx]])
                assert tuple(int(v) for v in dec[by * 8 + 4, bx * 8 + 4]) == exp
    for _ in range(15):
        c = rng.integers(0, 256, size=3)
        img = np.full((16, 16, 3), c, dtype=np.uint8)
        dec = J.decode_jpeg(J.encode_jpeg_baseline(img, subsampling="420"))
        assert (dec == np.array(closed_form(*[int(v) for v in c]), dtype=np.uint8)).all()


def test_jpeg_unsupported_flavors_raise():
    """Progressive (SOF2) and truncated streams surface as
    NotImplementedError — the decode_ok=false boundary, never garbage."""
    import numpy as np
    import pytest as _pytest

    from table_computing_spark.operators import jpeg as J
    from table_computing_spark.operators import multimodal as mm

    arr = np.zeros((16, 16, 3), dtype=np.uint8)
    enc = bytearray(J.encode_jpeg_baseline(arr))
    sof = enc.find(b"\xff\xc0")
    assert sof > 0
    prog = bytes(enc[:sof]) + b"\xff\xc2" + bytes(enc[sof + 2 :])
    with _pytest.raises(NotImplementedError):
        J.decode_jpeg(prog)
    with _pytest.raises(NotImplementedError):
        J.decode_jpeg(b"\xff\xd8\xff\xe0")  # SOI then truncation
    # dispatch: decode_image routes JPEG signatures to decode_jpeg
    assert np.array_equal(mm.decode_image(bytes(enc)), J.decode_jpeg(bytes(enc)))


def test_jpeg_flows_through_feature_extraction(spark):
    """The mapInPandas feature contract over real JPEG bytes: every
    demo image decodes (decode_ok) and w=h=16 comes back through the
    feature probes."""
    from pyspark.sql import functions as F

    from table_computing_spark.operators import multimodal as mm

    feats = mm.extract_features(mm.make_demo_jpeg_media(spark, 12)).collect()
    assert len(feats) == 12
    for r in feats:
        assert r["decode_ok"], r
        assert round(r["feature"][0] * 255) == 16
        assert round(r["feature"][1] * 255) == 16


def test_jpeg_restart_markers_do_not_change_pixels():
    """DRI/RSTn streams must decode identically to the unrestarted
    stream — pins the decoder's predictor reset + byte realignment."""
    import numpy as np

    from table_computing_spark.operators import jpeg as J

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(32, 40, 3), dtype=np.uint8)
    plain = J.decode_jpeg(J.encode_jpeg_baseline(arr))
    for re_ in (1, 2, 7):
        assert np.array_equal(
            plain, J.decode_jpeg(J.encode_jpeg_baseline(arr, restart_every=re_))
        ), re_
    arr2 = rng.integers(0, 256, size=(32, 48, 3), dtype=np.uint8)
    assert np.array_equal(
        J.decode_jpeg(J.encode_jpeg_baseline(arr2, subsampling="420")),
        J.decode_jpeg(
            J.encode_jpeg_baseline(arr2, subsampling="420", restart_every=2)
        ),
    )


def test_triangle_counts_known_graphs(spark):
    """K4 (every node in 3 triangles), a path (zero triangles), and a
    triangle with a pendant vertex — degree-ordered orientation must
    count each triangle exactly once per corner, zero-fill non-corner
    nodes, and ignore self-loops/duplicate/reversed edges."""
    from table_computing_spark.operators.graph import triangle_counts

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    path = [(10, 11), (11, 12), (12, 13)]
    pendant = [(20, 21), (21, 22), (22, 20), (22, 23)]
    noise = [(1, 1), (2, 1), (3, 1)]  # self-loop + reversed dupes
    df = spark.createDataFrame(k4 + path + pendant + noise, "u long, v long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert {n: got[n] for n in (1, 2, 3, 4)} == {1: 3, 2: 3, 3: 3, 4: 3}
    assert {n: got[n] for n in (10, 11, 12, 13)} == {10: 0, 11: 0, 12: 0, 13: 0}
    assert {n: got[n] for n in (20, 21, 22, 23)} == {20: 1, 21: 1, 22: 1, 23: 0}


def test_triangle_counts_matches_naive_random(spark):
    """Random multigraph with self-loops vs a brute-force O(n³) count."""
    import itertools
    import random
    from collections import defaultdict

    from table_computing_spark.operators.graph import triangle_counts

    random.seed(7)
    edges = [(random.randint(0, 40), random.randint(0, 40)) for _ in range(300)]
    adj = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    want = {n: 0 for n in adj}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            want[a] += 1
            want[b] += 1
            want[c] += 1
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == want


def test_dense_ids_contiguous_and_partitioning_invariant(spark):
    """Ids are exactly 0..n-1 in the requested total order, identical
    under any input partitioning / range-partition count, and the plan
    never funnels DATA rows through a single partition — the offset
    cumsum (the only SinglePartition step) sees one row per partition."""
    from pyspark.sql import functions as F

    from table_computing_spark.operators.ids import dense_ids

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    order = [F.col("n_chars").desc(), F.col("doc_id")]
    out = dense_ids(d, order, num_partitions=7)
    pdf = out.select("doc_id", "n_chars", "dense_id").toPandas()
    want = pdf.sort_values(
        ["n_chars", "doc_id"], ascending=[False, True]
    ).reset_index(drop=True)
    assert list(want["dense_id"]) == list(range(len(want)))

    again = dense_ids(d.repartition(13), order, num_partitions=3, start=1000)
    m1 = dict(zip(pdf["doc_id"], pdf["dense_id"] + 1000))
    m2 = {r["doc_id"]: r["dense_id"] for r in again.collect()}
    assert m1 == m2

    # plan gate: the broadcast (offset) side may exchange to a single
    # partition; the data side must not
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    for m in re.finditer(r"Exchange SinglePartition", plan):
        context = plan[m.start() - 400 : m.start()]
        assert "HashAggregate" in context or "__n" in plan[m.start():m.start() + 600], (
            "SinglePartition exchange outside the per-partition count path:\n" + plan
        )


def test_ntile_distributed_matches_sql_ntile(spark):
    """Closed-form bucket == real ntile() for awkward N/n combos
    (N % n != 0, ties on the primary key, N < n) under any input
    partitioning — and the plan carries NO unpartitioned window over
    the data rows (the whole point)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from table_computing_spark.operators.ids import ntile_distributed

    rows = [(i, (i * 7) % 13, f"k{i:04d}") for i in range(997)]
    d = spark.createDataFrame(rows, "rid long, v long, k string").repartition(11)
    for n in (5, 16, 1, 3):
        got = ntile_distributed(d, [F.col("v"), F.col("k")], n, out_col="b")
        want = d.withColumn(
            "b", F.ntile(n).over(Window.orderBy(F.col("v"), F.col("k")))
        )
        g = {r["rid"]: r["b"] for r in got.collect()}
        w = {r["rid"]: r["b"] for r in want.collect()}
        assert g == w, f"ntile({n}) mismatch"
    # N < n: every row its own bucket
    tiny = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "v long, k string")
    got = ntile_distributed(tiny, ["v"], 10, out_col="b")
    assert sorted(r["b"] for r in got.collect()) == [1, 2, 3]


def test_semantic_dedup_matches_naive_numpy(spark):
    """Re-derive every keep/drop decision with a naive numpy
    reimplementation (buckets, integer-micro centroids, rounded
    cosines, dominated rule) and require exact agreement, plus the
    invariant that each nonempty bucket keeps its top-ranked point."""
    import numpy as np

    from table_computing_spark.operators.similarity import semantic_dedup

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = {
        r["vec_id"]: (r["bucket"], r["cos_centroid"], r["keep"])
        for r in semantic_dedup(df, bits=6, threshold=0.35).collect()
    }

    rows = df.select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in rows]
    M = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    bucket = np.zeros(len(ids), dtype=int)
    for i in range(6):
        bucket += (M[:, i] > 0) * (1 << i)
    keep_want = {}
    for bk in np.unique(bucket):
        idx = np.where(bucket == bk)[0]
        cent = np.round(M[idx] * 1e6).sum(axis=0) / 1e6 / len(idx)
        cc = {
            ids[i]: round(
                float(
                    M[i] @ cent / (np.linalg.norm(M[i]) * np.linalg.norm(cent))
                ),
                6,
            )
            for i in idx
        }
        order = sorted(idx, key=lambda i: (cc[ids[i]], ids[i]))
        for pos, i in enumerate(order):
            dominated = any(
                round(
                    float(
                        M[i] @ M[j]
                        / (np.linalg.norm(M[i]) * np.linalg.norm(M[j]))
                    ),
                    6,
                )
                >= 0.35
                for j in order[:pos]
            )
            keep_want[ids[i]] = (int(bk), cc[ids[i]], not dominated)
        assert keep_want[ids[order[0]]][2] is True  # top rank always kept
    assert got == keep_want
    assert any(not k for _, _, k in got.values()), "threshold dropped nothing"


def test_semantic_dedup_with_ivf_buckets(spark):
    """The scale path: semantic_dedup over PRECOMPUTED cluster cells
    (here the embedding table's own label column standing in for
    ivf_assign output) must run the identical keep-rule per cell —
    verified against the same naive numpy replica re-bucketed by
    label. This is the documented fix for the r07 scaling finding that
    FIXED sign-LSH cells go quadratic in occupancy."""
    import numpy as np

    from table_computing_spark.operators.similarity import semantic_dedup

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = {
        r["vec_id"]: (r["bucket"], r["cos_centroid"], r["keep"])
        for r in semantic_dedup(
            df, threshold=0.35, bucket_col="label"
        ).collect()
    }
    rows = df.select("vec_id", "embedding", "label").collect()
    ids = [r["vec_id"] for r in rows]
    M = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    bucket = np.array([r["label"] for r in rows])
    keep_want = {}
    for bk in np.unique(bucket):
        idx = np.where(bucket == bk)[0]
        cent = np.round(M[idx] * 1e6).sum(axis=0) / 1e6 / len(idx)
        cc = {
            ids[i]: round(
                float(M[i] @ cent / (np.linalg.norm(M[i]) * np.linalg.norm(cent))),
                6,
            )
            for i in idx
        }
        order = sorted(idx, key=lambda i: (cc[ids[i]], ids[i]))
        for pos, i in enumerate(order):
            dominated = any(
                round(
                    float(M[i] @ M[j] / (np.linalg.norm(M[i]) * np.linalg.norm(M[j]))),
                    6,
                )
                >= 0.35
                for j in order[:pos]
            )
            keep_want[ids[i]] = (int(bk), cc[ids[i]], not dominated)
    assert got == keep_want


def test_cms_one_sided_merge_and_exact_when_wide(spark):
    """The three CMS contracts: estimate >= truth always; estimates
    from a merged pair of shard sketches equal the whole-data sketch;
    width >> distinct keys makes every estimate exact."""
    from pyspark.sql import functions as F

    from table_computing_spark.operators import frequency

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    keys = li.select("l_partkey").distinct()
    exact = {
        r["l_partkey"]: r["n"]
        for r in li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n")).collect()
    }

    sk = frequency.cms_build(li, "l_partkey", depth=4, width=64)
    est = {
        r["l_partkey"]: r["est_count"]
        for r in frequency.cms_estimate(sk, keys, "l_partkey", depth=4, width=64).collect()
    }
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact), "CMS undershot a count"
    assert any(est[k] > exact[k] for k in exact), "width=64 should collide"

    # merge: two half sketches == one full sketch, counter for counter
    h1 = li.where(F.col("l_orderkey") % 2 == 0)
    h2 = li.where(F.col("l_orderkey") % 2 == 1)
    merged = frequency.cms_merge(
        frequency.cms_build(h1, "l_partkey", depth=4, width=64),
        frequency.cms_build(h2, "l_partkey", depth=4, width=64),
    )
    m = {(r["row"], r["slot"]): r["cnt"] for r in merged.collect()}
    w = {(r["row"], r["slot"]): r["cnt"] for r in sk.collect()}
    assert m == w

    wide = frequency.cms_build(li, "l_partkey", depth=4, width=1 << 16)
    est_wide = {
        r["l_partkey"]: r["est_count"]
        for r in frequency.cms_estimate(
            wide, keys, "l_partkey", depth=4, width=1 << 16
        ).collect()
    }
    assert est_wide == exact


def test_kn_bigram_nll_matches_pure_python_and_sums_to_one(spark):
    """Recompute interpolated KN per-doc NLL with a pure-Python
    reimplementation (same nano rounding) and require exact equality;
    also pin the KN normalization identity: for every context w1,
    sum over the seen vocabulary of P(w2|w1) == 1 exactly (the
    discount mass redistributed through continuation counts)."""
    import math
    from collections import Counter, defaultdict

    from table_computing_spark.operators.text import kn_bigram_nll

    d = 0.75
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {
        r["doc_id"]: (r["n_bigram_tokens"], r["kn_nll"])
        for r in kn_bigram_nll(df).collect()
    }

    docs = {
        r["doc_id"]: [t for t in r["text"].lower().split() if t]
        for r in df.select("doc_id", "text").collect()
    }
    c12: Counter = Counter()
    for toks in docs.values():
        for a, b in zip(toks, toks[1:]):
            c12[(a, b)] += 1
    c1: Counter = Counter()
    nfollow: Counter = Counter()
    ncont: Counter = Counter()
    for (a, b), c in c12.items():
        c1[a] += c
        nfollow[a] += 1
        ncont[b] += 1
    t = len(c12)

    def p(a, b):
        return (max(c12[(a, b)] - d, 0.0) / c1[a]) + (
            (d * nfollow[a] / c1[a]) * (ncont[b] / t)
        )

    for doc_id, toks in docs.items():
        # floor(x+0.5): Spark/DuckDB round() is half-UP, Python round()
        # is half-even (same trap pagerank_nano documents)
        nanos = [
            int(math.floor(-math.log(p(a, b)) * 1e9 + 0.5))
            for a, b in zip(toks, toks[1:])
        ]
        n = len(nanos)
        want = (n, round(sum(nanos) / n / 1e9, 6)) if n else (0, 0.0)
        assert got[doc_id] == want, doc_id

    vocab_by_ctx = defaultdict(set)
    for a, b in c12:
        vocab_by_ctx[a].add(b)
    seen_w2 = set(ncont)
    for a in list(vocab_by_ctx)[:25]:
        total = sum(p(a, b) for b in seen_w2)
        assert abs(total - 1.0) < 1e-9, (a, total)


def test_containment_pairs_catches_embedded_fragment(spark):
    """The case symmetric Jaccard structurally misses: a short doc
    quoted verbatim inside a much longer one. Containment must be 1.0
    small→big while the Jaccard of the same pair sits far below any
    dedup threshold; unrelated docs must produce no pair."""
    from table_computing_spark.operators import dedup

    quote = "alpha beta gamma delta epsilon zeta eta theta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(60))
    rows = [
        (1, quote),
        (2, filler[: len(filler) // 2] + " " + quote + " " + filler),
        (3, "completely different text with no overlap at all here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_small"], r["id_big"]): r["containment"]
        for r in dedup.containment_pairs(df, threshold=0.8).collect()
    }
    assert got == {(1, 2): 1.0}

    jac = dedup.shingle_jaccard_pairs(df, threshold=0.01).collect()
    j = {(r["id_a"], r["id_b"]): r["jaccard"] for r in jac}
    assert j[(1, 2)] < 0.1, "fragment pair should have tiny Jaccard"


def test_exact_quantiles_matches_numpy_multi_round(spark):
    """Distributed selection must equal numpy's linear-interpolation
    percentiles exactly, with a tiny slice limit forcing several
    histogram-refinement rounds; all-equal and null-bearing columns
    exercise the degenerate paths."""
    import numpy as np
    from pyspark.sql import functions as F

    from table_computing_spark.operators.quantiles import exact_quantiles

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    qs = [0.0, 0.25, 0.5, 0.95, 1.0]
    got = {
        r["q"]: r["value"]
        for r in exact_quantiles(
            li, "l_extendedprice", qs, buckets=32, slice_limit=100, max_rounds=12
        ).collect()
    }
    arr = np.array(
        [r["l_extendedprice"] for r in li.select("l_extendedprice").collect()]
    )
    for q in qs:
        want = float(np.percentile(arr, q * 100, method="linear"))
        assert abs(got[q] - want) < 1e-9, (q, got[q], want)

    const = spark.range(100).select(F.lit(7.5).alias("x"))
    assert {
        r["q"]: r["value"]
        for r in exact_quantiles(const, "x", [0.5], buckets=8, slice_limit=5).collect()
    } == {0.5: 7.5}

    ndf = spark.createDataFrame([(1.0,), (None,), (3.0,), (2.0,)], "x double")
    assert {
        r["q"]: r["value"] for r in exact_quantiles(ndf, "x", [0.5]).collect()
    } == {0.5: 2.0}


def test_ranking_metrics_golden_and_perfect_prediction(spark):
    """Hand-computed golden: truth {a,b,c}, pred hits b@1 and c@3 →
    recall 2/3, MRR 1, NDCG = (1/log2(2) + 1/log2(4)) / ideal(3); a
    perfect prediction scores 1.0 everywhere; a miss scores 0."""
    import math

    from table_computing_spark.operators.similarity import ranking_metrics

    truth = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2), (1, "c", 3), (2, "x", 1)],
        "query_id long, neighbor_id string, rank int",
    )
    pred = spark.createDataFrame(
        [(1, "b", 1), (1, "z", 2), (1, "c", 3), (2, "y", 1)],
        "query_id long, neighbor_id string, rank int",
    )
    got = {
        r["query_id"]: (r["recall_at_k"], r["mrr"], r["ndcg_at_k"])
        for r in ranking_metrics(pred, truth, k=10).collect()
    }

    def nano(x):
        return int(math.floor(1e9 / math.log2(x + 1) + 0.5))

    dcg = nano(1) + nano(3)
    idcg = nano(1) + nano(2) + nano(3)
    assert got[1] == (round(2 / 3, 6), 1.0, round(dcg / idcg, 6))
    assert got[2] == (0.0, 0.0, 0.0)

    perfect = ranking_metrics(truth, truth, k=10)
    assert all(
        (r["recall_at_k"], r["mrr"], r["ndcg_at_k"]) == (1.0, 1.0, 1.0)
        for r in perfect.collect()
    )


def test_robust_outliers_resists_contamination(spark):
    """The scenario mean/stddev detectors fail: a group of ~100 plus
    three extreme points. The MAD detector must flag exactly the
    planted extremes, and a constant group must flag nothing (mad=0
    short-circuit, not divide-by-zero everything)."""
    from pyspark.sql import functions as F

    from table_computing_spark.operators.drift import robust_outliers

    rows = [("a", float(v)) for v in range(100)]
    rows += [("a", 10_000.0), ("a", -9_000.0), ("a", 5_000.0)]
    rows += [("c", 7.0)] * 20
    df = spark.createDataFrame(rows, "g string, value double")
    out = robust_outliers(df, "value", ["g"], k=3.5)
    flagged = {
        (r["g"], r["value"]) for r in out.where("is_outlier").collect()
    }
    assert flagged == {("a", 10_000.0), ("a", -9_000.0), ("a", 5_000.0)}
    cgroup = out.where("g = 'c'").collect()
    assert all(not r["is_outlier"] for r in cgroup)
    assert all(r["mad"] == 0.0 for r in cgroup)


def test_prefix_agg_matches_global_window(spark):
    """Running sum/min/max/count from prefix_agg == the literal
    unpartitioned-window SQL (inclusive AND exclusive frames, ties in
    the order prefix, negative values, any input partitioning) — and
    the plan's only globally ordered window is the one-row-per-partition
    __pid offset table."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from table_computing_spark.operators.prefix import prefix_agg

    rows = [(i, (i * 3) % 17, ((i * 7919) % 2001) - 1000) for i in range(3001)]
    d = spark.createDataFrame(rows, "rid long, tie long, x long").repartition(13)
    order = [F.col("tie"), F.col("rid")]
    for exclusive in (False, True):
        got = prefix_agg(
            d,
            order,
            {
                "run_sum": ("sum", "x"),
                "run_min": ("min", "x"),
                "run_max": ("max", "x"),
                "run_n": ("count", F.lit(1)),
            },
            exclusive=exclusive,
            num_partitions=7,
        )
        end = -1 if exclusive else 0
        w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, end)
        want = (
            d.withColumn("run_sum", F.sum("x").over(w))
            .withColumn("run_min", F.min("x").over(w))
            .withColumn("run_max", F.max("x").over(w))
            .withColumn("run_n", F.count(F.lit(1)).over(w))
        )
        cols = ["run_sum", "run_min", "run_max", "run_n"]
        g = {r["rid"]: tuple(r[c] for c in cols) for r in got.collect()}
        e = {r["rid"]: tuple(r[c] for c in cols) for r in want.collect()}
        assert g == e, f"exclusive={exclusive}"
    # plan: no unpartitioned window over the data (only __pid offsets)
    import io
    import re
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        got.explain("formatted")
    plan = buf.getvalue()
    for blk in re.split(r"\n\n", plan):
        if re.match(r"\(\d+\) Window\b", blk):
            arg = next(
                (l for l in blk.splitlines() if l.startswith("Arguments:")), ""
            )
            if " ASC" in arg or " DESC" in arg:
                assert "__pid#" in arg, arg


def test_welch_ttest_matches_numpy(spark):
    """t / Welch-df against the textbook numpy computation on skewed
    integer samples (ddof=1), and the control group never appears as
    an output row."""
    import numpy as np
    from pyspark.sql import functions as F

    from table_computing_spark.operators.drift import welch_ttest

    rng = np.random.RandomState(7)
    rows = []
    for g, (mu, sd, n) in {
        "a": (1000, 50, 400), "b": (1100, 200, 150), "ctl": (1020, 80, 300)
    }.items():
        for v in rng.normal(mu, sd, n).astype(int):
            rows.append((g, int(v)))
    d = spark.createDataFrame(rows, "grp string, v long")
    out = {
        r["grp"]: r
        for r in welch_ttest(d, F.col("v"), "grp", control="ctl").collect()
    }
    assert set(out) == {"a", "b"}
    arr = {g: np.array([v for gg, v in rows if gg == g], dtype=float)
           for g in ("a", "b", "ctl")}
    for g in ("a", "b"):
        x, c = arr[g], arr["ctl"]
        vx, vc = x.var(ddof=1), c.var(ddof=1)
        se = vx / len(x) + vc / len(c)
        t = (x.mean() - c.mean()) / np.sqrt(se)
        dfw = se**2 / ((vx / len(x)) ** 2 / (len(x) - 1)
                       + (vc / len(c)) ** 2 / (len(c) - 1))
        assert abs(out[g]["t_stat"] - t) < 1e-4, g
        assert abs(out[g]["df_welch"] - dfw) < 1e-2, g
        assert out[g]["n"] == len(x)


def test_lag_autocorr_matches_numpy(spark):
    """Pearson r of (x_t, x_{t-k}) == numpy corrcoef per key; constant
    and too-short series yield NULL."""
    import numpy as np

    from table_computing_spark.operators.temporal import lag_autocorr

    rng = np.random.RandomState(11)
    series = {
        "trend": np.cumsum(rng.randint(-3, 10, 200)) + 500,
        "noise": rng.randint(0, 100, 120),
        "const": np.full(50, 7),
        "short": np.array([3, 9]),
    }
    rows = [
        (k, int(t), int(v))
        for k, xs in series.items()
        for t, v in enumerate(xs)
    ]
    d = spark.createDataFrame(rows, "k string, t long, v long")
    out = {r["k"]: r for r in lag_autocorr(d, ["k"], "t", "v", lag=1).collect()}
    for k in ("trend", "noise"):
        xs = series[k].astype(float)
        want = np.corrcoef(xs[1:], xs[:-1])[0, 1]
        assert abs(out[k]["autocorr"] - want) < 1e-5, k
        assert out[k]["n_pairs"] == len(xs) - 1
    assert out["const"]["autocorr"] is None
    assert out["short"]["n_pairs"] == 1 and out["short"]["autocorr"] is None


def test_url_canonicalize_rules(spark):
    """Each canonicalization rule pinned: case, default ports (per
    scheme), fragments, tracking params, param sorting, trailing
    slashes, schemeless passthrough."""
    from table_computing_spark.operators.text import url_canonicalize

    cases = [
        ("HTTP://Example.COM:80/Path/?utm_source=tw&b=2&a=1#frag",
         "http://example.com/Path?a=1&b=2"),
        ("https://WWW.Example.com:443/a/b//", "https://www.example.com/a/b"),
        ("https://example.com:8080/x?b=2&a=1",
         "https://example.com:8080/x?a=1&b=2"),
        ("http://example.com", "http://example.com/"),
        ("http://example.com/?utm_campaign=x&fbclid=9", "http://example.com/"),
        ("  http://A.com/Q?gclid=1&z=9&ref_src=x&a=2 ", "http://a.com/Q?a=2&z=9"),
        ("not a url", "not a url"),
        # the OTHER scheme's default port must be kept
        ("http://example.com:443/x", "http://example.com:443/x"),
        ("ftp://Host.com:21/f", "ftp://host.com:21/f"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [r[0] for r in df.select(url_canonicalize("u")).collect()]
    assert got == [w for _, w in cases]


def test_prefix_agg_grouped_matches_partitioned_window(spark):
    """partition_by mode == the literal SUM() OVER (PARTITION BY key
    ORDER BY ...) window, including a HOT key whose history spans many
    range partitions (the shape the plain window cannot spread) and a
    key with a single row."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from table_computing_spark.operators.prefix import prefix_agg

    rows = [("hot", i, ((i * 7919) % 401) - 200) for i in range(4000)]
    rows += [("warm", i, i % 23) for i in range(300)]
    rows += [("solo", 0, 42)]
    d = spark.createDataFrame(rows, "k string, t long, x long").repartition(9)
    got = prefix_agg(
        d,
        ["t"],
        {"bal": ("sum", "x"), "peak": ("max", "x"), "n": ("count", F.lit(1))},
        partition_by=["k"],
        num_partitions=11,
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = (
        d.withColumn("bal", F.sum("x").over(w))
        .withColumn("peak", F.max("x").over(w))
        .withColumn("n", F.count(F.lit(1)).over(w))
    )
    cols = ["bal", "peak", "n"]
    g = {(r["k"], r["t"]): tuple(r[c] for c in cols) for r in got.collect()}
    e = {(r["k"], r["t"]): tuple(r[c] for c in cols) for r in want.collect()}
    assert g == e
    # the hot key must actually SPAN partitions (else this test proves
    # nothing about the spread)
    from table_computing_spark.operators.prefix import _MID_SHIFT

    spans = (
        d.repartitionByRange(11, F.col("k"), F.col("t"))
        .withColumn("__pid", F.shiftright(F.monotonically_increasing_id(), _MID_SHIFT))
        .filter(F.col("k") == "hot")
        .select("__pid")
        .distinct()
        .count()
    )
    assert spans >= 3, spans


def test_minhash_estimate_pairs_bounds(spark):
    """Signature-agreement estimate: exactly 1.0 for identical unit
    sets, exactly 0.0 for disjoint ones, and within 4 standard errors
    (4*sqrt(j(1-j)/32) ~ 0.36) of a mid-similarity pair."""
    from pyspark.sql import functions as F

    from table_computing_spark.operators.dedup import (
        minhash_estimate_pairs, ngram_jaccard_pairs)

    docs = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),        # identical to 1
        (3, "one two three four five six"),                # disjoint from 1
        (4, "alpha beta gamma one two three"),             # j = 3/9 vs 1
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "id_a long, id_b long"
    )
    est = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_estimate_pairs(d, pairs, use_tokens=True).collect()
    }
    assert est[(1, 2)] == 1.0
    assert est[(1, 3)] == 0.0
    assert abs(est[(1, 4)] - 3 / 9) <= 0.36
