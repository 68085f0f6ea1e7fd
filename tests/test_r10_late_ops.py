"""Round-10 late additions: degree assortativity + temperature mixing."""

import math

import numpy as np


def _assort(spark, edge_list):
    from vtb_datafusion_2023_spark.operators.graph import degree_assortativity

    edges = spark.createDataFrame(edge_list, "src long, dst long")
    rows = degree_assortativity(edges).collect()
    assert len(rows) == 1
    return rows[0]


def _numpy_assortativity(edge_list):
    und = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
    deg: dict = {}
    for u, v in und:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    xs, ys = [], []
    for u, v in und:
        xs += [deg[u], deg[v]]
        ys += [deg[v], deg[u]]
    return len(und), float(np.corrcoef(xs, ys)[0, 1])


def test_degree_assortativity_star_is_minus_one(spark):
    # K_{1,4}: every edge joins deg-4 hub to a deg-1 leaf -> r = -1
    row = _assort(spark, [(0, 1), (0, 2), (0, 3), (0, 4)])
    assert row.n_edges == 4
    assert abs(row.assortativity - (-1.0)) < 1e-12


def test_degree_assortativity_regular_graph_is_null(spark):
    # triangle: all degrees equal -> zero variance -> NULL (like scipy nan)
    row = _assort(spark, [(1, 2), (2, 3), (3, 1)])
    assert row.n_edges == 3
    assert row.assortativity is None


def test_degree_assortativity_matches_numpy(spark):
    # lollipop + pendant chain, duplicate/reversed/self edges thrown in
    # to exercise the dedupe
    edges = [
        (1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4),
        (6, 7), (7, 8), (2, 1), (4, 3), (5, 5),
    ]
    row = _assort(spark, edges)
    n_ref, r_ref = _numpy_assortativity(edges)
    assert row.n_edges == n_ref
    assert abs(row.assortativity - r_ref) < 1e-12


def test_temperature_mix_weights_quarter_power(spark):
    from vtb_datafusion_2023_spark.operators.filtering import (
        temperature_mix_weights,
    )

    # source b has 16x the tokens of a -> weight ratio 16^0.25 = 2 exactly
    rows = [("a", 10) for _ in range(10)] + [("b", 160) for _ in range(10)]
    df = spark.createDataFrame(rows, "source string, n_tokens long")
    got = {
        r.source: r
        for r in temperature_mix_weights(
            df, sqrt_steps=2, token_budget=1_000_000
        ).collect()
    }
    assert got["a"].n_docs == 10 and got["b"].n_docs == 10
    assert got["a"].n_tokens == 100 and got["b"].n_tokens == 1600
    assert abs(got["b"].weight / got["a"].weight - 2.0) < 1e-12
    assert abs(got["a"].weight + got["b"].weight - 1.0) < 1e-12
    for r in got.values():
        assert abs(r.alloc_tokens - r.weight * 1_000_000.0) < 1e-6
        assert abs(r.epochs - r.alloc_tokens / r.n_tokens) < 1e-12
    # temperature flattens: raw share 16/17 vs mixed share 2/3
    assert got["b"].weight < 1600 / 1700


def test_temperature_mix_matches_numpy_reference(spark):
    from vtb_datafusion_2023_spark.operators.filtering import (
        temperature_mix_weights,
    )

    counts = {"s0": 7, "s1": 9973, "s2": 123456, "s3": 31}
    rows = [(s, int(n)) for s, n in counts.items()]
    df = spark.createDataFrame(rows, "source string, n_tokens long")
    got = {
        r.source: r
        for r in temperature_mix_weights(
            df, sqrt_steps=2, token_budget=5_000_000
        ).collect()
    }
    w_raw = {s: math.sqrt(math.sqrt(float(n))) for s, n in counts.items()}
    denom = 0.0
    for s in sorted(counts):
        denom += w_raw[s]
    for s, n in counts.items():
        w = w_raw[s] / denom
        assert abs(got[s].weight - w) < 1e-15
        assert abs(got[s].epochs - (w * 5_000_000.0) / n) < 1e-9


def test_temperature_mix_single_source_gets_everything(spark):
    from vtb_datafusion_2023_spark.operators.filtering import (
        temperature_mix_weights,
    )

    df = spark.createDataFrame([("only", 42)], "source string, n_tokens long")
    row = temperature_mix_weights(df, token_budget=777).collect()[0]
    assert row.weight == 1.0
    assert row.alloc_tokens == 777.0


def test_int8_rerank_full_coarse_equals_bruteforce(spark, sf_small):
    """With k_coarse >= corpus size stage 1 prunes nothing, so the final
    ranking must EQUAL brute-force cosine top-k bit-for-bit."""
    from pyspark.sql import functions as F

    from vtb_datafusion_2023_spark.operators.similarity import (
        cosine_topk,
        int8_rerank_topk,
    )
    from vtb_datafusion_2023_spark.suite.datapipe import T

    emb = T(spark, sf_small, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5)
    n = emb.count()
    exact = {tuple(r) for r in cosine_topk(emb, qs, k=5).collect()}
    funnel = {
        (r.query_id, r.neighbor_id, r.rank, r.cos)
        for r in int8_rerank_topk(emb, qs, k_coarse=n, k=5).collect()
    }
    assert funnel == exact and len(exact) == 25


def test_int8_coarse_score_matches_numpy_and_tracks_cosine(spark, sf_small):
    from pyspark.sql import functions as F

    from vtb_datafusion_2023_spark.operators.similarity import int8_rerank_topk
    from vtb_datafusion_2023_spark.suite.datapipe import T

    emb = T(spark, sf_small, "embeddings")
    qs = emb.filter(F.col("vec_id") < 3)
    rows = int8_rerank_topk(emb, qs, k_coarse=8, k=8).collect()
    assert rows
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}

    def q8(x):
        s = 127.0 / np.abs(x).max()
        return np.floor(x * s + 0.5).astype(np.int64)

    for r in rows:
        qa, ca = q8(vecs[r.query_id]), q8(vecs[r.neighbor_id])
        ref = float(qa @ ca) / (
            math.sqrt(float(qa @ qa)) * math.sqrt(float(ca @ ca))
        )
        assert abs(r.cos8 - ref) < 1e-12
        # 32-dim int8 quantization: coarse score tracks true cosine
        assert abs(r.cos8 - r.cos) < 0.05


def _phash_img(d):
    import hashlib

    by, bx = np.meshgrid(np.arange(8), np.arange(9), indexing="ij")
    base = np.array(
        [
            [
                1
                + int(hashlib.md5(f"{d % 101}:{r}:{c}".encode()).hexdigest()[:8], 16)
                % 220
                for c in range(9)
            ]
            for r in range(8)
        ],
        dtype=np.int64,
    )
    vb = base + 23 * ((d % 5 == 0) & ((by + bx) % 7 == 0))
    vpix = np.repeat(np.repeat(vb, 4, axis=0), 4, axis=1)
    yy, xx = np.meshgrid(np.arange(32), np.arange(36), indexing="ij")
    vpix = vpix + ((yy + xx + d) % 2)
    return np.stack([vpix - 1, vpix, vpix + 1], axis=2).astype(np.uint8)


def test_dhash_noise_invariant_but_bytes_differ():
    """The per-doc checkerboard noise phase changes the ENCODED BYTES
    but not the perceptual hash — the property the dedup head exists
    to exploit."""
    from vtb_datafusion_2023_spark.operators.codecs import decode_png, encode_png
    from vtb_datafusion_2023_spark.operators.multimodal import dhash64

    a, b = _phash_img(101), _phash_img(202)  # same cluster, odd/even noise
    pa, pb = encode_png(a, filter_mode="cycle"), encode_png(b, filter_mode="cycle")
    assert pa != pb
    assert dhash64(decode_png(pa)) == dhash64(decode_png(pb))


def test_dhash_perturbed_variant_is_near_not_equal():
    from vtb_datafusion_2023_spark.operators.multimodal import dhash64

    # docs d%5==0 carry the 23-level block perturb; same cluster base
    # -> few bits differ across several clusters, never zero overall,
    # never a rehash-everything blowup
    hams = []
    for d in (0, 5, 10, 15, 20):  # clusters 0, 5, 10, 15, 20
        hp = dhash64(_phash_img(d))
        hu = dhash64(_phash_img(d + 202))  # same cluster (202 = 2*101)
        assert (d + 202) % 101 == d % 101 and (d + 202) % 5 != 0
        ham = bin(hp[0] ^ hu[0]).count("1") + bin(hp[1] ^ hu[1]).count("1")
        hams.append(ham)
    assert sum(hams) >= 1 and max(hams) <= 20


def test_dhash_packing_matches_manual_bits():
    from vtb_datafusion_2023_spark.operators.multimodal import dhash64

    img = _phash_img(77)
    g = img.astype(np.int64).sum(axis=2) // 3
    blocks = g.reshape(8, 4, 9, 4).sum(axis=(1, 3)) // 16
    hi = lo = 0
    for r in range(8):
        for c in range(8):
            if blocks[r][c + 1] > blocks[r][c]:
                if r < 4:
                    lo |= 1 << (r * 8 + c)
                else:
                    hi |= 1 << ((r - 4) * 8 + c)
    assert dhash64(img) == (hi, lo)


def test_phash_canonicalize_groups_noise_variants(spark):
    from vtb_datafusion_2023_spark.operators.multimodal import phash_canonicalize

    hashed = spark.createDataFrame(
        [(1, 10, 20), (5, 10, 20), (3, 10, 21), (9, 11, 20)],
        "doc_id long, phash_hi long, phash_lo long",
    )
    got = {r.doc_id: (r.canon_doc, r.group_size) for r in phash_canonicalize(hashed).collect()}
    assert got == {1: (1, 2), 5: (1, 2), 3: (3, 1), 9: (9, 1)}


def test_phash_near_pairs_merge_perturb_groups(spark, sf_small):
    """The near head must find the perturb-variant <-> cluster-base rep
    pairs (hamming in [1, 7], never 0 — those collapsed in the exact
    group stage) and every returned pair must share >= 1 byte chunk
    (the pigeonhole guarantee it was built on)."""
    from vtb_datafusion_2023_spark.suite.datapipe import mm_phash_near_pairs

    rows = mm_phash_near_pairs(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert 1 <= r.hamming <= 7
        assert r.rep_a < r.rep_b
        assert r.size_a >= 1 and r.size_b >= 1


def test_minhash_band_candidates_catch_exact_dupes(spark):
    """Identical texts produce identical signatures in EVERY band, so
    the candidate stage can never miss an exact duplicate (recall floor
    of the dd_lsh_recall_eval gate); disjoint-vocab docs share no
    shingle, hence no bucket."""
    from vtb_datafusion_2023_spark.operators.dedup import (
        _bucket_candidate_pairs,
        minhash_md5_band_table,
    )

    rows = [(i, "alpha beta gamma delta epsilon zeta") for i in range(4)]
    rows.append((10, "one two three four five six"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    banded = minhash_md5_band_table(docs, "doc_id", "text", 16, 4, 3)
    got = {
        (r.id_a, r.id_b)
        for r in _bucket_candidate_pairs(banded, max_bucket_size=100).collect()
    }
    assert got == {(a, b) for a in range(4) for b in range(4) if a < b}
