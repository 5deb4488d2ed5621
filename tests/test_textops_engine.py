"""Engine-side (non-oracle) text-dedup paths: xxhash64 MinHash banding at
scale (no token dictionary), verified against brute-force Jaccard on
planted near-duplicates."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from engine import io as eio  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
N_PERMS = 16
N_BANDS = 8  # 2 rows per band


def _shingles_col():
    """3-gram word shingles — order-sensitive, unlike token sets (the
    fixture's tiny vocabulary makes token-set Jaccard useless: unrelated
    long docs share nearly the whole vocabulary)."""
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    return F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 3),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
                F.element_at(toks, i + 3),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def minhash_xxhash(docs, n_perms=N_PERMS):
    """Scale-path MinHash over shingles: hash = xxhash64 (no dictionary
    build, no global window) — cost O(shingles), one shuffle."""
    tok = docs.select("doc_id", F.explode(_shingles_col()).alias("w")).distinct()
    tok = tok.withColumn("h", F.xxhash64("w"))
    perms = tok.sparkSession.range(n_perms).select(F.col("id").alias("p"))
    return (
        tok.crossJoin(F.broadcast(perms))
        .groupBy("doc_id", "p")
        .agg(F.min(F.xxhash64("h", "p")).alias("mh"))
    )


def lsh_band_pairs(sigs, rows_per_band=2):
    banded = sigs.withColumn("band", (F.col("p") / rows_per_band).cast("int"))
    keys = banded.groupBy("doc_id", "band").agg(
        F.xxhash64(F.sort_array(F.collect_list(F.struct("p", "mh")))).alias(
            "band_key"
        )
    )
    a, b = keys.alias("a"), keys.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


@pytest.fixture(scope="module")
def docs_with_neardups(spark):
    """Plant near-duplicates: doc_id+10000 = same text with one word
    appended (Jaccard ≈ 0.95+)."""
    base = eio.read_table(spark, SF_DIR, "documents").filter(F.col("doc_id") < 40)
    dup = base.select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat("text", F.lit(" zzz")).alias("text"),
    )
    out = base.select("doc_id", "text").unionByName(dup)
    out.cache().count()
    return out


def test_minhash_lsh_finds_planted_neardups(spark, docs_with_neardups):
    sigs = minhash_xxhash(docs_with_neardups)
    pairs = lsh_band_pairs(sigs).toPandas()
    found = set(zip(pairs["doc_a"], pairs["doc_b"]))
    planted = {(i, i + 10000) for i in range(40)}
    recall = len(found & planted) / len(planted)
    assert recall >= 0.9, f"planted near-dup recall {recall}"


def test_minhash_lsh_verify_step_precision(spark, docs_with_neardups):
    """LSH candidates are only *candidates* — the fixture docs share a tiny
    vocabulary so token-SET Jaccard between random docs is genuinely high
    and band collisions abound. The dedup decision is candidates -> exact
    Jaccard verify; at J>=0.9 exactly the planted pairs must survive."""
    sigs = minhash_xxhash(docs_with_neardups)
    cand = lsh_band_pairs(sigs)
    tok = (
        docs_with_neardups.select(
            "doc_id", F.explode(_shingles_col()).alias("w")
        ).distinct()
    )
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = tok.withColumnRenamed("doc_id", "doc_a")
    b = tok.withColumnRenamed("doc_id", "doc_b")
    inter = (
        cand.join(a, "doc_a")
        .join(b, ["doc_b", "w"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    j = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
        .withColumn("jacc", F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")))
    )
    verified = {
        (r["doc_a"], r["doc_b"])
        for r in j.filter(F.col("jacc") >= 0.9).collect()
    }
    planted = {(i, i + 10000) for i in range(40)}
    missing = planted - verified
    assert len(missing) <= 4, f"planted pairs lost: {sorted(missing)[:5]}"
    extras = verified - planted
    assert len(extras) <= 4, f"unexpected J>=0.9 pairs: {sorted(extras)[:5]}"


def test_signature_stability_across_partitioning(spark, docs_with_neardups):
    s1 = minhash_xxhash(docs_with_neardups).toPandas()
    s2 = minhash_xxhash(docs_with_neardups.repartition(7)).toPandas()
    k = ["doc_id", "p"]
    assert s1.sort_values(k, ignore_index=True).equals(
        s2.sort_values(k, ignore_index=True)
    )


def test_connected_components_known_graph(spark):
    """Min-label propagation must find true components, not 1-hop minima:
    a chain 5-4-3-2-1 needs multiple rounds to converge to 1."""
    from engine.graph import connected_components

    edges = spark.createDataFrame(
        [(5, 4), (4, 3), (3, 2), (2, 1), (10, 11), (20, 20)],
        "u long, v long",
    )
    got = {
        r["node"]: r["component_id"]
        for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 20: 20}


def test_components_refine_one_hop_canonicals(spark):
    """The fixpoint must be at least as coarse as 1-hop canonicalization
    and strictly coarser when chains exist (observed on the fixture)."""
    import __spark_entry__ as entrymod

    one_hop = entrymod.queries()["neardup_canonical_docs"](spark, SF_DIR).toPandas()
    comps = entrymod.queries()["neardup_components_docs"](spark, SF_DIR).toPandas()
    m = one_hop.merge(comps, on="doc_id")
    # component id is a lower bound of the 1-hop canonical id everywhere
    assert (m["component_id"] <= m["canonical_id"]).all()
    assert m["component_id"].nunique() <= m["canonical_id"].nunique()


def test_chain_candidates_survive_false_positive_bucket_min(spark):
    """ADVICE r3 recall hazard, fixed by star+chain candidates: plant a
    bucket whose MINIMUM doc_id is an LSH false positive (collides in every
    band but fails Jaccard verify). Star-only candidates then never test
    the true near-dup pair behind it; the chain edge (nearest-lower-id
    bucket neighbour) recovers it."""
    from engine.textops import (
        _MH_PRIME,
        _N_PERMS,
        neardup_verified_pairs,
        tok_hash,
    )

    S = [f"s{i:02d}" for i in range(20)]
    junk = [f"j{i:03d}" for i in range(200)]
    tids = dict(
        spark.createDataFrame([(w,) for w in S + junk], "w string")
        .select("w", tok_hash(F.col("w")).alias("tid"))
        .collect()
    )

    def key(w, p):
        return (1000003 * tids[w] + 17 * (p + 1)) % _MH_PRIME

    # per-perm minima of S and the words that achieve them
    minima = {p: min(key(w, p) for w in S) for p in range(_N_PERMS)}
    minimizers = {
        next(w for w in S if key(w, p) == minima[p]) for p in range(_N_PERMS)
    }
    # junk words that never undercut any perm minimum of S: adding them to
    # the false-positive doc leaves its minhash signature identical to S's
    safe_junk = [
        w
        for w in junk
        if all(key(w, p) > minima[p] for p in range(_N_PERMS))
    ][:30]
    assert len(safe_junk) == 30
    fp_tokens = sorted(minimizers) + safe_junk
    # Jaccard(F, S) = |minimizers| / (|S| + |junk|) <= 8/50 — far below 0.5
    assert len(minimizers) / (len(S) + len(safe_junk)) < 0.5

    docs = spark.createDataFrame(
        [
            (1, " ".join(fp_tokens)),          # false positive, lowest id
            (2, " ".join(S)),                  # true dup
            (3, " ".join(S)),                  # true dup
            (9, "completely unrelated filler words here"),
        ],
        "doc_id long, text string",
    )

    def pairs(mode):
        return {
            (r["doc_a"], r["doc_b"])
            for r in neardup_verified_pairs(spark, docs, candidates=mode).collect()
        }

    star = pairs("star")
    chain = pairs("star_chain")
    # the FP min shares every band with {2,3}, so star offers only
    # (1,2)/(1,3) — both fail verify — and never tests (2,3)
    assert (2, 3) not in star
    assert (2, 3) in chain
    # the false-positive edges themselves are correctly rejected either way
    assert not {(1, 2), (1, 3)} & chain
    # recall is monotone: chain candidates only ever add verified pairs
    assert star <= chain


def test_connected_components_logn_rounds_on_path_graph(spark):
    """The adversarial topology for min-label propagation: a 10k-node path
    (diameter 9999). Propagate + double pointer-jump must converge in
    O(log n) rounds — ≤ ceil(log2 n) + 1 — where the old loop needed
    O(diameter)."""
    import math

    from engine.graph import connected_components

    n = 10_000
    edges = spark.range(n - 1).select(
        F.col("id").alias("u"), (F.col("id") + 1).alias("v")
    )
    stats = {}
    # driver_threshold=0 forces the DISTRIBUTED loop — this test pins its
    # O(log n) round bound (the numpy fast path would otherwise absorb a
    # 10k-edge graph)
    lbl = connected_components(edges, stats=stats, driver_threshold=0)
    assert stats["rounds"] <= math.ceil(math.log2(n)) + 1, stats
    assert "driver" not in stats
    assert lbl.filter(F.col("component_id") != 0).count() == 0
    assert lbl.count() == n


def test_connected_components_driver_path_parity(spark):
    """The bounded-collect numpy fast path returns exactly the distributed
    result — same (node, component_id = min id) rows — on a mixed topology
    (two chains, a star, a triangle bridge, singleton-free)."""
    from engine.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (20, 21), (20, 22),
         (20, 23), (4, 10), (30, 31), (31, 32), (32, 30)],
        "u long, v long",
    )
    stats_d, stats_s = {}, {}
    fast = {
        (r["node"], r["component_id"])
        for r in connected_components(edges, stats=stats_d).collect()
    }
    slow = {
        (r["node"], r["component_id"])
        for r in connected_components(
            edges, stats=stats_s, driver_threshold=0
        ).collect()
    }
    assert stats_d.get("driver") is True
    assert "driver" not in stats_s
    assert fast == slow
    # chains 1-2-3-4-10-11-12 merged via the 4-10 bridge
    assert (12, 1) in fast and (21, 20) in fast and (32, 30) in fast


def test_fused_lsh_rows_match_hof_reference(spark):
    """Round-6 optimization guard: the fused Arrow LSH front-end
    (_lsh_doc_rows) must reproduce the HOF reference pipeline exactly —
    token-id sets, sizes, and banded minhash keys — including on non-ASCII
    and empty/whitespace documents (Python ord / split(' ') vs JVM
    ascii / F.split parity)."""
    from engine.textops import (_bands_from_rows, _doc_token_ids,
                                _lsh_doc_rows, _minhash_bands)

    base = eio.read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    extra = spark.createDataFrame(
        [
            (90001, "héllo wörld 你好 你好 a😀b"),
            (90002, "  doubled  spaces   here "),
            (90003, ""),
            (90004, "    "),
            (90005, "naïve café naïve x"),
        ],
        "doc_id long, text string",
    )
    docs = base.unionByName(extra)
    rows = _lsh_doc_rows(docs)

    tw_ref = _doc_token_ids(docs)
    got_tids = sorted(
        (r["doc_id"], t)
        for r in rows.collect()
        for t in r["tids"]
    )
    want_tids = sorted((r["doc_id"], r["tid"]) for r in tw_ref.collect())
    assert got_tids == want_tids

    got_sizes = {r["doc_id"]: r["n"] for r in rows.collect()}
    want_sizes = {
        r["doc_id"]: r["n"]
        for r in tw_ref.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    assert got_sizes == want_sizes

    got_bands = sorted(
        (r["doc_id"], r["band"], r["band_key"])
        for r in _bands_from_rows(rows).collect()
    )
    want_bands = sorted(
        (r["doc_id"], r["band"], r["band_key"])
        for r in _minhash_bands(spark, tw_ref).collect()
    )
    assert got_bands == want_bands
