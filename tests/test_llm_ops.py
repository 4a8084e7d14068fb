"""Property tests for the training-data pipeline operators: fuzzy dedup
recall/precision vs the exact similarity join, SimHash behavior on
synthetic near-duplicates, LSH ANN recall vs brute force, and the
multimodal plumbing contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ser_etl_spark.operators.dedup import (
    dedup_exact,
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from ser_etl_spark.operators.multimodal import (
    decode_media,
    extract_features,
    sample_frames,
    with_fake_payload,
)
from ser_etl_spark.operators.packing import greedy_pack, pack_sequences
from ser_etl_spark.operators.similarity import (
    cosine_topk,
    embedding_neardup_pairs,
    ivf_ann_topk,
    ivf_assign,
    ivf_centroids,
    lsh_ann_topk,
)
from ser_etl_spark.sources.parquet import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_small):
    return load_table(spark, sf_small, "documents")


@pytest.fixture(scope="module")
def vectors(spark, sf_small):
    return load_table(spark, sf_small, "embeddings")


@pytest.fixture(scope="module")
def docs_with_dups(spark, docs):
    """Corpus + synthetic near-duplicates: copies of 5 docs with the
    first token changed (very high but not perfect jaccard)."""
    perturbed = (
        docs.filter(F.col("doc_id") < 5)
        .withColumn("doc_id", F.col("doc_id") + 100000)
        .withColumn("text", F.concat(F.lit("zzz "), F.col("text")))
    )
    return docs.unionByName(perturbed)


class TestFuzzyDedup:
    def test_sized_shingle_rows_matches_shingle_rows(self, docs):
        """The r14 in-row-size base of the similarity joins: row set
        identical to shingle_rows (collect_set's in-group dedup replaces
        distinct), and nsh equals the doc's distinct-shingle count on
        every row (the Jaccard/containment denominators ride these, so
        any drift here is a wrong-answer bug, not a perf bug)."""
        from ser_etl_spark.operators.dedup import (
            shingle_rows,
            sized_shingle_rows,
        )

        plain = {
            (r["doc_id"], r["sh"]) for r in shingle_rows(docs).collect()
        }
        sized = sized_shingle_rows(docs).collect()
        assert {(r["doc_id"], r["sh"]) for r in sized} == plain
        counts: dict[int, int] = {}
        for d, _ in plain:
            counts[d] = counts.get(d, 0) + 1
        assert all(r["nsh"] == counts[r["doc_id"]] for r in sized)

    def test_minhash_subset_of_exact_join(self, docs):
        exact = {
            (r["doc_a"], r["doc_b"])
            for r in ngram_jaccard_pairs(docs, 0.5, max_shingle_df=None).collect()
        }
        lsh = {
            (r["doc_a"], r["doc_b"])
            for r in minhash_lsh_pairs(docs, 0.5).collect()
        }
        # verification makes LSH precise: no false positives possible
        assert lsh <= exact

    def test_minhash_recall_on_high_similarity(self, docs):
        exact_high = {
            (r["doc_a"], r["doc_b"])
            for r in ngram_jaccard_pairs(docs, 0.8, max_shingle_df=None).collect()
        }
        lsh = {
            (r["doc_a"], r["doc_b"])
            for r in minhash_lsh_pairs(docs, 0.5).collect()
        }
        # 16x4 banding: P(candidate) at j=0.8 is ~1-(1-0.8^4)^16 ~ 0.9996
        assert exact_high, "fixture should contain high-sim pairs"
        assert exact_high <= lsh

    def test_minhash_finds_synthetic_neardups(self, docs_with_dups):
        pairs = {
            (r["doc_a"], r["doc_b"])
            for r in minhash_lsh_pairs(docs_with_dups, 0.5).collect()
        }
        for i in range(5):
            assert (i, i + 100000) in pairs

    def test_simhash_finds_synthetic_neardups(self, docs_with_dups):
        # one added token flips 4-8 of 64 bits on these short docs
        # (measured); 8 chunks guarantee blocking recall at hamming <= 7
        pairs = {
            (r["doc_a"], r["doc_b"])
            for r in simhash_pairs(
                docs_with_dups, max_hamming=8, chunks=8
            ).collect()
        }
        found = sum((i, i + 100000) in pairs for i in range(5))
        assert found >= 4

    def test_dedup_exact_keeps_lowest_id(self, spark):
        df = spark.createDataFrame(
            [(1, "same"), (5, "same"), (3, "other")], ["doc_id", "text"]
        )
        kept = {r["doc_id"] for r in dedup_exact(df).collect()}
        assert kept == {1, 3}
        groups = {
            r["doc_id"]: r["copies"] for r in exact_duplicates(df).collect()
        }
        assert groups == {1: 2, 3: 1}


class TestSimilarity:
    def test_topk_self_is_nearest(self, vectors):
        vec = list(
            vectors.filter(F.col("vec_id") == 0).first()["embedding"]
        )
        top = cosine_topk(vectors, vec, k=5).collect()
        assert top[0]["vec_id"] == 0
        assert top[0]["cos_sim"] == pytest.approx(1.0, abs=1e-4)
        sims = [r["cos_sim"] for r in top]
        assert sims == sorted(sims, reverse=True)

    def test_lsh_ann_contains_query_and_subsets_corpus(self, vectors):
        vec = list(
            vectors.filter(F.col("vec_id") == 0).first()["embedding"]
        )
        approx = lsh_ann_topk(vectors, vec, k=10, planes=8)
        rows = approx.collect()
        # the query vector's own bucket always contains itself -> rank 1
        assert rows[0]["vec_id"] == 0
        # single-probe bucket at 8 planes shrinks the scanned corpus
        assert 1 <= len(rows) <= 10

    def test_multiprobe_widens_candidates_and_recall(self, vectors):
        """Multi-probe must scan a superset of the single-probe
        CANDIDATE set (observed by ranking with k >= corpus, which
        returns every candidate) and must not lose top-k recall vs
        exact — the whole point of the recall lever."""
        from ser_etl_spark.operators.similarity import lsh_ann_multiprobe

        vec = list(vectors.filter(F.col("vec_id") == 0).first()["embedding"])
        n = vectors.count()
        single_cand = {
            r["vec_id"] for r in lsh_ann_topk(vectors, vec, k=n).collect()
        }
        multi_cand = {
            r["vec_id"]
            for r in lsh_ann_multiprobe(vectors, vec, k=n).collect()
        }
        assert 0 in multi_cand  # the query's own bucket is always probed
        assert single_cand <= multi_cand
        assert len(multi_cand) < n  # still pruning, not brute force

        exact = {r["vec_id"] for r in cosine_topk(vectors, vec, k=10).collect()}
        single = {r["vec_id"] for r in lsh_ann_topk(vectors, vec, k=10).collect()}
        multi = {
            r["vec_id"]
            for r in lsh_ann_multiprobe(vectors, vec, k=10).collect()
        }
        assert len(multi & exact) >= len(single & exact)
        # max_mismatches = planes degenerates to exact brute force
        full = {
            r["vec_id"]
            for r in lsh_ann_multiprobe(
                vectors, vec, k=10, max_mismatches=4
            ).collect()
        }
        assert full == exact

    def test_neardup_blocks_by_label(self, vectors):
        pairs = embedding_neardup_pairs(vectors, threshold=0.35).collect()
        labels = {
            r["label"]
            for r in pairs
        }
        by_id = {r["vec_id"]: r["label"] for r in vectors.collect()}
        for r in pairs:
            assert by_id[r["id_a"]] == by_id[r["id_b"]] == r["label"]


class TestIVF:
    def test_assignment_covers_corpus_once(self, vectors):
        assigned = ivf_assign(vectors).collect()
        assert len(assigned) == vectors.count()
        cids = {r["centroid_id"] for r in assigned}
        assert cids <= set(range(8))

    def test_centroid_vectors_assign_to_themselves(self, vectors):
        assigned = {
            r["vec_id"]: r["centroid_id"] for r in ivf_assign(vectors).collect()
        }
        for cid in range(8):
            assert assigned[cid] == cid  # cos(v, v) = 1 is the max

    def test_ann_recall_vs_bruteforce(self, vectors):
        vec = list(vectors.filter(F.col("vec_id") == 0).first()["embedding"])
        exact = [r["vec_id"] for r in cosine_topk(vectors, vec, k=10).collect()]
        approx = [
            r["vec_id"]
            for r in ivf_ann_topk(vectors, vec, k=10, nprobe=4).collect()
        ]
        assert approx[0] == 0  # the query's own list is always probed
        # probing half the lists should recover most of the true top-10
        recall = len(set(exact) & set(approx)) / 10
        assert recall >= 0.5

    def test_nprobe_full_equals_bruteforce(self, vectors):
        vec = list(vectors.filter(F.col("vec_id") == 0).first()["embedding"])
        exact = [r["vec_id"] for r in cosine_topk(vectors, vec, k=10).collect()]
        full = [
            r["vec_id"]
            for r in ivf_ann_topk(vectors, vec, k=10, nprobe=8).collect()
        ]
        assert full == exact  # nprobe = num_centroids degenerates to exact

    def test_centroids_are_deterministic(self, vectors):
        assert ivf_centroids(vectors) == ivf_centroids(vectors)


class TestPacking:
    def test_greedy_reference(self):
        # items: 600+300 fit; 500 opens bin 1; 2000 oversized -> own bin
        assert greedy_pack([600, 300, 500, 2000, 10], 1024) == [
            (0, 0), (0, 600), (1, 0), (2, 0), (3, 0),
        ]

    def test_every_doc_packed_once(self, docs):
        packed = pack_sequences(docs).collect()
        assert len(packed) == docs.count()
        assert len({r["doc_id"] for r in packed}) == len(packed)

    def test_bins_respect_budget(self, docs):
        packed = pack_sequences(docs, budget=1024).collect()
        bins: dict[tuple, list] = {}
        for r in packed:
            bins.setdefault((r["source"], r["shard"], r["bin_id"]), []).append(r)
        for members in bins.values():
            total = sum(r["n_tokens"] for r in members)
            assert total <= 1024 or len(members) == 1  # oversized solo doc

    def test_matches_reference_packer_per_group(self, docs):
        packed = pack_sequences(docs, budget=1024).collect()
        groups: dict[tuple, list] = {}
        for r in packed:
            groups.setdefault((r["source"], r["shard"]), []).append(r)
        for members in groups.values():
            members.sort(key=lambda r: r["doc_id"])
            expect = greedy_pack([r["n_tokens"] for r in members], 1024)
            got = [(r["bin_id"], r["bin_pos"]) for r in members]
            assert got == expect

    def test_deterministic_across_runs(self, docs):
        a = sorted(map(str, pack_sequences(docs).collect()))
        b = sorted(map(str, pack_sequences(docs.repartition(7)).collect()))
        assert a == b


class TestMultimodal:
    def test_decode_stub_raises_without_fake(self):
        with pytest.raises(NotImplementedError):
            decode_media(b"abc", "image")

    def test_features_deterministic_and_shaped(self, spark, docs):
        media = with_fake_payload(docs.select("doc_id").limit(50))
        a = extract_features(media).collect()
        b = extract_features(media).collect()
        assert len(a) == 50
        assert all(len(r["features"]) == 8 for r in a)
        assert sorted(map(str, a)) == sorted(map(str, b))
        # features are unit-interval floats
        assert all(0.0 <= v < 1.0 for r in a for v in r["features"])

    def test_payload_dropped_from_feature_output(self, spark, docs):
        media = with_fake_payload(docs.select("doc_id").limit(5))
        out = extract_features(media)
        assert set(out.columns) == {"doc_id", "features"}

    def test_frame_sampling(self, spark, docs):
        media = with_fake_payload(docs.select("doc_id").limit(60))
        frames = sample_frames(media, every_n=30).collect()
        assert frames  # fixture ids include video rows (id % 3 == 2)
        by_doc: dict[int, list[int]] = {}
        for r in frames:
            by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
        for doc_id, idxs in by_doc.items():
            assert idxs == sorted(idxs)
            assert all(i % 30 == 0 for i in idxs)


class TestDuplicateClusters:
    def test_transitive_chain_collapses(self, spark):
        from ser_etl_spark.operators.dedup import duplicate_clusters

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)],
            "doc_a bigint, doc_b bigint",
        )
        got = {
            r["doc_id"]: (r["cluster_id"], r["is_survivor"])
            for r in duplicate_clusters(pairs).collect()
        }
        assert got == {
            1: (1, True), 2: (1, False), 3: (1, False), 4: (1, False),
            10: (10, True), 11: (10, False),
            20: (20, True), 21: (20, False), 22: (20, False),
        }

    def test_synthetic_neardups_cluster_with_original(self, spark, docs_with_dups):
        from ser_etl_spark.operators.dedup import duplicate_clusters

        pairs = ngram_jaccard_pairs(docs_with_dups, 0.5, max_shingle_df=None)
        clusters = {
            r["doc_id"]: r["cluster_id"]
            for r in duplicate_clusters(pairs).collect()
        }
        for i in range(5):
            assert clusters.get(i + 100000) == clusters.get(i)


class TestDatasetSplit:
    def test_split_is_complete_disjoint_and_deterministic(self, spark, sf_small):
        from ser_etl_spark.operators.sampling import assign_split
        from ser_etl_spark.sources.parquet import load_table

        docs = load_table(spark, sf_small, "documents").select("doc_id")
        a = dict(assign_split(docs, "doc_id").collect())
        b = dict(assign_split(docs.repartition(7), "doc_id").collect())
        # every doc assigned, same answer under any partitioning
        assert set(a.values()) <= {"train", "val", "test"}
        assert None not in a.values()
        assert a == b

    def test_split_proportions_near_targets(self, spark, sf_medium):
        from ser_etl_spark.operators.sampling import assign_split
        from ser_etl_spark.sources.parquet import load_table

        docs = load_table(spark, sf_medium, "documents").select("doc_id")
        counts = {
            r["split"]: r["n"]
            for r in assign_split(docs, "doc_id")
            .groupBy("split")
            .count()
            .withColumnRenamed("count", "n")
            .collect()
        }
        total = sum(counts.values())
        assert abs(counts["train"] / total - 0.80) < 0.03
        assert abs(counts["val"] / total - 0.10) < 0.02
        assert abs(counts["test"] / total - 0.10) < 0.02

    def test_split_bucket_no_overflow_on_extreme_ids(self, spark):
        """Ids near int64 max must hash without wrapping (and match DuckDB,
        which raises on BIGINT overflow rather than wrapping)."""
        import duckdb

        from ser_etl_spark.operators.sampling import (
            sql_split_bucket,
            split_bucket,
        )

        ids = [0, 1, 2**31 - 1, 2**31, 2**32 - 1, 2**32,
               2**62, 2**63 - 1, 123456789012345]
        df = spark.createDataFrame([(i,) for i in ids], "id long")
        got = {
            r["id"]: r["b"]
            for r in df.select("id", split_bucket("id").alias("b")).collect()
        }
        con = duckdb.connect()
        for i in ids:
            (want,) = con.execute(
                f"SELECT {sql_split_bucket(str(i))}"
            ).fetchone()
            assert got[i] == want, f"id={i}: spark={got[i]} duckdb={want}"
            assert 0 <= got[i] < 100
        con.close()


class TestEmbeddingQuantize:
    def test_reconstruction_error_bounded(self, spark, sf_small):
        from ser_etl_spark.operators.similarity import quantize_embeddings
        from ser_etl_spark.sources.parquet import load_table

        emb = load_table(spark, sf_small, "embeddings")
        q = quantize_embeddings(emb).select("vec_id", "embedding", "qvec", "scale")
        rows = q.collect()
        assert rows
        for r in rows:
            assert len(r["qvec"]) == len(r["embedding"])
            assert all(-127 <= v <= 127 for v in r["qvec"])
            # dequantized component within half a quantization step
            for x, qv in zip(r["embedding"], r["qvec"]):
                assert abs(qv * r["scale"] - x) <= r["scale"] / 2 + 1e-9

    def test_quantized_cosine_close_to_exact(self, spark, sf_small):
        """Ranking-quality sanity: int8 cosine tracks float cosine."""
        import math

        from ser_etl_spark.operators.similarity import quantize_embeddings
        from ser_etl_spark.sources.parquet import load_table

        emb = load_table(spark, sf_small, "embeddings").limit(50)
        rows = quantize_embeddings(emb).select("embedding", "qvec").collect()

        def cos(a, b):
            num = sum(x * y for x, y in zip(a, b))
            return num / (
                math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
            )

        base = rows[0]
        for other in rows[1:6]:
            exact = cos(base["embedding"], other["embedding"])
            approx = cos(base["qvec"], other["qvec"])
            assert abs(exact - approx) < 0.02

    def test_zero_vector_quantizes_to_zeros(self, spark):
        from ser_etl_spark.operators.similarity import quantize_embeddings

        df = spark.createDataFrame(
            [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])],
            "vec_id bigint, embedding array<float>",
        )
        rows = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
        assert rows[1]["qvec"] == [0, 0, 0]
        assert all(v is not None for v in rows[2]["qvec"])


class TestPiiScrub:
    def test_detects_and_redacts_synthetic_pii(self, spark):
        from ser_etl_spark.operators.text import pii_scrub

        docs = spark.createDataFrame(
            [
                (1, "contact me at jane.doe+x@example.co.uk or call +1-555-123-4567 today"),
                (2, "no pii here, just text about 42 things"),
                (3, "two mails: a@b.io c.d@e-f.org and phone 310 555 0199"),
            ],
            "doc_id bigint, text string",
        )
        got = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
        assert got[1]["n_emails"] == 1 and got[1]["n_phones"] == 1
        assert got[2]["n_emails"] == 0 and got[2]["n_phones"] == 0
        assert got[3]["n_emails"] == 2 and got[3]["n_phones"] == 1
        # redaction replaces the longer PII with shorter tags
        assert got[1]["clean_chars"] < len(
            "contact me at jane.doe+x@example.co.uk or call +1-555-123-4567 today"
        )

    def test_redaction_matches_duckdb_on_synthetic_rows(self, spark):
        """The corpus contains no PII, so prove cross-engine scrub
        equality on rows that do."""
        import duckdb

        from ser_etl_spark.operators.text import PII_EMAIL, PII_PHONE, pii_scrub

        rows = [
            (1, "mail x@y.zz and +44-207-946-0958 plus tail"),
            (2, "a@b.cc a@b.cc twice"),
        ]
        docs = spark.createDataFrame(rows, "doc_id bigint, text string")
        spark_fp = {r["doc_id"]: r["clean_fp"] for r in pii_scrub(docs).collect()}
        con = duckdb.connect()
        for doc_id, text in rows:
            (fp,) = con.execute(
                f"SELECT md5(regexp_replace(regexp_replace(?, '{PII_EMAIL}', "
                f"'<EMAIL>', 'g'), '{PII_PHONE}', '<PHONE>', 'g'))",
                [text],
            ).fetchone()
            assert spark_fp[doc_id] == fp
        con.close()


class TestCuration:
    """Invariants for the corpus-curation passes (curation.py); value
    parity vs DuckDB is covered by the registry oracles."""

    def test_chunks_reconstruct_documents(self, spark):
        from ser_etl_spark.operators.curation import chunk_documents

        rows = [(1, "a" * 1), (2, "xy" * 160), (3, "q" * 200), (4, "")]
        docs = spark.createDataFrame(rows, "doc_id bigint, text string")
        chunks = chunk_documents(docs, chunk_chars=200, overlap=50).collect()
        by_doc: dict[int, list] = {}
        for r in chunks:
            by_doc.setdefault(r["doc_id"], []).append(r)
        assert 4 not in by_doc  # empty text yields no chunks
        for doc_id, text in rows:
            if not text:
                continue
            got = sorted(by_doc[doc_id], key=lambda r: r["chunk_id"])
            # stride-sized prefixes + full last chunk reassemble the doc
            rebuilt = "".join(r["chunk_text"][:150] for r in got[:-1])
            rebuilt += got[-1]["chunk_text"]
            assert rebuilt == text
            # consecutive chunks overlap by exactly 50 chars (or to end)
            for a, b in zip(got, got[1:]):
                assert a["chunk_text"][150:] == b["chunk_text"][: len(a["chunk_text"]) - 150]
            assert all(r["chunk_chars"] == len(r["chunk_text"]) for r in got)

    def test_chunk_geometry_validation(self, spark):
        from ser_etl_spark.operators.curation import chunk_documents

        docs = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
        with pytest.raises(ValueError):
            chunk_documents(docs, chunk_chars=100, overlap=100)

    def test_repetition_flags_degenerate_docs(self, spark):
        from ser_etl_spark.operators.curation import repetition_stats

        docs = spark.createDataFrame(
            [
                (1, "spam ham " * 50),          # one bigram dominates
                (2, "all words here differ"),    # no repetition
                (3, "solo"),                     # < 2 tokens
            ],
            "doc_id bigint, text string",
        )
        got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
        assert got[1]["type_token_ratio"] < 0.1
        assert got[1]["top_bigram_frac"] > 0.49
        assert got[2]["type_token_ratio"] == 1.0
        assert got[2]["top_bigram_frac"] == pytest.approx(1 / 3)
        assert got[3]["top_bigram_frac"] is None

    def test_contamination_detects_planted_overlap(self, spark):
        from ser_etl_spark.operators.curation import benchmark_contamination

        bench_text = "alpha beta gamma delta epsilon zeta eta theta"
        rows = [
            (0, bench_text),                                  # benchmark doc
            (1, "prefix " + bench_text + " suffix"),          # contaminated
            (2, "totally unrelated words in this document here"),
        ]
        docs = spark.createDataFrame(rows, "doc_id bigint, text string")
        got = {r["doc_id"]: r for r in benchmark_contamination(docs).collect()}
        assert 0 not in got          # bench docs are never reported
        assert 2 not in got          # clean docs are not reported
        assert got[1]["hit_ngrams"] == 4  # the 4 five-grams inside bench_text
        assert 0 < got[1]["contamination_frac"] <= 1

    def test_bloom_contamination_superset_and_fp_bound(self, spark, sf_small):
        """Bloom hits ⊇ exact hits per doc (no false negatives — the
        hard guarantee), with false-positive mass a sliver of the probe
        count at m=2^20 / k=3."""
        from ser_etl_spark.operators.curation import (
            benchmark_contamination,
            bloom_contamination,
        )

        docs = load_table(spark, sf_small, "documents")
        exact = {
            r["doc_id"]: r["hit_ngrams"]
            for r in benchmark_contamination(docs).collect()
        }
        bloom = {
            r["doc_id"]: r["bloom_hit_ngrams"]
            for r in bloom_contamination(docs).collect()
        }
        for doc_id, hits in exact.items():
            assert bloom.get(doc_id, 0) >= hits, doc_id
        # false positives: bounded, tiny relative to the corpus probes
        extra = sum(bloom.values()) - sum(exact.values())
        assert extra <= max(5, len(bloom))

    def test_bloom_contamination_planted_overlap(self, spark):
        from ser_etl_spark.operators.curation import bloom_contamination

        bench_text = "alpha beta gamma delta epsilon zeta eta theta"
        rows = [
            (0, bench_text),
            (1, "prefix " + bench_text + " suffix"),
            (2, "totally unrelated words in this document here"),
        ]
        docs = spark.createDataFrame(rows, "doc_id bigint, text string")
        got = {
            r["doc_id"]: r["bloom_hit_ngrams"]
            for r in bloom_contamination(docs).collect()
        }
        assert 0 not in got
        assert got[1] >= 4  # all 4 planted five-grams are bloom-positive

    def test_bloom_contamination_repeated_ngram_basis(self, spark):
        """Both operators count DISTINCT shingles per doc: a train doc
        repeating a contaminated n-gram counts it ONCE on both sides, so
        the superset guarantee can't break on repeats (mixed bases —
        occurrences on one side, distinct on the other — would let
        exact > bloom with zero false negatives)."""
        from ser_etl_spark.operators.curation import (
            benchmark_contamination,
            bloom_contamination,
        )

        bench_text = "alpha beta gamma delta epsilon"
        rows = [
            (0, bench_text),
            # the planted five-gram appears twice in the train doc
            (1, bench_text + " filler words here " + bench_text),
            (2, "totally unrelated words in this document here"),
        ]
        docs = spark.createDataFrame(rows, "doc_id bigint, text string")
        exact = {
            r["doc_id"]: r["hit_ngrams"]
            for r in benchmark_contamination(docs).collect()
        }
        bloom = {
            r["doc_id"]: r["bloom_hit_ngrams"]
            for r in bloom_contamination(docs).collect()
        }
        assert exact[1] == 1  # distinct basis: the repeat counts once
        assert bloom[1] >= exact[1]  # superset holds on the same basis

    def test_source_mixture_keeps_largest_source_whole(self, spark, sf_small):
        from ser_etl_spark.operators.curation import source_temperature_sample

        docs = load_table(spark, sf_small, "documents")
        kept = source_temperature_sample(docs)
        fracs = {
            r["source"]: r["keep_frac"]
            for r in kept.select("source", "keep_frac").distinct().collect()
        }
        assert all(0 < f <= 1.0 for f in fracs.values())
        # the max-volume source has keep_frac exactly 1.0 -> all rows kept
        top = max(fracs, key=fracs.get)
        assert fracs[top] == 1.0
        n_top = docs.filter(F.col("source") == top).count()
        assert kept.filter(F.col("source") == top).count() == n_top
        # temperature flattening: kept share of small sources >= raw share
        assert kept.count() <= docs.count()

    def test_training_order_is_sharded_permutation(self, spark, sf_small):
        from ser_etl_spark.operators.curation import ORDER_SHARDS, training_order

        docs = load_table(spark, sf_small, "documents")
        out = training_order(docs)
        rows = out.collect()
        assert len(rows) == docs.count()
        assert {r["doc_id"] for r in rows} == {
            r["doc_id"] for r in docs.select("doc_id").collect()
        }
        by_shard: dict[int, list[int]] = {}
        for r in rows:
            assert 0 <= r["shard_id"] < ORDER_SHARDS
            by_shard.setdefault(r["shard_id"], []).append(r["shard_pos"])
        for shard, positions in by_shard.items():
            assert sorted(positions) == list(range(1, len(positions) + 1))
        # deterministic across invocations
        again = {(r["doc_id"], r["shard_id"], r["shard_pos"]) for r in
                 training_order(docs).collect()}
        assert again == {(r["doc_id"], r["shard_id"], r["shard_pos"]) for r in rows}

    def test_source_cap_limits_each_source(self, spark, sf_small):
        from ser_etl_spark.operators.curation import source_cap_sample

        docs = load_table(spark, sf_small, "documents")
        capped = source_cap_sample(docs, cap=3)
        per_src = {
            r["source"]: r["n"]
            for r in capped.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        assert per_src and all(n <= 3 for n in per_src.values())
        # sources with >= 3 docs are fully used
        raw = {
            r["source"]: r["n"]
            for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        for s, n in raw.items():
            assert per_src.get(s, 0) == min(n, 3)
        # deterministic
        a = {tuple(r) for r in capped.collect()}
        b = {tuple(r) for r in source_cap_sample(docs, cap=3).collect()}
        assert a == b

    def test_canonical_corpus_drops_only_losers(self, spark):
        from ser_etl_spark.operators.dedup import canonical_corpus

        docs = spark.createDataFrame(
            [
                (1, "aa", "en", "s1"),
                (2, "bb", "en", "s1"),
                (3, "cc", "en", "s2"),
                (4, "dd", "en", "s2"),
            ],
            "doc_id bigint, text string, lang string, source string",
        )
        pairs = spark.createDataFrame(
            [(1, 2), (2, 4)], "doc_a bigint, doc_b bigint"
        )
        kept = sorted(r["doc_id"] for r in canonical_corpus(docs, pairs).collect())
        # {1,2,4} is one cluster -> survivor 1; doc 3 untouched
        assert kept == [1, 3]


class TestRandomProjection:
    def test_preserves_pairwise_distances_on_average(self, spark, sf_small):
        import math

        from ser_etl_spark.operators.similarity import random_projection
        from ser_etl_spark.sources.parquet import load_table

        vecs = load_table(spark, sf_small, "embeddings").limit(40)
        orig = {r["vec_id"]: r["embedding"] for r in vecs.collect()}
        proj = {
            r["vec_id"]: r["projected"]
            for r in random_projection(vecs, out_dim=16).collect()
        }
        assert set(proj) == set(orig)
        assert all(len(v) == 16 for v in proj.values())

        def dist(a, b):
            return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

        ids = sorted(orig)[:20]
        ratios = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d0 = dist(orig[ids[i]], orig[ids[j]])
                if d0 > 0:
                    ratios.append(dist(proj[ids[i]], proj[ids[j]]) / d0)
        mean = sum(ratios) / len(ratios)
        # JL at 16 dims: distances preserved in expectation, individual
        # pairs within a loose band
        assert 0.85 < mean < 1.15, mean
        assert all(0.3 < r < 1.9 for r in ratios), (min(ratios), max(ratios))

    def test_deterministic_under_repartitioning(self, spark, sf_small):
        from ser_etl_spark.operators.similarity import random_projection
        from ser_etl_spark.sources.parquet import load_table

        vecs = load_table(spark, sf_small, "embeddings").limit(10)
        a = {r["vec_id"]: r["projected"] for r in random_projection(vecs).collect()}
        b = {
            r["vec_id"]: r["projected"]
            for r in random_projection(vecs.repartition(7)).collect()
        }
        assert a == b


class TestBm25Search:
    """Semantics of the lexical relevance ranking (bm25_search)."""

    def _docs(self, spark, rows):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
        )

    def test_higher_tf_ranks_higher_at_equal_length(self, spark):
        from ser_etl_spark.operators.text import bm25_search

        filler = "data " * 20
        docs = self._docs(
            spark,
            [
                filler + "hash hash hash join",   # 3+1 query hits
                filler + "hash line line line",   # 1 query hit
                filler + "line line line line",   # 0 hits -> excluded
            ],
        )
        got = bm25_search(docs, query_terms=("hash", "join")).collect()
        assert [r["doc_id"] for r in got] == [0, 1]
        assert got[0]["score"] > got[1]["score"]
        assert got[0]["n_hit_terms"] == 2 and got[1]["n_hit_terms"] == 1

    def test_length_normalization_prefers_shorter_doc(self, spark):
        from ser_etl_spark.operators.text import bm25_search

        docs = self._docs(
            spark,
            [
                "hash join " + "data " * 5,    # same tf, short
                "hash join " + "data " * 100,  # same tf, long
            ],
        )
        got = {
            r["doc_id"]: r["score"]
            for r in bm25_search(docs, query_terms=("hash", "join")).collect()
        }
        assert got[0] > got[1], got

    def test_scores_positive_and_sorted(self, spark, sf_small):
        from ser_etl_spark.operators.text import bm25_search
        from ser_etl_spark.sources.parquet import load_table

        got = bm25_search(load_table(spark, sf_small, "documents")).collect()
        assert 0 < len(got) <= 20
        scores = [r["score"] for r in got]
        assert scores == sorted(scores, reverse=True)
        assert all(s > 0 for s in scores)


class TestBigramRareRatio:
    """Semantics of the LM-free fluency proxy (bigram_rare_ratio)."""

    def test_invariants_on_fixture(self, spark, sf_small):
        from ser_etl_spark.operators.text import bigram_rare_ratio
        from ser_etl_spark.sources.parquet import load_table

        docs = load_table(spark, sf_small, "documents")
        got = bigram_rare_ratio(docs).collect()
        assert len(got) == docs.count()
        for r in got:
            assert 0 <= r["n_rare"] <= r["n_bigrams"]
            assert 0.0 <= r["rare_ratio"] <= 1.0
            assert r["min_bigram_freq"] >= 1

    def test_unique_transitions_flagged_rare(self, spark):
        from ser_etl_spark.operators.text import bigram_rare_ratio

        common = "the cat sat on the mat"
        docs = spark.createDataFrame(
            # 10 fluent copies of the same sentence + 1 shuffled doc whose
            # transitions appear nowhere else
            [(i, common) for i in range(10)] + [(99, "mat the on sat cat")],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r for r in bigram_rare_ratio(docs, threshold=5).collect()}
        assert got[99]["rare_ratio"] == 1.0
        # the repeated sentence's bigrams occur 10x > threshold
        assert got[0]["rare_ratio"] == 0.0


class TestHardNegativeMining:
    def test_negatives_are_cross_label_and_ranked(self, spark, sf_small):
        from ser_etl_spark.operators.similarity import (
            HARD_NEG_FLOOR,
            HARD_NEG_K,
            _query_points,
            hard_negative_mine,
        )
        from ser_etl_spark.sources.parquet import load_table

        queries = _query_points(spark, sf_small)
        labels = {q_id: lab for q_id, lab, _ in queries}
        got = hard_negative_mine(
            load_table(spark, sf_small, "embeddings"), queries
        ).collect()
        assert got, "fixture should yield at least one hard negative"
        by_q = {}
        for r in got:
            assert r["label"] != labels[r["q_id"]]
            assert r["cos_sim"] >= HARD_NEG_FLOOR
            by_q.setdefault(r["q_id"], []).append(r)
        for rows in by_q.values():
            assert len(rows) <= HARD_NEG_K
            assert [r["neg_rank"] for r in rows] == list(range(1, len(rows) + 1))
            sims = [r["cos_sim"] for r in rows]
            assert sims == sorted(sims, reverse=True)

    def test_negatives_are_the_true_topk(self, spark, sf_small):
        """Brute-force check: each anchor's mined set equals the exact
        cross-label top-k above the floor, computed independently."""
        from ser_etl_spark.operators.similarity import (
            HARD_NEG_FLOOR,
            HARD_NEG_K,
            _query_points,
            hard_negative_mine,
        )
        from ser_etl_spark.sources.parquet import load_table

        vecs = load_table(spark, sf_small, "embeddings").collect()
        queries = _query_points(spark, sf_small)
        got = {}
        for r in hard_negative_mine(
            load_table(spark, sf_small, "embeddings"), queries
        ).collect():
            got.setdefault(r["q_id"], []).append(r["vec_id"])

        import math

        def cos(a, b):
            num = sum(x * y for x, y in zip(a, b))
            return num / (
                math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
            )

        for q_id, q_label, q in queries:
            scored = [
                (round(cos(list(r["embedding"]), q), 4), r["vec_id"])
                for r in vecs
                if r["label"] != q_label
            ]
            want = [
                vid
                for s, vid in sorted(scored, key=lambda t: (-t[0], t[1]))
                if s >= HARD_NEG_FLOOR
            ][:HARD_NEG_K]
            assert got.get(q_id, []) == want, q_id


class TestPackOracle:
    def test_xxhash64_emulation_matches_spark(self, spark):
        """The staged DuckDB mod-2^64 emulation of Spark's
        xxhash64(BIGINT) must agree exactly — the packing oracle's shard
        assignment depends on it bit-for-bit."""
        import duckdb

        from ser_etl_spark.operators.packing import PACK_SHARDS
        from ser_etl_spark.oracle_hash import (
            stages_to_ctes,
            xxh64_long_stage_cols,
        )

        vals = list(range(500)) + [10**6, 10**12, 2**62, 2**63 - 1]
        con = duckdb.connect()
        con.execute("CREATE TABLE rel AS SELECT unnest($1) AS v", [vals])
        ctes, fin = stages_to_ctes(
            "b", xxh64_long_stage_cols("v", "_h"), "_t"
        )
        duck = dict(
            con.execute(
                f"WITH b AS (SELECT v FROM rel){ctes} "
                f"SELECT v, _h % {PACK_SHARDS} FROM {fin}"
            ).fetchall()
        )
        sdf = spark.createDataFrame([(v,) for v in vals], "v long").select(
            "v", F.pmod(F.xxhash64("v"), F.lit(PACK_SHARDS)).alias("s")
        )
        got = {r["v"]: r["s"] for r in sdf.collect()}
        assert {k: int(x) for k, x in duck.items()} == got


class TestAnnIndexMaintenance:
    """Incremental index upsert: a delta laid out with the frozen
    quantizer and appended into the partition dirs must answer probes
    identically to a full rebuild over the grown corpus."""

    def _probe_lsh(self, spark, idx, vec, k=10):
        from pyspark.sql import functions as F

        from ser_etl_spark.operators import similarity as S

        matrix = S._plane_matrix(spark, len(vec), S.ANN_PLANES)
        qb = S._srp_bucket_py(vec, matrix)
        df = spark.read.parquet(idx).filter(F.col("srp_bucket") == qb)
        return sorted(
            tuple(r)
            for r in S._query_cosine_topk(
                df, vec, k, "embedding", "vec_id", norm_sql="vnorm"
            ).collect()
        )

    def _probe_ivf(self, spark, idx, vec, k=10, nprobe=2):
        from pyspark.sql import functions as F

        from ser_etl_spark.operators import similarity as S

        cents = S.index_centroids(spark, idx)
        probes = S._ivf_probe_ids(vec, cents, nprobe)
        df = spark.read.parquet(idx).filter(F.col("centroid_id").isin(probes))
        return sorted(
            tuple(r)
            for r in S._query_cosine_topk(
                df, vec, k, "embedding", "vec_id", norm_sql="vnorm"
            ).collect()
        )

    def test_upsert_equals_rebuild(self, spark, sf_small, tmp_path):
        from pyspark.sql import functions as F

        from ser_etl_spark.operators import similarity as S
        from ser_etl_spark.sources.parquet import load_table

        emb = load_table(spark, sf_small, "embeddings")
        n = emb.count()
        half = n // 2
        base = emb.filter(F.col("vec_id") < half)  # contains centroids 0..7
        delta = emb.filter(F.col("vec_id") >= half)

        # The frozen-quantizer invariant (v3): an upserted index equals a
        # rebuild WITH THE SAME quantizer — train on the base corpus once
        # and lay out both sides with it, exactly what production does
        # (train-once-freeze; a from-scratch retrain on the grown corpus
        # is a deliberate snapshot rebuild, not an upsert).
        cents, _ = S.kmeans_train(base)
        full_dir = str(tmp_path / "full")
        inc_dir = str(tmp_path / "inc")
        for src, path in ((emb, full_dir), (base, inc_dir)):
            (
                S.ann_layout_frame(src, centroids=cents)
                .write.partitionBy("srp_bucket", "centroid_id")
                .parquet(path)
            )
            S.write_quantizer_table(spark, cents, f"{path}/_quantizer")
        S.upsert_ann_index(spark, inc_dir, delta)

        assert spark.read.parquet(inc_dir).count() == n
        vec = S._query_vector(spark, sf_small)
        assert self._probe_lsh(spark, inc_dir, vec) == self._probe_lsh(
            spark, full_dir, vec
        )
        assert self._probe_ivf(spark, inc_dir, vec) == self._probe_ivf(
            spark, full_dir, vec
        )
        # frozen quantizer: delta rows assigned with base centroids match
        # the full rebuild's assignment partition-for-partition
        inc_parts = sorted(
            tuple(r) for r in spark.read.parquet(inc_dir)
            .select("vec_id", "srp_bucket", "centroid_id").collect()
        )
        full_parts = sorted(
            tuple(r) for r in spark.read.parquet(full_dir)
            .select("vec_id", "srp_bucket", "centroid_id").collect()
        )
        assert inc_parts == full_parts


    def test_indexed_probes_after_upsert_equal_scan(
        self, spark, sf_small, tmp_path
    ):
        """Directive-r7 #4: after an upsert delta, the REGISTERED indexed
        probe functions (resolving the published `<table>_ann_index` and
        reading the quantizer from the index itself) must equal the
        scan-time probes over the grown corpus — probe selection cannot
        drift from the persisted centroid_id partitioning."""
        from pyspark.sql import functions as F

        from ser_etl_spark.etl.build import TableLayout, build_snapshot
        from ser_etl_spark.operators import similarity as S
        from ser_etl_spark.sources.parquet import load_table

        emb = load_table(spark, sf_small, "embeddings")
        n = emb.count()
        half = n // 2
        base = emb.filter(F.col("vec_id") < half)  # contains centroids 0..7
        delta = emb.filter(F.col("vec_id") >= half)

        snap = str(tmp_path / "snap")
        build_snapshot(
            {"embeddings": base},
            snap,
            layouts={
                "embeddings": TableLayout(unique_key="vec_id", ann_index=True)
            },
            views={},
        )
        # incremental sync: delta appended to the table AND the index;
        # source_path refreshes the freshness manifest to the GROWN
        # table (r8) — without it ensure_ann_index would correctly
        # refuse the now-stale published copy
        delta.write.mode("append").parquet(f"{snap}/embeddings")
        S.upsert_ann_index(
            spark,
            f"{snap}/embeddings_ann_index",
            delta,
            source_path=f"{snap}/embeddings",
        )

        idx = S.ensure_ann_index(spark, snap)
        assert idx == f"{snap}/embeddings_ann_index"  # published, not tmp

        vec = S._query_vector(spark, sf_small)

        def rows(df):
            return sorted(tuple(r) for r in df.collect())

        assert rows(S.lsh_ann_topk_indexed(spark, snap, vec, k=10)) == rows(
            S.lsh_ann_topk(emb, vec, k=10)
        )
        # scan-time replay uses the INDEX'S frozen quantizer (trained on
        # the base corpus at snapshot build) — the invariant is indexed
        # == scan-time under the same centroids, not under a hypothetical
        # retrain on the grown corpus (train-once-freeze)
        frozen = S.index_centroids(spark, idx)
        assert rows(S.ivf_ann_topk_indexed(spark, snap, vec, k=10)) == rows(
            S.ivf_ann_topk(emb, vec, k=10, centroids=frozen)
        )

    def test_stale_published_index_refused(self, spark, sf_small, tmp_path):
        """ADVICE r8 (medium): a published index whose source table was
        rewritten WITHOUT a matching upsert must NOT be served — before
        this gate, ensure_ann_index preferred any structurally-usable
        published copy and probes silently missed true neighbors. The
        freshness manifest detects the drift and resolution falls back
        to the fingerprint-keyed cache (which reflects the live table)."""
        import os

        from pyspark.sql import functions as F

        from ser_etl_spark.etl.build import TableLayout, build_snapshot
        from ser_etl_spark.operators import similarity as S
        from ser_etl_spark.sources.parquet import load_table

        emb = load_table(spark, sf_small, "embeddings")
        half = emb.count() // 2
        base = emb.filter(F.col("vec_id") < half)

        snap = str(tmp_path / "snap")
        build_snapshot(
            {"embeddings": base},
            snap,
            layouts={
                "embeddings": TableLayout(unique_key="vec_id", ann_index=True)
            },
            views={},
        )
        # fresh build: published copy is served
        assert S.ensure_ann_index(spark, snap) == f"{snap}/embeddings_ann_index"

        # the table grows but the index is NOT upserted: stale
        emb.filter(F.col("vec_id") >= half).write.mode("append").parquet(
            f"{snap}/embeddings"
        )
        idx = S.ensure_ann_index(spark, snap)
        assert idx != f"{snap}/embeddings_ann_index"
        assert os.path.exists(os.path.join(idx, "_SUCCESS"))
        # the fallback index reflects the GROWN corpus — a probe through
        # it sees the appended vectors the stale copy would have missed
        vec = S._query_vector(spark, sf_small)
        assert sorted(
            tuple(r) for r in S.lsh_ann_topk_indexed(spark, snap, vec, k=10)
            .collect()
        ) == sorted(
            tuple(r) for r in S.lsh_ann_topk(emb, vec, k=10).collect()
        )

    def test_stale_published_bands_refused(self, spark, sf_small, tmp_path):
        """The band-artifact twin of the stale-index gate: rewriting the
        documents table without upsert_minhash_bands must push
        ensure_minhash_bands off the published copy."""
        import os

        from ser_etl_spark.etl.build import TableLayout, build_snapshot
        from ser_etl_spark.operators.dedup import ensure_minhash_bands
        from ser_etl_spark.sources.parquet import load_table

        docs = load_table(spark, sf_small, "documents")
        is_delta = (F.col("doc_id") % 4) == 3

        snap = str(tmp_path / "snap")
        build_snapshot(
            {"documents": docs.filter(~is_delta)},
            snap,
            layouts={
                "documents": TableLayout(
                    unique_key="doc_id", minhash_bands=True
                )
            },
            views={},
        )
        published = os.path.join(snap, "documents_minhash_bands")
        assert ensure_minhash_bands(spark, snap) == published

        docs.filter(is_delta).write.mode("append").parquet(
            f"{snap}/documents"
        )
        assert ensure_minhash_bands(spark, snap) != published

    def test_upsert_with_degenerate_delta(self, spark, tmp_path):
        """A delta containing seam vectors (zero vector -> NULL centroid,
        short array) appends into the hive-default partition and reads
        back with NULL centroid_id — maintenance never chokes on rows
        the quantizer can't place."""
        from pyspark.sql import functions as F

        from ser_etl_spark.operators import similarity as S
        from tests.test_edge_vectors_parity import (
            _edge_vectors,
            _write_embeddings,
        )

        rows = _edge_vectors()
        base = [r for r in rows if r[0] < 8]
        delta = [r for r in rows if r[0] in (8, 11, 12)]  # zero, short, dup
        base_dir = tmp_path / "base"
        delta_dir = tmp_path / "delta"
        base_dir.mkdir()
        delta_dir.mkdir()
        _write_embeddings(base_dir / "embeddings.parquet", base)
        _write_embeddings(delta_dir / "embeddings.parquet", delta)

        idx = str(tmp_path / "idx")
        base_df = spark.read.parquet(str(base_dir / "embeddings.parquet"))
        seeds = S.ivf_centroids(base_df)
        (
            S.ann_layout_frame(base_df, centroids=seeds)
            .write.partitionBy("srp_bucket", "centroid_id")
            .parquet(idx)
        )
        # v3 indexes carry their quantizer; the manual layout here uses
        # the seed quantizer (training is irrelevant to the seam rows
        # under test) but must still persist it for the upsert to read
        S.write_quantizer_table(spark, seeds, f"{idx}/_quantizer")
        S.upsert_ann_index(
            spark,
            idx,
            spark.read.parquet(str(delta_dir / "embeddings.parquet")),
        )
        out = spark.read.parquet(idx)
        assert out.count() == len(base) + len(delta)
        got = {
            r["vec_id"]: r["centroid_id"]
            for r in out.select("vec_id", "centroid_id").collect()
        }
        assert got[8] is None and got[11] is None  # degenerate -> NULL list
        assert got[12] == 1  # duplicate of centroid 1, frozen quantizer


class TestQuantizedRescore:
    """Two-stage retrieval invariants: the exact stage really is exact,
    and the quantized candidate stage loses little at 8 bits."""

    def test_rescored_scores_are_exact(self, spark, sf_small):
        from ser_etl_spark.operators.similarity import (
            _query_vector,
            cosine_topk,
            quantized_rescore_topk,
        )
        from ser_etl_spark.sources.parquet import load_table

        emb = load_table(spark, sf_small, "embeddings")
        vec = _query_vector(spark, sf_small)
        exact = {
            r["vec_id"]: r["cos_sim"]
            for r in cosine_topk(emb, vec, k=200).collect()
        }
        out = quantized_rescore_topk(emb, vec, k=10).collect()
        assert len(out) == 10
        for r in out:
            # every returned score equals the brute-force score for that id
            assert exact[r["vec_id"]] == r["cos_sim"], r

    def test_recall_vs_bruteforce(self, spark, sf_small):
        from ser_etl_spark.operators.similarity import (
            _query_vector,
            cosine_topk,
            quantized_rescore_topk,
        )
        from ser_etl_spark.sources.parquet import load_table

        emb = load_table(spark, sf_small, "embeddings")
        vec = _query_vector(spark, sf_small)
        exact_ids = {r["vec_id"] for r in cosine_topk(emb, vec, k=10).collect()}
        got_ids = {
            r["vec_id"] for r in quantized_rescore_topk(emb, vec, k=10).collect()
        }
        # int8 reconstruction error is tiny relative to top-10 gaps; the
        # 50-candidate pool should recover (nearly) the whole exact set
        assert len(exact_ids & got_ids) >= 8, (exact_ids, got_ids)


def test_hamming_ball_properties():
    """Probe-set combinatorics: |ball(r)| = sum of C(planes, i) for
    i <= r, always contains the center, monotone in r, and every member
    is within Hamming distance r."""
    from itertools import combinations
    from math import comb

    from ser_etl_spark.operators.similarity import _hamming_ball

    for planes in (1, 4, 8):
        for center in {0, (1 << planes) >> 1, (1 << planes) - 1}:
            prev: set[int] = set()
            for r in range(planes + 1):
                ball = _hamming_ball(center, planes, r)
                assert len(ball) == len(set(ball))  # no duplicates
                assert center in ball
                assert set(ball) >= prev  # monotone widening
                assert len(ball) == sum(comb(planes, i) for i in range(r + 1))
                for b in ball:
                    assert bin(b ^ center).count("1") <= r
                    assert 0 <= b < (1 << planes)
                prev = set(ball)


class TestPhashNeardup:
    """Pigeonhole blocking guarantee: every pair within the Hamming
    threshold is found; pairs that differ in every band are correctly
    missed only when beyond the threshold."""

    def _bands(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc_id long, b0 long, b1 long, b2 long, b3 long"
        )

    def test_finds_all_pairs_within_threshold(self, spark):
        from ser_etl_spark.operators.multimodal import phash_neardup_pairs

        base = [0xAAAA, 0x5555, 0x0F0F, 0xF0F0]
        rows = [
            (0, *base),
            (1, *base),                                   # hamming 0
            (2, base[0] ^ 1, *base[1:]),                  # hamming 1
            (3, base[0] ^ 1, base[1] ^ 2, base[2] ^ 4, base[3]),  # 3
            (4, base[0] ^ 1, base[1] ^ 2, base[2] ^ 4, base[3] ^ 8),  # 4
            (5, 0x1111, 0x2222, 0x3333, 0x4444),          # far away
        ]
        got = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in phash_neardup_pairs(self._bands(spark, rows)).collect()
        }
        # every <=3 pair vs doc 0 found with its exact distance
        assert got[(0, 1)] == 0 and got[(1, 2)] == 1
        assert got[(0, 2)] == 1 and got[(0, 3)] == 3
        # hamming-4-with-a-shared-band pairs are candidates but fail the
        # exact verify; doc 4 differs from doc 0 in all four bands AND
        # exceeds the threshold — absent either way
        assert (0, 4) not in got and (0, 5) not in got
        assert got[(3, 4)] == 1  # 3 and 4 differ by one bit in b3

    def test_shared_band_beyond_threshold_rejected(self, spark):
        """A candidate pair (identical band 0) with total Hamming 6 must
        be generated by the block join and then rejected by the exact
        popcount — blocking recall, verification precision."""
        from ser_etl_spark.operators.multimodal import phash_neardup_pairs

        rows = [
            (0, 7, 0, 0, 0),
            (1, 7, 3, 3, 3),  # same b0, hamming 6 overall
        ]
        got = phash_neardup_pairs(self._bands(spark, rows)).collect()
        assert got == []

    def test_asset_pool_pairs_share_assets(self, spark, sf_small):
        """Registered-query semantics: every reported pair is a genuine
        asset re-use (doc ids congruent mod the pool) at hamming 0."""
        from ser_etl_spark.operators.multimodal import (
            ASSET_POOL,
            extract_phash_bands,
            phash_neardup_pairs,
            with_asset_payload,
        )
        from ser_etl_spark.sources.parquet import load_table

        docs = load_table(spark, sf_small, "documents").select("doc_id")
        pairs = phash_neardup_pairs(
            extract_phash_bands(with_asset_payload(docs))
        ).collect()
        n_docs = docs.count()
        if n_docs > ASSET_POOL:
            assert pairs
        for r in pairs:
            assert r["hamming"] == 0
            assert r["id_a"] % ASSET_POOL == r["id_b"] % ASSET_POOL


class TestDeltaDedup:
    def test_one_sided_join_equals_cross_subset_of_full(self, spark, docs):
        """The one-sided band join must find exactly the cross-side
        subset of the full minhash_lsh_pairs result — the corpus never
        pairs against itself, and nothing cross-side is lost."""
        from ser_etl_spark.operators.dedup import (
            delta_dedup_pairs,
            minhash_lsh_pairs,
        )

        is_delta = (F.col("doc_id") % 4) == 3
        got = {
            (r["corpus_doc"], r["delta_doc"]): r["jaccard"]
            for r in delta_dedup_pairs(
                docs.filter(~is_delta), docs.filter(is_delta)
            ).collect()
        }
        want = {}
        for r in minhash_lsh_pairs(docs, 0.5).collect():
            a, b = r["doc_a"], r["doc_b"]
            if (a % 4 == 3) != (b % 4 == 3):
                pair = (b, a) if a % 4 == 3 else (a, b)
                want[pair] = r["jaccard"]
        assert got == want
        assert all(c % 4 != 3 and d % 4 == 3 for c, d in got)

    def test_persisted_bands_resolve_through_snapshot_zero_rebuild(
        self, spark, sf_small, tmp_path
    ):
        """The corpus band table is a real write-time artifact: built by
        build_snapshot(minhash_bands=True), resolved published-first by
        ensure_minhash_bands (no tmp-cache build), appended by
        upsert_minhash_bands, and the one-sided dedup over it matches
        the inline-computed form."""
        import os
        import tempfile

        from ser_etl_spark.etl.build import TableLayout, build_snapshot
        from ser_etl_spark.operators.dedup import (
            delta_dedup_pairs,
            ensure_minhash_bands,
            minhash_band_entries,
            upsert_minhash_bands,
        )
        from ser_etl_spark.sources.parquet import load_table

        docs = load_table(spark, sf_small, "documents")
        is_delta = (F.col("doc_id") % 4) == 3
        corpus, delta = docs.filter(~is_delta), docs.filter(is_delta)

        snap = str(tmp_path / "snap")
        build_snapshot(
            {"documents": corpus},
            snap,
            layouts={
                "documents": TableLayout(
                    unique_key="doc_id", minhash_bands=True
                )
            },
            views={},
        )
        assert os.path.exists(
            os.path.join(snap, "documents_minhash_bands", "_SUCCESS")
        )
        uid = getattr(os, "getuid", lambda: "na")()
        cache_root = os.path.join(
            tempfile.gettempdir(), f"ser_etl_minhash_bands_{uid}"
        )
        before = (
            set(os.listdir(cache_root)) if os.path.isdir(cache_root) else set()
        )
        bands_dir = ensure_minhash_bands(spark, snap)
        assert bands_dir == os.path.join(snap, "documents_minhash_bands")
        persisted = spark.read.parquet(bands_dir)
        got = sorted(
            tuple(r)
            for r in delta_dedup_pairs(
                corpus, delta, corpus_bands=persisted
            ).collect()
        )
        inline = sorted(
            tuple(r) for r in delta_dedup_pairs(corpus, delta).collect()
        )
        assert got == inline
        after = (
            set(os.listdir(cache_root)) if os.path.isdir(cache_root) else set()
        )
        assert before == after  # zero on-demand rebuild

        # append-is-rebuild: upserting the delta makes the artifact equal
        # to the bands of the grown corpus
        upsert_minhash_bands(spark, bands_dir, delta)
        grown = sorted(
            tuple(r)
            for r in spark.read.parquet(bands_dir)
            .select("doc_id", "band", "bucket")
            .collect()
        )
        direct = sorted(
            tuple(r)
            for r in minhash_band_entries(docs)
            .select("doc_id", "band", "bucket")
            .collect()
        )
        assert grown == direct


class TestSubstringDedup:
    """Exact-span semantics of substring_dedup_spans on a hand-built
    corpus: offsets, maximality, multiple spans per pair, threshold and
    df-guard behavior."""

    @staticmethod
    def _mk(spark, rows):
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    def test_single_span_offsets_exact(self, spark):
        from ser_etl_spark.operators.dedup import substring_dedup_spans

        shared = " ".join(f"s{i}" for i in range(25))
        docs = self._mk(spark, [
            (1, "a1 a2 a3 a4 a5 " + shared + " a6 a7"),
            (2, "b1 b2 " + shared + " b3"),
        ])
        got = [tuple(r) for r in substring_dedup_spans(docs).collect()]
        # doc 1: span starts at token 6 (1-based); doc 2: token 3
        assert got == [(1, 2, 6, 3, 25)]

    def test_multiple_and_subthreshold_spans(self, spark):
        from ser_etl_spark.operators.dedup import substring_dedup_spans

        s1 = " ".join(f"x{i}" for i in range(20))
        s2 = " ".join(f"y{i}" for i in range(21))
        small = " ".join(f"z{i}" for i in range(10))  # below min_tokens
        docs = self._mk(spark, [
            (1, s1 + " a1 a2 a3 " + s2 + " a4 " + small),
            (2, "b1 " + s1 + " b2 b3 " + s2 + " b4 " + small + " b5"),
        ])
        got = [tuple(r) for r in substring_dedup_spans(docs).collect()]
        assert (1, 2, 1, 2, 20) in got      # s1
        assert (1, 2, 24, 24, 21) in got    # s2
        assert all(r[4] >= 20 for r in got)  # the 10-token span is out
        assert len(got) == 2

    def test_df_guard_drops_ubiquitous_grams(self, spark):
        from ser_etl_spark.operators.dedup import substring_dedup_spans

        boiler = " ".join(f"c{i}" for i in range(30))
        rows = [(i, boiler) for i in range(1, 6)]
        docs = self._mk(spark, rows)
        # cap below the df: every anchor dropped, no pairs at all
        assert substring_dedup_spans(docs, max_anchor_df=3).count() == 0
        # exact mode: all 10 ordered pairs carry the full span
        exact = substring_dedup_spans(docs, max_anchor_df=None).collect()
        assert len(exact) == 10
        assert all(r["span_tokens"] == 30 for r in exact)


class TestTextPostings:
    """The inverted-index artifact (third member of the write-time
    family): build/ensure/upsert lifecycle, bit-equality of the indexed
    BM25 with the scan-time form, freshness gating."""

    def test_indexed_equals_scan(self, spark, sf_small):
        from ser_etl_spark.operators.text import (
            bm25_search,
            bm25_search_indexed,
        )
        from ser_etl_spark.sources.parquet import load_table

        scan = [
            tuple(r)
            for r in bm25_search(
                load_table(spark, sf_small, "documents")
            ).collect()
        ]
        idx = [tuple(r) for r in bm25_search_indexed(spark, sf_small).collect()]
        assert idx == scan  # bit-identical, ordering included

    def test_published_first_zero_rebuild_and_upsert(
        self, spark, sf_small, tmp_path
    ):
        import os
        import tempfile

        from ser_etl_spark.artifacts import read_manifest
        from ser_etl_spark.etl.build import TableLayout, build_snapshot
        from ser_etl_spark.operators.text import (
            _postings_totals,
            ensure_text_postings,
            postings_frame,
            upsert_text_postings,
        )
        from ser_etl_spark.sources.parquet import load_table

        docs = load_table(spark, sf_small, "documents")
        is_delta = (F.col("doc_id") % 4) == 3
        base, delta = docs.filter(~is_delta), docs.filter(is_delta)

        snap = str(tmp_path / "snap")
        build_snapshot(
            {"documents": base},
            snap,
            layouts={
                "documents": TableLayout(
                    unique_key="doc_id", text_postings=True
                )
            },
            views={},
        )
        published = os.path.join(snap, "documents_text_postings")
        assert os.path.exists(os.path.join(published, "_SUCCESS"))
        uid = getattr(os, "getuid", lambda: "na")()
        cache_root = os.path.join(
            tempfile.gettempdir(), f"ser_etl_text_postings_{uid}"
        )
        before = (
            set(os.listdir(cache_root)) if os.path.isdir(cache_root) else set()
        )
        assert ensure_text_postings(spark, snap) == published
        after = (
            set(os.listdir(cache_root)) if os.path.isdir(cache_root) else set()
        )
        assert before == after  # zero on-demand rebuild

        # upsert: append delta postings + merge totals + refresh digest
        delta.write.mode("append").parquet(f"{snap}/documents")
        upsert_text_postings(
            spark, published, delta, source_path=f"{snap}/documents"
        )
        assert ensure_text_postings(spark, snap) == published  # still fresh
        grown = sorted(
            tuple(r)
            for r in spark.read.parquet(published)
            .select("doc_id", "tok", "tf", "dl").collect()
        )
        direct = sorted(
            tuple(r)
            for r in postings_frame(docs)
            .select("doc_id", "tok", "tf", "dl").collect()
        )
        assert grown == direct  # append IS rebuild
        m = read_manifest(published)
        nd, tt = _postings_totals(docs)
        assert (m["n_docs"], m["t_toks"]) == (nd, tt)  # totals merged

    def test_stale_published_postings_refused(self, spark, sf_small, tmp_path):
        import os

        from ser_etl_spark.etl.build import TableLayout, build_snapshot
        from ser_etl_spark.operators.text import ensure_text_postings
        from ser_etl_spark.sources.parquet import load_table

        docs = load_table(spark, sf_small, "documents")
        snap = str(tmp_path / "snap")
        build_snapshot(
            {"documents": docs.filter(F.col("doc_id") % 4 != 3)},
            snap,
            layouts={
                "documents": TableLayout(
                    unique_key="doc_id", text_postings=True
                )
            },
            views={},
        )
        published = os.path.join(snap, "documents_text_postings")
        assert ensure_text_postings(spark, snap) == published
        # table grows without an upsert: published copy must be refused
        docs.filter(F.col("doc_id") % 4 == 3).write.mode("append").parquet(
            f"{snap}/documents"
        )
        assert ensure_text_postings(spark, snap) != published


class TestSpanRemoval:
    def test_cleaned_text_exact(self, spark):
        from ser_etl_spark.operators.dedup import remove_duplicated_spans

        shared = " ".join(f"s{i}" for i in range(25))
        docs = spark.createDataFrame(
            [
                (1, "a1 a2 " + shared + " a3"),
                (2, "b1 " + shared + " b2 b3"),  # later doc loses the span
                (3, "unrelated text entirely here"),
            ],
            "doc_id bigint, text string",
        )
        out = {r["doc_id"]: r for r in remove_duplicated_spans(docs).collect()}
        assert set(out) == {2}  # only the affected doc, as a delta
        r = out[2]
        assert r["removed_tokens"] == 25
        assert r["kept_tokens"] == 3
        assert r["cleaned_text"] == "b1 b2 b3"

    def test_overlapping_spans_remove_union(self, spark):
        from ser_etl_spark.operators.dedup import remove_duplicated_spans

        s = " ".join(f"s{i}" for i in range(30))
        docs = spark.createDataFrame(
            [
                (1, s),                 # earlier doc: keeps everything
                (2, "x1 " + s + " x2"),  # duplicates doc 1's span
                (3, s + " y1"),          # duplicates it too (and doc 2's)
            ],
            "doc_id bigint, text string",
        )
        out = {r["doc_id"]: r for r in remove_duplicated_spans(docs).collect()}
        assert 1 not in out  # the earliest holder keeps the span
        assert out[2]["cleaned_text"] == "x1 x2"
        # doc 3 loses the span once even though it matches BOTH doc 1
        # and doc 2 (overlapping removal intervals union via distinct)
        assert out[3]["cleaned_text"] == "y1"
        assert out[3]["removed_tokens"] == 30


def test_token_budget_dominant_source_seam(spark):
    """Mega-source skew seam (r9 verdict directive #8): 90% of the
    corpus in ONE source must produce the same greedy selection as the
    serial model — the per-source window serializes that source through
    one task (documented in the docstring), but the ANSWER must not
    depend on the skew."""
    from ser_etl_spark.operators.curation import token_budget_selection

    rows = []
    # dominant source: 90 docs with varying diversity/length
    for i in range(90):
        ntok = 3 + (i % 11)
        distinct = 1 + (i % ntok)
        text = " ".join(f"w{j % distinct}" for j in range(ntok))
        rows.append((i, "mega", text))
    # two small sources (5 docs each), plus junk rows the nullif guard
    # must exclude
    for i in range(5):
        rows.append((100 + i, "a", " ".join(f"t{j}" for j in range(4 + i))))
        rows.append((200 + i, "b", "dup dup dup dup"))
    rows.append((300, "mega", "   "))
    rows.append((301, "a", None))
    docs = spark.createDataFrame(rows, "doc_id bigint, source string, text string")

    budget = 120
    got = {
        r["source"]: r
        for r in token_budget_selection(docs, budget=budget).collect()
    }

    # serial greedy model, same algebra
    def model():
        per: dict[str, list] = {}
        for doc_id, source, text in rows:
            if text is None or not text.strip():
                continue
            toks = text.strip().lower().split()
            ntok = len(toks)
            prio = (len(set(toks)) * 10000) // ntok
            per.setdefault(source, []).append((-prio, doc_id, ntok))
        out = {}
        for source, docs_ in per.items():
            docs_.sort()
            used = n_sel = 0
            for _, _, ntok in docs_:
                if used + ntok > budget:
                    break
                used += ntok
                n_sel += 1
            out[source] = (n_sel, used)
        return out

    expected = model()
    assert set(got) == set(expected)
    for source, (n_sel, used) in expected.items():
        assert got[source]["n_selected"] == n_sel, source
        assert got[source]["tokens_used"] == used, source


class TestTrainedQuantizer:
    """r10: the trained coarse quantizer (iterated Lloyd) as a persisted,
    freshness-manifested, frozen-between-retrains artifact."""

    def test_roundtrip_and_published_first(self, spark, sf_small, tmp_path):
        import os
        import shutil
        import tempfile

        from ser_etl_spark.operators.similarity import (
            build_trained_quantizer,
            ensure_trained_quantizer,
            kmeans_train,
            trained_quantizer_centroids,
        )
        from ser_etl_spark.sources.parquet import load_table

        # a private sf_dir copy so the published artifact sits NEXT to
        # its source table like a real snapshot
        snap = tmp_path / "snap"
        snap.mkdir()
        shutil.copy(
            os.path.join(sf_small, "embeddings.parquet"),
            snap / "embeddings.parquet",
        )
        published = build_trained_quantizer(
            spark, str(snap), str(snap / "embeddings_trained_quantizer")
        )
        # persisted rows == the in-memory training output, bit-for-bit
        cents, traj = kmeans_train(load_table(spark, str(snap), "embeddings"))
        assert trained_quantizer_centroids(spark, published) == cents
        # trajectory converges: total movement strictly shrinks by iter 3
        mv = {}
        for it, _, _, sq in traj:
            mv[it] = mv.get(it, 0.0) + (sq or 0.0)
        assert mv[3] < mv[1]
        # published-first: resolution returns the artifact, no cache build
        uid = getattr(os, "getuid", lambda: "na")()
        cache_root = os.path.join(
            tempfile.gettempdir(), f"ser_etl_kmeans_q_{uid}"
        )
        before = (
            set(os.listdir(cache_root)) if os.path.isdir(cache_root) else set()
        )
        assert ensure_trained_quantizer(spark, str(snap)) == published
        after = (
            set(os.listdir(cache_root)) if os.path.isdir(cache_root) else set()
        )
        assert before == after

    def test_stale_published_quantizer_refused(self, spark, sf_small, tmp_path):
        """A source rewrite after the train must invalidate the published
        copy (manifest digest mismatch) — resolution falls back to a
        fresh cache-keyed retrain instead of serving stale centroids."""
        import os
        import shutil

        from ser_etl_spark.operators.similarity import (
            build_trained_quantizer,
            ensure_trained_quantizer,
        )
        from ser_etl_spark.sources.parquet import load_table

        snap = tmp_path / "snap"
        snap.mkdir()
        shutil.copy(
            os.path.join(sf_small, "embeddings.parquet"),
            snap / "embeddings.parquet",
        )
        published = build_trained_quantizer(
            spark, str(snap), str(snap / "embeddings_trained_quantizer")
        )
        # rewrite the source: drop half the rows (digest changes)
        emb = load_table(spark, str(snap), "embeddings")
        half = emb.filter(F.col("vec_id") % 2 == 0)
        tmp_parq = str(tmp_path / "half")
        half.coalesce(1).write.mode("overwrite").parquet(tmp_parq)
        os.remove(snap / "embeddings.parquet")
        import glob

        part = glob.glob(os.path.join(tmp_parq, "*.parquet"))[0]
        shutil.copy(part, snap / "embeddings.parquet")
        resolved = ensure_trained_quantizer(spark, str(snap))
        assert resolved != published  # stale copy refused, retrained


def test_snapshot_diff_full_outer_reports_removals(spark):
    """The general two-snapshot CDC diff (r9 ADVICE: the audit twin's
    derived prev can never remove, so the FULL OUTER form must be
    pinned directly): added keys, removed keys (source taken from the
    prev side), changed fingerprints, null-safe NULL-text equality."""
    from ser_etl_spark.operators.curation import snapshot_diff

    curr = spark.createDataFrame(
        [
            (1, "a", "same text"),
            (2, "a", "edited text v2"),
            (4, "b", "brand new"),
            (5, "b", None),          # NULL text, present both sides
            (6, "b", "Same  TEXT"),  # normalization-equal to prev
        ],
        "doc_id bigint, source string, text string",
    )
    prev = spark.createDataFrame(
        [
            (1, "a", "same text"),
            (2, "a", "edited text v1"),
            (3, "a", "gone now"),    # only in prev -> removed under 'a'
            (5, "b", None),
            (6, "b", "same text"),
        ],
        "doc_id bigint, source string, text string",
    )
    got = {r["source"]: r for r in snapshot_diff(curr, prev).collect()}
    assert got["a"]["n_added"] == 0
    assert got["a"]["n_removed"] == 1     # doc 3, source from PREV side
    assert got["a"]["n_changed"] == 1     # doc 2
    assert got["a"]["n_unchanged"] == 1   # doc 1
    assert got["b"]["n_added"] == 1       # doc 4
    assert got["b"]["n_removed"] == 0
    assert got["b"]["n_changed"] == 0
    # doc 5: NULL == NULL via null-safe compare; doc 6: md5 of the
    # normalized text matches across case/whitespace
    assert got["b"]["n_unchanged"] == 2


class TestIvfRecallTrainedVsSeed:
    """r11 (VERDICT r10 #3): quantify what the r10 training bought,
    gating the index family's migration onto the trained artifact."""

    def test_training_pays_for_itself_at_equal_nprobe(self, spark, sf_small):
        """On this near-uniform synthetic fixture, Lloyd refinement
        mainly BALANCES lists (the ivf_list_balance_trained story), so
        the honest dominance claim at equal nprobe is hits per probed
        candidate: the trained quantizer must recover at least as much
        of the exact top-k per candidate scanned as the seed stand-in —
        equal-or-better recall at equal-or-lower probe cost is exactly
        the property that justifies serving the index from it. (On a
        clustered corpus the raw-recall gap would widen; the readout
        reports both so a rollout can gate on either.)"""
        from ser_etl_spark.operators.similarity import (
            ivf_recall_trained_vs_seed,
        )

        rows = {
            (r["quantizer"], r["anchor_id"]): r
            for r in ivf_recall_trained_vs_seed(spark, sf_small).collect()
        }
        anchors = sorted({a for _, a in rows})
        assert anchors and all(("seed", a) in rows for a in anchors)
        seed_hit = sum(rows[("seed", a)]["n_hit"] for a in anchors)
        seed_probe = sum(rows[("seed", a)]["n_probe"] for a in anchors)
        tr_hit = sum(rows[("trained", a)]["n_hit"] for a in anchors)
        tr_probe = sum(rows[("trained", a)]["n_probe"] for a in anchors)
        # every anchor's exact ground truth is the full top-k
        assert all(rows[("seed", a)]["n_exact"] == 10 for a in anchors)
        # efficiency dominance: exact integer cross-multiply, no floats
        assert tr_hit * seed_probe >= seed_hit * tr_probe, (
            (tr_hit, tr_probe), (seed_hit, seed_probe)
        )
        # and recall itself stays within one hit per anchor of the seed
        assert tr_hit >= seed_hit - len(anchors)


class TestHybridRetrieval:
    """Behavioral invariants of the retrieval-composition operators
    (cross-engine parity is covered by tests/test_oracle_parity.py)."""

    def test_rrf_both_arm_docs_dominate(self, spark, sf_small):
        from ser_etl_spark.operators.retrieval import RRF_K, rrf_fusion

        rows = rrf_fusion(spark, sf_small).collect()
        assert rows, "fixture corpora are non-empty"
        for r in rows:
            expect = 0.0
            if r["lex_rank"]:
                expect += 1.0 / (RRF_K + r["lex_rank"])
            if r["sem_rank"]:
                expect += 1.0 / (RRF_K + r["sem_rank"])
            assert r["rrf_score"] == expect
        # ranking is by fused score with the doc_id tie-break
        scores = [(r["rrf_score"], -r["doc_id"]) for r in rows]
        assert scores == sorted(scores, reverse=True)
        # a doc present in BOTH arms beats one holding the same rank in
        # only one arm
        both = [r for r in rows if r["lex_rank"] and r["sem_rank"]]
        single = [r for r in rows if bool(r["lex_rank"]) != bool(r["sem_rank"])]
        for b in both:
            for s in single:
                lone = s["lex_rank"] or s["sem_rank"]
                if lone >= max(b["lex_rank"], b["sem_rank"]):
                    assert b["rrf_score"] > s["rrf_score"]

    def test_mmr_pick1_is_pool_top_and_picks_distinct(self, spark, sf_small):
        from ser_etl_spark.operators.retrieval import mmr_rerank
        from ser_etl_spark.operators.similarity import cosine_topk, _query_vector

        picks = mmr_rerank(spark, sf_small).collect()
        assert len(picks) == 5
        assert len({p["vec_id"] for p in picks}) == 5
        assert [p["pick_order"] for p in sorted(picks, key=lambda p: p["pick_order"])] == [1, 2, 3, 4, 5]
        # pick 1 == the plain cosine argmax excluding the query row
        vec = _query_vector(spark, sf_small)
        top = (
            cosine_topk(load_table(spark, sf_small, "embeddings"), vec, k=2)
            .filter(F.col("vec_id") != 0)
            .collect()
        )
        p1 = next(p for p in picks if p["pick_order"] == 1)
        assert p1["vec_id"] == top[0]["vec_id"]
        assert p1["mmr"] == p1["sim_q"]
        # later picks trade relevance for diversity: mmr <= sim_q (maxsel
        # over a pool of non-negative self-similar vectors) and the mmr
        # sequence is the greedy objective, monotonically non-increasing
        for p in picks:
            if p["pick_order"] > 1:
                assert p["mmr"] <= p["sim_q"]

    def test_knn_graph_bounds(self, spark, vectors):
        from ser_etl_spark.operators.retrieval import knn_graph_degree_audit

        rows = knn_graph_degree_audit(vectors, k=5).collect()
        assert rows, "fixture has labeled vectors"
        for r in rows:
            assert r["n_edges"] <= 5 * r["n_nodes"]
            assert 2 * r["n_mutual_pairs"] <= r["n_edges"]
            assert 0 <= r["reciprocity_bp"] <= 10000
            if r["n_edges"]:
                assert (
                    r["reciprocity_bp"]
                    == (10000 * 2 * r["n_mutual_pairs"]) // r["n_edges"]
                )


def test_mixture_rebalance_dominant_group_seam(spark):
    """Dominant-group skew seam (r11 VERDICT #1): 90% of the corpus in
    ONE language group must produce the exact feasible-count selection
    of the serial model. The banded two-level rank (hash-prefix bands +
    broadcast offsets) replaces the fixed-4-group single-task window;
    with ~900 docs the dominant group spans many hash bands, so the
    offset cumulation is genuinely exercised — the ANSWER must not
    depend on the banding."""
    from ser_etl_spark.operators.sampling import (
        MIXTURE_TARGETS,
        mixture_rebalance_sample,
    )

    rows = []
    for i in range(900):  # dominant: 'en' (target 40%)
        rows.append((i, "en"))
    for i in range(40):
        rows.append((1000 + i, "de"))
    for i in range(35):
        rows.append((2000 + i, "fr"))
    for i in range(25):  # pooled 'other'
        rows.append((3000 + i, ["zh", "es", "ja"][i % 3]))
    df = spark.createDataFrame(
        [(i, None, lang, None, 0) for i, lang in rows],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint",
    )
    got = {
        r["grp"]: (r["n_orig"], r["n_kept"], r["kept_share_bp"])
        for r in mixture_rebalance_sample(df).collect()
    }

    pct = dict(MIXTURE_TARGETS)
    named = {g for g in pct if g != "other"}
    groups: dict[str, int] = {}
    for _, lang in rows:
        g = lang if lang in named else "other"
        groups[g] = groups.get(g, 0) + 1
    m = min(n * 100 // pct[g] for g, n in groups.items())
    kept = {g: min(m * pct[g] // 100, n) for g, n in groups.items()}
    tot = sum(kept.values())
    exp = {
        g: (n, kept[g], 10000 * kept[g] // tot) for g, n in groups.items()
    }
    assert got == exp, (got, exp)
    # the binding constraint here is 'de' (40 docs / 30%): M = 133,
    # so the dominant group keeps 133*40//100 = 53 of its 900 docs
    assert m == 133 and got["en"][1] == 53


def test_frame_features_invariant_to_arrow_batch_size(spark, sf_small):
    """r12: the frame-keyed stub decode must make Arrow batch boundaries
    irrelevant — frames of one asset split across batches at
    maxRecordsPerBatch=3 must produce the identical feature rows."""
    from ser_etl_spark.operators.multimodal import (
        frame_features,
        with_fake_payload,
    )
    from ser_etl_spark.sources.parquet import load_table

    docs = load_table(spark, sf_small, "documents").select("doc_id")
    media = with_fake_payload(docs)

    def rows():
        return sorted(
            (r["doc_id"], r["frame_idx"], r["f0_raw"], r["f1_raw"])
            for r in frame_features(media).collect()
        )

    baseline = rows()
    assert baseline, "video rows must exist at sf_small"
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
        assert rows() == baseline
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", prev
        )


class TestReleaseGateComposition:
    """Semantic invariants of the r14 composed/audit operators — the
    cross-engine differential proves Spark == DuckDB; these prove the
    SHARED answer is internally consistent."""

    def test_corpus_release_funnel_is_monotone(self, spark, sf_small):
        from ser_etl_spark.registry import all_queries

        rows = {
            (r["stage"], r["detail"]): (r["n_docs"], r["n_chars"])
            for r in all_queries()["corpus_release"]
            .builder(spark, sf_small)
            .collect()
        }
        raw = rows[("0_raw", "all")]
        decon = rows[("1_decontaminated", "all")]
        gated = rows[("2_quality_gated", "all")]
        dedup = rows[("3_deduped", "all")]
        assert raw >= decon >= gated >= dedup  # both docs and chars
        # split rows partition the survivors exactly
        split_docs = sum(
            v[0] for (s, _), v in rows.items() if s == "4_split"
        )
        split_chars = sum(
            v[1] for (s, _), v in rows.items() if s == "4_split"
        )
        assert (split_docs, split_chars) == dedup
        # pii-flagged is a subset of each split
        for (stage, det), (nd, nc) in rows.items():
            if stage == "5_pii_flagged":
                assert (nd, nc) <= rows[("4_split", det)]
        # shards cover every split that has documents
        for (stage, det), (nd, _) in rows.items():
            if stage == "4_split" and nd > 0:
                assert rows[("6_shards", det)][0] >= 1

    def test_bpe_iterations_chain_and_compress(self, spark, sf_small):
        from ser_etl_spark.registry import all_queries

        rows = (
            all_queries()["bpe_merge_step"]
            .builder(spark, sf_small)
            .orderBy("iteration")
            .collect()
        )
        assert [r["iteration"] for r in rows] == [1, 2, 3]
        weights = []
        for i, r in enumerate(rows):
            # each merge removes exactly `merge_weight` symbols: every
            # merged occurrence collapses two symbols into one
            assert (
                r["symbols_before"] - r["symbols_after"]
                == r["merge_weight"]
            )
            assert r["merge_weight"] > 0
            weights.append(r["merge_weight"])
            if i:
                # iterations chain: before(i) == after(i-1)
                assert r["symbols_before"] == rows[i - 1]["symbols_after"]

    def test_shard_imbalance_bounded_by_one_doc(self, spark, sf_small):
        from ser_etl_spark.operators.packing import _SHARD_CHARS
        from ser_etl_spark.registry import all_queries

        docs = load_table(spark, sf_small, "documents")
        max_doc = docs.agg(F.max("n_chars")).collect()[0][0]
        row = (
            all_queries()["shard_skew_audit"]
            .builder(spark, sf_small)
            .collect()[0]
        )
        # a doc straddling a boundary overshoots its shard by at most
        # one doc; a full shard can't be shorter than the target minus
        # the largest doc that got pulled forward
        assert row["max_chars"] <= _SHARD_CHARS + max_doc
        if row["n_shards"] > 1:
            assert row["min_full_chars"] >= _SHARD_CHARS - max_doc
        assert 0 <= row["imbalance_bp"] <= 10000

    def test_split_lang_deviations_sum_to_zeroish(self, spark, sf_small):
        """Within a split, in-split shares sum to ~10000 (floor-div
        slack < |langs|), and corpus shares are split-independent."""
        from ser_etl_spark.registry import all_queries

        rows = (
            all_queries()["split_lang_balance_audit"]
            .builder(spark, sf_small)
            .collect()
        )
        by_split: dict[str, list] = {}
        corpus_share: dict[str, int] = {}
        for r in rows:
            by_split.setdefault(r["split"], []).append(r["split_share_bp"])
            prev = corpus_share.setdefault(r["lang"], r["corpus_share_bp"])
            assert prev == r["corpus_share_bp"]
        for split, shares in by_split.items():
            assert 10000 - len(shares) < sum(shares) <= 10000
