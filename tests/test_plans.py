"""Physical-plan quality gates: broadcast joins stay broadcast, scans
prune/push down, the shuffle-free formulations really are shuffle-free.
These lock in the 100-TB-relevant plan properties, not just results."""

import pytest

SF = "/root/testdata/sf0.001"


def plan_str(df):
    # public API: capture explain output
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_nation_revenue_uses_broadcast_joins(spark):
    from archive_pdf_tools_spark.queries import q_nation_revenue
    p = plan_str(q_nation_revenue(spark, SF))
    assert "BroadcastHashJoin" in p


def test_simhash_is_shuffle_free(spark):
    from archive_pdf_tools_spark.functions.dedup import simhash
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan_str(simhash(docs))
    assert "Exchange" not in p


def test_minhash_signatures_shuffle_free(spark):
    from archive_pdf_tools_spark.functions.dedup import minhash_signatures
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan_str(minhash_signatures(docs, k=8))
    assert "Exchange" not in p


def test_parquet_filter_pushdown_and_pruning(spark):
    from pyspark.sql import functions as F
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    q = docs.where(F.col("lang") == "en").select("doc_id", "n_chars")
    p = plan_str(q)
    assert "PushedFilters" in p and "EqualTo(lang,en)" in p
    # column pruning: text column must NOT be read
    assert "text" not in p.split("ReadSchema")[1].splitlines()[0]


def test_pricing_summary_partial_aggregate(spark):
    from archive_pdf_tools_spark.queries import q_pricing_summary
    p = plan_str(q_pricing_summary(spark, SF))
    # map-side combine before the shuffle
    assert p.count("HashAggregate") >= 2
    assert "PushedFilters" in p


def test_extraction_single_regroup_shuffle(spark, tmp_path):
    """The extraction DAG shuffles exactly twice: the explicit salted
    repartition and the per-doc regroup — nothing else (rasters and
    payloads never enter an extra shuffle)."""
    from archive_pdf_tools_spark.operators.extract import (
        OUTPUT_SCHEMA_DDL, extract_spans, reassemble)
    docs = spark.createDataFrame(
        [("d1", [("text", "{}", "", 0)])], schema=OUTPUT_SCHEMA_DDL)
    out = reassemble(extract_spans(docs, num_partitions=4))
    p = plan_str(out)
    import re
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", p, re.MULTILINE))
    assert n_exchanges == 2, p


def test_srp_signature_is_vectorized_not_interpreted(spark):
    """The SRP signature must come from one mapInPandas matmul, not
    n_planes interpreted Catalyst aggregate lambdas (measured 5-7x
    slower in the minhash kernels)."""
    from archive_pdf_tools_spark.functions.similarity import (
        srp_lsh_topk)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = [0.1] * 64
    p = plan_str(srp_lsh_topk(emb, q, k=5, n_planes=6))
    assert "MapInPandas" in p


def test_embedding_near_dups_blocks_on_ivf_cells(spark):
    """IVF-cell blocking: the candidate join keys on the cell id from a
    vectorized assign stage; the raw embedding column must not ride the
    blocking join (it is re-joined only for the verify)."""
    from archive_pdf_tools_spark.functions.dedup import embedding_near_dups
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    p = plan_str(embedding_near_dups(emb, tau=0.9))
    assert "MapInPandas" in p
    assert "cell" in p


def test_partition_count_invariance_new_queries(spark):
    """Results must not depend on spark.sql.shuffle.partitions — pins
    determinism of the iterative CC propagation, the LSH candidate
    joins, and the HTML front door under different physical plans."""
    from archive_pdf_tools_spark.queries import QUERIES

    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for name in ("dedup_clusters", "minhash_lsh_pairs", "html_extract",
                     "extract_digest"):
            fn, _sql = QUERIES[name]
            spark.conf.set("spark.sql.shuffle.partitions", "3")
            a = sorted(map(tuple, fn(spark, SF).collect()))
            spark.conf.set("spark.sql.shuffle.partitions", "17")
            b = sorted(map(tuple, fn(spark, SF).collect()))
            assert a == b, f"{name}: partition-count-dependent result"
            assert a, f"{name}: empty result"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)


def test_winnow_fingerprints_shuffle_free(spark):
    """Fingerprint selection is one vectorized map stage: no Exchange
    before the (doc_id, fp) rows (the per-character explode + window
    formulation shuffled ~n_chars rows per doc)."""
    from archive_pdf_tools_spark.functions.dedup import winnow_fingerprints
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan_str(winnow_fingerprints(docs))
    assert "Exchange" not in p
    assert "MapInPandas" in p


def test_lsh_verify_is_candidate_bounded(spark):
    """The exact-Jaccard verify inside minhash_lsh_pairs must tokenize
    only candidate documents: the shingle scan hangs off a semi-join on
    the candidate doc set, not a full-corpus cache."""
    from archive_pdf_tools_spark.functions.dedup import minhash_lsh_pairs
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan_str(minhash_lsh_pairs(docs))
    assert "LeftSemi" in p, p


def test_decontaminate_broadcasts_benchmark(spark):
    """The benchmark shingle side must broadcast: the corpus-side scan
    joins map-side and never shuffles its shingle stream."""
    from pyspark.sql import functions as F

    from archive_pdf_tools_spark.functions.pipeline import decontaminate
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bench = (docs.where(F.col("doc_id") % 100 == 0)
             .select(F.col("doc_id").alias("bench_id"), "text"))
    p = plan_str(decontaminate(docs, bench))
    assert "BroadcastHashJoin" in p, p


def test_stratified_sample_is_shuffle_free_and_deterministic(spark):
    from archive_pdf_tools_spark.functions.pipeline import stratified_sample
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    kept = stratified_sample(docs, {"en": 0.5, "zh": 0.1})
    assert "Exchange" not in plan_str(kept)
    a = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    assert a == b and 0 < len(a) < docs.count()


def test_scrub_pii_values_and_plan(spark):
    """Known strings redact to the exact placeholder text with correct
    per-class counts; the scrub itself is whole-stage-codegen column
    work with no Exchange (the 100-TB shape: one linear scan)."""
    from archive_pdf_tools_spark.functions.pipeline import scrub_pii

    df = spark.createDataFrame(
        [(0, "mail a.b+c@ex-1.org then 192.168.0.1 and +4915712345678 ok"),
         (1, "no pii here, just words and 12.5 percent"),
         (2, "two mails x@y.io z@q.dev")],
        "doc_id bigint, text string")
    rows = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    assert rows[0]["scrubbed"] == "mail <email> then <ip> and <phone> ok"
    assert (rows[0]["n_email"], rows[0]["n_ip"], rows[0]["n_phone"]) == \
        (1, 1, 1)
    assert rows[1]["scrubbed"] == rows[1]["text"]
    assert (rows[1]["n_email"], rows[1]["n_ip"], rows[1]["n_phone"]) == \
        (0, 0, 0)
    assert rows[2]["n_email"] == 2
    assert rows[2]["scrubbed"] == "two mails <email> <email>"
    assert "Exchange" not in plan_str(scrub_pii(df))


def test_pack_sequences_invariants(spark):
    """Offsets live in [0, max_tokens); seq_idx is non-decreasing in
    doc_id order within each (lang, shard) stream."""
    from archive_pdf_tools_spark.functions.pipeline import pack_sequences
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = pack_sequences(docs, max_tokens=1024, shards=8).collect()
    assert rows
    assert all(0 <= r["tok_offset"] < 1024 for r in rows)
    by_group = {}
    for r in sorted(rows, key=lambda r: (r["lang"], r["shard"], r["doc_id"])):
        k = (r["lang"], r["shard"])
        prev = by_group.get(k, 0)
        assert r["seq_idx"] >= prev
        by_group[k] = r["seq_idx"]


def test_pack_sequences_derives_shards_from_input_size(spark):
    """shards='auto': the shard count scales with the corpus (ceil of
    n_docs / docs_per_shard) instead of a fixed default that would make
    every (lang, shard) window group a monster sort at 10^12 docs; the
    derived layout stays deterministic and keeps the window invariants
    at both input sizes."""
    from archive_pdf_tools_spark.functions.pipeline import pack_sequences

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    small = docs.limit(40)
    for src, dps, want_shards in ((small, 10, 4), (docs, 100, None)):
        out = pack_sequences(src, max_tokens=256, shards="auto",
                             docs_per_shard=dps)
        rows = out.collect()
        n_docs = src.count()
        n_shards = len({r["shard"] for r in rows})
        expect = -(-n_docs // dps)
        if want_shards is not None:
            assert expect == want_shards
        # every assigned shard id is in range; most slots populated
        assert all(0 <= r["shard"] < expect for r in rows)
        assert n_shards >= min(expect, 2)
        assert all(0 <= r["tok_offset"] < 256 for r in rows)
        # deterministic: same input -> identical layout
        again = {(r["doc_id"], r["seq_idx"], r["tok_offset"])
                 for r in pack_sequences(src, max_tokens=256,
                                         shards="auto",
                                         docs_per_shard=dps).collect()}
        assert again == {(r["doc_id"], r["seq_idx"], r["tok_offset"])
                         for r in rows}


def test_pack_sequences_default_is_lazy(spark):
    """shards=None (the default) must not run a hidden job at plan
    construction: no Spark job may start before an action is called
    (VERDICT r7 ask #6)."""
    from archive_pdf_tools_spark.functions.pipeline import pack_sequences

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = tracker.getJobIdsForGroup(None) or []
    n_before = len(before)
    out = pack_sequences(docs, max_tokens=512)     # plan only
    after = tracker.getJobIdsForGroup(None) or []
    assert len(after) == n_before, "plan construction launched a job"
    rows = out.limit(5).collect()                  # action works
    assert rows and all(r["shard"] >= 0 for r in rows)


def test_kmeans_update_stage_partial_aggregates(spark):
    """The k-means mean-update shuffle must be map-side combined: the
    posexplode -> groupBy(cell, pos) plan carries a partial HashAggregate
    BEFORE its Exchange, so each iteration moves ~k*dim rows per
    partition regardless of corpus size."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    emb64 = F.col("embedding").cast("array<double>")
    stats = (emb.select(F.lit(0).alias("cell"),
                        F.posexplode(emb64).alias("pos", "val"))
             .groupBy("cell", "pos")
             .agg(F.sum("val").alias("s"), F.count("*").alias("n")))
    p = plan_str(stats)
    pre_exchange = p.split("Exchange")[-1]   # formatted plan lists leaves last
    assert "partial_sum" in p and "partial_count" in p
    # the partial aggregate sits upstream (after Exchange in the listing)
    assert "HashAggregate" in pre_exchange


def test_recompress_is_map_only(spark):
    """The PDF recompress front door never shuffles: the document row
    already holds everything the rewrite needs (one mapInPandas over
    the scan — the 100-TB shape for a per-doc transform)."""
    from archive_pdf_tools_spark.operators.pdfcomp import recompress_pdfs

    df = spark.createDataFrame(
        [("d", bytearray(b"%PDF-"), None)],
        "doc_id string, pdf binary, hocr binary")
    p = plan_str(recompress_pdfs(df))
    assert "Exchange" not in p
    assert "MapInPandas" in p
