"""Streaming incremental deduplication.

A continuous-ingest training-data pipeline must drop a document the
moment its (normalized-text) fingerprint has been seen in ANY earlier
micro-batch — batch dedup re-scans the corpus, streaming dedup carries
the seen-set as operator state.  This is the idiomatic Structured
Streaming shape: a JVM-side fingerprint column + ``dropDuplicates`` on
it, whose key state lives in the state store and survives restarts via
the checkpoint (so re-running the query continues deduplicating against
everything already admitted).

State sizing at scale: one state-store row per distinct fingerprint
(16-byte md5 + key overhead).  For bounded state under true infinite
streams, pass ``within`` to use ``dropDuplicatesWithinWatermark`` —
dedup then only guarantees uniqueness inside the watermark horizon
(the standard trade; exact global dedup over 10^12 docs is a batch
anti-join against the fingerprint table, ``functions/dedup.py``).
"""

from __future__ import annotations

from ..functions.textstats import fingerprint

__all__ = ["stream_dedup", "stream_near_dups", "DOCS_SCHEMA_DDL",
           "NEAR_DUP_OUTPUT"]

DOCS_SCHEMA_DDL = ("doc_id bigint, text string, lang string, "
                   "source string, n_chars bigint")


NEAR_DUP_OUTPUT = ("doc_a string, doc_b string, band int, "
                   "est_jaccard double")
_NEAR_DUP_STATE = "members string"


def _bucket_matcher(sim_tau: float, max_members: int):
    import json

    import pandas as pd

    def match(key, pdf_iter, state):
        if state.exists:
            members = json.loads(state.get[0])
        else:
            members = []                      # [(doc_id, [sig ints])]
        pairs = []
        member_ids = {m[0] for m in members}
        for pdf in pdf_iter:
            for doc_id, sig in zip(pdf["doc_id"], pdf["sig"]):
                doc_id = str(doc_id)
                sig = [int(v) for v in sig]
                for other_id, other_sig in members:
                    if other_id == doc_id:
                        continue
                    eq = sum(1 for a, b in zip(sig, other_sig) if a == b)
                    est = eq / len(sig)
                    if est >= sim_tau:
                        a, b = sorted((other_id, doc_id))
                        pairs.append((a, b, int(key[0]), round(est, 4)))
                # A re-delivered doc must not occupy a second member slot
                # (it would waste max_members capacity AND emit duplicate
                # self-pairs for every later arrival).
                if doc_id not in member_ids and len(members) < max_members:
                    members.append((doc_id, sig))
                    member_ids.add(doc_id)
        state.update((json.dumps(members),))
        yield pd.DataFrame(pairs, columns=["doc_a", "doc_b", "band",
                                           "est_jaccard"])
    return match


def stream_near_dups(stream_df, n: int = 3, k: int = 32, bands: int = 8,
                     sim_tau: float = 0.5, seed: int = 7,
                     max_members: int = 1024):
    """Incremental NEAR-dup pair detection over a document stream.

    MinHash signatures (stateless vectorized stage) -> explode to
    (band, bucket) keys -> ``applyInPandasWithState`` keyed per bucket:
    the state holds the bucket's member signatures, each arriving doc is
    scored against them by the fraction of equal signature components
    (the unbiased Jaccard estimator), and pairs >= ``sim_tau`` are
    emitted the moment the second member arrives — across micro-batches
    and restarts (state lives in the checkpoint).

    Scale posture: state is per *bucket*, bounded by ``max_members``
    (banding keeps buckets small exactly as in the batch LSH; the cap is
    the runaway-bucket guard for adversarial content).  The same pair
    can fire in several bands — consumers dedup on (doc_a, doc_b), which
    stays a cheap batch-local distinct.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..functions.dedup import band_buckets, minhash_signatures

    sig = minhash_signatures(stream_df, n=n, k=k, seed=seed)
    # Same banding as the batch path (shared helper): checkpointed
    # stream state must bucket identically to batch LSH.
    buckets = band_buckets(sig, k, bands, extra_cols=("sig",))
    return (buckets
            .groupBy("band", "bucket")
            .applyInPandasWithState(
                _bucket_matcher(sim_tau, max_members), NEAR_DUP_OUTPUT,
                _NEAR_DUP_STATE, "append", GroupStateTimeout.NoTimeout))


def stream_dedup(stream_df, ts_col: str | None = None,
                 within: str | None = None):
    """documents stream -> first-seen documents only (+ ``fp`` column).

    ``within``: optional watermark delay (e.g. ``"1 hour"``); requires
    ``ts_col``.  Without it the seen-set is exact and unbounded."""
    out = stream_df.withColumn("fp", fingerprint("text"))
    if within is not None:
        if ts_col is None:
            raise ValueError("within= requires ts_col=")
        return (out.withWatermark(ts_col, within)
                .dropDuplicatesWithinWatermark(["fp"]))
    return out.dropDuplicates(["fp"])
