"""Custom stateful streaming operator: incremental page-number run
tracking via ``applyInPandasWithState``.

The batch W1 parser (``kernels/pagenumbers.py``) sees a document's whole
label sequence; in a continuous ingest the labels of a document arrive
across micro-batches, so the run segmentation must carry state: per
doc_id we keep the open run (type, last numeric value, start, length) and
emit every run the moment it closes (type change / non-consecutive value
/ invalid transition — the same break rules as ``parse_series``,
``pagenumbers.py:222-234``, restricted to the arabic/invalid core; roman
look-ahead needs future labels and is inherently batch).

State size is O(1) per open document — the contract that lets this run
against an unbounded stream.
"""

from __future__ import annotations

__all__ = ["track_page_runs"]

OUTPUT_SCHEMA = ("doc_id string, start int, run_type string, run_len int, "
                 "first_value int")
STATE_SCHEMA = ("pos int, run_start int, run_type string, run_len int, "
                "first_value int, last_value int")




def _classify(label):
    if label is None or label == "" or not str(label).isdigit():
        return "Invalid", None
    return "Arabic", int(label)


def _make_track(idle_flush_ms):
    def _track(key, pdf_iter, state):
        import pandas as pd

        (doc_id,) = key
        if state.exists:
            pos, run_start, run_type, run_len, first_value, last_value = \
                state.get
        else:
            pos, run_start, run_type, run_len, first_value, last_value = \
                0, 0, None, 0, -1, -1

        closed = []
        if state.hasTimedOut:
            # Idle document: flush the open run and drop the state row —
            # final runs are emitted and state stays O(open documents).
            if run_type is not None:
                closed.append((doc_id, run_start, run_type, run_len,
                               first_value))
            state.remove()
            yield pd.DataFrame(closed, columns=["doc_id", "start", "run_type",
                                                "run_len", "first_value"])
            return

        # A micro-batch's rows arrive as MULTIPLE Arrow chunks with arbitrary
        # chunk boundaries after the groupBy shuffle — sorting each chunk
        # independently would interleave out-of-order labels and fabricate
        # run breaks, so the whole batch is concatenated before ordering.
        batch = pd.concat(list(pdf_iter), ignore_index=True)
        if len(batch):
            batch = batch.sort_values("offset")
            for off, label in zip(batch["offset"], batch["label"]):
                vtype, value = _classify(label)
                brk = (run_type is not None and
                       (vtype != run_type or
                        (vtype == "Arabic" and value != last_value + 1)))
                if brk:
                    closed.append((doc_id, run_start, run_type, run_len,
                                   first_value))
                    run_type, run_len = None, 0
                if run_type is None:
                    run_start = int(off)      # data position, not arrival count
                    run_type = vtype
                    first_value = value if value is not None else -1
                    run_len = 0
                run_len += 1
                last_value = value if value is not None else -1
                pos += 1

        state.update((pos, run_start, run_type, run_len, first_value,
                      last_value))
        if idle_flush_ms is not None:
            state.setTimeoutDuration(int(idle_flush_ms))

        yield pd.DataFrame(closed, columns=["doc_id", "start", "run_type",
                                            "run_len", "first_value"])

    return _track


def track_page_runs(labels_stream, idle_flush_ms: int | None = None):
    """streaming (doc_id string, offset int, label string) -> closed runs.

    Input must arrive offset-ordered per doc across BATCHES (an ordered
    ingest, e.g. the per-shard append of the extraction pipeline);
    within a batch any chunking/order is handled.

    ``idle_flush_ms``: with the default None, runs stay open across
    restarts indefinitely (exact continuation semantics; state is
    O(open documents) and a document's FINAL run is emitted only when a
    later label closes it).  Set a processing-time idle window to flush
    a quiescent document's last run and free its state row — the
    bounded-state mode for unbounded streams, at the cost of splitting
    a run that resumes after the window."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    timeout = (GroupStateTimeout.NoTimeout if idle_flush_ms is None
               else GroupStateTimeout.ProcessingTimeTimeout)
    return (labels_stream
            .groupBy("doc_id")
            .applyInPandasWithState(
                _make_track(idle_flush_ms), OUTPUT_SCHEMA, STATE_SCHEMA,
                "append", timeout))
