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
    for pdf in pdf_iter:
        pdf = pdf.sort_values("offset")
        for label in pdf["label"]:
            vtype, value = _classify(label)
            brk = (run_type is not None and
                   (vtype != run_type or
                    (vtype == "Arabic" and value != last_value + 1)))
            if brk:
                closed.append((doc_id, run_start, run_type, run_len,
                               first_value))
                run_type, run_len = None, 0
            if run_type is None:
                run_start = pos
                run_type = vtype
                first_value = value if value is not None else -1
                run_len = 0
            run_len += 1
            last_value = value if value is not None else -1
            pos += 1

    if state.hasTimedOut:
        if run_type is not None:
            closed.append((doc_id, run_start, run_type, run_len,
                           first_value))
        state.remove()
    else:
        state.update((pos, run_start, run_type, run_len, first_value,
                      last_value))

    yield pd.DataFrame(closed, columns=["doc_id", "start", "run_type",
                                        "run_len", "first_value"])


def track_page_runs(labels_stream):
    """streaming (doc_id string, offset int, label string) -> closed runs.

    Input must arrive offset-ordered per doc across batches (an ordered
    ingest, e.g. the per-shard append of the extraction pipeline)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (labels_stream
            .groupBy("doc_id")
            .applyInPandasWithState(
                _track, OUTPUT_SCHEMA, STATE_SCHEMA, "append",
                GroupStateTimeout.NoTimeout))
