"""Checked-in golden fixtures (FIXTURES.md §7): regenerated output must
equal the committed file — pins absolute kernel + corpus behavior, not
just Spark-vs-local relative equality."""

import json
import os

from archive_pdf_tools_spark.corpus.generate import make_doc
from archive_pdf_tools_spark.operators.extract import extract_document_local

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "docs_0_9_spans.json")


def test_goldens_match_committed():
    with open(GOLDEN, encoding="utf-8") as fh:
        want = json.load(fh)
    assert len(want) == 10
    for i in range(10):
        doc = make_doc(i, max_spans=12)
        got = extract_document_local(doc)["spans"]
        assert got == want[doc["doc_id"]], doc["doc_id"]
