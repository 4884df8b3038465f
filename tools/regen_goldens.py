#!/usr/bin/env python
"""Regenerate the checked-in golden span fixtures (FIXTURES.md §7).

The e2e tests compare Spark against the local runner (relative
correctness); this file pins *absolute* behavior: if any kernel or the
corpus generator drifts, the committed goldens fail.  CI rule: the
regenerated file must equal the committed one.
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from archive_pdf_tools_spark.corpus.generate import make_doc  # noqa: E402
from archive_pdf_tools_spark.operators.extract import (  # noqa: E402
    extract_document_local)

N_DOCS = 10
MAX_SPANS = 12
OUT = os.path.join(ROOT, "tests", "goldens", "docs_0_9_spans.json")


def main():
    goldens = {}
    for i in range(N_DOCS):
        doc = make_doc(i, max_spans=MAX_SPANS)
        goldens[doc["doc_id"]] = extract_document_local(doc)["spans"]
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w", encoding="utf-8") as fh:
        json.dump(goldens, fh, ensure_ascii=False, indent=1, sort_keys=True)
    print(OUT, sum(len(v) for v in goldens.values()), "spans")


if __name__ == "__main__":
    main()
