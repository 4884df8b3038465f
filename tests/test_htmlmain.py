"""HTML main-content extraction: boilerplate strip + DOM heuristics."""

from archive_pdf_tools_spark.corpus.htmlgen import synth_html
from archive_pdf_tools_spark.sources.htmlmain import extract_main_spans

PROSE = " ".join(f"word{i}" for i in range(95))


def test_chrome_is_stripped_content_kept():
    spans = extract_main_spans(synth_html(7, PROSE, with_image=True))
    kinds = [s["kind"] for s in spans]
    assert kinds == ["text", "media", "text", "text"]
    joined = " ".join(s["text"] for s in spans if s["kind"] == "text")
    assert joined == PROSE                       # exact main text recovery
    assert "Home" not in joined and "copyright" not in joined
    assert spans[1]["media_ref"] == "img://doc/7/0"
    assert [s["offset"] for s in spans] == [0, 1, 2, 3]


def test_link_density_filter():
    markup = """<html><body><main>
      <p><a href="/x">one link</a> <a href="/y">two link</a> tail</p>
      <p>plain paragraph with several real words here</p>
    </main></body></html>"""
    spans = extract_main_spans(markup)
    assert len(spans) == 1
    assert spans[0]["text"].startswith("plain paragraph")


def test_min_words_and_nested_chrome():
    markup = """<html><body><main>
      <p>ok go</p>
      <div><div class="ad-banner"><p>buy this thing now please</p></div>
           <p>surviving inner paragraph with words</p></div>
    </main></body></html>"""
    spans = extract_main_spans(markup)
    assert [s["text"] for s in spans] == [
        "surviving inner paragraph with words"]


def test_html_documents_spark_and_poison(spark):
    import pandas as pd

    from archive_pdf_tools_spark.sources.htmlmain import html_documents

    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": ["good", "bad"],
        "html": [synth_html(1, PROSE, with_image=False), "<html><mai"]}))
    out = {r["doc_id"]: r["spans"] for r in html_documents(df).collect()}
    assert [s["kind"] for s in out["good"]] == ["text"] * 3
    assert out["bad"][0]["kind"] == "html_error"
