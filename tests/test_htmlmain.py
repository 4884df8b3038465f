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

    df = spark.createDataFrame(
        [("good", synth_html(1, PROSE, with_image=False)),
         ("truncated", "<html><mai"),
         ("poison", None)],
        "doc_id string, html string")
    out = {r["doc_id"]: r["spans"] for r in html_documents(df).collect()}
    assert [s["kind"] for s in out["good"]] == ["text"] * 3
    # truncated markup parses tolerantly: no content, but no error either
    assert list(out["truncated"]) == []
    # a genuinely unparseable payload still degrades to html_error
    assert out["poison"][0]["kind"] == "html_error"


def test_real_world_html_tolerance():
    """Unclosed void tags, named entities and stray end tags — present
    in essentially every real page — must parse, not become html_error."""
    from archive_pdf_tools_spark.sources.htmlmain import extract_main_spans

    spans = extract_main_spans(
        "<html><body><p>line one<br>line two &nbsp; and &amp; more words"
        "</p></span></body></html>")
    assert [s["kind"] for s in spans] == ["text"]
    assert "line one" in spans[0]["text"] and "line two" in spans[0]["text"]
    assert "&" in spans[0]["text"]


def test_paragraph_with_inline_image_keeps_text():
    """A block with an inline <img> yields BOTH its text span and the
    media span (the old leaf rule silently dropped the whole text)."""
    from archive_pdf_tools_spark.sources.htmlmain import extract_main_spans

    spans = extract_main_spans(
        '<html><body><p>This long paragraph has an inline figure '
        '<img src="img://fig/1"/> and then it keeps going with words.'
        "</p></body></html>")
    kinds = [s["kind"] for s in spans]
    assert kinds == ["text", "media"]
    assert "keeps going" in spans[0]["text"]
    assert spans[1]["media_ref"] == "img://fig/1"


def test_direct_text_above_nested_blocks_not_yet_lost_is_documented():
    """Div with direct text AND a nested block: the nested block's text
    is extracted (leaf rule); the div's own stray text is not a leaf
    block — assert the nested content survives."""
    from archive_pdf_tools_spark.sources.htmlmain import extract_main_spans

    spans = extract_main_spans(
        "<html><body><div>stray container words here"
        "<p>the actual paragraph with enough words</p></div></body></html>")
    assert any("actual paragraph" in s["text"] for s in spans)
