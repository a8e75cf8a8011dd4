"""HTML boilerplate-strip kernel unit tests (no Spark)."""

from resume_parser_service_spark.kernels.html_text import extract_html

MAIN = ("the quick brown fox jumps over the lazy dog and keeps running "
        "through the forest")


def _page(main_html: str) -> bytes:
    return (f"<!DOCTYPE html><html><head><title>t</title>"
            f"<style>p{{color:red}}</style><script>var x=1;</script></head>"
            f"<body><nav><a href='/a'>aaa</a><a href='/b'>bbb</a></nav>"
            f"<header><h1><a href='/'>Site</a></h1></header>"
            f"<aside><a href='/x'>x</a> <a href='/y'>y</a></aside>"
            f"{main_html}"
            f"<footer><p>legal <a href='/tos'>tos</a></p></footer>"
            f"</body></html>").encode()


def test_main_content_identity():
    assert extract_html(_page(f"<article><p>{MAIN}</p></article>"))["text"] == MAIN


def test_multiple_paragraphs_joined_with_newline():
    res = extract_html(_page("<article><p>first paragraph with words</p>"
                             "<p>second paragraph with words</p></article>"))
    assert res["text"] == ("first paragraph with words\n"
                           "second paragraph with words")


def test_boilerplate_containers_dropped():
    res = extract_html(_page(f"<div><p>{MAIN}</p></div>"))
    assert "aaa" not in res["text"]
    assert "Site" not in res["text"]
    assert "legal" not in res["text"]
    assert res["text"] == MAIN


def test_link_density_block_dropped():
    html = _page(f"<div><a href='/1'>link one text</a> "
                 f"<a href='/2'>link two text</a></div>"
                 f"<article><p>{MAIN}</p></article>")
    assert extract_html(html)["text"] == MAIN


def test_entities_decoded():
    res = extract_html(_page("<article><p>fish &amp; chips &lt;tag&gt; "
                             "a&#39;b &#x41;BC</p></article>"))
    assert res["text"] == "fish & chips <tag> a'b ABC"


def test_whitespace_collapsed_within_block():
    res = extract_html(_page("<article><p>  lots   of\n\n whitespace "
                             "inside here  </p></article>"))
    assert res["text"] == "lots of whitespace inside here"


def test_script_style_raw_text_skipped():
    res = extract_html(_page(f"<article><p>{MAIN}</p>"
                             "<script>if (a < b) { alert('<p>hi</p>'); }"
                             "</script></article>"))
    assert res["text"] == MAIN


def test_comments_skipped():
    res = extract_html(_page(f"<article><!-- <p>ghost</p> -->"
                             f"<p>{MAIN}</p></article>"))
    assert res["text"] == MAIN


def test_hrefs_collected_in_order():
    res = extract_html(_page(f"<article><p>{MAIN}</p></article>"))
    assert res["links"][:2] == ["/a", "/b"]


def test_short_blocks_dropped():
    res = extract_html(_page(f"<article><p>ok</p><p>{MAIN}</p></article>"))
    assert res["text"] == MAIN


def test_charset_latin1_with_meta():
    body = "caf\xe9 au lait with enough characters to keep".encode("latin-1")
    html = (b'<html><head><meta charset="ISO-8859-1"></head><body>'
            b"<article><p>" + body + b"</p></article></body></html>")
    assert extract_html(html)["text"] == "caf\xe9 au lait with enough characters to keep"


def test_charset_utf8_default():
    body = "caf\xe9 über straße with enough length".encode("utf-8")
    html = b"<html><body><article><p>" + body + b"</p></article></body></html>"
    assert extract_html(html)["text"] == "caf\xe9 über straße with enough length"


def test_charset_latin1_fallback_without_meta():
    body = "r\xe9sum\xe9 text that is long enough".encode("latin-1")
    html = b"<html><body><article><p>" + body + b"</p></article></body></html>"
    assert extract_html(html)["text"] == "r\xe9sum\xe9 text that is long enough"


def test_class_hint_boilerplate_div():
    """<div class="navbar"> subtrees are chrome even without semantic
    tags (readability's unlikelyCandidates heuristic) — the dominant
    layout in pre-HTML5 crawl pages."""
    html = (b"<html><body>"
            b'<div class="navbar"><ul><li>home sweet home</li>'
            b"<li>products and services</li></ul></div>"
            b"<div><p>the real article body text lives here</p>"
            b'<div id="related-posts"><p>you may also like this one</p>'
            b"</div><p>and continues after the widget block</p></div>"
            b'<div class="footer-links"><p>tos and privacy and contact'
            b"</p></div></body></html>")
    res = extract_html(html)
    assert res["text"] == ("the real article body text lives here\n"
                           "and continues after the widget block")


def test_class_hint_nested_same_tag_close():
    """An unhinted inner div must not end the poisoned subtree early."""
    html = (b"<html><body>"
            b'<div class="sidebar"><div><p>inner sidebar junk text</p>'
            b"</div><p>more sidebar junk after inner div</p></div>"
            b"<p>kept main content paragraph</p></body></html>")
    assert extract_html(html)["text"] == "kept main content paragraph"


def test_hinted_paragraph_stays_text():
    """The hint only poisons structural containers; a <p class=comment>
    is kept (inline/leaf false-positive guard)."""
    html = (b"<html><body><p class='comment-style'>a paragraph long "
            b"enough to keep</p></body></html>")
    assert extract_html(html)["text"] == ("a paragraph long enough "
                                          "to keep")


def test_html5_named_entities_decoded():
    """Core entity table first (frozen), full stdlib HTML5 table as
    fallback — real crawls use &eacute;-style names; unknown names pass
    through untouched."""
    from resume_parser_service_spark.kernels.html_text import extract_html

    h = (b"<html><body><p>Fish &amp; Chips caf&eacute; stra&szlig;e "
         b"&uuml;ber &notanentity; &#233;</p></body></html>")
    t = extract_html(h)["text"]
    assert "Fish & Chips" in t
    assert "café" in t and "straße" in t and "über" in t
    assert "&notanentity;" in t
    assert "é" in t


def test_unclosed_hinted_container_recovers():
    """One unbalanced div inside a class-hinted container must not
    poison the rest of the page (html-1.4.0): abandoned hints pop when
    the depth falls to their recording, and <article>/<main> clears
    hint-derived boiler outright."""
    from resume_parser_service_spark.kernels.html_text import extract_html

    t = extract_html(
        b'<div class="menu"><div>unclosed</div>'
        b'<article><p>the real article content paragraph</p></article>')
    assert "real article content" in t["text"]
    # the hinted (menu) content itself must STAY dropped — recovery
    # must not abandon boiler classification wholesale
    assert "unclosed" not in t["text"]
    # semantic boilerplate inside the article still drops
    t2 = extract_html(
        b"<article><p>good paragraph with enough text</p>"
        b"<nav>skip me links</nav>"
        b"<p>more good text here too</p></article>")
    assert "skip me" not in t2["text"] and "more good" in t2["text"]


def test_digit_bearing_entities_decoded():
    from resume_parser_service_spark.kernels.html_text import extract_html

    t = extract_html(b"<p>&frac12; cup and &sup2; notation</p>")["text"]
    assert "½" in t and "²" in t
