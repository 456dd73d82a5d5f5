from graph4code_spark.html_extract import (
    extract_code_blocks,
    extract_text,
    parse_html,
)


def test_get_text_concatenation():
    html = "<html><head><title>T</title></head><body><p>a b</p><div>c</div></body></html>"
    assert extract_text(html) == "Ta bc"


def test_entities_decoded():
    assert extract_text("<p>a &amp; b &lt;c&gt;</p>") == "a & b <c>"


def test_code_blocks_multiline_only():
    html = (
        "<p>x</p><code>one liner</code>"
        "<pre><code>line1\nline2\n</code></pre>"
        "<code>a\nb</code>"
    )
    assert extract_code_blocks(html) == ["line1\nline2\n", "a\nb"]


def test_code_with_nested_element_excluded():
    # find_all("code", text=True) requires a single text child
    html = "<code>a\n<b>bold</b>c</code><code>x\ny</code>"
    assert extract_code_blocks(html) == ["x\ny"]


def test_text_includes_code():
    text, codes = parse_html("<p>q</p><code>a\nb</code>")
    assert text == "qa\nb"
    assert codes == ["a\nb"]


def test_broken_markup_tolerated():
    assert extract_text("<p>a<div>b") == "ab"
    assert extract_text("") == ""
