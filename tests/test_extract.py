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


def test_independent_qa_parser_agrees_with_worker():
    """The offset-slicing oracle parser (`reference_impl/qa_oracle`) and
    the regex worker (`sources/qa.parse_qa_page`) share no parsing code;
    they must produce byte-identical records over the synth corpus —
    this closes VERDICT r1's shared-extraction-worker residual for the
    digest oracles."""
    from graph4code_spark.reference_impl.qa_oracle import oracle_parse_qa_page
    from graph4code_spark.sources.qa import parse_qa_page
    from graph4code_spark.synth import (
        FIXED_CATALOG,
        HUB_ENTITY,
        _page_record,
        entity_name,
        entity_type,
    )

    names = sorted({entity_name(r) for r in FIXED_CATALOG})
    etypes = {entity_name(r): entity_type(r) for r in FIXED_CATALOG}
    for pid in range(300):
        page = _page_record(pid, 42, names, HUB_ENTITY, etypes)
        h = page["html"].decode("utf-8")
        assert parse_qa_page(page["url"], h) == oracle_parse_qa_page(page["url"], h)
    # non-QA page -> both None
    assert parse_qa_page("u", "<html><body>hi</body></html>") is None
    assert oracle_parse_qa_page("u", "<html><body>hi</body></html>") is None


# ---------------------------------------------------------------------------
# Fast-path equivalence: the regex tokenizer must be indistinguishable
# from the canonical html.parser semantics wherever it engages.
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

from graph4code_spark.html_extract import _parse_html_canonical, _parse_html_fast

_ATOMS = [
    "<code>", "</code>", "<pre>", "</pre>", "<code/>", "<code />",
    "<code a>", "<code a=>", "<code a='b'>", '<code a=">">', "<code a='<'>",
    '<div a="<code>">', "x\ny", "&amp;", "&", "&#38;", "&#x26;", "&quot;",
    "&bogus", "&bogus;", ";", "<", ">", "</", "/>", "<>", "< code>",
    "<CODE A='1'/>", "</CoDe>", "<br>", "<BR/>", "<img/>", "<input >",
    "<a b=c/d>", "<a b=c/>", "<a/ >", "<a /b>", "<a\tb='c'>", "<a\nb>",
    "text&#65;more", "&#xZZ;", "&#999999999;", "<em><code>x</em></code>",
    "<code><br></code>", "<code><br/></code>", "<code>a<b</code>",
    "<code a='</code>'>", "tag attr='>'", "<-", "<a", "a>", "<1>", "<a=b>",
    "</a b>", "</a >", "<a'>", '<a">', "<code\n>", "</code\n>",
    "<code@x>", "</code/>", "<!-- c -->", "<!doctype html>", "<?pi?>",
    "<script>x</script>", "<style>y</style>", "\x00", "<a b\x00>",
]


@settings(max_examples=500, deadline=None)
@given(st.lists(st.sampled_from(_ATOMS), min_size=1, max_size=14))
def test_fast_path_matches_canonical(parts):
    html = "".join(parts)
    fast = _parse_html_fast(html)
    if fast is not None:
        assert fast == _parse_html_canonical(html)


def test_fast_path_engages_on_synth_corpus():
    """The fast path must actually run on the benchmarked page shape
    (quoted '<' in data-tags attrs must not bail) AND agree with the
    canonical parser there — this is the hot 77% of pipeline CPU."""
    from graph4code_spark.synth import (
        FIXED_CATALOG, HUB_ENTITY, _page_record, entity_name, entity_type)

    names = sorted({entity_name(r) for r in FIXED_CATALOG})
    etypes = {entity_name(r): entity_type(r) for r in FIXED_CATALOG}
    for pid in range(200):
        h = _page_record(pid, 42, names, HUB_ENTITY, etypes)["html"].decode()
        fast = _parse_html_fast(h)
        assert fast is not None, "fast path bailed on a synth page"
        assert fast == _parse_html_canonical(h)


def test_fast_path_bails_on_quirk_constructs():
    """Constructs whose html.parser handling the tokenizer does not
    model must fall back (None), never guess."""
    for h in ["<!-- x --><code>a\nb</code>", "<!doctype html><p>t</p>",
              "<?pi?>", "<script>var x=1;</script>", "<style>.c{}</style>",
              "<a b=x<y>", "<code@x>a\nb</code@x>", "</code/>", "a < b"]:
        assert _parse_html_fast(h) is None
    # and the public function still gets those right via the fallback
    assert parse_html("<!-- c --><code>a\nb</code>")[1] == ["a\nb"]
    assert parse_html("a < b")[0] == _parse_html_canonical("a < b")[0]
