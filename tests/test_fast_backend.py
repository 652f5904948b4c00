"""Fast regex tokenizer backend == stdlib html.parser backend,
block-for-block (tag, boiler flag, text, densities) — the pinning that
lets the fast path be the default without touching goldens."""

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_document_recognition_service_spark import gen_pages, html_extract


def _blocks(text, backend):
    return [
        (b.tag, b.boiler, b.text, b.link_chars, b.raw_chars)
        for b in html_extract.html_blocks(text, backend=backend)
    ]


def test_backends_agree_on_corpus(corpus_rows):
    for r in corpus_rows:
        if r["html"][:4] == b"%PDF":
            continue
        t = html_extract.sniff_decode(r["html"])
        assert _blocks(t, "stdlib") == _blocks(t, "fast"), r["url"]


_frag = st.sampled_from(
    [
        "<p>", "</p>", "<div class='ads'>", "</div>", "<nav>", "</nav>",
        "<a href='/x'>", "</a>", "<br/>", "<b>", "<!-- c -->",
        "<script>x<y</script>", "word", "два слова", "&amp;", "&lt;", " ",
        "<", ">", "<h2>", "</h2>", "123", "<p class=\"x\">",
        # review counterexample classes
        "</SCRIPT>", "<script>q", "<!-- open", "<style>s</StYlE >",
        '<div class="nav&#95;bar">', "<p class='x&amp;y'>", "-->",
    ]
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_frag, max_size=40))
def test_backends_agree_property(frags):
    t = "".join(frags)
    assert _blocks(t, "stdlib") == _blocks(t, "fast")


def test_default_backend_is_fast():
    assert html_extract.BACKEND == "fast"
