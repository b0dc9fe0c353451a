"""Unit tests for the DOM walker text contract (SURVEY.md §7.1 M1)."""

from valere_ocr_ray.extract.html_text import extract_main_text


def t(html: str) -> str:
    return extract_main_text(html.encode())


def test_basic_blocks_and_join():
    assert t("<p>one</p><p>two</p>") == "one\ntwo"


def test_whitespace_collapse():
    assert t("<p>  a \n\t b  </p>") == "a b"


def test_script_style_head_dropped():
    html = "<head><title>T</title></head><body><script>x=1</script><style>.a{}</style><p>keep</p></body>"
    assert t(html) == "keep"


def test_chrome_regions_dropped():
    html = "<nav><a href='/'>Home</a></nav><p>body text</p><footer>c 2024</footer>"
    assert t(html) == "body text"


def test_link_density_boilerplate_dropped():
    # short, all-link block → dropped; long link-heavy block → kept
    assert t("<p><a href='x'>click here now</a></p>") == ""
    long = "<p><a href='x'>a very long anchor text with more than ten words inside it here</a></p>"
    assert t(long) != ""


def test_dt_dd_kv_pairing():
    assert t("<dl><dt>Member ID</dt><dd>A123</dd></dl>") == "Member ID: A123"


def test_dangling_dt_emitted():
    assert t("<dl><dt>Lonely</dt></dl>") == "Lonely"


def test_two_cell_row_kv():
    assert t("<table><tr><td>MRN</td><td>99</td></tr></table>") == "MRN: 99"


def test_multi_cell_row_pipe_join():
    """Contract §6 (Textract TABLES analog): >= 3 cells with no header
    row join with ' | '."""
    assert t("<table><tr><td>a</td><td>b</td><td>c</td></tr></table>") == "a | b | c"


def test_multi_cell_row_header_paired():
    """A preceding all-<th> row of the same width pairs header-wise."""
    out = t(
        "<table><tr><th>Name</th><th>Dose</th><th>Qty</th></tr>"
        "<tr><td>Amox</td><td>500mg</td><td>30</td></tr></table>"
    )
    assert out == "Name | Dose | Qty\nName: Amox | Dose: 500mg | Qty: 30"


def test_header_width_mismatch_falls_back_to_pipe_join():
    out = t(
        "<table><tr><th>A</th><th>B</th><th>C</th></tr>"
        "<tr><td>1</td><td>2</td><td>3</td><td>4</td></tr></table>"
    )
    assert out == "A | B | C\n1 | 2 | 3 | 4"


def test_header_does_not_cross_table_boundary():
    out = t(
        "<table><tr><th>A</th><th>B</th><th>C</th></tr></table>"
        "<table><tr><td>1</td><td>2</td><td>3</td></tr></table>"
    )
    assert out == "A | B | C\n1 | 2 | 3"


def test_two_cell_row_still_kv():
    """The 2-cell 'k: v' FORMS contract is unchanged by the TABLES work."""
    assert t("<table><tr><td>k</td><td>v</td></tr></table>") == "k: v"


def test_checkbox_checked_emits_x():
    out = t("<p><input type='checkbox' checked> Z39.1</p>")
    assert out == "X Z39.1"


def test_checkbox_unchecked_silent():
    assert t("<p><input type='checkbox'> Z39.1</p>") == "Z39.1"


def test_input_value_text():
    assert t("<p>Name: <input value='Jo'></p>") == "Name: Jo"


def test_img_alt_text():
    assert t("<p><img alt='signature'></p>") == "signature"


def test_br_splits_blocks():
    assert t("<p>a<br>b</p>") == "a\nb"


def test_heading_isupper_preserved():
    assert t("<h2>NEXT STEPS</h2><p>x</p>") == "NEXT STEPS\nx"


def test_invalid_bytes_replace():
    out = extract_main_text(b"<p>ok \xff\xfe</p>")
    assert "ok" in out


def test_idempotent():
    html = b"<div><p>a</p><nav>x</nav><p>b</p></div>"
    assert extract_main_text(html) == extract_main_text(html)


def test_fast_tokenizer_matches_stdlib_parser():
    """Differential gate: the regex tokenizer front-end must emit
    byte-identical text to the html.parser front-end over the full
    template battery + adversarial markup."""
    from valere_ocr_ray.extract.html_text import (
        extract_main_text,
        extract_main_text_reference,
    )
    from valere_ocr_ray.sources.synth import synth_row

    for i in range(0, 1500, 3):
        html = synth_row(i)[2]
        if html[:1] == b"<" and len(html) < 1_000_000:
            assert extract_main_text(html) == extract_main_text_reference(html), i

    adversarial = [
        b"<p>a &amp; b &lt;tag&gt; &#65; &unknown; & lone</p>",
        b"<p>bro < ken <div>x</p>",
        b"<script>if (a<b && c>d) {}</script><p>after</p>",
        b"<style>a>b{color:red}</style><p>s</p>",
        b"<!-- comment <p>no</p> --><p>yes</p>",
        b"<p class='x\"y'>quoted</p>",
        b'<a href="a>b">link text here</a><p>tail</p>',
        b"<input type=checkbox checked><p>box</p>",
        b"<img alt='pic &amp; stuff'/><p>t</p>",
        b"<P>UPPER</P><DIV>case</DIV>",
        b"<p>unclosed",
        b"<!DOCTYPE html><?xml version='1.0'?><p>d</p>",
        "<p>café &eacute;</p>".encode(),
    ]
    for case in adversarial:
        assert extract_main_text(case) == extract_main_text_reference(case), case


def test_fast_tokenizer_fuzz_matches_stdlib():
    """Property fuzz: the fast tokenizer and the html.parser front-end
    emit identical text over generated markup — tags (well-formed and
    soup: bare ``<``/``</``, end-tag junk, unterminated constructs at
    EOF, comments/CDATA/PI, char/entity refs, quoted ``<``/``>`` in
    attrs).

    Out of scope (documented divergence): start tags whose *attr area*
    contains a stray unpaired quote before a ``<`` — the stdlib's
    malformed-start-tag recovery is emulated only for the cases above;
    both parsers remain deterministic, and the engine's byte contract
    is pinned by its own goldens, not by stdlib soup recovery."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from valere_ocr_ray.extract.html_text import (
        extract_main_text,
        extract_main_text_reference,
    )

    fragment = st.one_of(
        st.sampled_from(
            [
                "<p>", "</p>", "<div>", "</div>", "<li>", "<dt>", "</dt>",
                "<dd>", "</dd>", "<tr>", "</tr>", "<td>", "</td>", "<br>",
                "<a href='x'>", "</a>", "<nav>", "</nav>", "<table>",
                "</table>", "<input type=checkbox checked>", "<img alt='z'>",
                "<script>", "</script>", "<style>", "</style>", "<!-- c -->",
                "&amp;", "&lt;", "&#65;", "&bogus;", "& ", "<", ">", "</",
                "<>", "< p>", "<p/>", "<a b=c>", "<a b='c d'>", "</p attr>",
                "<!doctype html>", "<?pi?>", "</>", "</ >", "</3>", "</p<q>",
                "<![CDATA[x]]>", "<!>", '<a href="x<y">', '<a title="a>b">',
            ]
        ),
        st.text(alphabet="ab c:.\n\t>&XYZ09/=!-;#x", min_size=0, max_size=14),
    )

    @settings(max_examples=400, deadline=None)
    @given(st.lists(fragment, min_size=0, max_size=30))
    def check(parts):
        doc = "".join(parts).encode("utf-8", "replace")
        assert extract_main_text(doc) == extract_main_text_reference(doc)

    check()


# -- C4 signature DOM tiers ---------------------------------------------
def _tier(html: str) -> int:
    from valere_ocr_ray.extract.html_text import extract_main_text_meta

    return extract_main_text_meta(html.encode())[1]


def test_sig_tier1_img_attrs():
    assert _tier('<p><img src="sig.png" alt="signature"></p>') == 1
    assert _tier('<p><img src="/img/signature_block.png"></p>') == 1
    assert _tier('<p><img class="signature-pad" src="x.png"></p>') == 1


def test_sig_tier1_canvas_and_input():
    assert _tier('<div><canvas id="signatureCanvas"></canvas></div>') == 1
    assert _tier('<form><input name="customer_signature" type="text"></form>') == 1


def test_sig_tier2_geometry_analog():
    # wide short text-less image = Textract w>0.2/h<0.05 no-Text LINE
    assert _tier('<p><img src="scan_17.png" width="400" height="40"></p>') == 2
    # too tall / too narrow / has alt text -> not geometry tier
    assert _tier('<p><img src="a.png" width="400" height="300"></p>') == 0
    assert _tier('<p><img src="a.png" width="100" height="40"></p>') == 0
    assert _tier('<p><img src="a.png" alt="logo" width="400" height="40"></p>') == 0


def test_sig_tier2_css_sized_images():
    """Pages sizing images via inline CSS instead of width/height attrs
    express the same geometry (VERDICT r2 missing #4)."""
    assert _tier('<p><img src="s.png" style="width:400px;height:40px"></p>') == 2
    # mixed: attr width + CSS height
    assert _tier('<p><img src="s.png" width="400" style="height: 40px"></p>') == 2
    # CSS says too tall -> not geometry
    assert _tier('<p><img src="s.png" style="width:400px;height:300px"></p>') == 0
    # percent/em units don't parse as px geometry
    assert _tier('<p><img src="s.png" style="width:90%;height:4em"></p>') == 0


def test_sig_tier_priority_and_chrome_excluded():
    # element tier wins over geometry tier
    html = (
        '<p><img src="x.png" width="400" height="40">'
        '<img src="signature.png"></p>'
    )
    assert _tier(html) == 1
    # chrome (footer/nav) signature imagery does not count
    assert _tier('<footer><img src="signature.png"></footer>') == 0


def test_sig_tiers_do_not_change_text():
    from valere_ocr_ray.extract.html_text import extract_main_text

    html = b'<p>Terms here.</p><p><img src="sig.png" width="400" height="40"></p>'
    assert extract_main_text(html) == "Terms here."


def test_detect_signature_three_tier_fallback():
    from valere_ocr_ray.registry.extractors import detect_signature

    assert detect_signature("no indicators at all", dom_sig_tier=1)
    assert detect_signature("no indicators at all", dom_sig_tier=2)
    assert not detect_signature("no indicators at all", dom_sig_tier=0)
    assert detect_signature("signed by customer", dom_sig_tier=0)
