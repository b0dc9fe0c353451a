"""Deterministic synthetic ``pages`` corpus (FIXTURES.md §1-2).

The BASELINE.json input is a Common-Crawl-style Parquet table
``pages(url, warc_ts, html, text, lang)``; no external data exists in
this sandbox, so the corpus is synthesized — seeded, per-row
deterministic (row ``i``'s content depends only on ``(seed, i)``, so
generation is order-free and shardable), written as multiple parquet
shard files (the per-partition unit for resume/checkpointing).

The template battery maps 1:1 to operator families (FIXTURES.md §2):
insurance_card / facesheet (query-set extraction T3), prescription_tch
/ prescription_bpd (brand battery F12 + rules §2.8), signed_agreement
en+es (F13/C4/A2), generic_article (boilerplate strip M1, F8-F11),
ambiguous (classifier C2 edges), duplicate_pair (exact dedup O4),
blocklisted (F3), PDF payloads (T5 path), garbage bytes (error path),
oversized blobs (skew/size-cap path F2).
"""

from __future__ import annotations

import hashlib
import os
import struct

import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
# bump when any template changes — forces cached corpora to regenerate
# (the _SYNTH_DONE marker embeds this)
CORPUS_VERSION = 14  # v14: JBIG2 (/JBIG2Decode) scanned PDFs join the rotation
BLOCKLIST_TOKENS = ("do_not_process",)

_FIRST = ["Maria", "James", "Aisha", "Wei", "Lucia", "Noah", "Priya", "Omar", "Elena", "Kofi"]
_LAST = ["Garcia", "Smith", "Khan", "Chen", "Rossi", "Brown", "Patel", "Hassan", "Novak", "Mensah"]
_PROVIDERS = ["Blue Harbor Health", "Lone Star Care", "Bright Path Insurance", "Cedar Medical Group"]
_PLANS = ["HMO", "PPO", "EPO", "POS"]


def _digest(i: int, seed: int = SEED) -> bytes:
    return hashlib.md5(f"valere:{seed}:{i}".encode()).digest()


class _Rand:
    """Tiny deterministic per-row value source driven by the md5 digest."""

    def __init__(self, i: int) -> None:
        self._buf = _digest(i)
        self._i = i
        self._pos = 0

    def u32(self) -> int:
        if self._pos + 4 > len(self._buf):
            self._buf = hashlib.md5(self._buf).digest()
            self._pos = 0
        v = struct.unpack_from("<I", self._buf, self._pos)[0]
        self._pos += 4
        return v

    def pick(self, seq: list[str]) -> str:
        return seq[self.u32() % len(seq)]

    def name(self) -> str:
        return f"{self.pick(_FIRST)} {self.pick(_LAST)}"

    def date(self) -> str:
        return f"{self.u32() % 12 + 1:02d}/{self.u32() % 28 + 1:02d}/{1950 + self.u32() % 70}"

    def phone(self) -> str:
        return f"({200 + self.u32() % 700}) {200 + self.u32() % 700}-{1000 + self.u32() % 9000}"


_NAV = (
    '<nav><ul><li><a href="/">Home</a></li><li><a href="/about">About</a></li>'
    '<li><a href="/contact">Contact</a></li></ul></nav>'
)
_FOOTER = (
    '<footer><p><a href="/privacy">Privacy</a> | <a href="/tos">Site Terms</a> | '
    '<a href="/jobs">Careers</a></p></footer>'
)
_SIDEBAR = (
    '<aside><h3>Related</h3><ul><li><a href="/a">Link one</a></li>'
    '<li><a href="/b">Link two</a></li></ul></aside>'
)


def _page(body: str, title: str = "Document") -> bytes:
    return (
        f"<html><head><title>{title}</title><style>.x{{color:red}}</style>"
        f"<script>var t=1;</script></head><body>{_NAV}{body}{_SIDEBAR}{_FOOTER}"
        "</body></html>"
    ).encode()


def _maybe(r: _Rand, value: str, p_empty_pct: int = 20) -> str:
    return "" if r.u32() % 100 < p_empty_pct else value


def _insurance_card(r: _Rand) -> bytes:
    member = r.name()
    member_id = f"A{10000 + r.u32() % 90000}"
    fields = [
        ("Member Name", f"{member} {member_id}"),
        ("Member ID", member_id),
        ("PCP", f"Dr. {r.name()}"),
        ("PCP Phone", r.phone()),
        ("medical insurance provider", r.pick(_PROVIDERS)),
        ("effective date", r.date()),
        ("Group No.", f"G{r.u32() % 100000:05d}"),
        ("plan type", r.pick(_PLANS)),
        ("BIN", f"{r.u32() % 1000000:06d}"),
        ("Rx PCN", f"PCN{r.u32() % 1000:03d}"),
        ("Generic Copay", _maybe(r, f"${r.u32() % 50}")),
        ("Brand Copay", _maybe(r, f"${r.u32() % 90}")),
        ("Specialty Copay", _maybe(r, f"${r.u32() % 200}")),
        ("Emergency Room Percentage", _maybe(r, f"{r.u32() % 50}%")),
        ("PCP Copay", _maybe(r, f"${r.u32() % 40}")),
    ]
    dl = "".join(f"<dt>{k}</dt><dd>{v}</dd>" for k, v in fields)
    body = f"<main><h1>Insurance Member Card</h1><dl>{dl}</dl></main>"
    return _page(body, "Member Card")


_FACESHEET_LABELS = [
    "Patient Name", "Patient Date of Birth", "Patient Address", "Patient sex",
    "Patient Ethnicity", "Patient citizenship", "Patient Race", "Patient Phone Number",
    "Admitting Provider Name", "Attending Provider Telephone Number",
    "Attending Provider Name", "Refering physician", "admitting diagnosis",
    "Encounter Date", "MRN", "Hospital Account number", "Contact Serial number",
    "Patient insurance provider", "insurance Subscriber name",
    "Patient insurance group number", "Patient insurance Subscriber Id",
    "Patient insurance type", "Patient insurance plan",
    "Patient relationship to insurance Subscriber", "insurance verifiaction status",
    "Garuntor Name", "Garuntor relation to patient", "Garuntor Id",
    "Garuntor Address", "Garuntor Phone number",
]


def _facesheet(r: _Rand) -> bytes:
    values = [
        r.name(), r.date(), f"{r.u32() % 9000 + 100} Oak St", r.pick(["F", "M"]),
        r.pick(["Hispanic", "Non-Hispanic"]), "US", r.pick(["White", "Black", "Asian", "Other"]),
        r.phone(), f"Dr. {r.name()}", r.phone(), f"Dr. {r.name()}", f"Dr. {r.name()}",
        r.pick(["Pneumonia", "Fracture", "Observation", "Labor"]), r.date(),
        f"MRN{r.u32() % 1000000:06d}", f"H{r.u32() % 1000000:06d}", f"C{r.u32() % 1000000:06d}",
        r.pick(_PROVIDERS), r.name(), f"G{r.u32() % 100000:05d}", f"S{r.u32() % 100000:05d}",
        r.pick(_PLANS), r.pick(["Standard", "Plus", "Family"]), r.pick(["Self", "Spouse", "Child"]),
        r.pick(["Verified", "Pending"]), r.name(), r.pick(["Self", "Parent", "Spouse"]),
        f"GR{r.u32() % 100000:05d}", f"{r.u32() % 9000 + 100} Elm Ave", r.phone(),
    ]
    rows = "".join(
        f"<tr><td>{k}</td><td>{_maybe(r, v)}</td></tr>"
        for k, v in zip(_FACESHEET_LABELS, values)
    )
    body = f"<main><h1>FACE SHEET</h1><table>{rows}</table></main>"
    return _page(body, "Facesheet")


def _prescription_tch(r: _Rand) -> bytes:
    mother, infant = r.name(), r.name()
    body = (
        "<main><h1>Texas Children's Hospital</h1>"
        "<h2>PRESCRIPTION</h2>"
        f"<p>Mother Name: {mother}</p>"
        f"<p>DOB: {r.date()}</p>"
        f"<p>Phone Number: {r.phone()}</p>"
        f"<p>Infant Name: {infant}</p>"
        f"<p>Infant Date of Birth: {r.date()}</p>"
        "<p>ICD-10 Code(s)</p><ul><li>• Z39.1 Care of the lactating mother</li></ul>"
        "<p>One (1) double-electric breast pump</p>"
        f"<p>Physician Name: Dr. {r.name()}</p>"
        f"<p>NPI Number: {1000000000 + r.u32() % 1000000000}</p>"
        '<p><input type="checkbox" checked> Z39.1 confirmed</p>'
        "</main>"
    )
    return _page(body, "Prescription")


def _prescription_bpd(r: _Rand) -> bytes:
    doctor = r.name()
    npi = 1000000000 + r.u32() % 1000000000
    body = (
        "<main><h1>The Breast Pump Depot</h1>"
        f"<p>Patient Name: {r.name()}</p>"
        f"<p>Date of Birth: {r.date()}</p>"
        f"<p>Phone: {r.phone()}</p>"
        "<h2>Item Description Code Length of Need</h2>"
        # item text must be 'c'-free: the reference QTY pattern is
        # IGNORECASE with a [^C]+ item group (Lauren_RX:284)
        "<p>QTY 1 Dual Pump Kit Code E0603</p>"
        "<p>Covers one Double Electric Breast Pump</p>"
        f"<p>Length of Need: {3 + r.u32() % 10}</p>"
        "<h2>Section II. Medical Necessity</h2>"
        "<p>X 1. Mother is returning to work or school</p>"
        "<p>X 2. Infant has difficulty latching</p>"
        "<h2>Section III. Physician Authorization</h2>"
        f"<dl><dt>Dr {doctor}, MD - {npi}</dt>"
        '<dd><input type="checkbox" checked></dd></dl>'
        "<p>Physician Signature: on file</p>"
        "</main>"
    )
    return _page(body, "Rx Order")


def _agreement(r: _Rand, spanish: bool) -> bytes:
    name = r.name()
    date = r.date()
    if spanish:
        tail = (
            f"<p>Firmado por el cliente: {name}</p>"
            f"<p>Fecha : {date} 10:30 CMT</p>"
        )
        terms = (
            "<p>Este acuerdo de servicio establece los terminos y condiciones "
            "del suministro. El cliente reconoce y acepta las condiciones.</p>"
        )
    else:
        tail = (
            f"<p>Signed by customer: {name}</p>"
            f"<p>Date : {date} 10:30 CMT</p>"
        )
        terms = (
            "<p>This service agreement sets out the terms and conditions of "
            "supply. The customer acknowledges and accepts the conditions. "
            "I agree to the rental terms stated herein and consent to the "
            "delivery schedule.</p>"
        )
    body = (
        "<main><h1>RENTAL AGREEMENT</h1>"
        f"{terms}"
        "<p>Equipment must be returned in good condition. Late returns incur "
        "fees as described in the schedule of charges.</p>"
        f"{tail}"
        '<p><img src="sig.png" alt="signature"></p>'
        "</main>"
    )
    return _page(body, "Agreement")


def _generic_article(r: _Rand, i: int) -> bytes:
    topic = r.pick(["city council", "river cleanup", "local library", "transit line", "weather front"])
    body = (
        f"<article><h1>Update on the {topic}</h1>"
        f"<p>Residents gathered this week to discuss the {topic}. Officials "
        "presented a revised schedule and took questions from attendees for "
        "more than an hour before adjourning.</p>"
        "<h2>BACKGROUND</h2>"
        f"<p>The project began in {2010 + r.u32() % 14} and has seen several "
        "delays. Funding was approved last spring, and construction crews "
        "have been active on weekdays since then.</p>"
        "<h2>NEXT STEPS</h2>"
        f"<p>A follow-up session is planned. Contact line: {r.phone()}.</p>"
        f"<p>Reference: item {i % 1000} of the public record.</p>"
        "</article>"
    )
    return _page(body, f"Update on the {topic}")


_TOPIC_WORDS = [
    "council", "river", "library", "transit", "harbor", "festival", "museum",
    "orchard", "bridge", "market", "garden", "station", "theater", "trail",
]


def _long_article(r: _Rand, i: int) -> bytes:
    """Common-Crawl-realistic page: tens of KB, long body, link farms.

    Exercises the walker at realistic page sizes (CC bodies are 10-100×
    the short templates) and the link-density boilerplate scorer on
    real-shaped chrome (tag clouds, related-article lists)."""
    n_paras = 40 + r.u32() % 80
    paras = []
    for p in range(n_paras):
        words = [
            _TOPIC_WORDS[r.u32() % len(_TOPIC_WORDS)] for _ in range(60 + r.u32() % 80)
        ]
        paras.append(f"<p>Paragraph {p}: " + " ".join(words) + ".</p>")
        if p % 7 == 3:
            paras.append(f"<h2>SECTION {p}</h2>")
    tag_cloud = "".join(
        f'<a href="/tag/{w}">{w}</a> ' for w in _TOPIC_WORDS * (2 + r.u32() % 3)
    )
    related = "".join(
        f'<li><a href="/story/{r.u32() % 10000}">Related story {k}</a></li>'
        for k in range(10 + r.u32() % 10)
    )
    body = (
        f"<article><h1>Long report {i % 100000} on the {r.pick(_TOPIC_WORDS)}</h1>"
        + "".join(paras)
        + f'<div class="tags">{tag_cloud}</div>'
        + f"<aside><h3>More</h3><ul>{related}</ul></aside>"
        + f"<p>Contact line: {r.phone()}.</p></article>"
    )
    return _page(body, f"Long report {i % 100000}")


def _ambiguous(r: _Rand) -> bytes:
    variant = r.u32() % 6
    if variant == 0:  # insurance >= 2 wins outright
        body = "<p>Your insurance member services line is open weekdays.</p>"
    elif variant == 1:  # prescription 3 > agreement 0
        body = "<p>The prescription from your doctor lists the diagnosis.</p>"
    elif variant == 2:  # agreement >= 3, >= prescription
        body = "<p>This agreement requires a signature; review the terms.</p>"
    elif variant == 3:  # possible prescription (2)
        body = "<p>Ask your doctor about the diagnosis next visit.</p>"
    elif variant == 4:  # possible agreement (2)
        body = "<p>The terms and conditions apply to all visitors.</p>"
    else:  # unknown
        body = "<p>Nothing notable appears on this page at all.</p>"
    return _page(f"<main>{body}</main>", "Notice")


_DUP_PAYLOADS = [
    _page("<main><h1>Shared Notice</h1><p>This exact notice is mirrored on "
          f"several sites. Mirror variant {k}.</p></main>", "Shared Notice")
    for k in range(3)
]


def _scanned_card_lines(r: _Rand) -> list[str]:
    """The card text the raster printer receives — exposed separately
    so the golden oracle can assert OCR output against the PRINTED
    lines (the true expectation) without ever running the OCR kernel."""
    return [
        "INSURANCE MEMBER CARD",
        f"MEMBER NAME: {r.name()}",
        f"MEMBER ID: A{10000 + r.u32() % 90000}",
        f"PCP: DR. {r.name()}",
        f"PCP PHONE: {r.phone()}",
        f"EFFECTIVE DATE: {r.date()}",
        f"GROUP NO. G{r.u32() % 100000:05d}",
        f"PLAN TYPE: {r.pick(_PLANS)}",
    ]


def _scanned_card(r: _Rand, i: int) -> bytes:
    """Raster insurance card: the card fields printed with the repo's
    deterministic glyph font into a BMP or PPM — the synth twin of the
    extraction stage's template-match OCR kernel
    (``extract/glyph_font``), mirroring the reference's scanned
    JPG/PNG cards through Textract."""
    from valere_ocr_ray.extract.glyph_font import render_text_image
    from valere_ocr_ray.extract.image_decode import (
        encode_bmp,
        encode_png,
        encode_ppm,
    )
    from valere_ocr_ray.extract.jpeg import encode_jpeg

    from valere_ocr_ray.extract.gif import encode_gif
    from valere_ocr_ray.extract.tiff import encode_tiff
    from valere_ocr_ray.extract.vp8 import encode_vp8
    from valere_ocr_ray.extract.webp import encode_webp

    img = render_text_image(_scanned_card_lines(r))
    # i % 100 == 95 is always odd — rotate container by the hundreds so
    # every decodable raster format (BMP/PPM/PNG/JPEG/TIFF/GIF/WebP
    # lossless AND lossy) appears in the corpus.  JPEG and VP8 are
    # lossy, but at their chosen qualities the glyph binarization is
    # pixel-exact (pinned by test_glyph_ocr / test_vp8), so the golden
    # text contract holds across all eight containers.  TIFF ships the
    # scanner default (LZW + horizontal predictor); GIF and VP8L are
    # palettized (2-color card) per the web norm — VP8L takes the
    # color-indexing path with 8-px/byte bundling; VP8 is the full
    # keyframe transform path at qi=20 (binarization-exact; coarser
    # quant = sparser token stream = cheaper pure-Python decode).
    enc = (
        encode_bmp,
        encode_ppm,
        encode_png,
        encode_jpeg,
        lambda px: encode_tiff(px, lzw=True, predictor=True),
        encode_gif,
        encode_webp,
        lambda px: encode_vp8(px, 20),
    )[(i // 100) % 8]
    return enc(img)


def build_pdf_bytes(lines: list[str], *, flate: bool = False) -> bytes:
    """Minimal single-page PDF with one text object — the shape
    `extract_pdf_text` parses (and a real PDF viewer opens).
    ``flate=True`` compresses the content stream with /FlateDecode
    (the real-world common case)."""
    import zlib as _zlib

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    shows = "\n".join(f"({esc(line)}) Tj 0 -14 Td" for line in lines)
    stream = f"BT /F1 10 Tf 50 742 Td\n{shows}\nET".encode("latin-1", "replace")
    if flate:
        stream = _zlib.compress(stream)
        len_obj = (
            b"<< /Length " + str(len(stream)).encode()
            + b" /Filter /FlateDecode >>\nstream\n" + stream + b"\nendstream"
        )
    else:
        len_obj = (
            b"<< /Length " + str(len(stream)).encode()
            + b" >>\nstream\n" + stream + b"\nendstream"
        )
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R "
        b"/Resources << /Font << /F1 5 0 R >> >> >>",
        len_obj,
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for n, obj in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{n} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\nstartxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def build_scanned_pdf_bytes(lines: list[str], *, codec: str = "jpeg") -> bytes:
    """Single-page IMAGE-ONLY PDF: the page is one image XObject of the
    glyph-rendered ``lines`` and there are no text objects — the shape
    of a scanner-produced PDF, the reference's async-Textract core case
    (``IDD/finalcodes/SignedAgreement.py:124-156``).  ``codec``:
    ``jpeg`` (/DCTDecode), ``flate`` (/FlateDecode /DeviceRGB),
    ``flate_gray`` (/FlateDecode /DeviceGray), ``raw`` (no filter),
    ``ccitt`` (/CCITTFaxDecode /K -1 — the fax/scanner bilevel G4
    default), ``ccitt_mixed`` (/K 2 — T.4 mixed 2-D G3, the
    standard-fax K-factor layout), ``jbig2`` (/JBIG2Decode — embedded
    T.88 segment stream, MQ generic region)."""
    import zlib as _zlib

    from valere_ocr_ray.extract.glyph_font import render_text_image

    img = render_text_image(lines)
    h, w = img.shape[:2]
    if codec == "jpeg":
        from valere_ocr_ray.extract.jpeg import encode_jpeg

        body, cs, filt = encode_jpeg(img), b"/DeviceRGB", b" /Filter /DCTDecode"
    elif codec == "flate":
        body, cs, filt = (
            _zlib.compress(img.tobytes()),
            b"/DeviceRGB",
            b" /Filter /FlateDecode",
        )
    elif codec == "flate_gray":
        body, cs, filt = (
            _zlib.compress(img[:, :, 0].tobytes()),
            b"/DeviceGray",
            b" /Filter /FlateDecode",
        )
    elif codec == "raw":
        body, cs, filt = img.tobytes(), b"/DeviceRGB", b""
    elif codec == "ccitt":
        from valere_ocr_ray.extract.ccitt import encode_g4

        body, cs = encode_g4(img[:, :, 0] < 128), b"/DeviceGray"
        filt = (
            b" /Filter /CCITTFaxDecode /DecodeParms << /K -1 /Columns "
            + str(w).encode() + b" /Rows " + str(h).encode() + b" >>"
        )
    elif codec == "ccitt_mixed":
        from valere_ocr_ray.extract.ccitt import encode_g3_mixed

        body, cs = encode_g3_mixed(img[:, :, 0] < 128, k=2), b"/DeviceGray"
        filt = (
            b" /Filter /CCITTFaxDecode /DecodeParms << /K 2 /Columns "
            + str(w).encode() + b" /Rows " + str(h).encode() + b" >>"
        )
    elif codec == "jbig2":
        from valere_ocr_ray.extract.jbig2 import encode_jbig2_embedded

        body, cs = encode_jbig2_embedded(img[:, :, 0] < 128), b"/DeviceGray"
        filt = b" /Filter /JBIG2Decode"
    elif codec == "jbig2_sym":
        # SYMBOL-coded (jbig2enc-class software encoder shape): glyph
        # dictionary + text region, not in the corpus rotation — the
        # fixture for the §6.4/§6.5 decode path
        from valere_ocr_ray.extract.jbig2 import encode_jbig2_symbol_page

        body, cs = encode_jbig2_symbol_page(lines), b"/DeviceGray"
        filt = b" /Filter /JBIG2Decode"
    else:
        raise ValueError(f"unknown scanned-pdf codec {codec!r}")
    bpc = b"1" if codec.startswith("ccitt") or codec.startswith("jbig2") else b"8"
    img_obj = (
        b"<< /Type /XObject /Subtype /Image /Width " + str(w).encode()
        + b" /Height " + str(h).encode()
        + b" /ColorSpace " + cs
        + b" /BitsPerComponent " + bpc + filt
        + b" /Length " + str(len(body)).encode()
        + b" >>\nstream\n" + body + b"\nendstream"
    )
    content = f"q {w} 0 0 {h} 0 0 cm /Im1 Do Q".encode()
    content_obj = (
        b"<< /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream"
    )
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R "
        b"/Resources << /XObject << /Im1 5 0 R >> >> >>",
        content_obj,
        img_obj,
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for n, obj in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{n} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\nstartxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def _agreement_pdf_lines(r: _Rand) -> list[str]:
    name, date = r.name(), r.date()
    return [
        "RENTAL AGREEMENT",
        "This service agreement sets out the terms and conditions of supply.",
        "The customer acknowledges and accepts the conditions.",
        f"Signed by customer: {name}",
        f"Date : {date} 10:30 CMT",
        "signature",
    ]


def _pdf_agreement(r: _Rand, i: int = 0) -> bytes:
    lines = _agreement_pdf_lines(r)
    # rotate by the hundreds: half text-PDFs with /FlateDecode content
    # streams (the real-world common case), a quarter plain, a quarter
    # SCANNED (image-only — the reference's async-Textract case) with
    # the embedded-image codec rotating too
    phase = (i // 100) % 4
    if phase == 3:
        codec = (
            "jpeg", "flate", "flate_gray", "raw", "ccitt", "ccitt_mixed",
            "jbig2",
        )[(i // 400) % 7]
        return build_scanned_pdf_bytes(lines, codec=codec)
    return build_pdf_bytes(lines, flate=phase == 1)


# row-class schedule (all rates per FIXTURES.md §1)
_OVERSIZE_EVERY = 5000  # ~0.02% — 10MiB+ blobs kept rare to bound disk
_GARBAGE_EVERY = 200  # 0.5%
_PDF_SLOT = 94  # 1% of i%100
_OVERSIZE_PAYLOAD = b"<html><body><p>" + b"A" * (10 * 1024 * 1024) + b"</p></body></html>"


def synth_row(i: int) -> tuple[str, int, bytes, str, str]:
    """Row ``i`` → (url, warc_ts_us, html, text, lang). Pure in (SEED, i)."""
    r = _Rand(i)
    lang = "es" if i % 10 == 3 else "en"
    if i % _OVERSIZE_EVERY == 4237:
        slug, html = "article", _OVERSIZE_PAYLOAD
    elif i % _GARBAGE_EVERY == 199:
        slug, html = "article", _digest(i) * 8  # undecodable, no magic
    elif i % 100 == _PDF_SLOT:
        slug, html = "signed_agreement", _pdf_agreement(r, i)
    else:
        bucket = i % 100
        if bucket < 25:
            slug, html = "article", _generic_article(r, i)
        elif bucket < 40:
            slug, html = "insurancecard", _insurance_card(r)
        elif bucket < 55:
            slug, html = "facesheet", _facesheet(r)
        elif bucket < 65:
            slug, html = "prescription", _prescription_tch(r)
        elif bucket < 75:
            slug, html = "prescription", _prescription_bpd(r)
        elif bucket < 85:
            slug, html = "signed_agreement", _agreement(r, lang == "es")
        elif bucket < 90:
            slug, html = "docs", _ambiguous(r)
        elif bucket < 93:
            slug, html = "article", _DUP_PAYLOADS[bucket - 90]
        elif bucket == 93:
            slug, html = f"{BLOCKLIST_TOKENS[0]}/asset", _generic_article(r, i)
        elif bucket >= 96:
            slug, html = "article", _long_article(r, i)  # CC-realistic size
        elif bucket == 95:
            # scanned raster page (the reference's PRIMARY modality:
            # JPG/PNG insurance cards through Textract OCR) — here a
            # BMP/PPM render of the same card fields through the
            # deterministic glyph-font printer; the extraction stage
            # reads it back with the template-match OCR kernel
            slug, html = "insurancecard", _scanned_card(r, i)
        else:
            slug, html = "article", _generic_article(r, i)
    if html[:5] == b"%PDF-":
        ext = ".pdf"
    elif html[:2] == b"BM":
        ext = ".bmp"
    elif html[:2] == b"P6":
        ext = ".ppm"
    elif html[:8] == b"\x89PNG\r\n\x1a\n":
        ext = ".png"
    elif html[:3] == b"\xff\xd8\xff":
        ext = ".jpg"
    elif html[:4] in (b"II*\x00", b"MM\x00*"):
        ext = ".tif"
    elif html[:6] in (b"GIF87a", b"GIF89a"):
        ext = ".gif"
    elif html[:4] == b"RIFF" and html[8:12] == b"WEBP":
        ext = ".webp"
    else:
        ext = ".html"
    url = f"https://site{i % 97}.example/{slug}/{i:08d}{ext}"
    # plain-text probe column: head of content for half the rows (F5 path)
    text = ""
    if i % 2 == 0 and html[:1] == b"<":
        from valere_ocr_ray.extract.html_text import extract_main_text

        text = extract_main_text(html)[:200]
    warc_ts_us = 1_719_792_000_000_000 + i * 1_000_000  # 2024-07-01 + i sec
    return url, warc_ts_us, html, text, lang


PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def _write_shard(args: tuple[str, int, int]) -> None:
    """Generate + write one shard (top-level for process-pool pickling)."""
    path, lo, hi = args
    rows = [synth_row(i) for i in range(lo, hi)]
    cols = list(zip(*rows)) if rows else [[], [], [], [], []]
    table = pa.table(
        {
            "url": pa.array(cols[0], pa.string()),
            "warc_ts": pa.array(cols[1], pa.timestamp("us")),
            "html": pa.array(cols[2], pa.binary()),
            "text": pa.array(cols[3], pa.string()),
            "lang": pa.array(cols[4], pa.string()),
        },
        schema=PAGES_SCHEMA,
    )
    pq.write_table(table, path + ".tmp", compression="zstd")
    os.replace(path + ".tmp", path)


def synth_pages(out_dir: str, n_rows: int, n_shards: int | None = None) -> list[str]:
    """Write the corpus as ``pages_{shard:04d}.parquet`` files; returns paths.

    Idempotent: a ``_SYNTH_DONE`` marker (with row count) short-circuits
    regeneration.  Each shard holds a contiguous row range — shards are
    the resume/checkpoint partition unit (SURVEY.md §4.2).  Row content
    is pure in ``(SEED, i)``, so shards generate independently — large
    corpora fan out over a local process pool (generation is test/bench
    scaffolding, not engine code, so plain multiprocessing is fine).
    """
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, "_SYNTH_DONE")
    if n_shards is None:
        n_shards = max(4, min(64, n_rows // 2048))
    paths = [os.path.join(out_dir, f"pages_{s:04d}.parquet") for s in range(n_shards)]
    stamp = f"{n_rows}:{n_shards}:v{CORPUS_VERSION}"
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == stamp:
                return paths
    per = (n_rows + n_shards - 1) // n_shards
    jobs = [
        (path, s * per, min((s + 1) * per, n_rows)) for s, path in enumerate(paths)
    ]
    if n_rows >= 20_000:
        import concurrent.futures as cf

        with cf.ProcessPoolExecutor(max_workers=min(8, len(jobs))) as pool:
            list(pool.map(_write_shard, jobs))
    else:
        for job in jobs:
            _write_shard(job)
    with open(marker, "w") as f:
        f.write(stamp)
    return paths


_SF_ROWS = {"sf0.001": 500, "sf0.01": 5000, "sf0.1": 200_000}


def pages_dir_for_sf(sf_dir: str) -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join("/tmp/valere_pages", base)


def ensure_pages(sf_dir: str) -> str:
    """Materialize (once) the pages corpus sized for ``sf_dir``; returns dir."""
    base = os.path.basename(os.path.normpath(sf_dir))
    n = _SF_ROWS.get(base, 5000)
    out = pages_dir_for_sf(sf_dir)
    synth_pages(out, n)
    return out
