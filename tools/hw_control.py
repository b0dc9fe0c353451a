"""No-framework hardware control for the N→4N scaling criterion.

Runs the SAME per-document compute as the flagship extraction
pipeline — kind sniff + HTML/PDF/OCR parse (``stages/extractor``) +
classification/field battery (``registry/extractors``) — via plain
``multiprocessing`` (fork, COW-shared corpus, no Ray, no read/hash/
write overhead), at each process count given.  The resulting
efficiency curve is the ceiling this VM allows with zero framework:
sub-linearity here is memory-bandwidth/virtualization, not the engine
(BASELINE.md "Hardware control").

    python tools/hw_control.py [sf_dir] [--procs 4,8,16,32] > HW_CONTROL.json

Emits one JSON object: docs/s per process count plus the 4→16 and
8→32 efficiencies computed the same way as ``bench.py --scaling``
(eff = speedup / cpu-ratio).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# loaded once in the parent; fork shares it copy-on-write so workers
# receive only (start, stop) index ranges, never pickled payloads
_URLS: list[str] = []
_HTML: list[bytes] = []
_KINDS: list[str] = []


def _load(sf_dir: str) -> None:
    import pyarrow.dataset as pads

    from valere_ocr_ray.sources.synth import ensure_pages
    from valere_ocr_ray.stages.docmeta import _sniff_kinds

    pages_dir = ensure_pages(sf_dir)
    t = pads.dataset(pages_dir).to_table(columns=["url", "html"])
    _URLS.extend(t["url"].to_pylist())
    html = t["html"].combine_chunks()
    _HTML.extend(html.to_pylist())
    _KINDS.extend(_sniff_kinds(html).to_pylist())


def _work(span: tuple[int, int]) -> int:
    from valere_ocr_ray.extract.glyph_font import ocr_image_bytes
    from valere_ocr_ray.extract.html_text import extract_main_text_meta
    from valere_ocr_ray.extract.image_decode import ImageFormatError
    from valere_ocr_ray.extract.pdf_text import extract_pdf_text
    from valere_ocr_ray.registry.extractors import extract_document
    from valere_ocr_ray.stages.docmeta import KIND_HTML, KIND_IMAGE, KIND_PDF

    start, stop = span
    n = 0
    for i in range(start, stop):
        payload, kind = _HTML[i], _KINDS[i]
        try:
            sig_tier = 0
            if kind == KIND_PDF:
                text = extract_pdf_text(payload)
            elif kind == KIND_HTML:
                text, sig_tier = extract_main_text_meta(payload)
            elif kind == KIND_IMAGE:
                try:
                    text = ocr_image_bytes(payload)
                except ImageFormatError:
                    text = ""
            else:
                text = ""
            if text:
                extract_document(_URLS[i], text, sig_tier=sig_tier)
            n += 1
        except Exception:
            n += 1
    return n


def _run(procs: int) -> float:
    n = len(_URLS)
    # interleave-free contiguous spans, one per process slot ×4 for a
    # little load balance against the heavy-tail docs
    chunks = procs * 4
    bounds = [round(j * n / chunks) for j in range(chunks + 1)]
    spans = [(bounds[j], bounds[j + 1]) for j in range(chunks)]
    t0 = time.perf_counter()
    with mp.get_context("fork").Pool(procs) as pool:
        done = sum(pool.map(_work, spans))
    wall = time.perf_counter() - t0
    assert done == n, (done, n)
    return wall


def main() -> None:
    argv = sys.argv[1:]
    procs = [4, 8, 16, 32]
    positional: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--procs"):
            val = a.split("=", 1)[1] if "=" in a else argv[i + 1]
            procs = [int(p) for p in val.split(",")]
            i += 1 if "=" in a else 2
        else:
            positional.append(a)
            i += 1
    sf_dir = positional[0] if positional else "/root/testdata/sf0.1"
    _load(sf_dir)
    n = len(_URLS)
    out: dict = {
        "metric": "no-framework multiprocessing control (same parse+field work, no Ray)",
        "sf": os.path.basename(os.path.normpath(sf_dir)),
        "n_docs": n,
        "runs": {},
    }
    rates: dict[int, float] = {}
    for p in procs:
        wall = _run(p)
        rates[p] = n / wall
        out["runs"][str(p)] = {"wall_s": round(wall, 2), "docs_per_sec": round(n / wall, 1)}
    for lo, hi in ((4, 16), (8, 32)):
        if lo in rates and hi in rates:
            out[f"efficiency_{lo}to{hi}"] = round(rates[hi] / rates[lo] / (hi / lo), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
