"""Pure, deterministic per-document parsers (no Ray dependency).

These functions define the byte-exact extraction contract: the same
function object is used by the single-process golden-oracle generator
and by the Ray actor stages, so byte-identity per url across partition
counts / retries / parallelism levels is structural, and the pytest
golden corpus pins it across code versions.
"""

from valere_ocr_ray.extract.html_text import extract_main_text
from valere_ocr_ray.extract.pdf_text import extract_pdf_text

__all__ = ["extract_main_text", "extract_pdf_text"]
