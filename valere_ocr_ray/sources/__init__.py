from valere_ocr_ray.sources.synth import (
    ensure_pages,
    pages_dir_for_sf,
    synth_pages,
)

__all__ = ["synth_pages", "ensure_pages", "pages_dir_for_sf"]
