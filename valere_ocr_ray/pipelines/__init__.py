from valere_ocr_ray.pipelines.extract import build_extraction_ds, run_resumable

__all__ = ["build_extraction_ds", "run_resumable"]
