from valere_ocr_ray.state.manifest import (
    done_manifest_path,
    pending_shards,
    read_manifest,
    write_manifest,
)

__all__ = ["done_manifest_path", "pending_shards", "read_manifest", "write_manifest"]
