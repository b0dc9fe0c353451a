"""WARC source: round-trip + pipeline integration (SURVEY.md §2.1 S1-S3
web-scale analog — Common-Crawl archives as the input format)."""

import os

import pyarrow as pa
import pytest

from valere_ocr_ray.sources.warc import (
    read_warc,
    warc_file_to_table,
    write_warc,
)


def _sample_records():
    return [
        (
            "https://a.example/x",
            "2024-07-01T00:00:00Z",
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            b"<html><body><p>Hello world</p></body></html>",
        ),
        (
            "https://b.example/y",
            "2024-07-01T00:00:01Z",
            b"<html><body><p>No http headers</p></body></html>",
        ),
        ("https://c.example/z.pdf", "2024-07-01T00:00:02Z", b"%PDF-1.4 fake"),
    ]


@pytest.mark.parametrize("suffix", [".warc", ".warc.gz"])
def test_warc_roundtrip(tmp_path, suffix):
    path = str(tmp_path / f"sample{suffix}")
    write_warc(_sample_records(), path)
    t = warc_file_to_table(path)
    assert t.num_rows == 3
    assert t["url"].to_pylist() == [
        "https://a.example/x",
        "https://b.example/y",
        "https://c.example/z.pdf",
    ]
    # http headers stripped; raw payload kept verbatim otherwise
    assert t["html"][0].as_py() == b"<html><body><p>Hello world</p></body></html>"
    assert t["html"][2].as_py() == b"%PDF-1.4 fake"
    assert t["warc_ts"][0].as_py().isoformat().startswith("2024-07-01T00:00:00")


def test_read_warc_feeds_extraction(ray_session, tmp_path):
    from valere_ocr_ray.stages.docmeta import docmeta_batch
    from valere_ocr_ray.stages.extractor import extract_pages_batch

    path = str(tmp_path / "crawl.warc.gz")
    write_warc(_sample_records(), path)
    ds = read_warc(str(tmp_path))
    ds = ds.map_batches(lambda b: docmeta_batch(b), batch_format="pyarrow")
    ds = ds.map_batches(
        lambda b: extract_pages_batch(
            b.append_column("part_id", pa.array(["w0"] * b.num_rows))
        ),
        batch_format="pyarrow",
    )
    rows = {r["url"]: r for r in ds.take_all()}
    assert len(rows) == 3
    assert rows["https://a.example/x"]["extracted_text"] == "Hello world"
    assert rows["https://a.example/x"]["doc_kind"] == "html"
    assert rows["https://c.example/z.pdf"]["doc_kind"] == "pdf"


def test_convert_warc_dir_feeds_resumable(ray_session, tmp_path):
    """WARC archives → parquet shards → the resumable flagship, with the
    file == partition mapping preserved."""
    from valere_ocr_ray.pipelines.extract import run_resumable
    from valere_ocr_ray.sources.warc import convert_warc_dir

    wdir = str(tmp_path / "crawl")
    os.makedirs(wdir)
    write_warc(_sample_records(), os.path.join(wdir, "seg-00000.warc.gz"))
    write_warc(
        [("https://d.example/w", "2024-07-02T00:00:00Z",
          b"<html><body><p>Second archive page</p></body></html>")],
        os.path.join(wdir, "seg-00001.warc"),
    )

    pdir = str(tmp_path / "pages")
    outs = convert_warc_dir(wdir, pdir)
    assert [os.path.basename(o) for o in outs] == [
        "seg-00000.parquet", "seg-00001.parquet",
    ]
    # idempotent
    assert convert_warc_dir(wdir, pdir) == outs

    out = str(tmp_path / "extracted")
    s = run_resumable(pdir, out, group_size=1)
    assert s["totals"]["n_in"] == 4
    assert s["totals"]["n_partitions"] == 2
    import pyarrow.dataset as pads

    df = pads.dataset(out, partitioning="hive").to_table().to_pandas()
    by_url = df.set_index("url")
    assert by_url.loc["https://d.example/w", "extracted_text"] == "Second archive page"
    assert by_url.loc["https://c.example/z.pdf", "doc_kind"] == "pdf"
