"""Large-scale training-data operations (beyond the reference's own
operators): deduplication families, similarity search, text analysis,
multimodal plumbing.  All are Dataset→Dataset transforms built on
``map_batches`` / ``groupby`` — no driver-side row loops."""
