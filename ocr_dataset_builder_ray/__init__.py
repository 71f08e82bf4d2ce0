"""ocr_dataset_builder_ray — a Ray-Data-native web-text extraction engine.

A brand-new engine with the data-processing capabilities of
``pieces-app/ocr-dataset-builder`` (reference read-only at
``/root/reference``), re-expressed Ray-Data-first over Parquet tables of
Common-Crawl-style web pages::

    pages(url: string, warc_ts: timestamp[us], html: binary,
          text: string, lang: string)

The reference's per-frame OCR map (tesseract/pipeline.py) becomes a
per-document main-content extraction ``map_batches`` stage over
zero-copy Arrow batches; its ProcessPoolExecutor-per-directory model
becomes Ray Data streaming execution with actor pools for stateful
stages; its append-only checkpoint log (video/frame_pipeline.py:169-208)
becomes per-partition completion manifests (state/manifest.py).

Layout:
    functions/  pure kernels (text normalization, DOM extraction,
                hashing, augmentations, text statistics) — no Ray
    sources/    dataset readers + deterministic synthetic `pages` corpus
    stages/     map_batches stage callables (extraction actor pool,
                dedup, similarity, multimodal plumbing)
    pipelines/  end-to-end Dataset -> Dataset pipelines + export
    state/      resumable run state: partition manifests, anti-join plan
"""

__version__ = "0.1.0"
