"""Job-driver CLI — the ``ray job submit`` entry form of the engine.

The reference exposes each stage as a ``fire`` CLI whose output dir is
the next stage's input dir (docs/DESIGN.md:108-131; e.g.
``python -m ocr_dataset_builder.tesseract.pipeline run``). Here one
driver assembles the Dataset DAG and owns the Ray session::

    ray job submit -- python -m ocr_dataset_builder_ray.cli extract \
        --input /data/pages --output /data/extracted --partitions 64

Subcommands:
    extract   partitioned, resumable extraction run (manifests + lineage)
    daemon    incremental ingestion loop (rescan input every interval)
    export    project a completed run to JSONL/Parquet (standard |
              cleaning_pairs)
    metrics   print lineage + aggregate metrics for a completed run
    gen       generate the deterministic synthetic pages corpus
    curate    corpus-curation chain over a documents table (repetition
              gate -> decontamination -> exact dedup -> source mix),
              optionally written as deterministic training shards
    ingest-warc  WARC archives -> pages-shaped parquet (extract input)
    search    BM25 top-k over a documents-style table (JSON rows)
    index     build an inverted index (token -> sorted postings) parquet
    profile   one-pass numeric column profile (JSON rows)

This module is the ONLY library-side owner of ``ray.init`` (guarded);
``__ray_entry__.py`` and the pipeline functions never initialize Ray.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _cmd_extract(args: argparse.Namespace) -> int:
    _ensure_ray()
    from .pipelines.extraction import run_partitioned_extraction

    partition_range = None
    if args.part_start is not None or args.part_end is not None:
        partition_range = (args.part_start or 0, args.part_end if args.part_end is not None else args.partitions)
    summary = run_partitioned_extraction(
        args.input,
        args.output,
        num_partitions=args.partitions,
        dedup=not args.no_dedup,
        global_dedup=args.global_dedup,
        plan_ranges=args.plan_ranges,
        partition_range=partition_range,
        batch_size=args.batch_size,
        max_concurrent_partitions=args.concurrent_partitions,
    )
    print(json.dumps(summary))
    return 0


def _cmd_daemon(args: argparse.Namespace) -> int:
    _ensure_ray()
    from .pipelines.extraction import run_daemon

    url_index = None
    if args.cross_pass_dedup:
        from .state.url_index import UrlIndex

        url_index = UrlIndex()
        # resume the membership state: snapshot + manifest reconciliation
        # (a snapshot can be BEHIND the manifests after a crash between
        # partition commit and index save — replay the gap, add() is
        # idempotent)
        url_index.resume_from_run(args.output)

    results = run_daemon(
        args.input,
        args.output,
        interval_s=args.interval,
        max_passes=args.max_passes,
        files_per_partition=args.files_per_partition,
        dedup=not args.no_dedup,
        url_index=url_index,
        plan_ranges=args.plan_ranges,
    )
    print(json.dumps(results))
    return 0


def _cmd_export(args: argparse.Namespace) -> int:
    _ensure_ray()
    from .pipelines.export import export_dataset
    from .pipelines.extraction import read_extracted

    ds = read_extracted(args.input)
    export_dataset(ds, args.output, mode=args.mode, fmt=args.fmt)
    print(json.dumps({"exported_rows": ds.count(), "mode": args.mode, "fmt": args.fmt}))
    return 0


def _cmd_delta(args: argparse.Namespace) -> int:
    _ensure_ray()
    from .pipelines.extraction import read_extracted
    from .stages.delta import crawl_delta, select_changed

    old_ds = read_extracted(args.old).select_columns(
        [args.key, args.hash_col]
    )
    new_full = read_extracted(args.new)
    # materialize the skinny delta once (object-store blocks, not the
    # driver): it feeds both the count summary and the payload fetch
    delta = crawl_delta(
        old_ds,
        new_full.select_columns([args.key, args.hash_col]),
        key_col=args.key,
        hash_col=args.hash_col,
    ).materialize()
    counts = {
        r["change"]: int(r["count()"])
        for r in delta.groupby("change").count().take_all()
    }
    if args.output:
        select_changed(new_full, delta, key_col=args.key).write_parquet(
            args.output
        )
    print(json.dumps({"changes": counts, "output": args.output}))
    return 0


def _cmd_metrics(args: argparse.Namespace) -> int:
    _ensure_ray()
    from .pipelines.extraction import read_extracted
    from .pipelines.metrics import extraction_metrics
    from .state.manifest import RunManifest

    from .functions.util import humanize_bytes

    lineage = RunManifest(args.input).metrics()
    agg = extraction_metrics(read_extracted(args.input))
    lineage["bytes_human"] = humanize_bytes(lineage.get("bytes", 0))
    print(json.dumps({"lineage": lineage, "aggregate": agg}))
    return 0


def _cmd_curate(args: argparse.Namespace) -> int:
    _ensure_ray()
    import ray.data

    from .pipelines.curation import curation_pipeline
    from .pipelines.export import export_training_shards

    ds = ray.data.read_parquet(args.input)
    if args.bench:
        corpus, bench = ds, ray.data.read_parquet(args.bench)
    else:
        # no benchmark table given: split one off by key modulo (the
        # q55 convention) so decontamination always runs
        import pyarrow as pa

        key, modulo = args.key, args.bench_modulo

        def _mod(batch, want):
            ids = batch[key].to_numpy()
            return batch.filter(pa.array((ids % modulo == 0) == want))

        bench = ds.map_batches(lambda b: _mod(b, True), batch_format="pyarrow")
        corpus = ds.map_batches(lambda b: _mod(b, False), batch_format="pyarrow")

    props = json.loads(args.proportions) if args.proportions else None
    out = curation_pipeline(
        corpus,
        bench,
        text_col=args.text,
        key_col=args.key,
        group_col=args.group,
        max_dup_word_frac=args.max_dup_word_frac,
        max_top_bigram_frac=args.max_top_bigram_frac,
        window=args.window,
        proportions=props,
    )
    if args.shards:
        manifest = export_training_shards(
            out, args.output, args.shards, key_col=args.key,
            shuffle_seed=args.shuffle_seed,
        )
        print(json.dumps({"curated_rows": manifest["total_rows"],
                          "shards": manifest["n_shards"]}))
    else:
        if args.shuffle_seed is not None:
            # flat export: same seeded order contract as --shards, with
            # the ticket persisted so multi-file readers can ORDER BY it
            from .stages.curation import deterministic_shuffle

            out = deterministic_shuffle(
                out, args.key, args.shuffle_seed, keep_ord_col=True
            )
        out.write_parquet(args.output)
        print(json.dumps(
            {"curated_rows": ray.data.read_parquet(args.output).count()}
        ))
    return 0


def _read_clean(path: str, columns: list[str]):
    """read_parquet with the pandas metadata stripped from the schema
    (same seam as pipelines.queries._clean_schema — a metadata dict
    makes Ray's block-schema dedup log 'Failed to hash the schemas'
    in every read task)."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    f = path
    if os.path.isdir(path):
        cands = sorted(
            glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        )
        f = cands[0] if cands else None
    schema = None
    if f is not None:
        try:
            schema = pq.read_schema(f).remove_metadata()
            if columns is not None:
                schema = pa.schema([schema.field(c) for c in columns])
        except Exception:
            schema = None
    return ray.data.read_parquet(path, columns=columns, schema=schema)


def _cmd_search(args: argparse.Namespace) -> int:
    _ensure_ray()
    import ray.data

    from .stages.retrieval import bm25_topk

    ds = _read_clean(args.input, [args.key, args.text])
    out = bm25_topk(
        ds, args.terms, text_col=args.text, key_col=args.key, k=args.k
    )
    print(out.to_json(orient="records"))
    return 0


def _cmd_report(args: argparse.Namespace) -> int:
    _ensure_ray()
    import json as _json

    from .pipelines.metrics import corpus_report

    ds = _read_clean(args.input, None)
    rep = corpus_report(
        ds,
        text_col=args.text,
        key_col=args.key,
        lang_col=args.lang,
        domain_col=args.domain,
        top_k=args.top,
    )
    print(_json.dumps(rep))
    return 0


def _cmd_dedup_index(args: argparse.Namespace) -> int:
    _ensure_ray()
    import json as _json

    from .state.minhash_index import (
        build_minhash_index,
        incremental_minhash_dedup,
    )

    if args.mode == "build":
        # band rows only need (key, text) — prune the read
        ds = _read_clean(args.input, [args.key, args.text])
        params = build_minhash_index(
            ds,
            args.index,
            args.text,
            args.key,
            num_perm=args.num_perm,
            bands=args.bands,
        )
        print(_json.dumps({"built": args.index, **params}))
        return 0
    # pass mode writes the survivors: keep the FULL input schema (lang,
    # domain, ... must survive into --output)
    ds = _read_clean(args.input, None)
    survivors, report = incremental_minhash_dedup(
        ds, args.index, args.text, args.key, threshold=args.threshold,
        update=not args.no_update,
    )
    if args.output:
        survivors.write_parquet(args.output)
    print(_json.dumps(report))
    return 0


def _cmd_classify(args: argparse.Namespace) -> int:
    _ensure_ray()
    import json as _json

    from .stages.classify import (
        nb_classify,
        nb_filter,
        train_nb_classifier,
    )

    train_path = args.train_input or args.input
    train_ds = _read_clean(train_path, [args.key, args.label, args.text])
    model = train_nb_classifier(
        train_ds, label_col=args.label, text_col=args.text
    )
    ds = _read_clean(args.input, None)
    if args.keep_label:
        out = nb_filter(
            ds, model, keep_label=args.keep_label,
            min_margin=args.min_margin, text_col=args.text,
        )
    else:
        out = nb_classify(ds, model, text_col=args.text, key_col=args.key)
    out.write_parquet(args.output)
    import ray.data

    n = ray.data.read_parquet(args.output).count()
    print(
        _json.dumps(
            {
                "rows": n,
                "classes": model.classes,
                "vocab": int(model.vocab.size),
                "mode": "filter" if args.keep_label else "score",
            }
        )
    )
    return 0


def _cmd_index(args: argparse.Namespace) -> int:
    _ensure_ray()
    import ray.data

    from .stages.retrieval import build_postings

    ds = _read_clean(args.input, [args.key, args.text])
    postings = build_postings(
        ds, text_col=args.text, key_col=args.key, key_span=args.key_span
    )
    postings.write_parquet(args.output)
    n = ray.data.read_parquet(args.output).count()
    print(json.dumps({"index": args.output, "segments": n}))
    return 0


def _cmd_profile(args: argparse.Namespace) -> int:
    _ensure_ray()
    import ray.data

    from .pipelines.metrics import profile_columns

    ds = _read_clean(args.input, args.columns)
    out = profile_columns(ds, args.columns)
    print(out.to_json(orient="records"))
    return 0


def _cmd_linkrank(args: argparse.Namespace) -> int:
    """Build the hyperlink graph from a pages dir and PageRank it."""
    _ensure_ray()
    import ray.data

    from .stages.graph import extract_links, pagerank

    pages = _read_clean(args.input, ["url", "html"])
    edges = extract_links(pages).materialize()
    pr = pagerank(edges, n_iter=args.iters, damping=args.damping)
    scored = pr.attach(pages.drop_columns(["html"]), "url")
    scored.write_parquet(args.output)
    top = pr.top_k(args.top)
    print(
        json.dumps(
            {
                "nodes": pr.n_nodes,
                "edges": pr.n_edges,
                "iterations": pr.iterations,
                "final_delta": pr.delta,
                "output": args.output,
                "top_node_ids": [int(v) for v in top["node_id"]],
            }
        )
    )
    return 0


def _cmd_ingest_docs(args: argparse.Namespace) -> int:
    """JSONL / CSV / parquet -> canonical documents parquet dir."""
    _ensure_ray()
    import ray.data

    from .sources.ingest import normalize_documents, read_any

    ds = read_any(args.input, fmt=args.fmt)
    out = normalize_documents(
        ds,
        text_col=args.text_col,
        key_col=args.key_col,
        lang_col=args.lang_col,
        source_col=args.source_col,
        min_chars=args.min_chars,
    )
    out.write_parquet(args.output)
    n = ray.data.read_parquet(args.output).count()
    print(json.dumps({"documents": n, "output": args.output}))
    return 0


def _cmd_ingest_warc(args: argparse.Namespace) -> int:
    """WARC archives -> pages-shaped parquet dir (the extract input).

    Conversion is a streaming Dataset write (one read task per archive,
    bounded blocks), so a 1 GB `.warc.gz` never materializes whole. The
    row count is summed from the written parquet footers — no second
    pass over the data."""
    _ensure_ray()
    import glob
    import os

    import pyarrow.parquet as pq

    from .sources.warc import read_warc, warc_pages

    pages = warc_pages(read_warc(args.input))
    if args.transcode:
        from .stages.transcode import transcode_to_utf8

        # normalize legacy-encoded payloads to clean UTF-8 once at
        # ingest (adds encoding/encoding_source columns); extraction
        # sniffs per-document anyway, so this is for corpora consumed
        # by many downstream pipelines
        pages = transcode_to_utf8(pages)
    pages.write_parquet(args.output)
    rows = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(os.path.join(args.output, "*.parquet"))
    )
    print(json.dumps({"pages": args.output, "rows": rows}))
    return 0


def _cmd_gen(args: argparse.Namespace) -> int:
    _ensure_ray()
    from .sources.pages import generate_pages_corpus

    out = generate_pages_corpus(args.output, n_rows=args.rows, rows_per_file=args.rows_per_file)
    print(json.dumps({"corpus": out, "rows": args.rows}))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="ocr_dataset_builder_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    e = sub.add_parser("extract", help="partitioned resumable extraction")
    e.add_argument("--input", required=True, help="dir of pages parquet files")
    e.add_argument("--output", required=True)
    e.add_argument("--partitions", type=int, default=16)
    e.add_argument("--batch-size", type=int, default=128)
    e.add_argument("--no-dedup", action="store_true")
    e.add_argument(
        "--global-dedup",
        action="store_true",
        help="after all partitions: cross-partition exact per-url dedup "
        "(skinny plan + rewrite of affected partitions only)",
    )
    e.add_argument(
        "--plan-ranges",
        type=int,
        default=None,
        help="url-hash ranges for winner planning (bounds driver memory "
        "at huge url counts)",
    )
    e.add_argument(
        "--concurrent-partitions",
        type=int,
        default=1,
        help="run up to N partition pipelines at once (amortizes "
        "per-pipeline startup when partitions are small; output "
        "identical to the sequential run)",
    )
    e.add_argument(
        "--part-start", type=int, default=None,
        help="first partition id this driver runs (manual multi-driver sharding)",
    )
    e.add_argument(
        "--part-end", type=int, default=None,
        help="one past the last partition id this driver runs",
    )
    e.set_defaults(fn=_cmd_extract)

    d = sub.add_parser("daemon", help="incremental ingestion loop")
    d.add_argument("--input", required=True)
    d.add_argument("--output", required=True)
    d.add_argument("--interval", type=float, default=300.0)
    d.add_argument("--max-passes", type=int, default=None)
    d.add_argument("--files-per-partition", type=int, default=4)
    d.add_argument("--no-dedup", action="store_true")
    d.add_argument(
        "--cross-pass-dedup",
        action="store_true",
        help="first-seen-wins url dedup across passes (seen-url index actors)",
    )
    d.add_argument(
        "--plan-ranges",
        type=int,
        default=None,
        help="url-hash ranges for winner planning (bounds driver memory)",
    )
    d.set_defaults(fn=_cmd_daemon)

    x = sub.add_parser("export", help="project a completed run")
    x.add_argument("--input", required=True, help="completed extraction out dir")
    x.add_argument("--output", required=True)
    x.add_argument("--mode", default="standard")
    x.add_argument("--fmt", default="jsonl", choices=["jsonl", "parquet"])
    x.set_defaults(fn=_cmd_export)

    m = sub.add_parser("metrics", help="lineage + aggregate metrics")
    m.add_argument("--input", required=True)
    m.set_defaults(fn=_cmd_metrics)

    dl = sub.add_parser(
        "delta", help="classify urls between two extracted snapshots"
    )
    dl.add_argument("--old", required=True, help="older extraction out dir")
    dl.add_argument("--new", required=True, help="newer extraction out dir")
    dl.add_argument(
        "--output", default=None,
        help="write added+modified new-snapshot rows here (parquet)",
    )
    dl.add_argument("--key", default="url")
    dl.add_argument("--hash-col", dest="hash_col", default="content_hash")
    dl.set_defaults(fn=_cmd_delta)

    c = sub.add_parser("curate", help="corpus-curation chain over a documents table")
    c.add_argument("--input", required=True, help="documents parquet dir/file")
    c.add_argument("--output", required=True)
    c.add_argument("--bench", default=None, help="benchmark/eval parquet for decontamination")
    c.add_argument("--bench-modulo", type=int, default=25,
                   help="no --bench: use keys with key %% MOD == 0 as the benchmark")
    c.add_argument("--key", default="doc_id")
    c.add_argument("--text", default="text")
    c.add_argument("--group", default="lang")
    c.add_argument("--max-dup-word-frac", type=float, default=0.55)
    c.add_argument("--max-top-bigram-frac", type=float, default=0.08)
    c.add_argument("--window", type=int, default=4)
    c.add_argument("--proportions", default=None,
                   help='JSON dict of group -> target proportion, e.g. \'{"en":0.5,"de":0.5}\'')
    c.add_argument("--shards", type=int, default=None,
                   help="write deterministic training shards instead of flat parquet")
    c.add_argument("--shuffle-seed", type=int, default=None,
                   help="fix the training order to a seeded deterministic "
                        "shuffle (within-shard with --shards, global otherwise; "
                        "persists _shuffle_ord)")
    c.set_defaults(fn=_cmd_curate)

    s = sub.add_parser("search", help="BM25 top-k over a documents table")
    s.add_argument("--input", required=True)
    s.add_argument("--terms", nargs="+", required=True)
    s.add_argument("--text", default="text")
    s.add_argument("--key", default="doc_id")
    s.add_argument("--k", type=int, default=10)
    s.set_defaults(fn=_cmd_search)

    i = sub.add_parser("index", help="build an inverted index (parquet)")
    i.add_argument("--input", required=True)
    i.add_argument("--output", required=True)
    i.add_argument("--text", default="text")
    i.add_argument("--key", default="doc_id")
    i.add_argument(
        "--key-span",
        type=int,
        default=65536,
        dest="key_span",
        help="keys per postings segment (bounds a hot token's row size)",
    )
    i.set_defaults(fn=_cmd_index)

    pr = sub.add_parser("profile", help="one-pass numeric column profile")
    pr.add_argument("--input", required=True)
    pr.add_argument("--columns", nargs="+", required=True)
    pr.set_defaults(fn=_cmd_profile)

    lr = sub.add_parser(
        "linkrank", help="hyperlink graph + PageRank over a pages dir"
    )
    lr.add_argument("--input", required=True)
    lr.add_argument("--output", required=True)
    lr.add_argument("--iters", type=int, default=20)
    lr.add_argument("--damping", type=float, default=0.85)
    lr.add_argument("--top", type=int, default=10)
    lr.set_defaults(fn=_cmd_linkrank)

    ig = sub.add_parser(
        "ingest-docs",
        help="normalize jsonl/csv/parquet into the documents shape",
    )
    ig.add_argument("--input", required=True)
    ig.add_argument("--output", required=True)
    ig.add_argument("--fmt", choices=["json", "csv", "parquet"], default=None)
    ig.add_argument("--text-col", required=True)
    ig.add_argument("--key-col", required=True)
    ig.add_argument("--lang-col", default=None)
    ig.add_argument("--source-col", default=None)
    ig.add_argument("--min-chars", type=int, default=1)
    ig.set_defaults(fn=_cmd_ingest_docs)

    w = sub.add_parser(
        "ingest-warc", help="WARC archives -> pages parquet (extract input)"
    )
    w.add_argument(
        "--input", required=True, help="dir or file of *.warc / *.warc.gz"
    )
    w.add_argument("--output", required=True, help="pages parquet dir")
    w.add_argument(
        "--transcode", action="store_true",
        help="sniff charsets and rewrite payloads to UTF-8 at ingest",
    )
    w.set_defaults(fn=_cmd_ingest_warc)

    rp = sub.add_parser(
        "report", help="one-call corpus card (counts, dup rate, distributions)"
    )
    rp.add_argument("--input", required=True)
    rp.add_argument("--key", default="doc_id")
    rp.add_argument("--text", default="text")
    rp.add_argument("--lang", default=None)
    rp.add_argument("--domain", default=None)
    rp.add_argument("--top", type=int, default=20)
    rp.set_defaults(fn=_cmd_report)

    di = sub.add_parser(
        "dedup-index",
        help="persistent incremental MinHash near-dedup index",
    )
    di.add_argument("--mode", choices=["build", "pass"], required=True)
    di.add_argument("--input", required=True, help="documents parquet")
    di.add_argument("--index", required=True, help="index directory")
    di.add_argument("--output", default=None,
                    help="pass mode: write surviving rows here")
    di.add_argument("--key", default="doc_id")
    di.add_argument("--text", default="text")
    di.add_argument("--num-perm", type=int, default=64, dest="num_perm")
    di.add_argument("--bands", type=int, default=16)
    di.add_argument("--threshold", type=float, default=0.8)
    di.add_argument("--no-update", action="store_true",
                    help="pass mode: don't append survivors to the index")
    di.set_defaults(fn=_cmd_dedup_index)

    cl = sub.add_parser(
        "classify",
        help="train a NB corpus classifier and score or gate a table",
    )
    cl.add_argument("--input", required=True, help="table to score/filter")
    cl.add_argument("--output", required=True)
    cl.add_argument("--label", required=True, help="label column (training)")
    cl.add_argument("--train-input", default=None,
                    help="labeled training table (default: --input)")
    cl.add_argument("--key", default="doc_id")
    cl.add_argument("--text", default="text")
    cl.add_argument("--keep-label", default=None,
                    help="filter mode: keep only rows scored as this label")
    cl.add_argument("--min-margin", type=float, default=0.0)
    cl.set_defaults(fn=_cmd_classify)

    g = sub.add_parser("gen", help="generate synthetic pages corpus")
    g.add_argument("--output", required=True)
    g.add_argument("--rows", type=int, default=2000)
    g.add_argument("--rows-per-file", type=int, default=4096)
    g.set_defaults(fn=_cmd_gen)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
