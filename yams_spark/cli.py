"""CLI surface: the reference's command verbs mapped onto the operators.

The reference ships a `yams` binary (search / grep / get / ls / graph /
dedupe sub-commands over the daemon); this repo's equivalent surface is a
Spark driver program — same verbs, DataFrame operators underneath, JSON
lines on stdout. Run as

    spark-submit --py-files yams_spark.zip -m yams_spark.cli <cmd> ...
    # or locally: python -m yams_spark.cli <cmd> ...

Every command takes ``--docs <parquet>`` (a documents-like table) unless
noted. This is deliberately a thin shell: each verb is one operator call,
so the CLI is also living documentation of the public API.
"""

from __future__ import annotations

import argparse
import json
import sys


def _emit(df, limit: int) -> None:
    for row in df.limit(limit).collect():
        print(json.dumps(row.asDict(), default=str))


def _docs(spark, path: str):
    return spark.read.parquet(path)


def cmd_search(spark, args) -> int:
    from yams_spark.operators.neighbors import hybrid_search

    out = hybrid_search(
        spark, _docs(spark, args.docs), args.query, None,
        id_col=args.id_col, text_col=args.text_col, limit=args.limit,
        auto_phrase=args.auto_phrase, include_snippets=args.snippets,
    )
    _emit(out, args.limit)
    return 0


def cmd_grep(spark, args) -> int:
    from yams_spark.operators.grep import grep_lines_context, grep_scan

    docs = _docs(spark, args.docs)
    common = dict(
        id_col=args.id_col, text_col=args.text_col,
        literal_text=args.fixed_strings, whole_word=args.word,
        ignore_case=args.ignore_case,
    )
    if args.count or args.files_with_matches or args.files_without_match:
        out = grep_scan(docs, args.pattern,
                        files_without_match=args.files_without_match, **common)
        if args.files_with_matches or args.files_without_match:
            out = out.select(args.id_col)  # -l / -L: ids only
    else:
        out = grep_lines_context(
            docs, args.pattern, before=args.before, after=args.after,
            context=args.context, **common,
        )
    _emit(out, args.limit)
    return 0


def cmd_get(spark, args) -> int:
    from yams_spark.operators.resolve import resolve_documents

    out = resolve_documents(
        _docs(spark, args.docs), args.names,
        path_col=args.path_col, hash_col=args.hash_col,
        recency_col=args.recency_col,
    )
    _emit(out, len(args.names))
    return 0


def cmd_ls(spark, args) -> int:
    from pyspark.sql import functions as F

    from yams_spark.operators.qualifiers import _glob_to_rlike

    docs = _docs(spark, args.docs)
    if args.name:
        docs = docs.where(
            F.col(args.path_col).rlike(_glob_to_rlike("*" + args.name + "*"))
        )
    _emit(docs.orderBy(args.path_col), args.limit)
    return 0


def cmd_dedupe(spark, args) -> int:
    from yams_spark.plans.er_pipeline import PipelineConfig, run_pipeline

    cfg = (
        PipelineConfig.scale(checkpoint_dir=args.out)
        if args.scale
        else PipelineConfig(checkpoint_dir=args.out)
    )
    out = run_pipeline(spark, spark.read.parquet(args.pages), cfg)
    print(json.dumps({
        "clusters": out["clusters"].count(),
        "members": out["members"].count(),
        "checkpoint_dir": args.out,
    }))
    return 0


def cmd_kg(spark, args) -> int:
    from yams_spark.operators.kg import populate_kg

    kg = populate_kg(
        _docs(spark, args.docs), id_col=args.id_col, text_col=args.text_col,
        pagerank_iters=args.pagerank_iters,
    )
    counts = {name: df.count() for name, df in kg.items()}
    if args.out:
        for name, df in kg.items():
            df.write.mode("overwrite").parquet(f"{args.out}/{name}.parquet")
    print(json.dumps(counts))
    return 0


def cmd_graph(spark, args) -> int:
    from yams_spark.operators.graph import bfs_traverse

    edges = spark.read.parquet(args.edges)
    seeds = spark.createDataFrame([(s,) for s in args.seeds], "node string")
    out = bfs_traverse(
        edges, seeds, max_depth=args.depth,
        relation_col="relation" if args.relation else None,
        relations=args.relation or None,
        per_depth_cap=args.per_depth_cap,
    )
    _emit(out.orderBy("depth", "node"), args.limit)
    return 0


def cmd_route(spark, args) -> int:
    from yams_spark.operators.router import route_query

    print(json.dumps({"query": args.query, **route_query(spark, args.query)}))
    return 0


def cmd_topo(spark, args) -> int:
    """Route a query to candidate clusters (topology session): clusters
    parquet (cluster_id, member_count, persistence, cohesion, centroid)
    + memberships parquet (doc_hash, cluster_id); seeds as
    doc_hash[=weight] pairs; emits the scored routes."""
    from yams_spark.operators.topo_routing import route_clusters

    clusters = spark.read.parquet(args.clusters)
    memberships = spark.read.parquet(args.memberships)
    seeds = {}
    for s in args.seed or []:
        h, _, w = s.partition("=")
        seeds[h] = float(w) if w else 1.0
    out = route_clusters(
        spark, clusters, memberships,
        weighted_seeds=seeds or None,
        alpha=args.alpha, scoring_mode=args.mode, limit=args.limit,
    )
    _emit(out, args.limit or 20)
    return 0


def cmd_facets(spark, args) -> int:
    from yams_spark.operators.facets import choose_sample_digits, facet_counts

    docs = _docs(spark, args.docs)
    digits = args.sample_digits
    if digits is None:
        digits = choose_sample_digits(docs.count())
    out = facet_counts(docs, args.fields, id_col=args.id_col,
                       sample_hex_digits=digits)
    _emit(out.orderBy("field", "rk"), args.limit)
    return 0


def cmd_snapshot(spark, args) -> int:
    from yams_spark.operators.snapshots import tree_snapshot

    out = tree_snapshot(
        spark.read.parquet(args.files), args.snapshot_id,
        directory_path=args.directory, snapshot_label=args.label,
    )
    _emit(out, 1)
    return 0


def cmd_filetype(spark, args) -> int:
    from pyspark.sql import functions as F

    from yams_spark.functions.filetype import detect_file_type

    media = spark.read.parquet(args.media)

    def compute(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[args.media_id_col],
                                    pdf[args.payload_col]):
                r = detect_file_type(
                    bytes(payload) if payload is not None else b""
                )
                rows.append((mid, r["mime"], r["file_type"],
                             float(r["confidence"]), r["method"]))
            yield pd.DataFrame(
                rows, columns=["media_id", "mime", "file_type",
                               "confidence", "method"],
            )

    out = media.select(args.media_id_col, args.payload_col).mapInPandas(
        compute,
        schema="media_id string, mime string, file_type string, "
        "confidence double, method string",
    )
    _emit(out.orderBy(F.col("media_id")), args.limit)
    return 0


def cmd_archive(spark, args) -> int:
    from yams_spark.operators.multimodal import (
        explode_archive_members,
        extract_archive_listing,
    )

    media = spark.read.parquet(args.media)
    if args.members:
        out = explode_archive_members(media).drop("member_bytes")
    else:
        out = extract_archive_listing(media)
    _emit(out, args.limit)
    return 0


def cmd_title(spark, args) -> int:
    from pyspark.sql import functions as F

    from yams_spark.functions.title_util import derive_title_col

    docs = _docs(spark, args.docs)

    def opt(col):
        return docs[col] if col in docs.columns else F.lit("")

    name = (
        docs["name"] if "name" in docs.columns
        else docs[args.id_col].cast("string")
    )
    out = docs.select(
        args.id_col,
        derive_title_col(
            docs[args.text_col], name, opt("mime_type"), opt("ext")
        ).alias("title"),
    )
    _emit(out, args.limit)
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="yams-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, docs=True):
        if docs:
            sp.add_argument("--docs", required=True)
        sp.add_argument("--id-col", default="doc_id")
        sp.add_argument("--text-col", default="text")
        sp.add_argument("--limit", type=int, default=20)

    s = sub.add_parser("search", help="hybrid lexical search")
    s.add_argument("query")
    s.add_argument("--auto-phrase", action="store_true")
    s.add_argument("--snippets", action="store_true")
    common(s)
    s.set_defaults(fn=cmd_search)

    g = sub.add_parser("grep", help="content scan")
    g.add_argument("pattern")
    g.add_argument("-c", "--count", action="store_true")
    g.add_argument("-F", "--fixed-strings", action="store_true")
    g.add_argument("-w", "--word", action="store_true")
    g.add_argument("-i", "--ignore-case", action="store_true")
    g.add_argument("-l", "--files-with-matches", action="store_true")
    g.add_argument("-L", "--files-without-match", action="store_true")
    g.add_argument("-B", "--before", type=int, default=0)
    g.add_argument("-A", "--after", type=int, default=0)
    g.add_argument("-C", "--context", type=int, default=0)
    common(g)
    g.set_defaults(fn=cmd_grep)

    r = sub.add_parser("get", help="resolve names through the cascade")
    r.add_argument("names", nargs="+")
    r.add_argument("--path-col", default="path")
    r.add_argument("--hash-col", default="doc_hash")
    r.add_argument("--recency-col", default="warc_ts")
    common(r)
    r.set_defaults(fn=cmd_get)

    ls = sub.add_parser("ls", help="list scan with glob filter")
    ls.add_argument("--name")
    ls.add_argument("--path-col", default="path")
    common(ls)
    ls.set_defaults(fn=cmd_ls)

    d = sub.add_parser("dedupe", help="run the ER pipeline")
    d.add_argument("--pages", required=True)
    d.add_argument("--out", required=True)
    d.add_argument("--scale", action="store_true")
    d.set_defaults(fn=cmd_dedupe)

    k = sub.add_parser("kg", help="populate the knowledge graph tables")
    k.add_argument("--out")
    k.add_argument("--pagerank-iters", type=int, default=5)
    common(k)
    k.set_defaults(fn=cmd_kg)

    gr = sub.add_parser("graph", help="BFS over a (src,dst[,relation]) edge table")
    gr.add_argument("seeds", nargs="+")
    gr.add_argument("--edges", required=True)
    gr.add_argument("--depth", type=int, default=2)
    gr.add_argument("--relation", action="append")
    gr.add_argument("--per-depth-cap", type=int, default=None)
    gr.add_argument("--limit", type=int, default=50)
    gr.set_defaults(fn=cmd_graph)

    rt = sub.add_parser("route", help="classify one query (intent/mode/community)")
    rt.add_argument("query")
    rt.set_defaults(fn=cmd_route)

    tp = sub.add_parser("topo", help="topology cluster routing for a query")
    tp.add_argument("--clusters", required=True)
    tp.add_argument("--memberships", required=True)
    tp.add_argument("--seed", action="append", help="doc_hash[=weight]")
    tp.add_argument("--alpha", type=float, default=1.0)
    tp.add_argument("--mode", default="current",
                    choices=["current", "size_weighted", "seed_coverage"])
    tp.add_argument("--limit", type=int, default=10)
    tp.set_defaults(fn=cmd_topo)

    fc = sub.add_parser("facets", help="facet value counts (sampled above threshold)")
    fc.add_argument("fields", nargs="+")
    fc.add_argument("--sample-digits", type=int, default=None,
                    help="sha256 zero-hex-digit count; default auto from row count")
    common(fc)
    fc.set_defaults(fn=cmd_facets)

    ft = sub.add_parser("filetype", help="magic-byte type detection")
    ft.add_argument("--media", required=True)
    ft.add_argument("--media-id-col", default="media_id")
    ft.add_argument("--payload-col", default="payload")
    ft.add_argument("--limit", type=int, default=20)
    ft.set_defaults(fn=cmd_filetype)

    ar = sub.add_parser("archive", help="archive listing / member explode")
    ar.add_argument("--media", required=True)
    ar.add_argument("--members", action="store_true",
                    help="explode members (with real decompression)")
    ar.add_argument("--limit", type=int, default=20)
    ar.set_defaults(fn=cmd_archive)

    ti = sub.add_parser("title", help="derive titles via the ingest cascade")
    common(ti)
    ti.set_defaults(fn=cmd_title)

    sn = sub.add_parser("snapshot", help="tree snapshot with Merkle root")
    sn.add_argument("--files", required=True)
    sn.add_argument("--snapshot-id", required=True)
    sn.add_argument("--directory", default="/")
    sn.add_argument("--label")
    sn.set_defaults(fn=cmd_snapshot)

    return p


def main(argv: list[str] | None = None, spark=None) -> int:
    args = build_parser().parse_args(argv)
    own_session = spark is None
    if own_session:
        from yams_spark.session import get_spark

        spark = get_spark(app_name="yams_spark_cli")
    try:
        return args.fn(spark, args)
    finally:
        if own_session:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
