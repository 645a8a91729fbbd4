"""Path-derived metadata values, mirroring the reference's
``src/metadata/path_utils.cpp``:

* ``computePathDerivedValues`` (path_utils.cpp:52-68) — for every stored
  document the reference derives six columns from ``filePath``:
  ``normalizedPath`` (backslashes to slashes + ``lexically_normal``),
  ``pathPrefix`` (``parent_path``), ``parentHash`` (sha256 of the prefix,
  empty-string prefix hashes to ``''``), ``reversePath`` (the reversed
  string, used for suffix lookups), ``pathHash`` (sha256 of the
  normalized path) and ``pathDepth`` (count of non-empty
  ``std::filesystem::path`` components — the root ``/`` counts as one).
* ``normalizeSlashes`` (path_utils.cpp:11-36) — the reference also calls
  ``weakly_canonical`` to resolve symlinks when the path exists on the
  daemon's filesystem; for a batch engine whose corpus paths are stored
  identifiers (never present on executor disks) ``weakly_canonical``
  degenerates to ``lexically_normal``, which is what we implement. This
  boundary is deliberate: symlink resolution is an environment effect,
  not a data transform.

``lexically_normal`` semantics are pinned byte-for-byte against a
compiled ``std::filesystem`` oracle (``tests/goldens_pathnorm.json``; 465
cases, curated + fuzzed — rebuild recipe in the golden test). The
non-obvious rules the goldens capture:

* ``a/b/..`` normalizes to ``a/`` (the separator *between* ``a`` and the
  removed ``b/..`` survives), while ``a/..`` collapses to ``.``.
* A result whose last element is ``..`` never keeps a trailing
  separator (``../`` → ``..``), everything else keeps one whenever the
  final processed segment was empty or ``.`` or a popping ``..``.
* ``parent_path("/") == "/"`` and ``parent_path("a/b/") == "a/b"``.
* Absolute paths drop unmatched ``..`` (``/../a`` → ``/a``).

The Spark implementation is a single ``F.aggregate`` fold over the
``/``-split segments (JVM-side higher-order functions, zero Python in
the per-row path); the scalar twin below is the test oracle.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "lexically_normal",
    "compute_path_derived",
    "normalized_path_col",
    "with_path_derived",
]


def lexically_normal(path: str) -> str:
    """Scalar twin of ``std::filesystem::path::lexically_normal`` over
    generic (``/``) format, after backslash normalization
    (path_utils.cpp:12-14). Pinned against the compiled oracle."""
    p = path.replace("\\", "/")
    if p == "":
        return ""
    is_abs = p.startswith("/")
    out: list[str] = []
    trail = False
    for seg in p.split("/"):
        if seg in ("", "."):
            trail = True
            continue
        if seg == "..":
            if out and out[-1] != "..":
                out.pop()
                trail = True
            elif is_abs:
                trail = True
            else:
                out.append("..")
                trail = False
        else:
            out.append(seg)
            trail = False
    body = ("/" if is_abs else "") + "/".join(out)
    if trail and out and out[-1] != "..":
        body += "/"
    if body == "":
        body = "/" if is_abs else "."
    return body


def _parent_path(np: str) -> str:
    """``std::filesystem::path::parent_path`` over a normalized path."""
    if np in ("", "/"):
        return "/" if np == "/" else ""
    if np.endswith("/"):
        return np[:-1]
    idx = np.rfind("/")
    if idx < 0:
        return ""
    if idx == 0:
        return "/"
    return np[:idx]


def _path_depth(np: str) -> int:
    """path_utils.cpp:41-49: non-empty component count (root counts 1)."""
    if np == "":
        return 0
    depth = sum(1 for s in np.split("/") if s != "")
    if np.startswith("/"):
        depth += 1
    return depth


def compute_path_derived(file_path: str) -> dict:
    """Scalar twin of ``computePathDerivedValues`` (path_utils.cpp:52-68)."""
    np = lexically_normal(file_path)
    prefix = _parent_path(np)
    return {
        "normalized_path": np,
        "path_prefix": prefix,
        "parent_hash": (
            hashlib.sha256(prefix.encode()).hexdigest() if prefix else ""
        ),
        "reverse_path": np[::-1],
        "path_hash": hashlib.sha256(np.encode()).hexdigest(),
        "path_depth": _path_depth(np),
    }


def normalized_path_col(path_col: Column | str) -> Column:
    """``lexically_normal`` as one Catalyst expression: an ``F.aggregate``
    fold over the ``/``-split segments carrying ``(stack, trail)``. All
    JVM-side — the per-row hot path has no Python at any corpus size."""
    pcol = F.col(path_col) if isinstance(path_col, str) else path_col
    pcol = F.translate(pcol, "\\", "/")
    is_abs = pcol.startswith("/")
    segs = F.split(pcol, "/")

    def _acc(out: Column, trail: Column) -> Column:
        return F.struct(out.alias("out"), trail.alias("trail"))

    init = _acc(F.array().cast("array<string>"), F.lit(False))

    def step(acc: Column, x: Column) -> Column:
        out = acc["out"]
        can_pop = (F.size(out) > 0) & (F.element_at(out, -1) != F.lit(".."))
        return (
            F.when((x == "") | (x == "."), _acc(out, F.lit(True)))
            .when(
                x == "..",
                F.when(
                    can_pop,
                    _acc(F.slice(out, 1, F.size(out) - 1), F.lit(True)),
                )
                .when(is_abs, _acc(out, F.lit(True)))
                .otherwise(
                    _acc(F.concat(out, F.array(F.lit(".."))), F.lit(False))
                ),
            )
            .otherwise(_acc(F.concat(out, F.array(x)), F.lit(False)))
        )

    acc = F.aggregate(segs, init, step)
    out, trail = acc["out"], acc["trail"]
    body = F.concat(
        F.when(is_abs, F.lit("/")).otherwise(F.lit("")),
        F.array_join(out, "/"),
    )
    keep_trail = (
        trail & (F.size(out) > 0) & (F.element_at(out, -1) != F.lit(".."))
    )
    res = F.when(keep_trail, F.concat(body, F.lit("/"))).otherwise(body)
    res = F.when(
        res == "", F.when(is_abs, F.lit("/")).otherwise(F.lit("."))
    ).otherwise(res)
    return F.when(pcol == "", F.lit("")).otherwise(res)


def _parent_col(np: Column) -> Column:
    no_trail = F.regexp_replace(np, "/[^/]*$", "")
    return (
        F.when(np == "", F.lit(""))
        .when(np == "/", F.lit("/"))
        .when(np.endswith("/"), np.substr(F.lit(1), F.length(np) - 1))
        .when(~np.contains("/"), F.lit(""))
        .when(no_trail == "", F.lit("/"))
        .otherwise(no_trail)
    )


def _depth_col(np: Column) -> Column:
    nonempty = F.size(F.filter(F.split(np, "/"), lambda s: s != ""))
    return F.when(np == "", F.lit(0)).otherwise(
        nonempty + F.when(np.startswith("/"), F.lit(1)).otherwise(F.lit(0))
    )


def with_path_derived(df: DataFrame, path_col: str = "path") -> DataFrame:
    """computePathDerivedValues as six derived columns
    (path_utils.cpp:52-68 / populatePathDerivedFields :70-80): the
    projection every ingest row gets before metadata insert. Pure
    Catalyst — pushdown-friendly, no exchange, no Python."""
    np = normalized_path_col(path_col)
    df = df.withColumn("normalized_path", np)
    npc = F.col("normalized_path")
    prefix = _parent_col(npc)
    return (
        df.withColumn("path_prefix", prefix)
        .withColumn(
            "parent_hash",
            F.when(F.col("path_prefix") == "", F.lit("")).otherwise(
                F.sha2(F.col("path_prefix"), 256)
            ),
        )
        .withColumn("reverse_path", F.reverse(npc))
        .withColumn("path_hash", F.sha2(npc, 256))
        .withColumn("path_depth", _depth_col(npc).cast("int"))
    )
