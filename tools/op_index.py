"""Operator keyword index + duplicate-semantics guard (VERDICT r11 #4).

The grep-first rule ("before writing ANY operator, grep the package and
COVERAGE.md for prior art") has been violated twice -- r10 wrote a
psi_report duplicating aggregates.psi_bins, r11 a cusum_alarms
duplicating aggregates.cusum_changepoints; both were caught in-round
and rewritten, each costing a full operator's work. Names differed
(report vs bins, alarms vs changepoints), so a name grep alone was not
enough. This module automates the insurance:

1. ``python -m tools.op_index`` regenerates ``OP_INDEX.md`` -- ONE
   greppable line per public function in the engine package (module,
   name, first docstring sentence). Writing a new operator starts with
   a grep of that file.
2. ``tests/test_op_index.py`` fails when the index is stale (a new
   public function exists without a regenerated index -- forcing the
   author through the file) and when two public functions' keyword
   sets overlap above ``THRESHOLD`` without a recorded waiver (the
   mechanical form of "this already exists").

Keywords are the function's name tokens plus the content words of its
docstring's FIRST paragraph (the "what is this" sentence; later
paragraphs describe edge cases and scale shape, which legitimately
repeat across the package). Stopwords common to every operator
docstring (row/column/agg/shuffle/...) are dropped so the overlap
measures semantics, not house style.
"""

from __future__ import annotations

import importlib
import inspect
import itertools
import pkgutil
import re

PKG = "bigdata_storage_and_proccess_job_data_spark"

# plans/ is the registry surface (driver queries over the operators),
# not the operator inventory itself -- its duplicate guard is the
# registry's own duplicate-name refusal.
# exact dotted-path segments (r13, ADVICE r12: substring matching would
# silently drop a future 'plansomething' module from the guard)
EXCLUDE_SUBPACKAGES = ("plans",)

STOPWORDS = frozenset(
    """
    a an the and or of to in for with over per on by is are as from
    that this it its each one two three all any both only also never
    returns return returning row rows column columns col cols df
    dataframe frame input output value values key keys keyed spark
    duckdb sql scale shape hash agg aggregate aggregation shuffle
    shuffles join joins window windows group groupby grouped null
    nulls excluded not no none when where which whose same form once
    pass single bounded exact deterministic
    """.split()
)

# Pairs allowed to overlap above THRESHOLD, each with the reason the
# overlap is intentional rather than a duplicate. Adding a waiver is a
# reviewed act: the reason must say why BOTH functions exist.
THRESHOLD = 0.5
WAIVERS: dict[frozenset, str] = {
    frozenset(
        {"functions.vectors.lit_vector", "functions.vectors.lit_cube"}
    ): "literal-builder twins: same embedding-literal plumbing for a "
    "vector vs a rank-3 cube of test fixtures",
    frozenset(
        {"functions.vectors.vector_sql", "functions.vectors.cube_sql"}
    ): "DuckDB-literal renderers mirroring the lit_* twins",
    frozenset(
        {
            "operators.similarity.md5_centroids",
            "operators.similarity.md5_codebooks",
        }
    ): "deterministic md5 model builders: one flat centroid set (IVF) "
    "vs per-subspace codebooks (PQ) -- different model shapes",
    frozenset(
        {
            "streaming.pipeline.maintain_quantile_stream",
            "streaming.pipeline.maintain_sketch_stream",
        }
    ): "maintained-sketch streaming twins: KLL-style quantile state vs "
    "counting sketch state over the same foreachBatch seam",
    frozenset(
        {"domain.pipeline.company_stats", "domain.pipeline.location_stats"}
    ): "reference-parity cube variants (spark_batch_v2 emits one agg "
    "per dimension set; each keeps its reference citation)",
    frozenset(
        {"domain.pipeline.company_stats", "domain.pipeline.temporal_stats"}
    ): "reference-parity cube variants (see company/location waiver)",
    frozenset(
        {"domain.pipeline.company_stats", "domain.pipeline.worktype_stats"}
    ): "reference-parity cube variants (see company/location waiver)",
    frozenset(
        {"domain.pipeline.location_stats", "domain.pipeline.temporal_stats"}
    ): "reference-parity cube variants (see company/location waiver)",
    frozenset(
        {"domain.pipeline.location_stats", "domain.pipeline.worktype_stats"}
    ): "reference-parity cube variants (see company/location waiver)",
    frozenset(
        {"domain.pipeline.temporal_stats", "domain.pipeline.worktype_stats"}
    ): "reference-parity cube variants (see company/location waiver)",
}


def keywords(name: str, doc: str | None) -> frozenset:
    toks = {t for t in name.split("_") if len(t) > 2}
    if doc:
        para = doc.strip().split("\n\n")[0]
        toks |= {
            w
            for w in re.findall(r"[a-z]{3,}", para.lower())
            if w not in STOPWORDS
        }
    return frozenset(toks)


def first_sentence(doc: str | None, limit: int = 160) -> str:
    if not doc:
        return "(no docstring)"
    para = " ".join(doc.strip().split("\n\n")[0].split())
    return para[:limit] + ("..." if len(para) > limit else "")


def discover() -> list[tuple[str, str, str, frozenset]]:
    """(relative module, function name, first sentence, keywords) for
    every public function defined in the engine package, sorted."""
    pkg = importlib.import_module(PKG)
    out = []
    for mi in sorted(
        pkgutil.walk_packages(pkg.__path__, PKG + "."), key=lambda m: m.name
    ):
        segs = mi.name.split(".")
        if any(x in segs for x in EXCLUDE_SUBPACKAGES) or mi.ispkg:
            continue
        mod = importlib.import_module(mi.name)
        rel = mi.name[len(PKG) + 1 :]
        for nm in sorted(vars(mod)):
            fn = vars(mod)[nm]
            if nm.startswith("_") or not inspect.isfunction(fn):
                continue
            if fn.__module__ != mi.name:
                continue  # re-export, indexed where defined
            out.append(
                (rel, nm, first_sentence(fn.__doc__), keywords(nm, fn.__doc__))
            )
    return out


def jaccard(a: frozenset, b: frozenset) -> float:
    u = a | b
    return len(a & b) / len(u) if u else 0.0


def collisions(
    entries: list[tuple[str, str, str, frozenset]],
    threshold: float = THRESHOLD,
) -> list[tuple[float, str, str]]:
    """Unwaived pairs whose keyword overlap >= threshold."""
    out = []
    for (m1, n1, _, k1), (m2, n2, _, k2) in itertools.combinations(
        entries, 2
    ):
        j = jaccard(k1, k2)
        if j >= threshold:
            pair = frozenset({f"{m1}.{n1}", f"{m2}.{n2}"})
            if pair not in WAIVERS:
                out.append((j, f"{m1}.{n1}", f"{m2}.{n2}"))
    return sorted(out, reverse=True)


def render(entries: list[tuple[str, str, str, frozenset]]) -> str:
    lines = [
        "# Operator index (generated -- do not edit)",
        "",
        "One line per public function in the engine package. BEFORE",
        "writing a new operator, grep this file (and COVERAGE.md) for",
        "prior art -- names differ (psi_bins vs psi_report, changepoints",
        "vs alarms); search by CONCEPT keywords, not just the name you",
        "have in mind. Regenerate: `python -m tools.op_index`.",
        "Freshness + duplicate-overlap guard: tests/test_op_index.py.",
        "",
        f"{len(entries)} public functions.",
        "",
    ]
    for rel, nm, sent, _ in entries:
        lines.append(f"- `{rel}.{nm}` — {sent}")
    return "\n".join(lines) + "\n"


def main() -> None:
    import pathlib

    entries = discover()
    path = pathlib.Path(__file__).resolve().parent.parent / "OP_INDEX.md"
    path.write_text(render(entries))
    bad = collisions(entries)
    print(f"wrote {path} ({len(entries)} functions)")
    for j, a, b in bad:
        print(f"UNWAIVED OVERLAP {j:.3f}: {a} <-> {b}")
    if bad:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
