"""The duplicate-operator guard (VERDICT r11 #4): OP_INDEX.md must be
fresh, and no two public functions may share a keyword set above the
threshold without a recorded waiver. The grep-first rule's mechanical
backstop -- r10's psi_report and r11's cusum_alarms each duplicated an
existing operator under a different name and cost a rewrite."""

from __future__ import annotations

import pathlib

from tools import op_index

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_op_index_is_fresh():
    """Adding/renaming a public function without regenerating the index
    fails here -- the regeneration forces the author through the one
    greppable inventory (`python -m tools.op_index`)."""
    entries = op_index.discover()
    want = op_index.render(entries)
    got = (REPO / "OP_INDEX.md").read_text()
    assert got == want, (
        "OP_INDEX.md is stale -- regenerate with `python -m "
        "tools.op_index` AND grep it for prior art before shipping a "
        "new operator"
    )


def test_no_duplicate_operator_semantics():
    """No unwaived pair of public functions overlaps at >= THRESHOLD
    Jaccard on (name tokens + first-docstring-paragraph keywords).
    A new collision means either a real duplicate (remove it -- the
    psi_report/cusum_alarms precedent) or an intentional family twin
    (add a WAIVER with a reason saying why both exist)."""
    entries = op_index.discover()
    bad = op_index.collisions(entries)
    assert bad == [], "\n".join(
        f"{j:.3f} {a} <-> {b}" for j, a, b in bad
    )
    # waivers never go stale: every waived name still exists
    names = {f"{m}.{n}" for m, n, _, _ in entries}
    for pair in op_index.WAIVERS:
        for name in pair:
            assert name in names, f"stale waiver entry: {name}"


def test_guard_catches_near_duplicates():
    """The metric has teeth: a renamed near-copy of an existing
    operator (same first paragraph, alarm-flavored name -- the exact
    r11 cusum_alarms failure mode) scores above the threshold against
    the original."""
    entries = {f"{m}.{n}": (n, k) for m, n, _, k in op_index.discover()}
    orig_name, orig_kw = entries["operators.aggregates.cusum_changepoints"]
    import importlib

    agg = importlib.import_module(
        "bigdata_storage_and_proccess_job_data_spark.operators.aggregates"
    )
    doc = agg.cusum_changepoints.__doc__
    dup_kw = op_index.keywords("cusum_alarms", doc)
    assert op_index.jaccard(orig_kw, dup_kw) >= op_index.THRESHOLD
