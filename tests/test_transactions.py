"""Cross-table transactions: all-or-nothing visibility, crash-window
roll-forward recovery, version pinning via carry, optimistic CAS."""

from __future__ import annotations

import pytest

from bigdata_storage_and_proccess_job_data_spark.sources import (
    transactions as tx,
)
from bigdata_storage_and_proccess_job_data_spark.sources import versioned


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "x int")


def _xs(df):
    return sorted(r.x for r in df.collect())


def test_txn_commit_publishes_all_tables_atomically(spark, tmp_path):
    txd = str(tmp_path / "txn")
    fact, agg = str(tmp_path / "fact"), str(tmp_path / "agg")
    t1 = tx.txn_commit(
        txd,
        {"fact": (_df(spark, [1, 2]), fact), "agg": (_df(spark, [10]), agg)},
    )
    assert t1 == 1
    assert _xs(tx.txn_read(spark, txd, "fact")) == [1, 2]
    assert _xs(tx.txn_read(spark, txd, "agg")) == [10]
    # per-table pointers rolled forward too
    assert versioned.current_version(fact) == 1
    assert versioned.current_version(agg) == 1

    t2 = tx.txn_commit(
        txd,
        {"fact": (_df(spark, [1, 2, 3]), fact), "agg": (_df(spark, [13]), agg)},
    )
    assert t2 == 2
    # past txn stays readable as a consistent pair (time travel)
    assert _xs(tx.txn_read(spark, txd, "fact", txn=1)) == [1, 2]
    assert _xs(tx.txn_read(spark, txd, "agg", txn=1)) == [10]
    assert _xs(tx.txn_read(spark, txd, "agg")) == [13]

    with pytest.raises(KeyError, match="not in transaction scope"):
        tx.txn_read(spark, txd, "nope")
    with pytest.raises(ValueError, match="empty"):
        tx.txn_commit(txd, {})


def test_txn_crash_window_recovery_and_isolation(spark, tmp_path):
    """roll_forward=False simulates a crash between the txn commit point
    and the per-table flips: txn readers already see the new epoch
    (manifest is the truth), per-table readers still see the old one,
    and txn_recover repairs the pointers idempotently."""
    txd = str(tmp_path / "txn")
    fact, agg = str(tmp_path / "fact"), str(tmp_path / "agg")
    tx.txn_commit(
        txd,
        {"fact": (_df(spark, [1]), fact), "agg": (_df(spark, [10]), agg)},
    )
    tx.txn_commit(
        txd,
        {"fact": (_df(spark, [1, 2]), fact), "agg": (_df(spark, [12]), agg)},
        roll_forward=False,
    )
    # txn view: new epoch, both tables together
    assert _xs(tx.txn_read(spark, txd, "fact")) == [1, 2]
    assert _xs(tx.txn_read(spark, txd, "agg")) == [12]
    # per-table view: still the OLD epoch for both (no torn pair)
    assert _xs(versioned.read_version(spark, fact)) == [1]
    assert _xs(versioned.read_version(spark, agg)) == [10]
    moved = tx.txn_recover(txd)
    assert sorted(moved) == sorted([fact, agg])
    assert _xs(versioned.read_version(spark, fact)) == [1, 2]
    assert _xs(versioned.read_version(spark, agg)) == [12]
    assert tx.txn_recover(txd) == []  # idempotent


def test_txn_carry_pins_unwritten_tables(spark, tmp_path):
    txd = str(tmp_path / "txn")
    fact, dim = str(tmp_path / "fact"), str(tmp_path / "dim")
    tx.txn_commit(
        txd,
        {"fact": (_df(spark, [1]), fact), "dim": (_df(spark, [7]), dim)},
    )
    # dim advances OUTSIDE the txn scope (single-table commit)
    versioned.commit_version(_df(spark, [8]), dim)
    # next txn writes only fact, carries dim at its CURRENT version
    tx.txn_commit(
        txd, {"fact": (_df(spark, [1, 2]), fact)}, carry={"dim": dim}
    )
    assert _xs(tx.txn_read(spark, txd, "dim")) == [8]
    assert _xs(tx.txn_read(spark, txd, "dim", txn=1)) == [7]
    # recover never rewinds a table that moved AHEAD of the manifest
    versioned.commit_version(_df(spark, [9]), dim)
    assert tx.txn_recover(txd) == []
    assert versioned.current_version(dim) == 3

    with pytest.raises(ValueError, match="both written and carried"):
        tx.txn_commit(
            txd, {"dim": (_df(spark, [0]), dim)}, carry={"dim": dim}
        )
    with pytest.raises(FileNotFoundError, match="no committed version"):
        tx.txn_commit(
            txd,
            {"fact": (_df(spark, [1]), fact)},
            carry={"ghost": str(tmp_path / "ghost")},
        )


def test_txn_optimistic_cas(spark, tmp_path):
    txd = str(tmp_path / "txn")
    fact = str(tmp_path / "fact")
    t1 = tx.txn_commit(txd, {"fact": (_df(spark, [1]), fact)})
    tx.txn_commit(
        txd, {"fact": (_df(spark, [2]), fact)}, expected=t1
    )
    with pytest.raises(versioned.ConcurrentCommitError):
        tx.txn_commit(
            txd, {"fact": (_df(spark, [3]), fact)}, expected=t1
        )
    with pytest.raises(versioned.ConcurrentCommitError, match="expected"):
        tx.txn_commit(
            txd, {"fact": (_df(spark, [3]), fact)}, expected=99
        )


def test_txn_commit_composes_with_streaming_foreach_batch(spark, tmp_path):
    """The cross-table layer in a streaming pipeline: every micro-batch
    publishes the accumulated fact rows AND their derived aggregate as
    ONE transaction, so a reader resolving both tables through any txn
    id always sees a consistent pair (agg == aggregate of fact at that
    txn, for every txn) -- the reference's detail-plus-cube fan-out
    made atomic. The micro-batch id rides the manifest-adjacent fact
    snapshot via its version history (one txn per non-empty batch)."""
    from pyspark.sql import functions as F

    src_dir = str(tmp_path / "src")
    fact, agg = str(tmp_path / "fact"), str(tmp_path / "agg")
    txd = str(tmp_path / "txn")
    spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(30)],
        "id long, seg long, v double",
    ).repartition(3).write.json(src_dir)

    stream = spark.readStream.schema("id long, seg long, v double").option(
        "maxFilesPerTrigger", 1
    ).json(src_dir)

    state = {"seen": None}

    def publish(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        seen = (
            state["seen"].unionByName(batch_df)
            if state["seen"] is not None
            else batch_df
        )
        state["seen"] = seen.localCheckpoint()
        cube = state["seen"].groupBy("seg").agg(
            F.sum("v").alias("total"), F.count(F.lit(1)).alias("n")
        )
        tx.txn_commit(
            txd,
            {"fact": (state["seen"], fact), "agg": (cube, agg)},
        )

    q = (
        stream.writeStream.foreachBatch(publish)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    last = tx.txn_current(txd)
    assert last and last >= 2  # several micro-batches committed
    for t in range(1, last + 1):
        f = tx.txn_read(spark, txd, "fact", txn=t)
        a = {
            r.seg: (r.total, r.n)
            for r in tx.txn_read(spark, txd, "agg", txn=t).collect()
        }
        want = {
            r.seg: (r.total, r.n)
            for r in f.groupBy("seg")
            .agg(F.sum("v").alias("total"), F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert a == want  # every txn is a consistent fact/agg pair
    # the final pair covers the whole source
    assert tx.txn_read(spark, txd, "fact", txn=last).count() == 30


def test_txn_vacuum_keeps_committed_and_clears_markers(spark, tmp_path):
    import os

    txd = str(tmp_path / "txn")
    fact = str(tmp_path / "fact")
    last = None
    for i in range(4):
        last = tx.txn_commit(
            txd,
            {"fact": (_df(spark, list(range(i + 1))), fact)},
            expected=last,
        )
    assert tx.txn_current(txd) == 4
    dropped = tx.txn_vacuum(txd, keep=2)
    assert dropped == [1, 2]
    # committed + keep window readable; dropped manifests raise
    assert _xs(tx.txn_read(spark, txd, "fact", txn=4)) == [0, 1, 2, 3]
    assert _xs(tx.txn_read(spark, txd, "fact", txn=3)) == [0, 1, 2]
    with pytest.raises(FileNotFoundError):
        tx.txn_manifest(txd, 1)
    # completed CAS markers (every transition below the committed txn
    # finished by definition -- an in-flight writer would hold
    # ._txn_from_4) are gone, and expected-mode commits still work
    leftover = [
        n for n in os.listdir(txd) if n.startswith("._txn_from_")
    ]
    assert leftover == []
    # keep=1 never drops the committed manifest
    assert tx.txn_vacuum(txd, keep=1) == [3]
    assert tx.txn_current(txd) == 4
    assert _xs(tx.txn_read(spark, txd, "fact")) == [0, 1, 2, 3]
    assert tx.txn_commit(
        txd, {"fact": (_df(spark, [9]), fact)}, expected=4
    ) == 5


def test_txn_two_writer_race_loser_always_fails(spark, tmp_path):
    """A REAL two-thread race on the same expected txn (the
    versioned.py race-test precedent at the transaction layer): exactly
    one writer commits, the loser gets ConcurrentCommitError, and the
    committed manifest is a consistent (fact, agg) pair from ONE writer
    -- never a torn mix across writers."""
    import threading

    txd = str(tmp_path / "txn")
    fact, agg = str(tmp_path / "fact"), str(tmp_path / "agg")
    base = tx.txn_commit(
        txd,
        {"fact": (_df(spark, [0]), fact), "agg": (_df(spark, [100]), agg)},
    )
    expected = base
    for round_no in range(3):
        results: dict[str, object] = {}
        barrier = threading.Barrier(2)

        def writer(tag: str, mark: int) -> None:
            barrier.wait()
            try:
                results[tag] = tx.txn_commit(
                    txd,
                    {
                        "fact": (_df(spark, [mark]), fact),
                        "agg": (_df(spark, [100 + mark]), agg),
                    },
                    expected=expected,
                )
            except tx.ConcurrentCommitError as exc:
                results[tag] = exc

        ts = [
            threading.Thread(target=writer, args=(t, m))
            for t, m in (("a", 10 + round_no), ("b", 50 + round_no))
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        wins = [t for t, r in results.items() if isinstance(r, int)]
        losses = [
            t
            for t, r in results.items()
            if isinstance(r, tx.ConcurrentCommitError)
        ]
        assert len(wins) == 1 and len(losses) == 1, results
        committed = results[wins[0]]
        f = _xs(tx.txn_read(spark, txd, "fact", txn=committed))
        a = _xs(tx.txn_read(spark, txd, "agg", txn=committed))
        # the pair comes from the SAME writer (fact mark + 100 == agg)
        assert len(f) == 1 and len(a) == 1 and a[0] == f[0] + 100
        # the loser's manifest is cleaned up: no orphaned txn id is
        # time-travel readable
        import os as _os

        ids = {
            int(n[2:-5])
            for n in _os.listdir(txd)
            if n.startswith("t=") and n.endswith(".json")
        }
        assert committed in ids and all(i <= committed for i in ids)
        expected = committed
