"""Heaps-scale end-to-end certification of the streaming drift
monitor (round-10 verdict task #4, second maintainer — the PQ-index
record in PQ_STREAM_HEAPS.md is the template).

Embedding drops arrive as a REAL multi-batch file stream over the
heaps1 decade corpus (20k 64-d vectors, 10x sf0.1);
``maintain_drift_partials`` lands each micro-batch's integer drift
partials under an idempotent ``batch_id`` partition and
``drift_report`` rolls them up additively.  Stream == batch semantics
asserted three ways:

1. **Report parity** — the rolled-up streamed partials must EQUAL the
   one-pass batch ``embedding_drift`` over the same corpus
   bit-for-bit: the monitor is exact integer arithmetic (grid-snapped
   sums, DECIMAL(38,0) cross-multiplication), so there is no float
   tolerance — the tuple sets must be identical.
2. **Replay idempotence** — wipe the CHECKPOINT (not the output) and
   re-run the whole stream: every already-landed ``batch_id``
   partition is rewritten via dynamic partition overwrite instead of
   double-counted.  The report and the partial-row count must be
   unchanged — the exactly-once-by-idempotence claim the module makes
   for failure replay, exercised end-to-end at the decade.
3. **Incremental drop** — a NEW embedding batch landed after the
   first run, resumed from the ORIGINAL checkpoint, must extend the
   partials by exactly that batch (no reprocessing of consumed
   files) and the rolled-up report must equal a batch
   ``embedding_drift`` over the extended corpus.

Writes DRIFT_STREAM_HEAPS.md (runtimes + parity verdicts + drift
stamp) — the committed record.  The pytest twin
(test_streaming.py::test_streaming_drift_matches_batch) covers the
same semantics at sf-tiny; this tool is the scale evidence.

Usage: python tools/drift_stream_heaps.py [--emb PATH] [--batches N]
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

EMB = "/root/repo/testdata_heaps1/embeddings.parquet"


def main() -> None:
    args = sys.argv[1:]
    emb_path, n_batches = EMB, 5
    i = 0
    while i < len(args):
        if args[i] == "--emb":
            emb_path = args[i + 1]; i += 2
        elif args[i] == "--batches":
            n_batches = int(args[i + 1]); i += 2
        else:
            raise SystemExit("usage: drift_stream_heaps.py"
                             " [--emb PATH] [--batches N]")

    from pyspark.sql import functions as F

    from financial_data_ingestion_pipeline_spark.functions.similarity import (
        embedding_drift,
    )
    from financial_data_ingestion_pipeline_spark.session import get_spark
    from financial_data_ingestion_pipeline_spark.streaming.drift_stream import (
        drift_report,
        maintain_drift_partials,
    )

    spark = get_spark(
        app_name="fdip-drift-stream-heaps",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false",
                    "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from calibration import drift

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    cal = drift(spark, "local32")

    work = tempfile.mkdtemp(prefix="drift_stream_heaps_")
    emb = spark.read.parquet(emb_path).select("vec_id", "embedding")
    n_vecs = emb.count()

    # hold out the last hash bucket as the INCREMENTAL drop for
    # assertion 3; the first n_batches-1 buckets are the initial load
    landing = os.path.join(work, "landing")
    bucket = F.pmod(F.xxhash64("vec_id"), F.lit(n_batches))
    for b in range(n_batches - 1):
        (emb.filter(bucket == b).coalesce(1)
         .write.parquet(os.path.join(landing, f"b{b}")))
        time.sleep(0.05)  # strictly increasing mtimes -> stable order
    initial = emb.filter(bucket < n_batches - 1)
    n_initial = initial.count()

    report: list[str] = []
    partials = os.path.join(work, "partials")
    ckpt = os.path.join(work, "ckpt")

    def run_stream(checkpoint: str) -> float:
        src = (spark.readStream.schema(emb.schema)
               .option("maxFilesPerTrigger", 1)
               .parquet(f"{landing}/*/"))
        t0 = time.perf_counter()
        q = maintain_drift_partials(
            src, out_path=partials, checkpoint=checkpoint)
        q.awaitTermination()
        return round(time.perf_counter() - t0, 2)

    def report_tuples() -> set:
        return {tuple(r) for r in drift_report(spark, partials).collect()}

    # ---- 1. report parity: stream roll-up vs one-pass batch --------
    t_stream = run_stream(ckpt)
    got = report_tuples()
    n_partial_rows = spark.read.parquet(partials).count()
    t0 = time.perf_counter()
    want = {tuple(r) for r in embedding_drift(initial).collect()}
    t_batch = round(time.perf_counter() - t0, 2)
    parity_ok = got == want and len(got) > 0
    report.append(
        f"| drift_report(streamed partials) == embedding_drift (batch) | "
        f"{'PASS' if parity_ok else 'FAIL'} | {n_initial} vectors in "
        f"{n_batches - 1} batches -> {n_partial_rows} partial rows, "
        f"{len(got)} report dims, symmetric diff {len(got ^ want)}; "
        f"stream {t_stream}s / batch {t_batch}s |")

    # ---- 2. replay idempotence: wipe checkpoint, keep output -------
    # file mtimes are unchanged, so the re-listed stream replays the
    # SAME file->batch_id assignment; every partition is rewritten via
    # dynamic partition overwrite -- additive state must not change
    shutil.rmtree(ckpt)
    t_replay = run_stream(os.path.join(work, "ckpt_replay"))
    got_replay = report_tuples()
    n_partial_replay = spark.read.parquet(partials).count()
    replay_ok = got_replay == want and n_partial_replay == n_partial_rows
    report.append(
        f"| full replay (checkpoint wiped, output kept) is idempotent | "
        f"{'PASS' if replay_ok else 'FAIL'} | report diff "
        f"{len(got_replay ^ want)}, partial rows {n_partial_replay} "
        f"(was {n_partial_rows}); replay {t_replay}s |")

    # ---- 3. incremental drop resumed from the replay checkpoint ----
    drop = emb.filter(bucket == n_batches - 1)
    n_drop = drop.count()
    drop.coalesce(1).write.parquet(
        os.path.join(landing, f"b{n_batches - 1}"))
    t_incr = run_stream(os.path.join(work, "ckpt_replay"))
    got_full = report_tuples()
    n_partial_full = spark.read.parquet(partials).count()
    want_full = {tuple(r) for r in embedding_drift(emb).collect()}
    # one partial slab per (batch, dim): the drop adds exactly dim rows
    incr_ok = (got_full == want_full
               and n_partial_full > n_partial_replay)
    report.append(
        f"| incremental drop (same checkpoint) extends, parity holds | "
        f"{'PASS' if incr_ok else 'FAIL'} | +{n_drop} vectors -> "
        f"{n_partial_full} partial rows (was {n_partial_replay}), "
        f"report diff {len(got_full ^ want_full)}; incr run "
        f"{t_incr}s |")

    ok = parity_ok and replay_ok and incr_ok
    with open(os.path.join(REPO, "DRIFT_STREAM_HEAPS.md"), "w") as fh:
        fh.write("# DRIFT_STREAM_HEAPS — streaming drift monitor at "
                 "the heaps1 decade\n\n")
        fh.write(
            f"Corpus: `{emb_path}` ({n_vecs} 64-d vectors, 10x sf0.1), "
            f"initial load {n_batches - 1} file-stream batches + a full "
            "checkpoint-wipe replay + 1 incremental drop "
            "(`maxFilesPerTrigger=1`), local[32], 16g.  Stream == "
            "batch == replay semantics asserted three ways (exact "
            "integer parity, no float tolerance); generated by "
            "`tools/drift_stream_heaps.py`.  Drift probe: "
            f"{cal['probe_s']} s vs ref {cal['probe_ref_s']} s "
            f"(drift_factor {cal['drift_factor']}).\n\n")
        fh.write("| assertion | verdict | detail |\n|---|---|---|\n")
        fh.write("\n".join(report) + "\n")
        fh.write(f"\n**Overall: {'PASS' if ok else 'FAIL'}.**\n")
    print("\n".join(report))
    print("overall:", "PASS" if ok else "FAIL")
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
