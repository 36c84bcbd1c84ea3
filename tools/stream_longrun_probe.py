#!/usr/bin/env python
"""Streaming long-run probe: replay ~100 micro-batches through the
evolving-corpus ingest-dedup fold (the ``stream_ingest_dedup`` path,
plans/similarity.py) and record per-batch latency and state growth.

The registered verdict query proves CORRECTNESS over 4 micro-batches;
this probe answers the long-run question: does the foreachBatch fold's
per-batch cost grow with batch index? The fold is designed not to —

  - the state fold is APPEND-ONLY (O(batch) write, never an O(corpus)
    rewrite),
  - the near-dup gate is the one-sided banded-LSH candidate join
    (``minhash_candidates``), so per-batch join work is driven by the
    batch's bucket hits, not the corpus size,
  - the only per-batch cost that grows with the corpus is the state
    parquet SCAN (signature recompute) — linear in state bytes; a
    production deployment amortizes it by persisting the signature table
    alongside the corpus (noted in SCALE.md §10).

The fold uses the EXACTLY-ONCE epoch discipline the registered queries
run (streaming/idempotent.py): per-epoch partitioned writes, state reads
of strictly-earlier epochs, and every ``--compact-every`` batches an
``compact_epochs`` roll-up of the state (the maintenance op) so the
one-file-per-epoch accumulation doesn't degrade the scan — the
integration the maintenance ops exist for, now exercised at ~100-epoch
scale.

Usage:
  PYTHONPATH=. python tools/stream_longrun_probe.py [SF_DIR] [N_BATCHES] [COMPACT_EVERY] [USE_INDEX]

Defaults: SF_DIR=/root/testdata/sf0.1, N_BATCHES=100, COMPACT_EVERY=25,
USE_INDEX=0. With USE_INDEX=1 the fold routes against the WRITE-TIME
SIGNATURE INDEX (``build_dedup_index``) instead of re-shingling corpus
text every batch, and folds the index forward by appending the kept
docs' index rows — the full-corpus-scale configuration.
Prints ONE JSON line: per-decile mean batch seconds, a least-squares
slope of seconds vs batch index (flat ≈ 0), state bytes/files trend, and
final routing counts.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def dir_stats(path: str) -> tuple[int, int]:
    n, b = 0, 0
    for dp, _, fs in os.walk(path):
        for f in fs:
            if not f.startswith((".", "_")) and not f.endswith(".crc"):
                n += 1
                b += os.path.getsize(os.path.join(dp, f))
    return n, b


def main() -> None:
    from pyspark.sql import functions as F

    from sport_data_pipeline_spark.catalog import load_table
    from sport_data_pipeline_spark.operators.dedup import (
        build_dedup_index,
        incremental_dedup,
    )
    from sport_data_pipeline_spark.session import get_session
    from sport_data_pipeline_spark.streaming.idempotent import (
        compact_epochs,
        epoch_read,
        epoch_write,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    compact_every = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    use_index = len(sys.argv) > 4 and sys.argv[4] not in ("0", "false")

    spark = get_session("longrun_probe")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    corpus0 = docs.filter(F.col("doc_id") % 5 == 0)
    streamed = docs.filter(F.col("doc_id") % 5 != 0).toPandas()

    tmp = tempfile.mkdtemp(prefix="sdp_longrun_")
    in_dir, state_dir, routed_dir, ckpt = (
        f"{tmp}/in",
        f"{tmp}/state",
        f"{tmp}/routed",
        f"{tmp}/ckpt",
    )
    index_dir = f"{tmp}/index"
    batch_sec: list[float] = []
    state_trend: list[tuple[int, int]] = []  # (files, bytes) per batch
    try:
        epoch_write(corpus0, state_dir, -1)
        if use_index:
            epoch_write(
                build_dedup_index(
                    corpus0, "doc_id", "text", ["lang", "source"], shingle_n=3
                ),
                index_dir,
                -1,
            )

        # pre-write one parquet file per micro-batch with strictly
        # increasing mtimes (the file source triggers oldest-first); much
        # faster than 100 sleeps + spark writes
        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(in_dir)
        # explicit arrow schema: empty batch slices (polls with no new
        # data — realistic and kept) would otherwise infer null-typed
        # columns and poison the uniform file schema
        arrow_schema = pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text", pa.string()),
                ("lang", pa.string()),
                ("source", pa.string()),
            ]
        )
        t0 = time.time() - n_batches * 2
        for k in range(n_batches):
            part = streamed[streamed["doc_id"] % n_batches == k]
            path = os.path.join(in_dir, f"batch_{k:04d}.parquet")
            pq.write_table(
                pa.Table.from_pandas(part, preserve_index=False, schema=arrow_schema),
                path,
            )
            os.utime(path, (t0 + 2 * k, t0 + 2 * k))

        schema = spark.read.parquet(in_dir).schema

        def route_batch(batch, epoch: int) -> None:
            t = time.perf_counter()
            corpus_side = epoch_read(
                spark, index_dir if use_index else state_dir, before_epoch=epoch
            )
            routed = incremental_dedup(
                batch,
                corpus_side,
                "doc_id",
                "text",
                block_cols=["lang", "source"],
                threshold=0.5,
                shingle_n=3,
                minhash_candidates=(32, 16),  # the full-corpus-scale gate
            ).localCheckpoint(eager=True)
            epoch_write(routed, routed_dir, epoch)
            kept = batch.join(
                routed.filter(F.col("status") == "kept"), "doc_id", "left_semi"
            )
            epoch_write(kept, state_dir, epoch)
            if use_index:  # fold the index forward like the corpus
                epoch_write(
                    build_dedup_index(
                        kept, "doc_id", "text", ["lang", "source"], shingle_n=3
                    ),
                    index_dir,
                    epoch,
                )
            spark.catalog.clearCache()  # drop per-batch persisted signatures
            batch_sec.append(round(time.perf_counter() - t, 3))
            state_trend.append(dir_stats(state_dir))
            if compact_every and len(batch_sec) % compact_every == 0:
                tc = time.perf_counter()
                # roll COMMITTED epochs (strictly before the current one)
                # into the base partition; the current epoch stays its own
                # partition so a crash-replay of it still overwrites
                # cleanly instead of double-counting against the base
                compact_epochs(spark, state_dir, below_epoch=epoch)
                if use_index:
                    compact_epochs(spark, index_dir, below_epoch=epoch)
                print(
                    f"# compacted state after batch {len(batch_sec)}: "
                    f"{dir_stats(state_dir)[0]} files, "
                    f"{time.perf_counter() - tc:.1f}s",
                    file=sys.stderr,
                )

        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir)
            .writeStream.foreachBatch(route_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        counts = {
            r["status"]: r["n"]
            for r in spark.read.parquet(routed_dir)
            .groupBy("status")
            .agg(F.count("*").alias("n"))
            .collect()
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()

    n = len(batch_sec)
    decile = max(1, n // 10)
    deciles = [
        round(sum(batch_sec[i : i + decile]) / len(batch_sec[i : i + decile]), 3)
        for i in range(0, n, decile)
    ]
    xbar, ybar = (n - 1) / 2, sum(batch_sec) / n
    slope = sum((i - xbar) * (y - ybar) for i, y in enumerate(batch_sec)) / sum(
        (i - xbar) ** 2 for i in range(n)
    )
    print(
        json.dumps(
            {
                "n_batches": n,
                "decile_mean_sec": deciles,
                "sec_per_batch_slope": round(slope, 5),
                "first10_mean": round(sum(batch_sec[:10]) / 10, 3),
                "last10_mean": round(sum(batch_sec[-10:]) / 10, 3),
                "state_files_final": state_trend[-1][0],
                "state_mb_final": round(state_trend[-1][1] / 1e6, 2),
                "routing_counts": counts,
                "compact_every": compact_every,
                "use_index": use_index,
            }
        )
    )


if __name__ == "__main__":
    main()
