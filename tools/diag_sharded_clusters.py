"""Decompose dedup_clusters_sharded's runtime (VERDICT r13 item 5).

    python tools/diag_sharded_clusters.py [sf_dir ...]

The sf10/sf1 scaling ratio was 13.4x for 10x data (r13, cause named
but unverified: "shuffle groups growing with shard count"). Before
changing anything, split the wall clock into the query's three
phases (guide §1: measure first) so the fix targets the real cost:

  1. pairs    — sharded ngram_jaccard pair generation, materialized
                to the symmetric edge list (noop sink)
  2. labels   — the component_labels min-label loop, timed
                PER ITERATION (join+agg, checkpoint, convergence
                count as separate timers)
  3. assembly — the final shard join + groupBy report

Each phase re-times one fresh run (no reuse across phases beyond the
materialized edge checkpoint the real query also has). Prints one
JSON line per sf_dir.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

WARM_SF_DIR = os.environ.get("SPARK_GRAFT_WARM_SF_DIR",
                             "/root/testdata/sf0.001")
DEFAULT_DIRS = [
    os.path.join(REPO, "scale_scratch", "sf1"),
    os.path.join(REPO, "scale_scratch", "sf10"),
]


def main() -> int:
    from mapreducewordcounting_spark.checkpoints import (
        CheckpointRotator,
        pinned_ids,
        release_all_pinned,
        release_created_since,
    )
    from mapreducewordcounting_spark.catalog import load_table
    from mapreducewordcounting_spark.operators.dedup import (
        DEDUP_SHARD_SPAN,
        ngram_jaccard_pairs,
    )
    from mapreducewordcounting_spark.session import get_spark

    dirs = sys.argv[1:] or [d for d in DEFAULT_DIRS if os.path.isdir(d)]
    spark = get_spark(app_name="mrwc-diag-sharded")
    spark.sparkContext.setLogLevel("ERROR")

    def mat(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # JVM/codegen warmup on the tiny fixture (bench protocol)
    from mapreducewordcounting_spark import registry
    qs = registry.queries()
    mat(qs["dedup_clusters_sharded"](spark, WARM_SF_DIR))
    release_all_pinned(spark)

    for sf_dir in dirs:
        out: dict = {"sf_dir": sf_dir}
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "source",
            (F.col("doc_id") / DEDUP_SHARD_SPAN).cast("bigint")
            .alias("shard"))

        # -- phase 1: pairs -> symmetric edges, checkpointed --------
        before_ids = pinned_ids(spark)
        t0 = time.perf_counter()
        pairs = ngram_jaccard_pairs(
            docs, 0.8, shard_cols=("source", "shard")
        ).select("id_a", "id_b")
        edges_df = pairs.unionByName(
            pairs.select(F.col("id_b").alias("id_a"),
                         F.col("id_a").alias("id_b")))
        scratch = CheckpointRotator(spark)
        edges = scratch.rotate(edges_df)
        release_created_since(spark, before_ids, keep=scratch.live_ids)
        out["pairs_sec"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        out["n_edges"] = edges.count()
        out["edges_count_sec"] = round(time.perf_counter() - t0, 3)

        # -- phase 2: the label loop, per-iteration timers -----------
        steps = CheckpointRotator(spark)
        t0 = time.perf_counter()
        labels = steps.rotate(
            edges.select(F.col("id_a").alias("node"))
            .distinct()
            .withColumn("label", F.col("node")))
        out["labels_init_sec"] = round(time.perf_counter() - t0, 3)
        iters = []
        for _ in range(20):
            it = {}
            t0 = time.perf_counter()
            neighbor_min = (
                edges.join(labels, edges.id_b == labels.node)
                .groupBy(F.col("id_a").alias("node"))
                .agg(F.min("label").alias("nbr_label")))
            stepped = steps.rotate(
                labels.join(neighbor_min, "node", "left")
                .select(
                    "node",
                    F.col("label").alias("old_label"),
                    F.least(F.col("label"),
                            F.coalesce("nbr_label", "label"))
                    .alias("label")))
            it["step_sec"] = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            changed = stepped.filter(
                F.col("label") != F.col("old_label")).count()
            it["count_sec"] = round(time.perf_counter() - t0, 3)
            it["changed"] = changed
            iters.append(it)
            labels = stepped.select("node", "label")
            if changed == 0:
                break
        out["iterations"] = iters
        out["labels_total_sec"] = round(
            out["labels_init_sec"]
            + sum(i["step_sec"] + i["count_sec"] for i in iters), 3)

        # -- phase 3: final shard join + report ----------------------
        shard_of = docs.select(F.col("doc_id").alias("node"),
                               "source", "shard")
        t0 = time.perf_counter()
        mat(labels.join(shard_of, "node")
            .groupBy("source", "shard",
                     F.col("label").alias("cluster_survivor"))
            .agg(F.count("*").alias("n_members"),
                 F.array_join(F.sort_array(F.collect_list("node")), "|")
                 .alias("members")))
        out["assembly_sec"] = round(time.perf_counter() - t0, 3)
        out["total_sec"] = round(
            out["pairs_sec"] + out["labels_total_sec"]
            + out["assembly_sec"], 3)
        release_all_pinned(spark)
        print(json.dumps(out), flush=True)

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
