"""Capture r14 plan evidence for loop-INTERNAL shapes that the
registered queries' final explain cannot show (the returned frames are
lazy projections over localCheckpoints, so the loop bodies are
truncated out of the plan).

Writes, under plans/r14/:
  cc_round_{before,after}.txt      — one pointer-jumping round of
      connected_components at sf0.1's forced-distributed shape:
      before = r13 (no layout, no broadcast gate), after = r14
      (s-partitioned edges + broadcast label state).
  suffix_r0_join_{before,after}.txt — the suffix rank-0 vocabulary
      join: before = planner-chosen (SMJ), after = broadcast under the
      _VOCAB_BCAST_MAX gate.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"
PDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14"
)


def _save(name: str, df) -> None:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(PDIR, name), "w") as f:
        f.write(buf.getvalue())
    print(f"wrote {name}")


def main() -> int:
    os.makedirs(PDIR, exist_ok=True)
    from pyspark.sql import functions as F

    from etl_pipeline_orchestration_spark.session import get_spark
    from etl_pipeline_orchestration_spark.plans.llm_data import (
        _gram_share_edges,
    )
    from etl_pipeline_orchestration_spark.plans.scale_primitives import (
        assign_contiguous_ids_ordered,
    )
    from etl_pipeline_orchestration_spark.plans.corpus_ops import _SA_STRIDE
    from etl_pipeline_orchestration_spark.sources.tables import load_table

    spark = get_spark("plan_r14")
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # ---- connected-components round body ----
    pairs = _gram_share_edges(spark, SF)
    e = pairs.select(
        F.col("src").alias("s"), F.col("dst").alias("d")
    ).localCheckpoint(eager=True)

    def round_body(both, labels, bcast):
        hint = (lambda s: F.broadcast(s)) if bcast else (lambda s: s)
        nbr = both.join(
            hint(labels.withColumnRenamed("node", "d2")),
            F.col("d") == F.col("d2"),
        ).select(F.col("s").alias("node"), "component")
        l2 = labels.select(
            F.col("node").alias("c_node"), F.col("component").alias("c_comp")
        )
        jump = labels.join(
            hint(l2), F.col("component") == F.col("c_node")
        ).select("node", F.col("c_comp").alias("component"))
        return (
            labels.union(nbr)
            .union(jump)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )

    # before: unlaid edges, shuffle joins
    both_b = (
        e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels_b = (
        both_b.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    _save("cc_round_before.txt", round_body(both_b, labels_b, bcast=False))

    # after: s-partitioned edges, broadcast label state
    both_a = (
        e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
        .repartition(n_shuffle, "s")
        .localCheckpoint(eager=True)
    )
    labels_a = (
        both_a.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    _save("cc_round_after.txt", round_body(both_a, labels_a, bcast=True))

    # ---- suffix rank-0 vocabulary join ----
    docs = load_table(spark, SF, "documents")
    tok = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias(
                "idx", "tk"
            ),
        )
        .select(
            "doc_id",
            "idx",
            (F.col("doc_id") * _SA_STRIDE + F.col("idx")).alias("gid"),
            "tk",
        )
        .localCheckpoint(eager=True)
    )
    vocab = tok.select("tk").distinct().localCheckpoint(eager=True)
    proj = F.expr(
        "aggregate(transform(sequence(1, 7),"
        " i -> least(coalesce(ascii(substring(tk, i, 1)), -1) + 1, 256)),"
        " 0L, (acc, d) -> acc * 257L + d)"
    )
    vr = assign_contiguous_ids_ordered(
        vocab, ["tk"], proj, id_col="vid"
    ).select("tk", (F.col("vid") + 1).alias("r"))
    _save("suffix_r0_join_before.txt", tok.join(vr, "tk").select("gid", "r"))
    _save(
        "suffix_r0_join_after.txt",
        tok.join(F.broadcast(vr), "tk").select("gid", "r"),
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
