"""Scale smoke for the heavy families (marked slow).

The per-round bench runs at sf0.1 (5k documents / 2k embeddings);
driver-side bottlenecks and shuffle blowups that only appear at larger
cardinalities would ship unnoticed. This generates a ~10x-sf0.1 corpus
PARTITION-PARALLEL (pure Spark expressions over ``spark.range`` — no
driver-side row generation, the same discipline a 100 TB synthetic
load would use) and runs the three heavy families end-to-end through
their REGISTERED query entries:

* MinHash-LSH + exact-Jaccard verify (dedup family) with planted
  replica families, asserting recall on the planted structure;
* IVF ANN top-k (similarity family), asserting self-retrieval;
* corpus_report (corpus-statistics family), asserting completion AND
  that total shuffle-write bytes stay histogram-bounded — the
  assertion that catches an accidental corpus-scale shuffle.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.plans import registry

registry.load_all()

N_DOCS = 50_000  # 10x sf0.1 documents
N_VECS = 20_000  # 10x sf0.1 embeddings
REPLICAS = 10  # docs per near-dup family


@pytest.fixture(scope="module")
def big_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_big")
    vocab = ", ".join(f"'w{j:02d}'" for j in range(80))
    fam_words = (
        f"transform(sequence(1, 40),"
        f" i -> elt(1 + pmod(xxhash64(id div {REPLICAS}, i), 80), {vocab}))"
    )
    base_text = F.expr(f"concat_ws(' ', {fam_words})")
    text = F.when(F.col("id") % REPLICAS == 0, base_text).otherwise(
        F.concat(base_text, F.lit(" rep"), (F.col("id") % REPLICAS).cast("string"))
    )
    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        F.expr("elt(1 + id % 5, 'en', 'de', 'fr', 'es', 'it')").alias("lang"),
        F.expr("elt(1 + id % 4, 'web', 'books', 'wiki', 'code')").alias("source"),
    )
    docs = docs.withColumn("n_chars", F.length("text").cast("bigint"))
    docs.repartition(16).write.parquet(str(d / "documents.parquet"))

    emb = spark.range(N_VECS).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 63), j ->"
            " cast(pmod(xxhash64(id, j), 1000) / 500.0 - 1.0 AS float))"
        ).alias("embedding"),
        (F.col("id") % 10).cast("int").alias("label"),
    )
    emb.repartition(8).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


@pytest.mark.slow
def test_minhash_family_recall_at_10x_scale(spark, big_sf_dir):
    pairs = registry.QUERIES["dedup_minhash_verified"](
        spark, big_sf_dir
    ).collect()
    # Planted structure: replicas of a family differ by one appended
    # token (shingle Jaccard ~0.92, far above the 0.7 verify threshold
    # and on the ~certain part of the 8x4 LSH S-curve). Families draw
    # from disjoint hash streams, so cross-family pairs are improbable.
    n_families = N_DOCS // REPLICAS
    expected = n_families * (REPLICAS * (REPLICAS - 1) // 2)
    intra = sum(
        1 for r in pairs if r["id_a"] // REPLICAS == r["id_b"] // REPLICAS
    )
    assert len(pairs) >= 0.9 * expected, (
        f"LSH+verify found {len(pairs)} pairs; planted {expected}"
    )
    assert intra == len(pairs), "cross-family false positives above threshold"


@pytest.mark.slow
def test_ivf_topk_self_retrieval_at_10x_scale(spark, big_sf_dir):
    # Contract since the r12 certification (fd5266d): integer-exact IVF
    # returning (vec_id, list_j, dot_q) ordered by (dot_q desc, vec_id).
    rows = registry.QUERIES["embedding_topk_ivf"](spark, big_sf_dir).collect()
    assert len(rows) == 10
    assert rows[0]["vec_id"] == 0  # the query vector retrieves itself
    # Self-dot = |q|² is the maximum by a wide margin on this corpus;
    # the declared ordering must carry it to the front.
    assert rows[0]["dot_q"] > 0
    assert rows[0]["dot_q"] == max(r["dot_q"] for r in rows)
    dots = [r["dot_q"] for r in rows]
    assert dots == sorted(dots, reverse=True)


@pytest.mark.slow
def test_corpus_report_shuffle_stays_histogram_bounded(spark, big_sf_dir):
    df = registry.QUERIES["corpus_report"](spark, big_sf_dir)
    rows = df.collect()
    assert len(rows) >= 40  # all seven metrics populated

    corpus_bytes = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(f"{big_sf_dir}/documents.parquet")
        for f in files
    )
    store = spark._jsparkSession.sharedState().statusStore()
    execs = store.executionsList()
    last = execs.apply(execs.size() - 1)
    metrics = store.executionMetrics(last.executionId())
    g = store.planGraph(last.executionId())
    nodes = g.allNodes()
    shuffle_bytes = 0
    for i in range(nodes.size()):
        node = nodes.apply(i)
        ms = node.metrics()
        for j in range(ms.size()):
            m = ms.apply(j)
            if m.name() == "shuffle bytes written":
                opt = metrics.get(m.accumulatorId())
                if not opt.isEmpty():
                    shuffle_bytes += _parse_bytes(str(opt.get()))
    # Histogram-bounded: the gram-stats shuffle carries (key, count)
    # rows after map-side combine, not the corpus. Allow generous slack
    # over the raw parquet size — a corpus-scale shuffle regression
    # (e.g. losing partial aggregation) lands orders above this.
    assert shuffle_bytes > 0, "shuffle metrics not found — assertion vacuous"
    assert shuffle_bytes < 10 * corpus_bytes, (
        f"corpus_report shuffled {shuffle_bytes}B for a {corpus_bytes}B corpus"
    )


def _parse_bytes(s: str) -> int:
    # Metric strings come as plain "155", sized "2.4 KiB", or the
    # aggregated "total (min, med, max (stageId: taskId))\n11.1 KiB
    # (...)" — the value always leads the LAST line.
    parts = s.strip().splitlines()[-1].split("(")[0].split()
    try:
        val = float(parts[0].replace(",", ""))
    except (ValueError, IndexError):
        raise AssertionError(f"unparseable shuffle metric: {s!r}")
    unit = parts[1] if len(parts) > 1 else "B"
    mult = {
        "B": 1,
        "KB": 1024,
        "KiB": 1024,
        "MB": 1024**2,
        "MiB": 1024**2,
        "GB": 1024**3,
        "GiB": 1024**3,
    }.get(unit, 1)
    return int(val * mult)


@pytest.mark.slow
def test_distributed_rank_is_exact_permutation_at_5m_rows(spark):
    """The distributed global-rank operator at ~80x the bench row count:
    completes with no SinglePartition exchange and produces an exact
    1..N permutation (min/max/distinct checked distributively — nothing
    row-scale ever reaches the driver)."""
    from etl_pipeline_orchestration_spark.operators import ranking

    n = 5_000_000
    df = spark.range(n).select(
        "id", (F.xxhash64("id") % 100_000).alias("k")
    )
    ranked, total = ranking.append_global_row_number(
        df, [F.col("k"), F.col("id")], F.col("k"), n_buckets=64, out_col="rn"
    )
    assert total == n
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    stats = ranked.agg(
        F.min("rn").alias("lo"),
        F.max("rn").alias("hi"),
        F.countDistinct("rn").alias("nd"),
    ).head()
    assert (stats["lo"], stats["hi"], stats["nd"]) == (1, n, n)
