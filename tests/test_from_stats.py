"""from_stats= production path for the per-metric corpus queries: same
answers through the persisted gram-stats layer as standalone, with ZERO
documents scans in the from-stats plans."""

from __future__ import annotations

import pytest

from etl_pipeline_orchestration_spark.loader import WarehouseLoader
from etl_pipeline_orchestration_spark.plans import corpus_ops, corpus_stats

SF = "/root/testdata/sf0.001"

METRICS = [
    "bpe_pair_frequencies",
    "split_unigram_kl",
    "pmi_collocations",
    "zipf_slope_by_lang",
    "conditional_entropy_by_lang",
    "vocab_coverage_curve",
    "source_lang_skew",
]


@pytest.fixture(scope="module")
def gs_snaps(spark, tmp_path_factory):
    loader = WarehouseLoader(spark, str(tmp_path_factory.mktemp("wh")))
    return corpus_stats.materialize_gram_stats(spark, SF, loader)


@pytest.mark.parametrize("name", METRICS)
def test_from_stats_path_matches_standalone(spark, gs_snaps, name):
    fn = getattr(corpus_ops, name)
    standalone = {tuple(r) for r in fn(spark, SF).collect()}
    via_layer = {
        tuple(r) for r in fn(spark, SF, from_stats=gs_snaps.read()).collect()
    }
    assert via_layer == standalone and len(standalone) > 0


@pytest.mark.parametrize("name", METRICS)
def test_from_stats_path_never_scans_documents(spark, gs_snaps, name):
    """The point of the layer: the production path must read ONLY the
    persisted histogram. inputFiles() enumerates every file the plan
    reads — none may be the corpus."""
    fn = getattr(corpus_ops, name)
    df = fn(spark, SF, from_stats=gs_snaps.read())
    files = df.inputFiles()
    assert files, "expected the plan to read the persisted layer"
    assert all("documents" not in f for f in files), files
