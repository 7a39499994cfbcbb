"""Registry-wide correctness gate as a test.

The external driver samples only ~50 of the registered queries per
round; a regression in an unsampled query would otherwise surface a
round late. This runs the SAME differential (tools/check_oracle.py —
every queries() entry on Spark vs its oracle_sql() twin on DuckDB) over
the ENTIRE registry at sf0.001 on the warm test session.

Marked slow (~2 min): deselect during inner-loop iteration with
``pytest -m "not slow"``; the default full run keeps it on.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.mark.slow
def test_every_registered_query_matches_its_oracle(spark):
    from tools.check_oracle import run_sweep

    result = run_sweep("/root/testdata/sf0.001", spark=spark)
    assert result["fail"] == 0, f"oracle mismatches: {result['failures']}"
    # The registry must stay overwhelmingly oracle-checked — a drift
    # toward rows-only entries weakens the gate silently.
    assert result["pass"] >= 260
    # rows-only ceiling: raised 20 -> 24 in r7s4 for the four genuinely
    # non-SQL ops added together (unigram trainer + encode: per-word DP;
    # isolation forest: recursive partitioning); tightened 24 -> 20 in
    # r9 when markov attribution flipped to the oracled quantized
    # power-iteration form; 20 -> 18 in r10 when the redundant
    # dedup_simhash / doc_fingerprints registrations folded into their
    # certified cross-engine lanes (operators stay pinned by planted
    # tests); 18 -> 16 in r11 when embedding_kmeans_clusters moved to
    # the quantized-exact Lloyd path (unrolled 8-round oracle) and
    # multimodal_dhash_neardup gained its generator-vs-decoder integer
    # oracle; 16 -> 14 in r13 (multimodal_audio_spectral certified r12;
    # embedding_topk_ivf certified r13 via the integer-exact IVF).
    # Still <5% of the registry; raise this ONLY with a per-op
    # justification in the commit, never to paper over a lost oracle.
    assert result["rows_only"] <= 14
