"""Greedy tie-semantics conflation (VERDICT r3 #5): conflate_greedy must
count identically to the reference's insertion-order greedy matching with
in-place removal (building_merge.py:680-735) on corpora where the
order-free mutual-best formulation legitimately differs."""

from __future__ import annotations

from building2osm_spark.operators.conflate import conflate, conflate_greedy
from building2osm_spark.sources import fixtures as FX
from building2osm_spark.sources.fixtures import cascade_conflation_pdfs
from tests.test_conflate import run_reference_merge

# kept as the test-local name used below and by test_streaming_pip's guard test
_cascade_fixture = cascade_conflation_pdfs


def test_greedy_matches_reference_on_cascade_corpus(spark):
    osm_pdf, import_pdf = _cascade_fixture()
    want = run_reference_merge(osm_pdf, import_pdf)
    assert want == {(1, "A"), (2, "B")}  # the reference's greedy cascade

    osm = spark.createDataFrame(osm_pdf, schema=FX.OSM_CONFLATE_SCHEMA)
    imports = spark.createDataFrame(import_pdf, schema=FX.IMPORT_CONFLATE_SCHEMA)

    got = {(r.osm_id, r.ref) for r in conflate_greedy(osm, imports).collect()}
    assert got == want

    # and the default mutual-best mode legitimately differs here — the
    # documented equivalence-class boundary this mode exists for
    default = {(r.osm_id, r.ref) for r in conflate(osm, imports).collect()}
    assert default == {(1, "A")}


def test_greedy_equals_mutual_best_on_unique_best_corpus(spark):
    """On the standard fixture (unique best matches) greedy, mutual-best
    and the reference all agree — default behavior is unchanged."""
    osm_pdf, import_pdf = FX.conflation_pdfs(64)
    want = run_reference_merge(osm_pdf, import_pdf)

    osm = spark.createDataFrame(osm_pdf, schema=FX.OSM_CONFLATE_SCHEMA)
    imports = spark.createDataFrame(import_pdf, schema=FX.IMPORT_CONFLATE_SCHEMA)
    greedy = {(r.osm_id, r.ref) for r in conflate_greedy(osm, imports).collect()}
    mutual = {(r.osm_id, r.ref) for r in conflate(osm, imports).collect()}
    assert greedy == want
    assert mutual == want
