"""building2osm_spark — a from-scratch PySpark-native spatial-join + tiling
engine with the capabilities of NKAmapper/building2osm (see SURVEY.md).

Layout:
  constants   — all reference numeric constants, cited
  geom        — numpy geometry kernels (reference-parity numerics)
  cells       — int64 hierarchical cell index (H3/S2 stand-in)
  utm         — UTM <-> WGS84 transverse-Mercator reprojection
  functions/  — Spark Column expressions + Arrow-vectorized pandas UDFs
  operators/  — cover join (PIP), kNN, conflation, rectify, simplify,
                dedup, similarity, text analysis, levels aggregation
  sources/    — synthetic fixtures, GeoJSON sink, checkpoint manifests
  plans/      — end-to-end pipelines (flagship assignment pipeline)
  streaming/  — incremental / resumable batch increments
"""

__version__ = "0.1.0"
