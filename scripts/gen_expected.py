"""Generate the expected-output parquet goldens for the driver queries
whose kernels are not SQL-expressible (grouped geometry passes, image
decode, conflation Hausdorff, raster overlay, fixture phash pairing).

Each of these queries is fixture-driven (ignores sf_dir), so its output
is a deterministic constant; pytest proves the underlying kernels against
the reference implementation (tests/test_geopasses.py exact WKB parity,
test_conflate.py match-set equality, test_images.py phash/PSNR oracle,
test_overlay.py exact PIP). The golden pins that proven output where the
driver's DuckDB oracle can see it:  oracle = SELECT * FROM
read_parquet('<golden>').  Regenerate ONLY after an intentional semantic
change, with the parity suite green:

    python scripts/gen_expected.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from building2osm_spark.session import get_spark  # noqa: E402
from building2osm_spark import driver_queries as DQ  # noqa: E402

GOLDEN_DIR = "/root/repo/tests/golden/driver"
NAMES = [
    "rectify_simplify",
    "conflate_fixture",
    "conflate_greedy",
    "image_pipeline",
    "raster_overlay",
    "image_phash_buckets",
    "multimodal_dedup",
    "audio_features",
    "video_frames",
]


def main() -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    spark = get_spark(app="gen-expected", cores=8)
    for name in NAMES:
        df = DQ.QUERIES[name](spark, "/root/testdata/sf0.01")
        tbl = pa.Table.from_batches(df._collect_as_arrow())
        path = os.path.join(GOLDEN_DIR, f"{name}.parquet")
        pq.write_table(tbl, path)
        print(f"{name}: {tbl.num_rows} rows -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
