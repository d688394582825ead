"""Engine-wide constants and tuning knobs."""

# Zoom levels for the headline tile-assignment stage (matches fixture oracles).
TILE_ZOOMS = (4, 5, 6, 7, 8)

# Quadkey cell level used as THE partition key across PIP/kNN/histogram
# stages (SURVEY.md section 7: pick one partitioning key and reuse it).
CELL_LEVEL = 7

# A cell whose row count exceeds this is salted into sub-keys before any
# keyed shuffle (skew handling for dense "urban" hotspots).
HOT_CELL_CAP = 50_000

# Default map_batches batch size for metadata-only stages; image-payload
# stages use smaller batches (wide binary rows).
META_BATCH = 65536  # same default as GDAL's Arrow stream (ogrlayerarrow.cpp:1947)
IMAGE_BATCH = 256

# Broadcast-side caps (scale guards): above these row counts the broadcast
# fast paths switch to (or demand) the co-partitioned shuffle plans.
KNN_BROADCAST_MAX = 2_000_000     # reference-point index rows
EXACT_NEARDUP_MAX = 200_000       # all-pairs embedding rows (O(N^2) oracle)
