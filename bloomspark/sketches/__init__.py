"""Distributed approximate-aggregation sketches (the north-rule family
beyond Bloom: HLL, count-min, t-digest, KLL).

Every sketch follows the same Spark shape as the Bloom builds
(build.py): one ``mapInArrow`` pass producing a single binary partial
per partition, an optional executor tree-merge, and an associative
driver merge — a mergeable vectorized UDAF realized over Arrow batches,
with per-partition lineage identical to the Bloom path.  Hashing reuses
the repo's vectorized Murmur3 (no per-row Python anywhere).

Accuracy contracts (asserted in tests/test_sketches.py against exact
answers, and in the driver oracle gate against DuckDB):

- HyperLogLog: relative error ~1.04/sqrt(2^p) on count-distinct
  (Flajolet et al. 2007), merge = register max (idempotent).
- Count-min: estimate >= true count, excess <= eps*N with high
  probability (Cormode & Muthukrishnan 2005), merge = counter add.
- t-digest: rank-accurate quantiles, tighter at the tails (Dunning &
  Ertl, "Computing extremely accurate quantiles using t-digests"),
  merge = centroid merge + recompress.
- KLL: uniform rank error O(1/k) quantiles (Karnin, Lang, Liberty
  2016), merge = level-wise concat + compaction.
- Theta (KMV bottom-k): distinct counts with SET OPERATIONS —
  union/intersection/A-not-B estimates at relative error ~1/sqrt(k-2)
  (Beyer et al. 2007), EXACT while the retained set stays under k;
  merge = union of retained hashes below min(theta).
- Frequent items (Misra-Gries 1982, mergeable per Agarwal et al.
  2012): top-k heavy hitters WITH their identities; every count
  carries [lower, upper] bounds with upper - lower <= n/(k+1), EXACT
  while no trim has fired; merge = counter add + trim.
"""

from .engine import (SketchHandle, build_sketch, build_sketch_checkpointed,
                     build_sketch_per_group, sketch_values_per_group)
from .hll import HyperLogLog
from .cms import CountMinSketch
from .tdigest import TDigest
from .kll import KLLSketch
from .theta import ThetaSketch
from .frequent import FrequentItemsSketch, frequent_topk_per_group

__all__ = [
    "ThetaSketch",
    "FrequentItemsSketch",
    "frequent_topk_per_group",
    "build_sketch_per_group",
    "sketch_values_per_group",
    "HyperLogLog",
    "CountMinSketch",
    "TDigest",
    "KLLSketch",
    "SketchHandle",
    "build_sketch",
    "build_sketch_checkpointed",
]
