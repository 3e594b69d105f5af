"""Deliberately (re)generate tests/golden/full30.json from a completed
30-proteome easy-core output directory.

Run the pipeline first (TPU is ~6x faster than CPU for this):
  PYTHONPATH=/root/repo:/root/.axon_site python -m unicore_tpu easy-core \
      <dir-with-30-fa> <out> mock <tmp> --tree-builder fasttree \
      --tree-options "-gamma -boot 100" -v 2
then:  python scripts/gen_full30_golden.py <out>
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_full30 import GOLDEN, _summarize  # noqa: E402

out_dir = sys.argv[1]
summary = _summarize(out_dir)
with open(GOLDEN, "w") as f:
    json.dump(summary, f, indent=1)
print(f"wrote {GOLDEN}: {summary['n_clusters']} clusters, "
      f"{len(summary['core_genes'])} core genes, "
      f"{len(summary['splits'])} splits")
