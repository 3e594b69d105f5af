"""unicore_tpu — TPU-native structural core-gene phylogeny engine.

A from-scratch re-design of the capabilities of steineggerlab/unicore
(reference: /root/reference) for TPU hardware:

- ProstT5 AA->3Di translation as a JAX T5 encoder + CNN head (bf16, pjit DP/TP)
- Foldseek-style all-vs-all structural alignment as Pallas TPU kernels
  (prefix-scan Smith-Waterman over combined 3Di+AA substitution scores)
- Greedy set-cover clustering, core-gene profiling (bit-exact port of the
  reference's profile semantics, src/modules/profile.rs:13-147)
- 3Di-aware progressive MSA + gap filtering + supermatrix concatenation
- Maximum-likelihood species/gene tree inference (Felsenstein pruning as
  batched matmuls, NNI search, RELL/UFBoot-style bootstrap)

The pipeline stage layout, file formats (.map, seqdb triplets, clust.tsv,
copiness.tsv, combined.fasta(.partitions), Newick trees) and the CLI
(9 subcommands) mirror the reference's observable contract so that a
Unicore user can switch over; the compute underneath is all JAX/XLA/Pallas.
"""

__version__ = "0.1.0"

CITATION = (
    "Kim, D., Park, S. & Steinegger, M. Unicore enables scalable and accurate "
    "phylogenetic reconstruction with structural core genes. "
    "Genome Biology and Evolution (2025). (reference pipeline)\n"
    "unicore_tpu: TPU-native re-implementation."
)
