"""jtk_tpu — TPU-native targeted diploid genome assembler.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of ban-m/jtk
(reference mounted read-only at /root/reference): chunk-based diploid assembly
of noisy long reads from a <=10 Mbp region.

Layering (see SURVEY.md):
  * ``jtk_tpu.ops``      — device kernels: banded pair-HMM, modification table,
                            banded alignment, k-mer ops (JAX/Pallas).
  * ``jtk_tpu.mapper``   — seed-chain-extend read->chunk mapper (replaces the
                            reference's minimap2 subprocess).
  * ``jtk_tpu.datamodel``— the serialized ``DataSet`` state (JSON ABI matching
                            the reference's definitions crate) + columnar device
                            views.
  * ``jtk_tpu.stages``   — pipeline stages, each a function DataSet -> DataSet
                            (reference: one trait per stage on DataSet,
                            haplotyper/src/lib.rs:28-39).
  * ``jtk_tpu.graph``    — host-side graph algorithms (ditch graph, copy-number
                            flow, repeat resolution by foci).
  * ``jtk_tpu.parallel`` — device-mesh sharding helpers (pjit/shard_map).
  * ``jtk_tpu.pipeline`` — TOML-configured end-to-end pipeline with
                            phase-granular checkpoint/resume.
  * ``jtk_tpu.cli``      — the ``jtk`` CLI mirroring the reference's 18
                            subcommands with the stdin/stdout JSON stage ABI.
"""

__version__ = "0.1.0"
