"""textpipe_ray — a Ray-Data-native text quality-filter / data-processing engine.

A from-scratch reimplementation of the capabilities of textpipe/textpipe
(reference at /root/reference, studied for semantics only) expressed as
streaming ``ray.data.Dataset`` pipelines: ``map_batches`` over zero-copy
Arrow batches for stateless kernels, actor pools for stateful scoring
stages (language-ID, perplexity), explicit url-hash partitioning, and
per-partition lineage records for checkpoint/resume.

Layout:
  functions/   pure, deterministic per-batch kernels (no Ray imports)
  stages/      Ray Data stage wrappers (stateless fns + actor classes)
  sources/     readers/writers + the deterministic synthetic pages table
  pipelines/   pipeline spec registry (JSON round-trip) + flagship job
  state/       lineage ledger, counters/metrics
"""

__version__ = "0.1.0"
