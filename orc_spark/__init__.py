"""orc_spark — a PySpark-native per-column lightweight-compression engine.

Built from scratch against public knowledge only: the Apache ORC v1
specification (encoding semantics: dictionary, RLEv2 sub-modes,
frame-of-reference), the FSST paper (VLDB 2020), and the PySpark
DataFrame / Arrow UDF API.

Layers
------
- ``orc_spark.codecs``   — pure-numpy codec kernels (no Spark import):
  bitpack, rle (short-repeat / direct / delta / patched-base), dict,
  fsst, frame-of-reference, raw fallback, plus the stripe framing format.
- ``orc_spark.engine``   — the Spark control plane: stats sampling,
  codec auto-selection, salted repartitioning (skew), mapInPandas
  encode/decode stages, lineage + checkpoint-resume, metrics reports.

Capability parity with the reference (`jorge-barreto/orc`, a Go workflow
orchestrator) is at the *semantics* level, per SURVEY.md: its resumable
state machine becomes our checkpoint manifest (reference
internal/runner/runner.go:699-703), its cost/timing ledgers become our
lineage table (internal/state/costs.go:13-33), its `branch` dispatch
becomes the codec auto-selector (internal/runner/runner.go:1288-1311).
"""

__version__ = "0.1.0"
