"""Measured dead ends, kept as evidence — NOT wired into production.

Each module here is exact and parity-tested but lost its on-chip A/B
against the shipped implementation (numbers in ROADMAP.md). They are
retained so future hardware/compiler changes can re-run the comparison
without rebuilding the kernels, and so the negative results stay
reproducible:

- ``median_pallas``: rank-selection median kernel — matches XLA's sort
  speed (2.9 vs 2.8 ms), beaten by the Batcher selection network
  (``ops.median_select``) that ships.
- ``stem_batched``: batch-on-lanes fused stem megakernels — kernel fwd
  4.14 vs 4.51 ms but ~3.8 ms/step of layout glue; loses end to end to
  ``ops.stem_fused``.
- ``packed_stem``: space-to-depth rewrite of the first two convs —
  exact, but slightly slower than XLA's native 3-channel stem handling
  (14.7 vs 13.4 ms fwd b8). Reachable via
  ``models.apply(packed_stem=True)`` for hardware where small-channel
  convs are worse.

Nothing imports this package on any default path; production code
reaches ``packed_stem`` only behind its explicit opt-in flag.
"""
